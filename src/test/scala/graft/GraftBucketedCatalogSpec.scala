package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{ManifestTable, MergeInto}

/** S31 — the hash-bucketed MERGE layout reachable from the catalog:
  * `CREATE TABLE ... TBLPROPERTIES ('layout'='bucketed:<key>[:<n>]')`
  * routes every INSERT/MERGE/UPDATE/DELETE through the O(changeset)
  * upsert kernel ([[MergeInto.applyBatch]]), keeps the b=N layout
  * invariant on every surface (catalog SQL, V2 path, V1 alias), and
  * serves S18 point lookups by name (`CALL system.lookup`). */
class GraftBucketedCatalogSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-bkt").toString
    spark.conf.set("spark.sql.catalog.gbkt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbkt.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbkt.lake")
    dir
  }
  private def fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())

  private def freshBucketed(name: String, n: Int = 8): String = {
    wh: Unit
    spark.sql(s"DROP TABLE IF EXISTS gbkt.lake.$name")
    spark.sql(s"CREATE TABLE gbkt.lake.$name (k BIGINT, v STRING, amt DOUBLE) " +
      s"TBLPROPERTIES ('layout'='bucketed:k:$n', 'retainGenerations'='10')")
    s"$wh/lake/$name"
  }

  private def rows(name: String): Map[Long, (String, Double)] =
    spark.table(s"gbkt.lake.$name").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  private def livePaths(dir: String): Seq[String] =
    ManifestTable.livePaths(fs, dir)

  test("CREATE with layout pins the geometry; INSERT is an upsert by key") {
    val dir = freshBucketed("b1")
    assert(MergeInto.bucketedGeometry(spark, dir).contains(("k", 8)))
    spark.sql("INSERT INTO gbkt.lake.b1 VALUES (1,'a',10.0),(2,'b',20.0),(3,'c',30.0)")
    // every manifest path is a bucket dir — the layout invariant
    assert(livePaths(dir).nonEmpty && livePaths(dir).forall(_.contains("b=")))
    // re-inserting a key REPLACES its row: one row per key by construction
    spark.sql("INSERT INTO gbkt.lake.b1 VALUES (2,'B!',200.0),(9,'i',90.0)")
    assert(rows("b1") == Map(1L -> ("a", 10.0), 2L -> ("B!", 200.0),
      3L -> ("c", 30.0), 9L -> ("i", 90.0)))
    assert(livePaths(dir).forall(_.contains("b=")))
  }

  test("SQL MERGE routes through applyBatch: full clause surface, O(touched buckets)") {
    val dir = freshBucketed("b2")
    spark.sql("INSERT INTO gbkt.lake.b2 " +
      "VALUES (1,'a',10.0),(2,'b',20.0),(3,'c',30.0),(4,'d',40.0)")
    // bucket of each key under the kernel's own router
    val s0 = spark; import s0.implicits._
    val b = (1L to 9L).toSeq.toDF("k")
      .select(col("k"), pmod(hash(col("k")), lit(8)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val before = livePaths(dir)
    // source touches keys 2 (update), 3 (delete), 9 (insert)
    spark.sql(
      """MERGE INTO gbkt.lake.b2 AS t
         USING (SELECT * FROM VALUES
                  (2,'upd',2.0), (3,'del',0.0), (9,'ins',9.0)
                AS s(k, v, amt)) AS s
         ON t.k = s.k
         WHEN MATCHED AND s.v = 'del' THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = s.v, amt = t.amt + s.amt
         WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)""")
    assert(rows("b2") == Map(1L -> ("a", 10.0), 2L -> ("upd", 22.0),
      4L -> ("d", 40.0), 9L -> ("ins", 9.0)))
    // O(touched buckets): every bucket the source does NOT hash into
    // keeps its ORIGINAL dir in the new manifest (no rewrite, no read)
    val touched = Set(2L, 3L, 9L).map(b)
    val after = livePaths(dir)
    before.foreach { p =>
      val bucket = p.substring(p.lastIndexOf("b=") + 2).toInt
      if (!touched.contains(bucket))
        assert(after.contains(p), s"untouched bucket dir $p was rewritten")
    }
    assert(after.forall(_.contains("b=")), "merge preserved the layout")
  }

  test("MERGE with target-referencing values and clause conditions") {
    freshBucketed("b3")
    spark.sql("INSERT INTO gbkt.lake.b3 VALUES (1,'x',100.0),(2,'y',5.0)")
    // first-match-wins: k=1 hits the >50 clause, k=2 falls through
    spark.sql(
      """MERGE INTO gbkt.lake.b3 AS t
         USING (SELECT * FROM VALUES (1, 1.0), (2, 2.0) AS s(k, bump)) AS s
         ON t.k = s.k
         WHEN MATCHED AND t.amt > 50 THEN UPDATE SET amt = t.amt - s.bump
         WHEN MATCHED THEN UPDATE SET v = concat(t.v, '+')""")
    assert(rows("b3") == Map(1L -> ("x", 99.0), 2L -> ("y+", 5.0)))
  }

  test("MERGE duplicate source keys fail loudly; once-refused shapes now run natively") {
    val dir = freshBucketed("b4")
    spark.sql("INSERT INTO gbkt.lake.b4 VALUES (1,'a',1.0)")
    val dup = intercept[Exception] {
      spark.sql(
        """MERGE INTO gbkt.lake.b4 AS t
           USING (SELECT * FROM VALUES (1,'p',1.0),(1,'q',2.0) AS s(k,v,amt)) AS s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(dup).exists(_.contains("MERGE_CARDINALITY_VIOLATION")), msgs(dup))
    assert(rows("b4") == Map(1L -> ("a", 1.0)), "failed merge changed rows")
    // NOT MATCHED BY SOURCE judges every target row — the extension
    // kernel refused this shape; Spark's delta rewrite scans the full
    // target and emits per-row deletes, so it now just works
    spark.sql("INSERT INTO gbkt.lake.b4 VALUES (2,'gone',2.0)")
    spark.sql(
      """MERGE INTO gbkt.lake.b4 AS t
         USING (SELECT * FROM VALUES (1,'p',1.0) AS s(k,v,amt)) AS s
         ON t.k = s.k
         WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(rows("b4") == Map(1L -> ("a", 1.0)), "unmatched row must be deleted")
    // a compound ON condition — likewise native now
    spark.sql(
      """MERGE INTO gbkt.lake.b4 AS t
         USING (SELECT * FROM VALUES (1,'p',5.0) AS s(k,v,amt)) AS s
         ON t.k = s.k AND s.amt > 2
         WHEN MATCHED THEN UPDATE SET v = s.v""")
    assert(rows("b4") == Map(1L -> ("p", 1.0)))
    assert(livePaths(dir).forall(_.contains("b=")))
  }

  test("UPDATE and DELETE route through the kernel and keep the layout") {
    val dir = freshBucketed("b5")
    spark.sql("INSERT INTO gbkt.lake.b5 " +
      "VALUES (1,'a',10.0),(2,'b',20.0),(3,'c',30.0)")
    spark.sql("UPDATE gbkt.lake.b5 SET amt = amt + 1.0 WHERE k <= 2")
    assert(rows("b5") == Map(1L -> ("a", 11.0), 2L -> ("b", 21.0),
      3L -> ("c", 30.0)))
    spark.sql("DELETE FROM gbkt.lake.b5 WHERE v = 'b'")
    assert(rows("b5") == Map(1L -> ("a", 11.0), 3L -> ("c", 30.0)))
    assert(livePaths(dir).forall(_.contains("b=")),
      "row-level DML preserved the bucket layout")
    // assigning the bucket key moves row identity: the delta write
    // emits delete(old key) + insert(new row), so the row lands in its
    // new bucket and the old key is gone — the extension kernel used
    // to refuse this shape
    spark.sql("UPDATE gbkt.lake.b5 SET k = k + 100 WHERE v = 'a'")
    assert(rows("b5") == Map(101L -> ("a", 11.0), 3L -> ("c", 30.0)),
      "key update must move the row, not duplicate it")
    assert(livePaths(dir).forall(_.contains("b=")))
  }

  test("CALL system.lookup serves S18 point lookups by name") {
    freshBucketed("b6")
    spark.sql("INSERT INTO gbkt.lake.b6 " +
      "VALUES (1,'a',10.0),(2,'b',20.0),(3,'c',30.0),(4,'d',40.0)")
    val got = spark.sql(
      "CALL gbkt.system.lookup(table => 'lake.b6', keys => '2, 4, 77')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "b"), (4L, "d")))
  }

  test("V1 alias and V2 path writers route through the kernel too") {
    val dir = freshBucketed("b7")
    val s = spark; import s.implicits._
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "v", "amt")
      .write.format("graft-manifest").mode("append").save(dir)
    Seq((2L, "B2", 22.0), (3L, "c", 3.0)).toDF("k", "v", "amt")
      .write.format("graft").mode("append").save(dir)
    assert(rows("b7") == Map(1L -> ("a", 1.0), 2L -> ("B2", 22.0),
      3L -> ("c", 3.0)))
    assert(livePaths(dir).forall(_.contains("b=")))
    // a raw engine append cannot silently degrade the layout
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(Seq((9L, "x", 9.0)).toDF("k", "v", "amt"), dir)
    }
    assert(e.getMessage.contains("bucketed merge table"), e.getMessage)
  }

  test("declared CHECK constraints bind bucketed writes and DML") {
    freshBucketed("b8")
    spark.sql("ALTER TABLE gbkt.lake.b8 SET TBLPROPERTIES " +
      "('check.amt_pos'='amt >= 0')")
    spark.sql("INSERT INTO gbkt.lake.b8 VALUES (1,'a',1.0)")
    intercept[Exception] {
      spark.sql("INSERT INTO gbkt.lake.b8 VALUES (2,'bad',-5.0)")
    }
    intercept[Exception] {
      spark.sql("UPDATE gbkt.lake.b8 SET amt = -1.0 WHERE k = 1")
    }
    assert(rows("b8") == Map(1L -> ("a", 1.0)))
    // a NON-null-propagating check must not judge delete records'
    // null-filled data columns: DELETE and legal UPDATE still work
    spark.sql("ALTER TABLE gbkt.lake.b8 SET TBLPROPERTIES " +
      "('check.v_nn'='v IS NOT NULL')")
    spark.sql("INSERT INTO gbkt.lake.b8 VALUES (2,'b',2.0)")
    spark.sql("UPDATE gbkt.lake.b8 SET amt = 3.0 WHERE k = 1")
    spark.sql("DELETE FROM gbkt.lake.b8 WHERE k = 2")
    assert(rows("b8") == Map(1L -> ("a", 3.0)))
  }

  test("MERGE NOT MATCHED cannot INSERT a standing key (compound ON); update-moves onto standing keys refuse too") {
    freshBucketed("b8b")
    spark.sql("INSERT INTO gbkt.lake.b8b VALUES (1,'a',1.0),(2,'b',2.0)")
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    // a MIXED merge routes through the delta changeset: ON is false
    // for k=1 (amt filter), so the pair is NOT MATCHED and the rewrite
    // emits an insert for a key the target already holds — a keyed
    // table cannot represent that; must fail loudly, table unchanged
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO gbkt.lake.b8b t
           USING (SELECT CAST(1 AS BIGINT) AS k, 'p' AS v,
                         CAST(1.0 AS DOUBLE) AS amt) s
           ON t.k = s.k AND s.amt > 100
           WHEN MATCHED THEN UPDATE SET amt = s.amt
           WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)""")
    }
    assert(msgs(e).contains("duplicate standing key"), msgs(e).take(300))
    assert(rows("b8b") == Map(1L -> ("a", 1.0), 2L -> ("b", 2.0)))
    // an INSERT-ONLY merge is planned by Spark as an APPEND (left-anti
    // join), which on this layout follows the documented
    // INSERT-is-upsert-by-key contract — the standing row is REPLACED,
    // matching what INSERT INTO of the same row would do
    spark.sql(
      """MERGE INTO gbkt.lake.b8b t
         USING (SELECT CAST(1 AS BIGINT) AS k, 'p' AS v,
                       CAST(7.0 AS DOUBLE) AS amt) s
         ON t.k = s.k AND s.amt > 100
         WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)""")
    assert(rows("b8b") == Map(1L -> ("p", 7.0), 2L -> ("b", 2.0)))
    spark.sql("UPDATE gbkt.lake.b8b SET v = 'a', amt = 1.0 WHERE k = 1")
    // an UPDATE that MOVES the bucket key onto a standing key is the
    // same duplicate-key corruption — refused, table unchanged
    val e2 = intercept[Exception] {
      spark.sql("UPDATE gbkt.lake.b8b SET k = 2 WHERE k = 1")
    }
    assert(msgs(e2).contains("duplicate standing key"), msgs(e2).take(300))
    assert(rows("b8b") == Map(1L -> ("a", 1.0), 2L -> ("b", 2.0)))
    // ...while a move onto a FREE key still works
    spark.sql("UPDATE gbkt.lake.b8b SET k = 9 WHERE k = 1")
    assert(rows("b8b") == Map(9L -> ("a", 1.0), 2L -> ("b", 2.0)))
    // TWO NOT-MATCHED inserts for the SAME new key in one changeset
    // (duplicate unmatched source keys in a mixed merge): neither
    // matches a standing row, so Spark's cardinality check and the
    // standing-key clash both pass — without its own guard the
    // one-winner-per-key reduction would silently drop a source row
    val e3 = intercept[Exception] {
      spark.sql(
        """MERGE INTO gbkt.lake.b8b t
           USING (SELECT * FROM VALUES
                    (CAST(5 AS BIGINT),'x',CAST(1.0 AS DOUBLE)),
                    (CAST(5 AS BIGINT),'y',CAST(2.0 AS DOUBLE)) AS s(k,v,amt)) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET amt = s.amt
           WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)""")
    }
    assert(msgs(e3).contains("duplicate"), msgs(e3).take(300))
    assert(rows("b8b") == Map(9L -> ("a", 1.0), 2L -> ("b", 2.0)),
      "failed merge must leave the table unchanged")
  }

  test("time travel and TRUNCATE work on bucketed tables") {
    val dir = freshBucketed("b9")
    spark.sql("INSERT INTO gbkt.lake.b9 VALUES (1,'a',1.0),(2,'b',2.0)")
    val v = ManifestTable.headVersion(spark, dir).get
    spark.sql("INSERT INTO gbkt.lake.b9 VALUES (2,'B2',22.0)")
    assert(spark.sql(s"SELECT * FROM gbkt.lake.b9 VERSION AS OF $v")
      .collect().length == 2)
    assert(spark.table("gbkt.lake.b9").filter("k = 2").head().getString(1) == "B2")
    spark.sql("TRUNCATE TABLE gbkt.lake.b9")
    assert(spark.table("gbkt.lake.b9").count() == 0L)
    // the geometry survives truncation: later inserts still bucket
    spark.sql("INSERT INTO gbkt.lake.b9 VALUES (7,'z',7.0)")
    assert(rows("b9") == Map(7L -> ("z", 7.0)))
    assert(livePaths(dir).forall(_.contains("b=")))
  }

  test("INSERT OVERWRITE is ONE atomic commit: no empty-table window, no pre-swap loss point") {
    val dir = freshBucketed("bow")
    spark.sql("INSERT INTO gbkt.lake.bow VALUES (1,'a',10.0),(2,'b',20.0)")
    val before = ManifestTable.versions(fs, dir).last
    spark.sql("INSERT OVERWRITE gbkt.lake.bow VALUES (7,'x',70.0),(8,'y',80.0),(7,'X',700.0)")
    // exactly ONE commit advanced the head — the old truncate+merge
    // route was two, with a reader-visible empty table between them
    val after = ManifestTable.versions(fs, dir).last
    assert(after == before + 1,
      s"overwrite must be one commit, saw ${after - before}")
    // dedup through the winner reduction: one row per key survives,
    // under the same defaultTies order a plain INSERT uses (amt desc)
    assert(rows("bow") == Map(7L -> ("X", 700.0), 8L -> ("y", 80.0)))
    // layout invariant holds and the overwrite's sole commit carries
    // the full new table — no empty intermediate exists to observe
    // (only CREATE's own empty v1 predates the data)
    assert(livePaths(dir).forall(_.contains("b=")))
    assert(ManifestTable.readVersion(spark, dir, after).count() == 2L)
    // time travel still serves the pre-overwrite table
    assert(ManifestTable.readVersion(spark, dir, before).count() == 2L)
    // V1 alias overwrite routes through the same atomic swap
    val s0 = spark; import s0.implicits._
    val b2 = ManifestTable.versions(fs, dir).last
    Seq((100L, "z", 1.0)).toDF("k", "v", "amt")
      .write.format("graft-manifest").mode("overwrite").save(dir)
    assert(ManifestTable.versions(fs, dir).last == b2 + 1)
    assert(rows("bow") == Map(100L -> ("z", 1.0)))
  }

  test("overwrite publish re-resolves the declared schema against the live head") {
    val dir = freshBucketed("bsd")
    spark.sql("INSERT INTO gbkt.lake.bsd VALUES (1,'a',1.0)")
    // simulate the race window: replacement dirs already written under
    // the pre-ALTER schema, then a concurrent ALTER ADD COLUMN wins
    // the commit race BEFORE the overwrite publishes — drive the
    // publish seam directly with the stale data schema
    val staged = ManifestTable.pathsOf(fs, dir,
      ManifestTable.versions(fs, dir).last)
    spark.sql("ALTER TABLE gbkt.lake.bsd ADD COLUMN note STRING")
    val dataSchema = org.apache.spark.sql.types.StructType
      .fromDDL("k BIGINT, v STRING, amt DOUBLE")
    MergeInto.publishOverwrite(spark, dir, staged, dataSchema)
    // the concurrently-added column SURVIVES the overwrite's commit
    assert(spark.table("gbkt.lake.bsd").schema.fieldNames.contains("note"),
      "concurrent ALTER ADD COLUMN was reverted by the overwrite publish")
    // a concurrent INCOMPATIBLE type change aborts the publish loudly
    val headV = ManifestTable.versions(fs, dir).last
    ManifestTable.commitIf(spark, dir,
      ManifestTable.pathsOf(fs, dir, headV), headV, 10,
      schemaDdl = Some("k BIGINT, v INT, amt DOUBLE"),
      meta = ManifestTable.metaOf(fs, dir, headV))
    intercept[IllegalArgumentException] {
      MergeInto.publishOverwrite(spark, dir, staged, dataSchema)
    }
  }

  test("layout and clusterBy are mutually exclusive; bad layouts rejected at CREATE") {
    wh: Unit
    intercept[Exception] {
      spark.sql("CREATE TABLE gbkt.lake.badmix (k BIGINT, v STRING) " +
        "TBLPROPERTIES ('layout'='bucketed:k', 'clusterBy'='v')")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE gbkt.lake.badkey (k BIGINT) " +
        "TBLPROPERTIES ('layout'='bucketed:nope')")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE gbkt.lake.badform (k BIGINT) " +
        "TBLPROPERTIES ('layout'='zordered:k')")
    }
  }

  test("CALL system.compact re-buckets under the pinned geometry; retention honored") {
    val dir = freshBucketed("b10", n = 4)
    spark.sql("INSERT INTO gbkt.lake.b10 VALUES (1,'a',1.0),(2,'b',2.0)")
    spark.sql("INSERT INTO gbkt.lake.b10 VALUES (3,'c',3.0),(4,'d',4.0)")
    spark.sql("INSERT INTO gbkt.lake.b10 VALUES (5,'e',5.0),(6,'f',6.0)")
    // the declared retainGenerations=10 governs merge commits too —
    // every version is still retained (create + 3 inserts)
    assert(ManifestTable.versions(fs, dir).size == 4,
      "declared retention must survive merge-kernel commits")
    val r = spark.sql("CALL gbkt.system.compact(table => 'lake.b10')").head()
    // compaction folded the accreted per-merge bucket files into one
    // dir per OCCUPIED bucket, still b=-shaped (never rb= range dirs)
    val paths = ManifestTable.livePaths(fs, dir)
    assert(paths.forall(_.contains("b=")), s"layout broken: $paths")
    assert(paths.map(_.split("/", 2).head).distinct.size == 1,
      "one commit dir after compaction")
    assert(rows("b10").keySet == (1L to 6L).toSet)
    spark.sql("INSERT INTO gbkt.lake.b10 VALUES (2,'B!',22.0)")
    assert(rows("b10")(2L) == ("B!", 22.0))
    assert(r.getInt(1) >= 1)
  }

  test("layout is CREATE-time only; clusterBy does not apply to bucketed tables") {
    freshBucketed("b11")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE gbkt.lake.b11 SET TBLPROPERTIES ('clusterBy'='v')")
    }
    assert(msgs(e1).exists(_.contains("hash buckets")), msgs(e1))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gbkt.lake.b11 SET TBLPROPERTIES ('layout'='bucketed:v')")
    }
    assert(msgs(e2).exists(_.contains("CREATE")), msgs(e2))
    // direct-API compactAppend refuses the layout-breaking rewrite
    val e3 = intercept[IllegalArgumentException] {
      ManifestTable.compactAppend(spark, s"$wh/lake/b11", Seq("k"))
    }
    assert(e3.getMessage.contains("MergeInto.compact"), e3.getMessage)
  }

  test("a losing bucketed CREATE never marks the winner's dir (r20 advice)") {
    wh: Unit
    // a bucketed CREATE racing a PLAIN create of the same table: the
    // loser used to pin KeyMarker/BucketsMarker BEFORE losing the
    // version-1 commit, silently flipping the plain winner to
    // merge-kernel routing. Geometry now pins only after the commit
    // wins, so whichever side wins, the dir's routing matches ITS spec.
    spark.sql("DROP TABLE IF EXISTS gbkt.lake.crace")
    val dir = s"$wh/lake/crace"
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val won = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val mk: Map[String, String] = Map(
      "plain" -> "CREATE TABLE gbkt.lake.crace (k BIGINT, v STRING)",
      "bucketed" -> ("CREATE TABLE gbkt.lake.crace (k BIGINT, v STRING) " +
        "TBLPROPERTIES ('layout'='bucketed:k:4')"))
    val threads = mk.toSeq.map { case (kind, sql) =>
      new Thread(() =>
        try { spark.sql(sql); won.add(kind): Unit }
        catch { case e: Throwable => errors.add(e): Unit })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(won.size() == 1 && errors.size() == 1,
      s"one CREATE wins, one refuses: won=$won errors=${errors.size()}")
    val geom = MergeInto.bucketedGeometry(spark, dir)
    won.peek() match {
      case "plain" =>
        assert(geom.isEmpty,
          s"the plain winner's dir must carry NO geometry markers: $geom")
        spark.sql("INSERT INTO gbkt.lake.crace VALUES (1,'a'),(1,'b')")
        // plain semantics: an append, never an upsert-by-key
        assert(spark.table("gbkt.lake.crace").count() == 2L,
          "the plain winner must keep append semantics")
        assert(!ManifestTable.livePaths(fs, dir).exists(_.contains("b=")))
      case _ =>
        assert(geom.contains(("k", 4)),
          s"the bucketed winner keeps its declared geometry: $geom")
        spark.sql("INSERT INTO gbkt.lake.crace VALUES (1,'a'),(1,'b')")
        assert(spark.table("gbkt.lake.crace").count() == 1L,
          "the bucketed winner must keep upsert semantics")
    }
  }

  test("loadTable re-pins geometry lost to a crash between commit and pin (r20)") {
    val dir = freshBucketed("bheal", n = 4)
    spark.sql("INSERT INTO gbkt.lake.bheal VALUES (1,'a',1.0),(2,'b',2.0)")
    // simulate a creator that died inside the commit→pin window: the
    // layout prop is committed, the routing markers are gone — and the
    // healer is a FRESH JVM (the crashed creator's memo died with it)
    fs.delete(new Path(dir, "_merge_key"), false)
    fs.delete(new Path(dir, "_n_buckets"), false)
    graft.sources.GraftCatalog.geometryVerified.remove(dir): Unit
    assert(MergeInto.bucketedGeometry(spark, dir).isEmpty)
    // any catalog load self-heals from the immutable layout prop...
    assert(spark.table("gbkt.lake.bheal").count() == 2L)
    assert(MergeInto.bucketedGeometry(spark, dir).contains(("k", 4)),
      "loadTable must re-pin the declared geometry")
    // ...and writes keep upsert-by-key semantics, never a silent append
    spark.sql("INSERT INTO gbkt.lake.bheal VALUES (2,'B!',22.0)")
    assert(rows("bheal") == Map(1L -> ("a", 1.0), 2L -> ("B!", 22.0)))
  }

  test("s31 board query matches the recomputed oracle on sf0.001") {
    val r = graft.sources.Sources.s31_bucketed_catalog(spark, sf).head()
    assert(r.getLong(0) > 0)
    assert(graft.sources.Sources.s31_bucketed_catalog(spark, sf).head() == r)
  }
}
