package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S30 — CHECK constraints enforced in the write job (SQL semantics:
  * NULL passes, FALSE violates; batch fails before any commit), plus
  * the `timestampAsOf` path-read option. */
class GraftConstraintSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-chk").toString
    spark.conf.set("spark.sql.catalog.gchk", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gchk.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gchk.lake")
    dir
  }
  private def fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())

  test("CHECK constraint: valid rows pass, a violating batch fails uncommitted") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gchk.lake.c1")
    spark.sql("CREATE TABLE gchk.lake.c1 (k INT, v STRING) " +
      "TBLPROPERTIES ('check.pos'='k > 0', 'retainGenerations'='10')")
    spark.sql("INSERT INTO gchk.lake.c1 VALUES (1,'a'),(2,'b')")
    assert(spark.table("gchk.lake.c1").count() == 2L)
    val head = ManifestTable.headVersion(spark, s"$wh/lake/c1").get
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gchk.lake.c1 VALUES (3,'c'),(-1,'bad')")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // S52 made the declared checks visible through constraints(), so
    // SPARK's own write validation may fire before the engine's — both
    // name the constraint and surface the violating value
    assert(msgs(e).exists(m => m.contains("pos") &&
      (m.contains("bad") || m.contains("-1"))),
      s"violation must name the constraint and the row: ${msgs(e)}")
    // the failed batch committed NOTHING — not even its valid rows
    assert(spark.table("gchk.lake.c1").count() == 2L)
    assert(ManifestTable.headVersion(spark, s"$wh/lake/c1").contains(head))
  }

  test("CHECK constraint: NULL evaluations pass (SQL semantics)") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gchk.lake.c2")
    spark.sql("CREATE TABLE gchk.lake.c2 (k INT, v STRING) " +
      "TBLPROPERTIES ('check.pos'='k > 0')")
    spark.sql("INSERT INTO gchk.lake.c2 VALUES (NULL,'nullk'),(5,'ok')")
    assert(spark.table("gchk.lake.c2").count() == 2L)
  }

  test("ALTER-added constraints validate existing data, then govern writes") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gchk.lake.c3")
    spark.sql("CREATE TABLE gchk.lake.c3 (k INT)")
    spark.sql("INSERT INTO gchk.lake.c3 VALUES (-5)") // no constraint yet
    // the ADD CONSTRAINT contract: violating existing data refuses the
    // ALTER itself (one validation scan buys the
    // live-rows-always-conform invariant every rewrite relies on)
    intercept[Exception] {
      spark.sql("ALTER TABLE gchk.lake.c3 SET TBLPROPERTIES ('check.pos'='k > 0')")
    }
    spark.sql("DELETE FROM gchk.lake.c3 WHERE k < 0")
    spark.sql("ALTER TABLE gchk.lake.c3 SET TBLPROPERTIES ('check.pos'='k > 0')")
    intercept[Exception] {
      spark.sql("INSERT INTO gchk.lake.c3 VALUES (-6)")
    }
    spark.sql("ALTER TABLE gchk.lake.c3 UNSET TBLPROPERTIES ('check.pos')")
    spark.sql("INSERT INTO gchk.lake.c3 VALUES (-7)") // dropped → passes
    assert(spark.table("gchk.lake.c3").count() == 1L)
  }

  test("UPDATE and MERGE cannot write values a declared constraint forbids") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gchk.lake.c5")
    spark.sql("CREATE TABLE gchk.lake.c5 (k INT, amt DOUBLE) " +
      "TBLPROPERTIES ('check.amt_pos'='amt >= 0')")
    spark.sql("INSERT INTO gchk.lake.c5 VALUES (1, 5.0), (2, 6.0)")
    intercept[Exception] {
      spark.sql("UPDATE gchk.lake.c5 SET amt = -1.0 WHERE k = 1")
    }
    intercept[Exception] {
      spark.sql(
        """MERGE INTO gchk.lake.c5 AS t
           USING (SELECT * FROM VALUES (9, -3.0) AS s(k, amt)) AS s
           ON t.k = s.k
           WHEN NOT MATCHED THEN INSERT (k, amt) VALUES (s.k, s.amt)""")
    }
    // nothing landed, nothing was lost
    assert(spark.table("gchk.lake.c5").orderBy("k").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      Seq((1, 5.0), (2, 6.0)))
    // conforming DML still flows
    spark.sql("UPDATE gchk.lake.c5 SET amt = amt + 1.0 WHERE k = 1")
    assert(spark.table("gchk.lake.c5").filter("k = 1").head().getDouble(1) == 6.0)
  }

  test("a streaming appendSink batch is bound by declared contracts too") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gchk.lake.c6")
    spark.sql("CREATE TABLE gchk.lake.c6 (k INT) " +
      "TBLPROPERTIES ('check.pos'='k > 0')")
    val dir = s"$wh/lake/c6"
    val s = spark; import s.implicits._
    // direct micro-batch call (the foreachBatch body): violating batch
    // must fail with no commit
    intercept[Exception] {
      graft.streaming.Streams.appendBatch(
        Seq(-9).toDF("k"), dir, Seq.empty, "app", 0L)
    }
    assert(spark.table("gchk.lake.c6").count() == 0L)
    graft.streaming.Streams.appendBatch(
      Seq(9).toDF("k"), dir, Seq.empty, "app", 1L)
    assert(spark.table("gchk.lake.c6").count() == 1L)
  }

  test("a catalog-declared constraint binds PATH writers on every API") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gchk.lake.c4")
    spark.sql("CREATE TABLE gchk.lake.c4 (k INT) " +
      "TBLPROPERTIES ('check.pos'='k > 0')")
    val dir = s"$wh/lake/c4"
    val s = spark; import s.implicits._
    // the V2 path writer
    intercept[Exception] {
      Seq(-1).toDF("k").write.format("graft")
        .mode("append").save(dir)
    }
    // the V1 alias writer
    intercept[Exception] {
      Seq(-2).toDF("k").write.format("graft-manifest")
        .mode("append").save(dir)
    }
    // the direct SQL-INSERT-on-path via V1 CREATE TABLE USING
    assert(spark.table("gchk.lake.c4").count() == 0L,
      "no bypassing write may have landed")
    Seq(3).toDF("k").write.format("graft-manifest").mode("append").save(dir)
    assert(spark.table("gchk.lake.c4").count() == 1L)
  }

  private def msgChain(t: Throwable): Seq[String] =
    if (t == null) Seq.empty
    else Option(t.getMessage).toSeq ++ msgChain(t.getCause)

  test("ALTER SET check racing a violating append revalidates against the new head") {
    // Deterministic interleave (the ManifestStore seam): the ALTER's
    // validation scan passes at the old head; a violating append then
    // commits BEFORE the ALTER's pointer publish. The publish loses
    // (commitIf is an atomic put of head+1), the retry REVALIDATES
    // against the new head, sees the violation, and fails loudly — the
    // constraint never stands over unvalidated rows (r11 TOCTOU).
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gchk.lake.c7")
    spark.sql("CREATE TABLE gchk.lake.c7 (k INT) " +
      "TBLPROPERTIES ('retainGenerations'='10')")
    spark.sql("INSERT INTO gchk.lake.c7 VALUES (1), (2)")
    val dir = s"$wh/lake/c7"
    val s = spark; import s.implicits._
    @volatile var fired = false
    val store: graft.sources.ManifestStore = new graft.sources.ManifestStore {
      def putIfAbsent(hfs: org.apache.hadoop.fs.FileSystem,
                      target: Path, body: Array[Byte]): Boolean = {
        if (!fired && target.getName.startsWith("m-")) {
          fired = true
          ManifestTable.append(Seq(-7).toDF("k"), dir,
            retainGenerations = 10): Unit
        }
        graft.sources.PosixLinkStore.putIfAbsent(hfs, target, body)
      }
    }
    graft.sources.ManifestTable.storeOverride = Some(store)
    val e =
      try intercept[Exception] {
        spark.sql(
          "ALTER TABLE gchk.lake.c7 SET TBLPROPERTIES ('check.pos'='k > 0')")
      } finally graft.sources.ManifestTable.storeOverride = None
    assert(fired, "interleave never fired")
    assert(msgChain(e).exists(_.contains("check.pos")),
      s"failure must name the constraint: ${msgChain(e)}")
    // the constraint is NOT standing, and the racing append survived
    val head = ManifestTable.headVersion(spark, dir).get
    assert(!ManifestTable.metaOf(fs, dir, head).keySet
      .exists(_.contains("check.pos")))
    assert(spark.table("gchk.lake.c7").count() == 3L)
  }

  test("a violating append whose job predates ALTER SET check is refused at publish") {
    // The other direction of the same race: the append's write job was
    // built (and its rows validated) BEFORE the constraint existed; the
    // ALTER commits first. The append's publish loop sees check.* keys
    // it never bound, refuses to publish, and cleans up its dir — the
    // Delta MetadataChangedException shape, so a constraint whose
    // ADD-time scan could not see these rows never silently admits them.
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gchk.lake.c8")
    spark.sql("CREATE TABLE gchk.lake.c8 (k INT) " +
      "TBLPROPERTIES ('retainGenerations'='10')")
    spark.sql("INSERT INTO gchk.lake.c8 VALUES (1)")
    val dir = s"$wh/lake/c8"
    val s = spark; import s.implicits._
    @volatile var fired = false
    val store: graft.sources.ManifestStore = new graft.sources.ManifestStore {
      def putIfAbsent(hfs: org.apache.hadoop.fs.FileSystem,
                      target: Path, body: Array[Byte]): Boolean = {
        if (!fired && target.getName.startsWith("m-")) {
          fired = true
          spark.sql(
            "ALTER TABLE gchk.lake.c8 SET TBLPROPERTIES ('check.pos'='k > 0')")
        }
        graft.sources.PosixLinkStore.putIfAbsent(hfs, target, body)
      }
    }
    graft.sources.ManifestTable.storeOverride = Some(store)
    val e =
      try intercept[IllegalStateException] {
        ManifestTable.append(Seq(-5).toDF("k"), dir, retainGenerations = 10)
      } finally graft.sources.ManifestTable.storeOverride = None
    assert(fired, "interleave never fired")
    assert(e.getMessage.contains("declared") &&
      e.getMessage.contains("check.pos"), e.getMessage)
    // the constraint stands, the violating rows never landed, and the
    // refused write's dir was cleaned up (no orphan)
    val head = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.metaOf(fs, dir, head).keySet
      .exists(_.contains("check.pos")))
    assert(spark.table("gchk.lake.c8").collect().map(_.getInt(0)).toSeq == Seq(1))
    val live = ManifestTable.pathsOf(fs, dir, head)
      .map(_.split("/", 2).head).toSet
    val onDisk = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
    assert(onDisk == live, s"refused write left orphans: ${onDisk -- live}")
  }

  test("timestampAsOf path-read option resolves by commit instant") {
    val dir = Files.createTempDirectory("graft-tsopt").toString + "/t"
    val s = spark; import s.implicits._
    ManifestTable.append(Seq((1, "a")).toDF("k", "v"), dir,
      retainGenerations = 10)
    Thread.sleep(60)
    ManifestTable.append(Seq((2, "b")).toDF("k", "v"), dir,
      retainGenerations = 10)
    val t1 = ManifestTable.history(spark, dir)
      .filter(col("version") === 1).head().getLong(1)
    assert(spark.read.format("graft")
      .option("timestampAsOf", t1.toString).load(dir).count() == 1L)
    assert(spark.read.format("graft").load(dir).count() == 2L)
    intercept[Exception] { // an instant before the first commit
      spark.read.format("graft")
        .option("timestampAsOf", (t1 - 3600000L).toString).load(dir)
    }
    intercept[Exception] { // mutually exclusive with versionAsOf
      spark.read.format("graft").option("timestampAsOf", t1.toString)
        .option("versionAsOf", "1").load(dir)
    }
    // date-string form parses in the session zone; tomorrow covers all
    val tomorrow = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
      .plusDays(1).toString
    assert(spark.read.format("graft")
      .option("timestampAsOf", tomorrow).load(dir).count() == 2L)
  }

  test("s30 board query matches the recomputed oracle on sf0.001") {
    val r = graft.sources.Sources.s30_constrained_ingest(spark, sf).head()
    assert(r.getLong(0) > 0)
    assert(graft.sources.Sources.s30_constrained_ingest(spark, sf).head() == r)
  }
}
