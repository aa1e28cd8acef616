package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S23 — the `GraftCatalog` TableCatalog plugin: multi-part-identifier
  * SQL (CREATE/INSERT/SELECT/ALTER/DROP/RENAME, time travel, SHOW)
  * against manifest tables, plus path/catalog consistency and the
  * metadata-only schema-evolution contract. */
class GraftCatalogSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat.warehouse", dir)
    dir
  }
  private def fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())

  test("catalog: create namespace + table, insert, select, show") {
    wh: Unit
    spark.sql("CREATE NAMESPACE gcat.lake")
    spark.sql("CREATE TABLE gcat.lake.t (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k')")
    spark.sql("INSERT INTO gcat.lake.t VALUES (1,'a'),(2,'b'),(3,'c')")
    assert(spark.sql("SELECT * FROM gcat.lake.t").count() == 3L)
    assert(spark.sql("SELECT v FROM gcat.lake.t WHERE k = 2")
      .head().getString(0) == "b")
    assert(spark.sql("SHOW TABLES IN gcat.lake").collect()
      .map(_.getString(1)).toSet == Set("t"))
    assert(spark.sql("SHOW NAMESPACES IN gcat").collect()
      .map(_.getString(0)).contains("lake"))
    // TBLPROPERTIES persisted through the #meta prop channel
    val props = spark.sql("SHOW TBLPROPERTIES gcat.lake.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("statsCols").contains("k"))
    // declared statsCols govern the catalog writer: stats present
    val dir = s"$wh/lake/t"
    val head = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.statsOf(fs, dir, head).nonEmpty,
      "statsCols TBLPROPERTY should flow into the insert's stats write")
  }

  test("catalog: path access and catalog access resolve the same table") {
    wh: Unit
    spark.sql("CREATE TABLE IF NOT EXISTS gcat.lake.t (k INT, v STRING)")
    val byPath = spark.read.format("graft").load(s"$wh/lake/t")
    val byName = spark.table("gcat.lake.t")
    assert(byPath.orderBy("k").collect().toSeq ==
      byName.orderBy("k").collect().toSeq)
  }

  test("catalog: CTAS and writeTo append") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gcat.lake.c")
    spark.sql("CREATE TABLE gcat.lake.c AS " +
      "SELECT id AS k, CAST(id*2 AS STRING) AS v FROM range(5)")
    assert(spark.table("gcat.lake.c").count() == 5L)
    spark.range(5, 8).select(col("id").as("k"),
        col("id").cast("string").as("v"))
      .writeTo("gcat.lake.c").append()
    assert(spark.table("gcat.lake.c").count() == 8L)
  }

  test("catalog: VERSION AS OF and TIMESTAMP AS OF time travel") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gcat.lake.tt")
    spark.sql("CREATE TABLE gcat.lake.tt (k INT) " +
      "TBLPROPERTIES ('retainGenerations'='10')")
    spark.sql("INSERT INTO gcat.lake.tt VALUES (1)")   // v2
    Thread.sleep(60)
    spark.sql("INSERT INTO gcat.lake.tt VALUES (2)")   // v3
    Thread.sleep(60)
    spark.sql("INSERT INTO gcat.lake.tt VALUES (3)")   // v4
    assert(spark.table("gcat.lake.tt").count() == 3L)
    assert(spark.sql("SELECT * FROM gcat.lake.tt VERSION AS OF 3").count() == 2L)
    assert(spark.sql("SELECT * FROM gcat.lake.tt VERSION AS OF 2").count() == 1L)
    // TIMESTAMP AS OF v3's commit instant resolves version 3
    val t3 = ManifestTable.history(spark, s"$wh/lake/tt")
      .filter(col("version") === 3).head().getLong(1)
    val lit3 = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(t3))
    assert(spark.sql(
      s"SELECT * FROM gcat.lake.tt TIMESTAMP AS OF '$lit3'").count() == 2L)
    // a GC'd / never-committed version fails loudly
    intercept[Exception] {
      spark.sql("SELECT * FROM gcat.lake.tt VERSION AS OF 99").collect()
    }
    // an instant before the first commit fails loudly
    intercept[Exception] {
      spark.sql("SELECT * FROM gcat.lake.tt TIMESTAMP AS OF '1999-01-01'")
        .collect()
    }
  }

  test("catalog: metadata-only ADD COLUMN null-fills old dirs") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gcat.lake.ev")
    spark.sql("CREATE TABLE gcat.lake.ev (k INT) " +
      "TBLPROPERTIES ('retainGenerations'='10')")
    spark.sql("INSERT INTO gcat.lake.ev VALUES (1),(2)")
    val dir = s"$wh/lake/ev"
    val before = ManifestTable.livePaths(fs, dir)
    spark.sql("ALTER TABLE gcat.lake.ev ADD COLUMN note STRING")
    // no data dir was rewritten — the evolution is one metadata commit
    assert(ManifestTable.livePaths(fs, dir) == before)
    spark.sql("INSERT INTO gcat.lake.ev VALUES (3,'x')")
    val rows = spark.table("gcat.lake.ev").orderBy("k")
      .collect().map(r => (r.getInt(0), Option(r.get(1)))).toSeq
    assert(rows == Seq((1, None), (2, None), (3, Some("x"))))
    // contract edges: non-nullable and positioned adds are refused
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.lake.ev ADD COLUMN m INT NOT NULL")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.lake.ev ADD COLUMN m INT FIRST")
    }
  }

  test("catalog: metadata-only TYPE WIDENING serves old narrow dirs widened; guards hold") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gcat.lake.wd")
    spark.sql("CREATE TABLE gcat.lake.wd (k INT, r FLOAT, v STRING) " +
      "TBLPROPERTIES ('retainGenerations'='10', 'statsCols'='k')")
    spark.sql("INSERT INTO gcat.lake.wd VALUES " +
      "(1, CAST(1.5 AS FLOAT), 'a'), (2, CAST(2.5 AS FLOAT), 'b')")
    val dir = s"$wh/lake/wd"
    val before = ManifestTable.livePaths(fs, dir)
    spark.sql("ALTER TABLE gcat.lake.wd ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE gcat.lake.wd ALTER COLUMN r TYPE DOUBLE")
    // metadata-only: no dir rewritten
    assert(ManifestTable.livePaths(fs, dir) == before)
    // widened appends land; OLD INT32/FLOAT dirs read widened
    spark.sql("INSERT INTO gcat.lake.wd VALUES " +
      "(8589934592, CAST(3.5 AS DOUBLE), 'c')") // > Int.MaxValue
    val got = spark.table("gcat.lake.wd").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 1.5, "a"), (2L, 2.5, "b"),
      (8589934592L, 3.5, "c")), got)
    assert(spark.table("gcat.lake.wd").schema("k").dataType.simpleString
      == "bigint")
    // stats recorded pre-widening still prune (numeric compare)
    val pruned = ManifestTable.rangeScan(spark, dir, "k", "1", "1")
    assert(pruned.count() == 1L)
    // guards: lossy/unsupported widens refuse; bucket keys refuse
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.lake.wd ALTER COLUMN v TYPE INT")
    }
    intercept[Exception] { // bigint -> double is lossy
      spark.sql("ALTER TABLE gcat.lake.wd ALTER COLUMN k TYPE DOUBLE")
    }
    spark.sql("DROP TABLE IF EXISTS gcat.lake.wb")
    spark.sql("CREATE TABLE gcat.lake.wb (k INT, v STRING) " +
      "TBLPROPERTIES ('layout'='bucketed:k:4')")
    spark.sql("INSERT INTO gcat.lake.wb VALUES (1, 'a')")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.lake.wb ALTER COLUMN k TYPE BIGINT")
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e).contains("bucket key"), msgs(e).take(200))
  }

  test("catalog: clusterBy TBLPROPERTY is the declared cluster spec") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gcat.lake.cl")
    // PARTITIONED BY at create maps onto the cluster spec
    spark.sql("CREATE TABLE gcat.lake.cl (k INT, amt DOUBLE) " +
      "PARTITIONED BY (k)")
    val dir = s"$wh/lake/cl"
    def spec = ManifestTable.clusterSpecOf(fs, dir,
      ManifestTable.headVersion(spark, dir).get)
    assert(spec.contains(Seq("k")))
    spark.sql("ALTER TABLE gcat.lake.cl " +
      "SET TBLPROPERTIES ('clusterBy'='amt,k')")
    assert(spec.contains(Seq("amt", "k")))
    // unknown cluster column is refused at ALTER time
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.lake.cl SET TBLPROPERTIES ('clusterBy'='nope')")
    }
    spark.sql("ALTER TABLE gcat.lake.cl UNSET TBLPROPERTIES ('clusterBy')")
    assert(spec.isEmpty)
  }

  test("catalog: CREATE OR REPLACE resets the table (drop + create fallback)") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gcat.lake.ror")
    spark.sql("CREATE TABLE gcat.lake.ror (k INT)")
    spark.sql("INSERT INTO gcat.lake.ror VALUES (1)")
    // Spark's non-staging fallback: dropTable + createTable. The new
    // table starts a FRESH history (unlike Delta's in-history REPLACE)
    // — a documented difference, pinned here
    spark.sql("CREATE OR REPLACE TABLE gcat.lake.ror (k INT, v STRING)")
    assert(spark.table("gcat.lake.ror").schema.fieldNames.toSeq ==
      Seq("k", "v"))
    assert(spark.table("gcat.lake.ror").count() == 0L)
    assert(ManifestTable.headVersion(spark, s"$wh/lake/ror").contains(1L),
      "REPLACE starts a fresh history")
    val s2 = spark; import s2.implicits._
    Seq((9, "z")).toDF("k", "v").writeTo("gcat.lake.ror").createOrReplace()
    assert(spark.table("gcat.lake.ror").count() == 1L)
  }

  test("catalog: rename and drop") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gcat.lake.r1")
    spark.sql("DROP TABLE IF EXISTS gcat.lake.r2")
    spark.sql("CREATE TABLE gcat.lake.r1 (k INT)")
    spark.sql("INSERT INTO gcat.lake.r1 VALUES (7)")
    // the TO name resolves within the source's catalog — Spark hands
    // the catalog a catalog-relative identifier
    spark.sql("ALTER TABLE gcat.lake.r1 RENAME TO lake.r2")
    assert(!spark.catalog.tableExists("gcat.lake.r1"))
    assert(spark.table("gcat.lake.r2").head().getInt(0) == 7)
    spark.sql("DROP TABLE gcat.lake.r2")
    assert(!spark.catalog.tableExists("gcat.lake.r2"))
    // dropping a namespace with tables requires CASCADE
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.tmpns")
    spark.sql("CREATE TABLE gcat.tmpns.x (k INT)")
    intercept[Exception] { spark.sql("DROP NAMESPACE gcat.tmpns") }
    spark.sql("DROP NAMESPACE gcat.tmpns CASCADE")
    assert(!fs.exists(new Path(s"$wh/tmpns")))
  }

  test("catalog: the snapshot cache can never serve a DROP+CREATE stale") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gcat.lake.sc1")
    spark.sql("CREATE TABLE gcat.lake.sc1 (k INT) " +
      "TBLPROPERTIES ('retainGenerations'='10')")
    spark.sql("INSERT INTO gcat.lake.sc1 VALUES (1),(2),(3)")
    val dir = s"$wh/lake/sc1"
    // warm the cross-operation snapshot cache through BOTH read stacks
    assert(spark.table("gcat.lake.sc1").count() == 3L)
    assert(graft.sources.ManifestTable.read(spark, dir).count() == 3L)
    // DROP restarts version numbering at the same path; CREATE + a
    // single insert lands version numbers the cache has entries for —
    // the invalidation hook (plus the file-identity key) must make the
    // recreated table's content the only thing any surface serves
    spark.sql("DROP TABLE gcat.lake.sc1")
    spark.sql("CREATE TABLE gcat.lake.sc1 (k INT, tag STRING) " +
      "TBLPROPERTIES ('retainGenerations'='10')")
    spark.sql("INSERT INTO gcat.lake.sc1 VALUES (9,'new')")
    assert(spark.table("gcat.lake.sc1").columns.toSeq == Seq("k", "tag"))
    assert(spark.table("gcat.lake.sc1").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((9, "new")))
    assert(graft.sources.ManifestTable.read(spark, dir)
      .columns.toSeq == Seq("k", "tag"))
    assert(graft.sources.ManifestTable.read(spark, dir).count() == 1L)
  }

  test("catalog: INSERT OVERWRITE replaces, snapshots stay readable") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gcat.lake.ow")
    spark.sql("CREATE TABLE gcat.lake.ow (k INT) " +
      "TBLPROPERTIES ('retainGenerations'='10')")
    spark.sql("INSERT INTO gcat.lake.ow VALUES (1),(2)")
    spark.sql("INSERT OVERWRITE gcat.lake.ow VALUES (9)")
    assert(spark.table("gcat.lake.ow").collect().map(_.getInt(0)).toSeq == Seq(9))
    // the pre-overwrite version still time-travels
    assert(spark.sql("SELECT * FROM gcat.lake.ow VERSION AS OF 2").count() == 2L)
  }

  test("catalog: streaming read tails a catalog table (X13 by name)") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gcat.lake.st")
    spark.sql("CREATE TABLE gcat.lake.st (k INT)")
    spark.sql("INSERT INTO gcat.lake.st VALUES (1),(2)")
    val q = spark.readStream.table("gcat.lake.st")
      .writeStream.format("memory").queryName("cat_tail")
      .option("checkpointLocation",
        Files.createTempDirectory("cat-tail-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("cat_tail").count() == 2L)
      spark.sql("INSERT INTO gcat.lake.st VALUES (3)")
      q.processAllAvailable()
      assert(spark.table("cat_tail").count() == 3L)
    } finally q.stop()
  }

  test("s23 board query matches the recomputed oracle on sf0.001") {
    val r = graft.sources.Sources.s23_catalog_sql(spark, sf).head()
    val o = Tables.orders(spark, sf)
    val all = o.count()
    val pre97 = o.filter(year(col("o_orderdate")) < 1997).count()
    assert(r.getLong(0) == all)
    assert(r.getLong(3) == pre97 && pre97 > 0 && pre97 < all,
      "the CTAS snapshot must hold exactly the pre-1997 slice")
    // second invocation reuses the cached fixture and agrees
    assert(graft.sources.Sources.s23_catalog_sql(spark, sf).head() == r)
  }

  test("catalog: ALTER racing INSERTs never drops an appended dir") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gcat.lake.race")
    spark.sql("CREATE TABLE gcat.lake.race (k INT) " +
      "TBLPROPERTIES ('retainGenerations'='10')")
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(3)
    val go = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    def task(body: => Unit): Runnable = () => {
      go.await(); try body catch { case t: Throwable => errs.add(t): Unit }
    }
    pool.submit(task {
      for (i <- 1 to 3)
        spark.sql(s"ALTER TABLE gcat.lake.race SET TBLPROPERTIES ('tag'='$i')")
    })
    pool.submit(task {
      for (i <- 0 until 5)
        spark.sql(s"INSERT INTO gcat.lake.race VALUES ($i)")
    })
    pool.submit(task {
      for (i <- 100 until 105)
        spark.sql(s"INSERT INTO gcat.lake.race VALUES ($i)")
    })
    go.countDown(); pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"racer failed: ${errs.peek()}")
    // every inserted row survived the property-change rebases
    assert(spark.table("gcat.lake.race").collect().map(_.getInt(0)).sorted
      .toSeq == ((0 until 5) ++ (100 until 105)))
    val props = spark.sql("SHOW TBLPROPERTIES gcat.lake.race").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("tag").contains("3"), "the last ALTER wins")
  }

  test("catalog: SHOW CREATE TABLE round-trips USING graft + LOCATION") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gcat.lake.sc")
    spark.sql("CREATE TABLE gcat.lake.sc (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='7')")
    val ddl = spark.sql("SHOW CREATE TABLE gcat.lake.sc").head().getString(0)
    assert(ddl.contains("USING graft"), ddl)
    assert(ddl.contains(s"LOCATION '$wh/lake/sc'"), ddl)
    assert(ddl.contains("'statsCols' = 'k'") &&
      ddl.contains("'retainGenerations' = '7'"), ddl)
    // the engine-internal path prop must not leak into TBLPROPERTIES
    assert(!ddl.contains("'path'"), ddl)
  }

  test("catalog: identifier segments cannot escape the warehouse") {
    wh: Unit
    intercept[Exception] { spark.sql("CREATE TABLE gcat.lake.`..` (k INT)") }
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.lake.`a/b` (k INT)")
    }
    // underscore-prefixed names would collide with _manifests
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.lake.`_m` (k INT)")
    }
  }
  test("DDL hardening (r19 review finds): atomic CREATE, view-aware DROP NAMESPACE, validated clusterBy prop, bloomCols re-keys") {
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ddl")
    // racing CREATEs of one table: exactly one wins, one refuses —
    // never a silent clobber of the winner's schema
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 2).map { t =>
      new Thread(() =>
        try {
          spark.sql(s"CREATE TABLE gcat.ddl.race (k INT, v$t STRING)")
          wins.incrementAndGet(): Unit
        } catch { case e: Throwable => errors.add(e): Unit })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(wins.get() == 1 && errors.size() == 1,
      s"one CREATE wins, one refuses: wins=${wins.get()} errors=" +
        errors.size())
    assert(spark.table("gcat.ddl.race").schema.fieldNames.length == 2)
    // a bogus clusterBy TBLPROPERTY refuses at CREATE, not first write
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.ddl.bad (a INT) " +
        "TBLPROPERTIES ('clusterBy'='nope')")
    }
    assert(e1.getMessage.contains("cluster column 'nope'"), e1.getMessage)
    // DROP NAMESPACE without CASCADE refuses when only VIEWS remain
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.vns")
    spark.sql("CREATE VIEW gcat.vns.v AS SELECT 1 AS one")
    val e2 = intercept[Exception] {
      spark.sql("DROP NAMESPACE gcat.vns")
    }
    assert(e2.getMessage.toUpperCase.contains("SCHEMA_NOT_EMPTY") ||
      e2.getMessage.toUpperCase.contains("CASCADE"), e2.getMessage)
    assert(spark.sql("SELECT * FROM gcat.vns.v").head().getInt(0) == 1,
      "the view must have survived the refused drop")
    spark.sql("DROP NAMESPACE gcat.vns CASCADE")
    // RENAME COLUMN re-keys bloomCols; DROP COLUMN scrubs it
    spark.sql("CREATE TABLE gcat.ddl.bl (id STRING, x STRING, k INT) " +
      "TBLPROPERTIES ('bloomCols'='id,x', 'statsCols'='k')")
    spark.sql("ALTER TABLE gcat.ddl.bl RENAME COLUMN id TO order_id")
    def prop(t: String, k: String): Option[String] =
      spark.sql(s"SHOW TBLPROPERTIES gcat.ddl.$t").collect()
        .collectFirst { case r if r.getString(0) == k => r.getString(1) }
    assert(prop("bl", "bloomCols").contains("order_id,x"),
      s"bloomCols must follow the rename: ${prop("bl", "bloomCols")}")
    spark.sql("ALTER TABLE gcat.ddl.bl DROP COLUMN x")
    assert(prop("bl", "bloomCols").contains("order_id"),
      s"bloomCols must scrub the dropped column: ${prop("bl", "bloomCols")}")
    // and the sidecar actually builds under the NEW name
    spark.sql("INSERT INTO gcat.ddl.bl VALUES ('a1', 7)")
    val dir = s"$wh/ddl/bl"
    val head = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.bloomsOf(fs, dir, head).nonEmpty,
      "a write after the rename must still build the sidecar")
  }

  test("CALL system.analyze handles empty tables and skips non-statable default columns (r19 review finds)") {
    wh: Unit
    spark.conf.set("spark.sql.catalog.gcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.an")
    spark.sql("CREATE TABLE gcat.an.empty (a INT, b STRING)")
    val out = spark.sql("CALL gcat.system.analyze(table => 'an.empty')")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 0L, 0L), ("b", 0L, 0L)),
      s"an EMPTY committed table analyzes to zeros: ${out.toSeq}")
    // a MAP column no longer crashes the all-columns default — it is
    // skipped like Spark's own FOR ALL COLUMNS
    spark.sql("CREATE TABLE gcat.an.m (a INT, mm MAP<STRING,STRING>)")
    spark.sql("INSERT INTO gcat.an.m SELECT * FROM VALUES " +
      "(1, map('x','y')), (2, NULL), (NULL, NULL) AS t(a, mm)")
    val out2 = spark.sql("CALL gcat.system.analyze(table => 'an.m')")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out2.toSeq == Seq(("a", 2L)),
      s"the default set skips the MAP column: ${out2.toSeq}")
    // explicitly requesting it is the user's call — it runs (Spark 4
    // can distinct-aggregate maps) and reports honestly
    val out3 = spark.sql("CALL gcat.system.analyze(table => 'an.m', " +
      "columns => 'mm')").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out3.length == 1 && out3.head._1 == "mm", out3.toSeq)
  }

}
