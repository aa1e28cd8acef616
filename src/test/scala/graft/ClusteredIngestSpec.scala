package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S27 — clustered-on-arrival ingest: an append batch lands as
  * range/Morton-sorted dirs with per-dir stats, so selective reads
  * prune fresh data before any compaction. */
class ClusteredIngestSpec extends SparkTestBase {

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  test("appendClustered lands range-sorted dirs; a point scan opens one") {
    val dir = Files.createTempDirectory("graft-clu").toString + "/t"
    val s = spark; import s.implicits._
    val df = (1 to 400).map(i => (i, s"v$i")).toDF("k", "v")
    ManifestTable.appendClustered(df, dir, statsCols = Seq("k"), k = 4,
      retainGenerations = 10)
    val f = fs(dir)
    val head = ManifestTable.headVersion(spark, dir).get
    val paths = ManifestTable.pathsOf(f, dir, head)
    assert(paths.size == 4 && paths.forall(_.startsWith("ci-")))
    // per-dir ranges are disjoint: a point-k lookup opens exactly 1
    val schema = ManifestTable.declaredSchemaOf(spark, dir, head).get
    val kept = ManifestTable.prunePaths(f, dir, head,
      Map("k" -> ("7", "7")), schema)
    assert(kept.size == 1, s"expected 1 dir for a point scan, got $kept")
    // value parity with the input
    assert(ManifestTable.read(spark, dir).count() == 400L)
    assert(ManifestTable.read(spark, dir).agg(sum("k")).head.getLong(0) ==
      (1 to 400).map(_.toLong).sum)
  }

  test("a second clustered batch prunes independently of the first") {
    val dir = Files.createTempDirectory("graft-clu2").toString + "/t"
    val s = spark; import s.implicits._
    ManifestTable.appendClustered((1 to 100).map(i => (i, "a")).toDF("k", "v"),
      dir, statsCols = Seq("k"), k = 4, retainGenerations = 10)
    ManifestTable.appendClustered(
      (1001 to 1100).map(i => (i, "b")).toDF("k", "v"),
      dir, statsCols = Seq("k"), k = 4, retainGenerations = 10)
    val f = fs(dir)
    val head = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.pathsOf(f, dir, head).size == 8)
    val schema = ManifestTable.declaredSchemaOf(spark, dir, head).get
    // a point in batch 2 opens 1 of its 4 dirs; batch 1 fully pruned
    val kept = ManifestTable.prunePaths(f, dir, head,
      Map("k" -> ("1050", "1050")), schema)
    assert(kept.size == 1)
    assert(ManifestTable.read(spark, dir).count() == 200L)
  }

  test("declared multi-column spec Morton-clusters on arrival: both dims prune") {
    val dir = Files.createTempDirectory("graft-clu3").toString + "/t"
    val s = spark; import s.implicits._
    // seed + declare the (a, b) spec, then clustered-ingest a batch
    ManifestTable.append(Seq((0, 0, "seed")).toDF("a", "b", "v"), dir,
      statsCols = Seq("a", "b"), retainGenerations = 10)
    ManifestTable.alterClusterBy(spark, dir, Seq("a", "b"),
      retainGenerations = 10)
    val grid = for (a <- 1 to 20; b <- 1 to 20) yield (a, b, s"$a-$b")
    ManifestTable.appendClustered(grid.toDF("a", "b", "v"), dir,
      statsCols = Seq("a", "b"), k = 4, retainGenerations = 10)
    val f = fs(dir)
    val head = ManifestTable.headVersion(spark, dir).get
    val schema = ManifestTable.declaredSchemaOf(spark, dir, head).get
    val dirs = ManifestTable.pathsOf(f, dir, head).filter(_.startsWith("ci-"))
    assert(dirs.size == 4)
    // each dimension ALONE prunes at least one of the 4 z-dirs
    def keptFor(col: String, v: String) = ManifestTable.prunePaths(
      f, dir, head, Map(col -> (v, v)), schema).count(_.startsWith("ci-"))
    assert(keptFor("a", "2") < 4, "a-dim should prune z-clustered dirs")
    assert(keptFor("b", "2") < 4, "b-dim should prune z-clustered dirs")
  }

  test("batch (TIMESTAMP, STRING) spec Morton-clusters: both dims prune") {
    val dir = Files.createTempDirectory("graft-clu-ts").toString + "/t"
    val s = spark; import s.implicits._
    ManifestTable.append(Seq(
      (java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "h01", "seed"))
      .toDF("ts", "host", "v"), dir,
      statsCols = Seq("ts", "host"), retainGenerations = 10)
    ManifestTable.alterClusterBy(spark, dir, Seq("ts", "host"),
      retainGenerations = 10)
    def tsOf(i: Int) = f"2026-01-01 $i%02d:00:00"
    val grid = for (i <- 0 until 20; j <- 1 to 20)
      yield (java.sql.Timestamp.valueOf(tsOf(i)), f"h$j%02d", s"$i-$j")
    ManifestTable.appendClustered(grid.toDF("ts", "host", "v"), dir,
      statsCols = Seq("ts", "host"), k = 4, retainGenerations = 10)
    val f = fs(dir)
    val head = ManifestTable.headVersion(spark, dir).get
    val schema = ManifestTable.declaredSchemaOf(spark, dir, head).get
    val dirs = ManifestTable.pathsOf(f, dir, head).filter(_.startsWith("ci-"))
    assert(dirs.size == 4)
    def keptFor(col: String, v: String) = ManifestTable.prunePaths(
      f, dir, head, Map(col -> (v, v)), schema).count(_.startsWith("ci-"))
    assert(keptFor("ts", tsOf(2)) < 4,
      "timestamp dim should prune z-clustered dirs")
    assert(keptFor("host", "h02") < 4,
      "string dim should prune z-clustered dirs")
    // z-values collapse to range sort when one dim is constant; the
    // point is correctness of the string/timestamp ordinals end-to-end
    assert(ManifestTable.read(spark, dir)
      .where(col("host") === "h13" && col("ts") ===
        java.sql.Timestamp.valueOf(tsOf(7))).head.getString(2) == "7-13")
  }

  test("string Morton dims survive wide UTF-8 spans (no ANSI overflow)") {
    val dir = Files.createTempDirectory("graft-clu-wide").toString + "/t"
    val s = spark; import s.implicits._
    // 'a' (0x61...) vs CJK (0xe4... first UTF-8 byte) prefix ordinals
    // span ~3.7e16 > Long.MaxValue/255 — the naive `delta * 255`
    // scaling overflows (ANSI: the whole write job dies); the
    // bucket-divide form must carry it
    ManifestTable.append(Seq((0, "a", "lo"), (99, "中文", "hi"))
      .toDF("k", "s", "v"), dir,
      statsCols = Seq("k", "s"), retainGenerations = 10)
    ManifestTable.alterClusterBy(spark, dir, Seq("k", "s"),
      retainGenerations = 10)
    val rows = (0 until 40).map(i =>
      (i, if (i % 2 == 0) s"a$i" else s"中$i", s"v$i"))
    ManifestTable.appendClustered(rows.toDF("k", "s", "v"), dir,
      statsCols = Seq("k", "s"), k = 4, retainGenerations = 10)
    val got = ManifestTable.read(spark, dir)
      .where(col("k") === 7).select("v").collect().map(_.getString(0)).toSeq
    assert(got == Seq("v7"))
    assert(ManifestTable.read(spark, dir).count() == 42L)
  }

  test("catalog table with clusterBy TBLPROPERTY clusters every INSERT") {
    val wh = Files.createTempDirectory("graft-clu-cat").toString
    spark.conf.set("spark.sql.catalog.gclu", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gclu.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gclu.lake")
    spark.sql("CREATE TABLE gclu.lake.t (k INT, v STRING) " +
      "TBLPROPERTIES ('clusterBy'='k', 'statsCols'='k', " +
      "'retainGenerations'='10')")
    spark.sql("INSERT INTO gclu.lake.t SELECT id AS k, CAST(id AS STRING) " +
      "FROM range(1, 201)")
    val dir = s"$wh/lake/t"
    val f = fs(dir)
    val head = ManifestTable.headVersion(spark, dir).get
    val paths = ManifestTable.pathsOf(f, dir, head)
    assert(paths.nonEmpty && paths.forall(_.startsWith("ci-")),
      s"INSERT into a clusterBy table must land clustered dirs, got $paths")
    assert(paths.size > 1, "the batch should split into multiple range dirs")
    // SQL point read through the catalog prunes to one dir: proven by
    // row parity here, plan-level pruning proven in GraftV2Spec
    assert(spark.sql("SELECT v FROM gclu.lake.t WHERE k = 42")
      .head().getString(0) == "42")
    assert(spark.table("gclu.lake.t").count() == 200L)
  }

  test("INSERT OVERWRITE on a clustered table keeps the clustered layout (r19 review find)") {
    val wh = Files.createTempDirectory("graft-clu-ow").toString
    spark.conf.set("spark.sql.catalog.gclo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gclo.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gclo.lake")
    spark.sql("CREATE TABLE gclo.lake.t (k INT, v STRING) " +
      "TBLPROPERTIES ('clusterBy'='k', 'statsCols'='k', " +
      "'retainGenerations'='10')")
    spark.sql("INSERT INTO gclo.lake.t SELECT id AS k, 'old' " +
      "FROM range(1, 101)")
    spark.sql("INSERT OVERWRITE gclo.lake.t SELECT id AS k, 'new' " +
      "FROM range(1, 401)")
    val dir = s"$wh/lake/t"
    val f = fs(dir)
    val head = ManifestTable.headVersion(spark, dir).get
    val paths = ManifestTable.pathsOf(f, dir, head)
    assert(paths.forall(_.startsWith("ci-")) && paths.size > 1,
      s"an overwrite of a clustered table must land ≤k RANGE dirs, " +
        s"not one unclustered blob: $paths")
    // the replacement fully replaced: only 'new' rows, exact count
    val vs = spark.table("gclo.lake.t").select("v").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(vs == Seq("new"), s"overwrite must replace everything: $vs")
    assert(spark.table("gclo.lake.t").count() == 400L)
    // per-dir ranges prune: a point scan opens one dir
    val schema = ManifestTable.declaredSchemaOf(spark, dir, head).get
    val kept = ManifestTable.prunePaths(f, dir, head,
      Map("k" -> ("7", "7")), schema)
    assert(kept.size == 1,
      s"overwritten clustered dirs must prune to one for a point: $kept")
  }

  test("overwrite with a clusterBy OPTION lands clustered, not just declared (r20 review find)") {
    val dir = Files.createTempDirectory("graft-clu-opt").toString + "/t"
    val s = spark; import s.implicits._
    // seed an UNCLUSTERED table, then overwrite with the option: the
    // option must govern THIS overwrite's layout — the old route read
    // only the (absent) declared spec, landed one unclustered dir,
    // and then declared the spec that very write did not apply
    Seq((0, "seed")).toDF("k", "v").write.format("graft")
      .option("statsCols", "k").mode("append").save(dir)
    (1 to 400).map(i => (i, s"v$i")).toDF("k", "v")
      .write.format("graft").option("clusterBy", "k")
      .option("statsCols", "k").mode("overwrite").save(dir)
    val f = fs(dir)
    val head = ManifestTable.headVersion(spark, dir).get
    val paths = ManifestTable.pathsOf(f, dir, head)
    assert(paths.size > 1 && paths.forall(_.startsWith("ci-")),
      s"the overwrite itself must land range dirs: $paths")
    assert(ManifestTable.clusterSpecOf(f, dir, head).contains(Seq("k")),
      "…and the spec it applied is the one it declares")
    val schema = ManifestTable.declaredSchemaOf(spark, dir, head).get
    assert(ManifestTable.prunePaths(f, dir, head,
      Map("k" -> ("7", "7")), schema).size == 1,
      "point scans prune the freshly-overwritten layout")
    assert(ManifestTable.read(spark, dir).count() == 400L)
  }

  test("a V1-alias append honors the declared cluster spec too") {
    val dir = Files.createTempDirectory("graft-clu-v1").toString + "/t"
    val s = spark; import s.implicits._
    ManifestTable.append(Seq((0, "seed")).toDF("k", "v"), dir,
      statsCols = Seq("k"), retainGenerations = 10)
    ManifestTable.alterClusterBy(spark, dir, Seq("k"), retainGenerations = 10)
    (1 to 200).map(i => (i, s"v$i")).toDF("k", "v")
      .write.format("graft-manifest").option("statsCols", "k")
      .option("retainGenerations", "10").mode("append").save(dir)
    val f = fs(dir)
    val head = ManifestTable.headVersion(spark, dir).get
    val fresh = ManifestTable.pathsOf(f, dir, head).filter(_.startsWith("ci-"))
    assert(fresh.size > 1,
      "the V1 writer must not quietly degrade a declared clustered layout")
    assert(ManifestTable.read(spark, dir).count() == 201L)
  }

  test("batch INSERT into a clustered table shuffles ONCE, not twice") {
    // V2Writes prepares batch AppendData for the declared distribution
    // even on the V1 fallback; without the GraftV1Write peel the rows
    // range-shuffled twice — once for the preparation, once inside
    // appendClustered. Measured by total shuffle-write RECORDS across
    // the insert: one pass of N rows plus the (tiny) stats read-back
    // aggregate; the double-shuffle regression reads ~2N.
    val wh = Files.createTempDirectory("graft-clu-one").toString
    spark.conf.set("spark.sql.catalog.gclu1", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gclu1.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gclu1.lake")
    spark.sql("CREATE TABLE gclu1.lake.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('clusterBy'='k', 'statsCols'='k', " +
      "'retainGenerations'='10')")
    val n = 50000L
    val records = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          records.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sql("INSERT INTO gclu1.lake.t " +
        s"SELECT id AS k, CAST(id AS STRING) AS v FROM range(0, $n)")
      // listener events drain asynchronously — wait for quiescence
      var last = -1L
      var spins = 0
      while (records.get() != last && spins < 40) {
        last = records.get(); Thread.sleep(250); spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    val got = records.get()
    assert(got >= n, s"the clustering range shuffle must run: $got")
    assert(got < (n * 1.2).toLong,
      s"batch insert shuffled ~${got.toDouble / n}x the rows — the " +
        "prepared-exchange peel regressed (expected one shuffle pass)")
    // and the layout contract still holds: clustered dirs, point prune
    val dir = s"$wh/lake/t"
    val head = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.pathsOf(fs(dir), dir, head).forall(_.startsWith("ci-")))
    assert(spark.sql("SELECT v FROM gclu1.lake.t WHERE k = 42")
      .head().getString(0) == "42")
    assert(spark.table("gclu1.lake.t").count() == n)
  }

  test("s27 board query matches the recomputed oracle on sf0.001") {
    val r = graft.sources.Sources.s27_clustered_ingest(spark, sf).head()
    assert(r.getLong(0) > 0)
    assert(graft.sources.Sources.s27_clustered_ingest(spark, sf).head() == r)
  }
}
