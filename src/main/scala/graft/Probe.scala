package graft

import org.apache.spark.sql.SparkSession

/** Measurement-only diagnostic (guide §1): time named board queries —
  * or micro-probes — inside ONE session mirroring Bench's config, with
  * N reps each, so per-query cost can be decomposed (session floor,
  * parquet re-read cost, plan+codegen, execution). Never part of the
  * driver contract; exists so optimization rounds measure before
  * touching anything.
  *
  * usage: runMain graft.Probe <sfDir> <reps> [query ...]
  *   with no query names, runs the built-in micro-probes.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // A/B hooks (measurement only): strip pieces of the Bench session
    // config to attribute the per-action floor.
    val bare = sys.env.get("SPARK_GRAFT_PROBE_BARE").contains("1")
    val noAqe = sys.env.get("SPARK_GRAFT_PROBE_NOAQE").contains("1")
    val shufP = sys.env.getOrElse("SPARK_GRAFT_PROBE_SHUFP", cpus)
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufP)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (!bare) b = b
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
    if (noAqe) b = b.config("spark.sql.adaptive.enabled", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label%-40s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    // warmup mirrors Bench
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    spark.range(100000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").count().count()

    if (names.nonEmpty) {
      names.foreach { n =>
        val fn = SparkEntry.queries(n)
        time(n) { fn(spark, sfDir).count(): Unit }
      }
    } else {
      time("floor: range.count") { spark.range(10).count(): Unit }
      time("floor: shuffle 100k") {
        spark.range(100000).selectExpr("id % 7 AS k")
          .groupBy("k").count().count(): Unit
      }
      time("read lineitem fresh + count") {
        Tables.lineitem(spark, sfDir).count(): Unit
      }
      val li = Tables.lineitem(spark, sfDir)
      time("count reused lineitem df") { li.count(): Unit }
      time("read part fresh + count") {
        Tables.part(spark, sfDir).count(): Unit
      }
    }
    spark.stop()
  }
}
