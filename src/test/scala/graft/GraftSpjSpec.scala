package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S38 — storage-partitioned joins on S31 bucketed tables: both scans
  * report `KeyGroupedPartitioning(bucket(n, key))` resolved through
  * the catalog's V2 `bucket` function, and a co-bucketed equi-join
  * plans with ZERO shuffle on either side. */
class GraftSpjSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-spj").toString
    spark.conf.set("spark.sql.catalog.gspj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gspj.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gspj.lake")
    dir
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def makeBucketed(name: String, rows: Seq[(Long, String)]): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS gspj.lake.$name")
    spark.sql(s"CREATE TABLE gspj.lake.$name (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('layout'='bucketed:k:4', 'retainGenerations'='10')")
    val s = spark; import s.implicits._
    rows.toDF("k", "v").writeTo(s"gspj.lake.$name").append()
  }

  test("co-bucketed equi-join plans with zero shuffle and joins correctly") {
    wh: Unit
    makeBucketed("a", (1L to 40L).map(i => i -> s"a$i"))
    makeBucketed("b", (11L to 50L).map(i => i -> s"b$i"))
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = spark.table("gspj.lake.a").join(
        spark.table("gspj.lake.b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must be storage-partitioned (no shuffle):\n$plan")
      val got = j.select(col("k"), col("a.v"), col("b.v")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
      assert(got == (11L to 40L).map(i => (i, s"a$i", s"b$i")), got.take(5))
    }
  }

  test("mismatched bucket counts shuffle instead of mis-joining") {
    wh: Unit
    makeBucketed("c", (1L to 10L).map(i => i -> s"c$i"))
    spark.sql("DROP TABLE IF EXISTS gspj.lake.d")
    spark.sql("CREATE TABLE gspj.lake.d (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('layout'='bucketed:k:8', 'retainGenerations'='10')")
    val s = spark; import s.implicits._
    (5L to 15L).map(i => i -> s"d$i").toDF("k", "v")
      .writeTo("gspj.lake.d").append()
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = spark.table("gspj.lake.c").join(
        spark.table("gspj.lake.d"), "k")
      assert(j.count() == 6L) // 5..10
    }
  }

  test("the catalog bucket function is SQL-callable and bit-matches the write-side routing") {
    wh: Unit
    // pmod(hash(CAST(7 AS BIGINT)), 4) computed by Spark's own hash()
    val expected = spark.sql(
      "SELECT pmod(hash(CAST(7 AS BIGINT)), 4)").head().getInt(0)
    val got = spark.sql(
      "SELECT gspj.system.bucket(4, CAST(7 AS BIGINT))").head().getInt(0)
    assert(got == expected, s"function $got vs hash() $expected")
  }
}
