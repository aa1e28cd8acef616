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

  test("2n-vs-n bucket join plans WITHOUT a shuffle (ReducibleFunction folds the fine side)") {
    wh: Unit
    // 4-bucket table e, 8-bucket table f, same BIGINT key type: the
    // bucket function's reducer proves pmod(h,8) % 4 = pmod(h,4), so
    // Spark GROUPS f's fine partitions instead of shuffling both sides
    makeBucketed("e", (1L to 40L).map(i => i -> s"e$i"))
    spark.sql("DROP TABLE IF EXISTS gspj.lake.f")
    spark.sql("CREATE TABLE gspj.lake.f (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('layout'='bucketed:k:8', 'retainGenerations'='10')")
    val s = spark; import s.implicits._
    (11L to 50L).map(i => i -> s"f$i").toDF("k", "v")
      .writeTo("gspj.lake.f").append()
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = spark.table("gspj.lake.e").join(
        spark.table("gspj.lake.f"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"2n-vs-n bucket join must fold, not shuffle:\n$plan")
      val got = j.select(col("k"), col("e.v"), col("f.v")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
      assert(got == (11L to 40L).map(i => (i, s"e$i", s"f$i")), got.take(5))
    }
    // a NON-divisible modulus pair (3 vs 4) cannot fold — correctness
    // comes from the shuffle fallback, never a mis-grouped join
    spark.sql("DROP TABLE IF EXISTS gspj.lake.g")
    spark.sql("CREATE TABLE gspj.lake.g (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('layout'='bucketed:k:3', 'retainGenerations'='10')")
    (1L to 20L).map(i => i -> s"g$i").toDF("k", "v")
      .writeTo("gspj.lake.g").append()
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = spark.table("gspj.lake.e").join(
        spark.table("gspj.lake.g"), "k")
      assert(j.count() == 20L)
    }
  }

  test("a bucketed MERGE against a co-bucketed source plans its rewrite join storage-partitioned") {
    wh: Unit
    makeBucketed("mt", (1L to 40L).map(i => i -> s"t$i"))
    makeBucketed("ms", (30L to 45L).map(i => i -> s"S$i"))
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = plans.add(qe.executedPlan.toString): Unit
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      spark.sql(
        """MERGE INTO gspj.lake.mt t USING gspj.lake.ms s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v
           WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
      // listener events drain asynchronously — poll for the plan
      import scala.jdk.CollectionConverters._
      var spins = 0
      while (!plans.asScala.exists(_.contains("MergeRows")) && spins < 40) {
        Thread.sleep(250); spins += 1
      }
      val rewrite = plans.asScala.find(_.contains("MergeRows")).getOrElse(
        fail(s"no MergeRows plan captured among ${plans.size} executions"))
      // both sides of the rewrite join report bucket(4, k): the
      // target-vs-source join is storage-partitioned — NO exchange in
      // the MERGE statement's own plan (the changeset APPLY that
      // follows shuffles only O(changeset), in its own jobs)
      assert(!rewrite.contains("Exchange"),
        s"co-bucketed MERGE rewrite must not shuffle either side:\n$rewrite")
    } finally spark.listenerManager.unregister(listener)
    val got = spark.table("gspj.lake.mt").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size == 45 && got(35L) == "S35" && got(45L) == "S45" &&
      got(10L) == "t10", got.toSeq.sortBy(_._1).take(8))
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
