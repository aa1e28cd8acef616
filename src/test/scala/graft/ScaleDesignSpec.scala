package graft

import org.apache.spark.sql.functions._

/** Scale-design mechanics the sf0.01 differential can't see: bucketed
  * co-located joins (zero-exchange), skew salting equivalence, and the
  * typed nested-report assembly (SURVEY §1.2). */
class ScaleDesignSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // default warehouse (spark-warehouse/ in cwd, gitignored) — the
    // warehouse dir is a static conf and can't move per-test; a fresh
    // in-memory catalog doesn't know about dirs left by a previous JVM,
    // so remove the physical locations too
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // disable broadcast so the join must pick SMJ over the bucketed layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").count()
      val plan = j.queryExecution.executedPlan.toString
      // the join itself must not need an Exchange on either side
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan.take(2000))
      assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning(l_orderkey"),
        "probe side was re-shuffled despite bucketing")
      // same result as the unbucketed join
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("salted aggregation equals direct aggregation (skew mitigation)") {
    // two-phase: salt the key 8 ways, partial agg, de-salt, final agg
    val li = Tables.lineitem(spark, sf)
    val salted = li
      .withColumn("salt", (col("l_orderkey") % 8).cast("int"))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity")).as("partial"))
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("partial")), 2).as("total"))
    val direct = li.groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("total"))
    val a = salted.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = direct.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("observe() attaches monitoring metrics to a batch query") {
    // TEST:162's monitoring ask, Spark-native: metrics ride the action
    val df = Tables.lineitem(spark, sf)
      .observe("dq", count(lit(1)).as("rows"),
        sum(col("l_quantity")).as("qty"))
      .filter(col("l_quantity") > 0)
    df.collect()
    val m = df.queryExecution.observedMetrics("dq")
    assert(m.getAs[Long]("rows") == Tables.lineitem(spark, sf).count())
    assert(m.getAs[Double]("qty") > 0)
  }

  test("typed MiningReport assembly: 1 doc, 4 resources, 3 reserves, null economics") {
    val reports = ops.Extraction.assembleReports(spark, sf).collect()
    assert(reports.length == 1)
    val r = reports.head
    assert(r.doc_hash == "878C2FBC" && r.source_system == "sedar")
    assert(r.resources.map(_.category).toSet ==
      Set("Measured", "Indicated", "Measured + Indicated", "Inferred"))
    assert(r.reserves.map(_.category).toSet ==
      Set("Proven", "Probable", "Proven + Probable"))
    assert(r.economics.npv_usd.isEmpty && r.economics.irr_pct.isEmpty)
    assert(r.resources.forall(x => x.grade_unit == "g/t" && x.metal == "Au"))
  }
}
