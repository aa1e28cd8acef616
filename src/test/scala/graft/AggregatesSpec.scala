package graft

import graft.functions.WeightedMean
import org.apache.spark.sql.functions._

/** Aggregation semantics: UDAF arithmetic, rollup subtotal invariant,
  * HLL error bound, dedup idempotence (SURVEY.md §5.2 property layer —
  * properties run over seeded random instances, deterministic re-runs). */
class AggregatesSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("WeightedMean reproduces the PDF's M+I grade arithmetic") {
    // (4.1·14.31 + 3.8·14.38) / 7.9 ≈ 14.34 (reference PDF p.9 Table 1-2)
    val df = Seq((14.31, 4.1), (14.38, 3.8)).toDF("grade", "tonnes")
    val got = df.agg(WeightedMean($"grade", $"tonnes")).head.getDouble(0)
    assert(math.abs(got - 14.34) < 0.005, s"got $got")
  }

  test("WeightedMean of empty weight sum is NaN, not a crash") {
    val df = Seq((1.0, 0.0), (2.0, 0.0)).toDF("v", "w")
    assert(df.agg(WeightedMean($"v", $"w")).head.getDouble(0).isNaN)
  }

  test("rollup subtotals equal the sum of their children (property)") {
    for (_ <- 1 to 5) {
      val rows = List.fill(30)((
        Seq("a", "b", "c")(rnd.nextInt(3)),
        Seq("x", "y")(rnd.nextInt(2)),
        rnd.nextInt(100)))
      val df = rows.toDF("g1", "g2", "v")
      val r = df.rollup($"g1", $"g2").agg(sum($"v").as("s")).collect()
      val grand = r.filter(x => x.isNullAt(0) && x.isNullAt(1)).map(_.getLong(2)).sum
      val leaves = r.filter(x => !x.isNullAt(0) && !x.isNullAt(1)).map(_.getLong(2)).sum
      val mids = r.filter(x => !x.isNullAt(0) && x.isNullAt(1)).map(_.getLong(2)).sum
      assert(grand == leaves && grand == mids)
    }
  }

  test("approx_count_distinct within 5% of exact at rsd=0.01") {
    val ev = Tables.events(spark, sf)
    val exact = ev.agg(countDistinct($"user_id")).head.getLong(0)
    val approx = ev.agg(approx_count_distinct($"user_id", 0.01)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05, s"$approx vs $exact")
  }

  test("dropDuplicates is idempotent and order-insensitive (property)") {
    for (_ <- 1 to 5) {
      val xs = List.fill(20)(rnd.nextInt(6))
      val df = xs.toDF("x")
      val once = df.dropDuplicates("x")
      assert(once.count() == xs.distinct.size)
      assert(once.dropDuplicates("x").count() == once.count())
    }
  }

  test("approx percentile sketch: rank bound holds everywhere, exact values agree with a10") {
    val rows = ops.Aggregates.a13_approx_percentile(spark, sf)
      .select($"o_orderstatus", $"q", $"exact_p", $"sketch_within_bound")
      .as[(String, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty && rows.length % 3 == 0)
    rows.foreach { case (st, q, _, ok) => assert(ok, s"rank bound violated at ($st, $q)") }
    // the exact side must be the same numbers a10 reports
    val a10 = ops.Aggregates.a10_percentiles(spark, sf)
      .select($"o_orderstatus", $"p25", $"p50", $"p90")
      .as[(String, Double, Double, Double)].collect()
      .flatMap { case (st, p25, p50, p90) =>
        Seq((st, 0.25) -> p25, (st, 0.5) -> p50, (st, 0.9) -> p90) }.toMap
    rows.foreach { case (st, q, p, _) =>
      assert(math.abs(p - a10((st, q))) < 1e-9, s"($st, $q): $p vs a10 ${a10((st, q))}") }
  }

  test("pivot row-set equals groupBy pairs; language columns sum to total") {
    val piv = ops.Aggregates.a9_pivot(spark, sf)
    val direct = Tables.documents(spark, sf)
      .groupBy($"source").agg(count(lit(1))).count()
    assert(piv.count() == direct)
    val total = piv.select((col("de") + col("en") + col("es") + col("fr") + col("zh")).as("s"))
      .agg(sum($"s")).head.getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }
}
