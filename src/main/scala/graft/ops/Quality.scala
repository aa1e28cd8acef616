package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality / pipeline-monitoring operators — the reference's
  * production-architecture asks (TEST:161-163: error handling, data
  * validation, monitoring metrics) expressed as first-class queries.
  * At 100 TB these run as cheap side-car aggregations (each is one
  * scan + partial agg); in streaming the same expressions attach via
  * `df.observe` (see ScaleDesignSpec).
  */
object Quality {

  /** DQ1: referential integrity — orphan foreign keys across the star
    * schema. All zeros on the healthy corpus; non-zero = broken load.
    * The three lineitem FK checks share ONE fact scan: left-join all
    * three dims (each key side is unique, so row count is preserved and
    * a null PK after the join ≡ anti-join membership) and count nulls
    * per relation in a single aggregate — at 100 TB that is one pass
    * over the big fact instead of three. orders→customer and
    * customer→nation are their own (much smaller) single passes. */
  def dq1_referential_integrity(s: SparkSession, d: String): DataFrame = {
    def orphans(fact: DataFrame, fk: String, dim: DataFrame, pk: String, label: String) =
      fact.select(col(fk)).join(dim.select(col(pk)), col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans")).select(lit(label).as("relation"), col("n_orphans"))
    def nullCount(pk: String) =
      coalesce(sum(when(col(pk).isNull, 1L).otherwise(0L)), lit(0L))
    val liChecks = lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .join(orders(s, d).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .join(part(s, d).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left")
      .join(supplier(s, d).select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left")
      .agg(nullCount("o_orderkey").as("to_orders"),
        nullCount("p_partkey").as("to_part"),
        nullCount("s_suppkey").as("to_supplier"))
      .selectExpr("""stack(3,
        'lineitem->orders', to_orders,
        'lineitem->part', to_part,
        'lineitem->supplier', to_supplier) AS (relation, n_orphans)""")
    liChecks
      .unionByName(orphans(orders(s, d), "o_custkey", customer(s, d), "c_custkey", "orders->customer"))
      .unionByName(orphans(customer(s, d), "c_nationkey", nation(s, d), "n_nationkey", "customer->nation"))
      .orderBy("relation")
  }

  /** DQ2: domain/range assertions — rows violating the documented value
    * ranges (FIXTURES.md §1) per rule; all zero on healthy data. A NULL
    * in a checked column counts as BAD: `when(!x.between(...))` alone
    * evaluates to NULL for null inputs and `otherwise(0)` would count a
    * fully-nulled column as perfectly healthy — the exact failure mode
    * a broken load produces. The explicit isNull arm keeps "non-zero =
    * broken load" true for missing values too (dq3 profiles null RATES
    * on the nullable surface; here null is a range violation). */
  def dq2_value_ranges(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val ev = events(s, d)
    def bad(c: String, viol: org.apache.spark.sql.Column) =
      sum(when(col(c).isNull || viol, 1).otherwise(0)).cast("long")
    li.agg(
      bad("l_discount", !col("l_discount").between(0.0, 0.10)).as("bad_discount"),
      bad("l_quantity", !col("l_quantity").between(1.0, 50.0)).as("bad_quantity"),
      bad("l_extendedprice", col("l_extendedprice") <= 0.0).as("bad_price"))
      .crossJoin(ev.agg(
        bad("event_type", !col("event_type").isin(
          "signup", "click", "view", "purchase", "error")).as("bad_event_type"),
        bad("value", col("value") < 0.0).as("bad_value")))
  }

  /** DQ3: completeness / null-rate profile per column of the extraction-
    * style nullable surface (spec mandates nulls be tolerated AND
    * visible, TEST:30 + TEST:162 monitoring). */
  def dq3_null_rates(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val total = count(lit(1))
    c.withColumn("seg_nullable", nullif(col("c_mktsegment"), lit("BUILDING")))
      .agg(
        total.as("n_rows"),
        sum(when(col("c_name").isNull, 1).otherwise(0)).cast("long").as("null_name"),
        sum(when(col("c_acctbal").isNull, 1).otherwise(0)).cast("long").as("null_acctbal"),
        sum(when(col("seg_nullable").isNull, 1).otherwise(0)).cast("long").as("null_seg_planted"),
        round(avg(when(col("seg_nullable").isNull, 1.0).otherwise(0.0)), 6).as("planted_null_rate"))
  }

  /** DQ4: statistical outlier detection — per-segment z-score profile of
    * account balances. The corpus is uniform (max |z| ≈ √3 — no natural
    * tail), so anomalies are planted deterministically (×25 + 200k
    * balance for every 199th custkey, the guaranteed-catch pattern) and
    * the flag threshold |z| > 3 sits ≥ 1.0 away from every real z at
    * all three SFs (verified empirically) — cross-engine float drift
    * (~1e-12 relative) cannot flip a flag. Scale shape: TWO passes over
    * the augmented frame (one builds the 5 stat rows via map-side
    * partials, one probes them through a broadcast join) and ZERO fact
    * shuffles — the 100 TB anomaly-report idiom. The alternative
    * single-pass form (window over c_mktsegment) would shuffle the
    * whole fact onto 5 keys — a skew trap; re-scanning beats
    * re-shuffling here. (The union makes each pass two customer scans;
    * at scale the planted branch is a test fixture, not a cost.) */
  def dq4_outliers(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val aug = c.unionByName(
      c.filter(col("c_custkey") % 199 === 0)
        .select((col("c_custkey") + 8000000L).as("c_custkey"), col("c_mktsegment"),
          (col("c_acctbal") * 25.0 + 200000.0).as("c_acctbal")))
    val stats = aug.groupBy("c_mktsegment")
      .agg(avg(col("c_acctbal")).as("m"), stddev_samp(col("c_acctbal")).as("sd"))
    aug.join(broadcast(stats), Seq("c_mktsegment"))
      .withColumn("az", abs((col("c_acctbal") - col("m")) / col("sd")))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("az") > 3.0, 1).otherwise(0)).cast("long").as("n_outliers"),
        round(max(col("az")), 4).as("max_abs_z"),
        round(avg(col("c_acctbal")), 4).as("mean_bal"))
      .orderBy("c_mktsegment")
  }

  /** DQ5: observe()-based monitoring metrics under the oracle gate —
    * the Spark-native monitoring channel (CollectMetricsExec): metric
    * aggregates ride the SAME execution as the query, zero extra scans,
    * and measure the PRE-filter stream while the query's own aggregate
    * sees only surviving rows. The metrics are read driver-side after
    * the action (that is what observe IS — a listener-visible side
    * channel) and folded into the result row, a4-style, so DuckDB
    * re-derives every value exactly: the observed totals as subqueries
    * over the unfiltered table, the passed totals over the filtered
    * one. At 100 TB this is the monitoring idiom: row counts and
    * control totals for free on every pipeline action.
    *
    * NOTE this builder is EAGER by necessity: observed metrics exist
    * only after an action, so the observed query runs inside the
    * builder and the returned frame is the materialized 1-row result —
    * a plan-only consumer (graft.Explain) sees a LocalTableScan here,
    * not the CollectMetrics plan (ScaleDesignSpec asserts that plan
    * shape on the un-collected form instead). NULL aggregates (empty
    * table: sum over zero rows) propagate as NULL, exactly as the
    * oracle's subqueries do — unboxing them to 0.0 would report a
    * plausible control total instead of surfacing "no data observed". */
  def dq5_observe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val observed = lineitem(s, d)
      .select(col("l_quantity"), col("l_extendedprice"))
      .observe("dq5",
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .filter(col("l_quantity") >= 25)
    val agg = observed.agg(
      count(lit(1)).as("n_passed"),
      round(sum(col("l_extendedprice")), 2).as("price_passed"))
    val row = agg.collect().head
    val m = agg.queryExecution.observedMetrics("dq5")
    def optD(r: org.apache.spark.sql.Row, f: String): Option[Double] = {
      val i = r.fieldIndex(f)
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }
    Seq((m.getAs[Long]("n_rows"), optD(m, "sum_qty"),
      row.getAs[Long]("n_passed"), optD(row, "price_passed")))
      .toDF("n_rows_observed", "qty_observed", "n_passed", "price_passed")
  }

  /** DQ6: column-level profile via UNPIVOT — min/max/avg/distinct-count
    * per numeric column of the fact table, reshaped long with `stack`
    * (the unpivot generator — the inverse of A9's pivot, completing the
    * reshape pair). The long/tidy shape is what monitoring stores
    * ingest.
    *
    * Scale/plan shape (r21, guide §2.3/§2.4): unpivot FIRST, then ONE
    * grouped aggregate over (col_name, value). The three profiled
    * columns ride a single fact scan and a single two-phase distinct
    * chain — Catalyst plans a mixed distinct+plain aggregate with ONE
    * distinct column group as regroup-by-(key, value), no Expand — vs
    * the previous shape's three separate scans + three distinct chains
    * + two crossJoins (9 stages → 3; measured 1.0s → ~0.45s at sf0.1;
    * plan files plans/r21/dq6_column_profile_{before,after}.txt). The
    * multi-distinct-Expand trap the old comment guarded against stays
    * avoided: after the unpivot there is exactly one distinct column
    * (`v`), never one per profiled column. The unpivot triples the
    * scanned row COUNT but carries (name, value) pairs only — the same
    * bytes the three pruned scans read in total — and the partial agg
    * combines map-side, so the exchange carries distinct values, not
    * rows, exactly as before. */
  def dq6_column_profile(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .selectExpr(
        """stack(3,
             'l_discount',      l_discount,
             'l_extendedprice', l_extendedprice,
             'l_quantity',      l_quantity
           ) AS (col_name, v)""")
      .groupBy("col_name")
      .agg(min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        round(avg(col("v")), 4).as("avg_v"),
        countDistinct(col("v")).as("n_distinct"))
      .orderBy("col_name")

  /** DQ7: distribution drift (PSI) — the monitoring metric that catches
    * a pipeline silently changing its data mix: Population Stability
    * Index between a reference era (orders ≤ 1997) and the current one
    * (> 1997), for one numeric feature (o_totalprice, fixed-width 50k
    * buckets capped at decile 9 — data-independent edges, so the metric
    * is comparable across runs) and one categorical (o_orderpriority).
    * Add-one smoothing over the observed bucket set keeps ln finite
    * when an era misses a bucket. PSI ≥ 0.1 = drift warning (the
    * standard threshold). The synthetic corpus is era-uniform (PSI ≈
    * 0.001 on the real columns — a truthful "no drift"), so a third
    * lane plants drift deterministically (cur-era prices scaled ×1.5,
    * the t19 plant-it-yourself pattern) and must fire the flag in both
    * engines. Scale: one fact scan unpivoted by a
    * generator, a (feature,bucket)-keyed partial agg (≤15 groups), and
    * window sums over those 15 rows — the whole monitor is a side-car
    * aggregation, never a second pass over the fact. */
  def dq7_distribution_drift(s: SparkSession, d: String): DataFrame = {
    val u = orders(s, d)
      .withColumn("side",
        when(year(col("o_orderdate")) <= 1997, "ref").otherwise("cur"))
      .selectExpr("side",
        """stack(3,
             'o_orderpriority', o_orderpriority,
             'o_totalprice', concat('b', cast(least(floor(o_totalprice / 50000), 9) as int)),
             'o_totalprice_drifted', concat('b', cast(least(floor(
               o_totalprice * (case when side = 'cur' then 1.5 else 1.0 end) / 50000), 9) as int))
           ) AS (feature, bucket)""")
    val counts = u.groupBy("feature", "bucket")
      .agg(count(when(col("side") === "ref", 1)).as("ref_n"),
        count(when(col("side") === "cur", 1)).as("cur_n"))
    val w = Window.partitionBy("feature")
    val p = counts
      .withColumn("b", count(lit(1)).over(w))
      .withColumn("p_ref",
        (col("ref_n") + 1).cast("double") / (sum(col("ref_n")).over(w) + col("b")))
      .withColumn("p_cur",
        (col("cur_n") + 1).cast("double") / (sum(col("cur_n")).over(w) + col("b")))
    p.groupBy("feature")
      .agg(max(col("b")).cast("int").as("n_buckets"),
        round(sum((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref"))), 6).as("psi"))
      .withColumn("drifted", col("psi") >= 0.1)
      .orderBy("feature")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq1_referential_integrity" -> (dq1_referential_integrity _),
    "dq2_value_ranges" -> (dq2_value_ranges _),
    "dq3_null_rates" -> (dq3_null_rates _),
    "dq4_outliers" -> (dq4_outliers _),
    "dq5_observe" -> (dq5_observe _),
    "dq6_column_profile" -> (dq6_column_profile _),
    "dq7_distribution_drift" -> (dq7_distribution_drift _),
  )

  val oracle: Map[String, String] = Map(
    "dq7_distribution_drift" ->
      """WITH o2 AS (
           SELECT CASE WHEN year(o_orderdate) <= 1997 THEN 'ref' ELSE 'cur' END AS side,
                  o_orderpriority, o_totalprice
           FROM orders),
         u AS (
           SELECT side, 'o_orderpriority' AS feature, o_orderpriority AS bucket FROM o2
           UNION ALL
           SELECT side, 'o_totalprice',
                  'b' || CAST(CAST(least(floor(o_totalprice / 50000), 9) AS INTEGER) AS VARCHAR) FROM o2
           UNION ALL
           SELECT side, 'o_totalprice_drifted',
                  'b' || CAST(CAST(least(floor(
                    o_totalprice * (CASE WHEN side = 'cur' THEN 1.5 ELSE 1.0 END) / 50000), 9) AS INTEGER) AS VARCHAR) FROM o2),
         c AS (
           SELECT feature, bucket,
                  count(*) FILTER (side = 'ref') AS ref_n,
                  count(*) FILTER (side = 'cur') AS cur_n
           FROM u GROUP BY 1, 2),
         e AS (
           SELECT feature,
                  CAST(ref_n + 1 AS DOUBLE) /
                    (sum(ref_n) OVER (PARTITION BY feature) + count(*) OVER (PARTITION BY feature)) AS p_ref,
                  CAST(cur_n + 1 AS DOUBLE) /
                    (sum(cur_n) OVER (PARTITION BY feature) + count(*) OVER (PARTITION BY feature)) AS p_cur,
                  count(*) OVER (PARTITION BY feature) AS b
           FROM c)
         SELECT feature, CAST(max(b) AS INTEGER) AS n_buckets,
                round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi,
                (round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) >= 0.1) AS drifted
         FROM e GROUP BY feature ORDER BY feature""",
    "dq1_referential_integrity" ->
      """SELECT relation, n_orphans FROM (
           SELECT 'lineitem->orders' AS relation, count(*) FILTER (
             o_orderkey IS NULL) AS n_orphans
           FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
           UNION ALL
           SELECT 'orders->customer', count(*) FILTER (c_custkey IS NULL)
           FROM orders LEFT JOIN customer ON o_custkey = c_custkey
           UNION ALL
           SELECT 'customer->nation', count(*) FILTER (n_nationkey IS NULL)
           FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
           UNION ALL
           SELECT 'lineitem->part', count(*) FILTER (p_partkey IS NULL)
           FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
           UNION ALL
           SELECT 'lineitem->supplier', count(*) FILTER (s_suppkey IS NULL)
           FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey)
         ORDER BY relation""",
    "dq2_value_ranges" ->
      """SELECT
         CAST(sum(CASE WHEN l_discount IS NULL OR l_discount NOT BETWEEN 0.0 AND 0.10 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
         CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity NOT BETWEEN 1.0 AND 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_quantity,
         CAST(sum(CASE WHEN l_extendedprice IS NULL OR l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
         (SELECT CAST(sum(CASE WHEN event_type IS NULL OR event_type NOT IN ('signup','click','view','purchase','error') THEN 1 ELSE 0 END) AS BIGINT) FROM events) AS bad_event_type,
         (SELECT CAST(sum(CASE WHEN value IS NULL OR value < 0.0 THEN 1 ELSE 0 END) AS BIGINT) FROM events) AS bad_value
         FROM lineitem""",
    "dq3_null_rates" ->
      """SELECT count(*) AS n_rows,
         CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_name,
         CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_acctbal,
         CAST(sum(CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_seg_planted,
         round(avg(CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL THEN 1.0 ELSE 0.0 END), 6) AS planted_null_rate
         FROM customer""",
    "dq4_outliers" ->
      """WITH aug AS (
           SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
           UNION ALL
           SELECT c_custkey + 8000000, c_mktsegment, c_acctbal * 25.0 + 200000.0
           FROM customer WHERE c_custkey % 199 = 0),
         s AS (
           SELECT c_mktsegment, avg(c_acctbal) AS m, stddev_samp(c_acctbal) AS sd
           FROM aug GROUP BY 1)
         SELECT aug.c_mktsegment,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN abs((c_acctbal - m)/sd) > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(max(abs((c_acctbal - m)/sd)), 4) AS max_abs_z,
           round(avg(c_acctbal), 4) AS mean_bal
         FROM aug JOIN s USING (c_mktsegment)
         GROUP BY aug.c_mktsegment ORDER BY aug.c_mktsegment""",
    "dq5_observe" ->
      """SELECT (SELECT count(*) FROM lineitem) AS n_rows_observed,
           (SELECT round(sum(l_quantity), 2) FROM lineitem) AS qty_observed,
           count(*) AS n_passed,
           round(sum(l_extendedprice), 2) AS price_passed
         FROM lineitem WHERE l_quantity >= 25""",
    "dq6_column_profile" ->
      """SELECT 'l_discount' AS col_name, min(l_discount) AS min_v,
           max(l_discount) AS max_v, round(avg(l_discount), 4) AS avg_v,
           CAST(count(DISTINCT l_discount) AS BIGINT) AS n_distinct
         FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice', min(l_extendedprice), max(l_extendedprice),
           round(avg(l_extendedprice), 4),
           CAST(count(DISTINCT l_extendedprice) AS BIGINT)
         FROM lineitem
         UNION ALL
         SELECT 'l_quantity', min(l_quantity), max(l_quantity),
           round(avg(l_quantity), 4),
           CAST(count(DISTINCT l_quantity) AS BIGINT)
         FROM lineitem
         ORDER BY col_name""",
  )
}
