package graft.ops

import graft.Tables._
import graft.functions.WeightedMean
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregations (SURVEY.md §2.4 A1–A12).
  *
  * Scale notes: every groupBy here is a HashAggregate with map-side partial
  * aggregation — the shuffle carries pre-combined (key, buffer) pairs, not
  * raw rows, so network volume is O(distinct keys), not O(rows). collect_list
  * (A8) is the one exception (ObjectHashAggregate, buffers grow with group
  * size) — keep group cardinality bounded there.
  */
object Aggregates {

  /** A1 — flagship: TPC-H-Q1-shape pricing summary over lineitem.
    * scan → pushed filter → partial agg → 1 shuffle on a 6-value key →
    * final agg. The canonical "would survive 100 TB" plan. */
  def a1_pricing_summary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A2: global (no-group) aggregate — corpus totals. */
  def a2_global_agg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      count(lit(1)).as("n_rows"),
      round(sum(col("l_quantity")), 2).as("total_qty"),
      round(sum(col("l_extendedprice")), 2).as("total_price"),
      round(avg(col("l_discount")), 6).as("avg_disc"),
      min(col("l_shipdate")).cast("date").as("first_ship"),
      max(col("l_shipdate")).cast("date").as("last_ship"))

  /** A3: exact distinct — distinct users per event type. */
  def a3_count_distinct(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** A3b: dropDuplicates-style exact dedup on a projection. */
  def a3_distinct_rows(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("lang"), col("source")).distinct()
      .orderBy("lang", "source")

  /** A4: approximate distinct (HLL++) — the 100 TB path where exact
    * countDistinct's shuffle is unaffordable. DuckDB's sketch estimates
    * differently, so the raw estimate can't hash-match; instead the
    * tolerance window is folded into the result: `approx_ok` asserts the
    * HLL++ estimate (rsd 1%) lands within ±5% of exact, which the oracle
    * states as a literal TRUE — an estimate drifting out of tolerance
    * flips the hash. The tighter 1%-rsd bound stays in AggregatesSpec. */
  def a4_approx_distinct(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.01).as("approx"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx") - col("exact_users")).cast("double") /
          col("exact_users") <= 0.05).as("approx_ok"))
      .orderBy("event_type")

  /** A5: ROLLUP — subtotals + grand total, the PDF's own M+I / P+P row
    * semantics (reference PDF p.9 Tables 1-2/1-3). */
  def a5_rollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** A6: CUBE — full subtotal lattice over lang × source. */
  def a6_cube(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("n_chars")), 4).as("avg_chars"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)

  /** A6b: GROUPING SETS with grouping_id — the explicit lattice form
    * (rollup/cube are sugar over this) plus the disambiguation bit that
    * separates "null because subtotal" from "null in the data". */
  def a6_grouping_sets(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
         CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
         round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem_gs
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
  }

  /** A7: custom UDAF — quantity-weighted mean discount per return flag
    * (same arithmetic as the PDF's tonnage-weighted grades). */
  def a7_weighted_mean(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(WeightedMean(col("l_discount"), col("l_quantity")), 6).as("wavg_disc"),
        round(sum(col("l_quantity")), 2).as("sum_w"))
      .orderBy("l_returnflag")

  /** A8: collect_list → nested array per group (the §1.2 resources/reserves
    * assembly shape); sort_array for cross-engine determinism. The arrays
    * are serialized with concat_ws in the final projection (quantities are
    * whole numbers, so the BIGINT cast is lossless): the driver's pandas
    * compare cannot sort/hash raw ndarray cells. */
  def a8_collect_list(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_orderkey") <= 100)
      .groupBy(col("l_orderkey"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("l_quantity").cast("long"))))
          .as("quantities"),
        concat_ws(",", sort_array(collect_set(col("l_returnflag")))).as("flags"))
      .orderBy("l_orderkey")

  /** A9: pivot — lang categories to columns per source (fixed value list
    * so the output schema is static at any scale). */
  def a9_pivot(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("source"))
      .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
      .agg(count(lit(1)))
      .na.fill(0, Seq("de", "en", "es", "fr", "zh")) // absent combo = 0, like COUNT FILTER
      .orderBy("source")

  /** A10: exact percentiles / median of order totals per status.
    * ONE array-typed `percentile(x, array(...))` buffer, not three
    * scalar percentile/median aggregates (r21, guide §2.3): Spark's
    * Percentile buffers every (value, count) pair per group per
    * AGGREGATE EXPRESSION, so the 3-expression form built and shuffled
    * the whole group's value map three times. `median(x)` IS
    * `percentile(x, 0.5)` (RuntimeReplaceable), so the result is
    * bit-identical; the per-group buffer and its shuffle bytes drop 3×. */
  def a10_percentiles(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.9D))").as("ps"))
      .select(col("o_orderstatus"),
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p90"))
      .orderBy("o_orderstatus")

  /** A11: argmax-style selection — max_by/min_by per brand (keyed on the
    * unique partkey so ties cannot make the result nondeterministic). */
  def a11_min_max_by(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .groupBy(col("p_brand"))
      .agg(max_by(col("p_name"), col("p_partkey")).as("latest_part"),
        min_by(col("p_name"), col("p_partkey")).as("first_part"),
        count(lit(1)).as("n_parts"))
      .orderBy("p_brand")

  /** A12: conditional aggregation — per-event-type error/purchase shares. */
  def a12_conditional_agg(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_errors"),
        sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)).as("purchase_value_raw"),
        count(lit(1)).as("n_events"))
      .withColumn("error_rate", round(col("n_errors").cast("double") / col("n_events"), 6))
      .withColumn("purchase_value", round(col("purchase_value_raw"), 2))
      .drop("purchase_value_raw")
      .orderBy("user_id")

  /** A13: approx percentile sketch — the quantile member of the
    * bounded-memory sketch family (A4 HyperLogLog cardinality, T28
    * count-min frequency, T33 Bloom membership): `approx_percentile`
    * answers per-group quantiles in one pass with memory bounded by the
    * accuracy parameter, independent of group size — at 100 TB exact
    * percentile (A10) must buffer whole groups; the sketch never does.
    * The guarantee (returned value's rank within n/accuracy of the
    * target rank) is verified IN-PLAN by ranking the sketch's answer
    * against the group — and folded into an oracle-checkable boolean
    * (the a4/t28/t33 pattern); the exact quantile is emitted beside it
    * so the oracle also pins real values. */
  def a13_approx_percentile(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderstatus"), col("o_totalprice"))
    val qArr = array(lit(0.25), lit(0.5), lit(0.9))
    // sketch + exact + count in ONE pass over orders (they aggregate the
    // same key); only the rank-verification pass re-reads the table
    // exact side uses ONE array-typed percentile buffer, same as a10
    // (three scalar percentile expressions would build and shuffle the
    // per-group value map three times for identical output)
    val stats = o.groupBy(col("o_orderstatus"))
      .agg(expr("approx_percentile(o_totalprice, array(0.25D, 0.5D, 0.9D), 100)").as("ap"),
        expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.9D))").as("ep"),
        count(lit(1)).as("n"))
      .select(col("o_orderstatus"), col("n"), col("ep"),
        posexplode(col("ap")).as(Seq("qi", "v")))
      .withColumn("q", element_at(qArr, col("qi") + 1))
      .withColumn("exact_v", element_at(col("ep"), col("qi") + 1))
    val ranks = o.join(broadcast(stats.select(col("o_orderstatus"), col("qi"),
        col("q"), col("v"))), Seq("o_orderstatus"))
      .groupBy(col("o_orderstatus"), col("qi"), col("q"))
      .agg(sum(when(col("o_totalprice") < col("v"), 1).otherwise(0)).as("n_lt"),
        sum(when(col("o_totalprice") <= col("v"), 1).otherwise(0)).as("n_le"))
    // rank guarantee with accuracy=100: some rank of the returned value
    // lies within n/100 of q·n; duplicates give v the rank interval
    // (n_lt, n_le], so check interval overlap (+1 slack for the
    // floor/ceiling conventions at tiny groups)
    ranks.join(stats.select(col("o_orderstatus"), col("qi"), col("n"),
        col("exact_v")), Seq("o_orderstatus", "qi"))
      .withColumn("qn", col("q") * col("n"))
      .withColumn("eps", col("n") / 100.0 + 1.0)
      .select(col("o_orderstatus"), col("q"), col("n"),
        round(col("exact_v"), 4).as("exact_p"),
        (col("n_lt") <= col("qn") + col("eps") &&
          col("n_le") >= col("qn") - col("eps")).as("sketch_within_bound"))
      .orderBy("o_orderstatus", "q")
  }

  /** A14: fixed-width histogram — the profiling staple: bucket the fact
    * column on data-independent bounds (width 5000 over the documented
    * price domain), count + share per bucket. Fixed literals (not
    * min/max-derived) keep the binning stable as data arrives — the
    * monitoring property (a drifting histogram must mean drifting DATA,
    * not a drifting scale). One scan, one small agg; the share is a
    * window over the ~22-row bucket frame, never the fact table. */
  def a14_histogram(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    lineitem(s, d)
      .select(floor(col("l_extendedprice") / 5000).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("bucket_lo", (col("bucket") * 5000).cast("double"))
      .withColumn("bucket_hi", ((col("bucket") + 1) * 5000).cast("double"))
      .withColumn("share", round(col("n") / sum(col("n")).over(w), 6))
      .select("bucket", "bucket_lo", "bucket_hi", "n", "share")
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_pricing_summary" -> (a1_pricing_summary _),
    "a2_global_agg" -> (a2_global_agg _),
    "a3_count_distinct" -> (a3_count_distinct _),
    "a3_distinct_rows" -> (a3_distinct_rows _),
    "a4_approx_distinct" -> (a4_approx_distinct _),
    "a5_rollup" -> (a5_rollup _),
    "a6_cube" -> (a6_cube _),
    "a6_grouping_sets" -> (a6_grouping_sets _),
    "a7_weighted_mean" -> (a7_weighted_mean _),
    "a8_collect_list" -> (a8_collect_list _),
    "a9_pivot" -> (a9_pivot _),
    "a10_percentiles" -> (a10_percentiles _),
    "a11_min_max_by" -> (a11_min_max_by _),
    "a12_conditional_agg" -> (a12_conditional_agg _),
    "a13_approx_percentile" -> (a13_approx_percentile _),
    "a14_histogram" -> (a14_histogram _),
  )

  val oracle: Map[String, String] = Map(
    "a1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_extendedprice), 6) AS avg_price,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "a2_global_agg" ->
      """SELECT count(*) AS n_rows, round(sum(l_quantity), 2) AS total_qty,
         round(sum(l_extendedprice), 2) AS total_price,
         round(avg(l_discount), 6) AS avg_disc,
         CAST(min(l_shipdate) AS DATE) AS first_ship,
         CAST(max(l_shipdate) AS DATE) AS last_ship
         FROM lineitem""",
    "a3_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""",
    "a3_distinct_rows" ->
      """SELECT DISTINCT lang, source FROM documents ORDER BY lang, source""",
    "a4_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
         TRUE AS approx_ok
         FROM events GROUP BY event_type ORDER BY event_type""",
    "a5_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
         count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "a6_cube" ->
      """SELECT lang, source, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
         FROM documents GROUP BY CUBE (lang, source)
         ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""",
    "a6_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
         round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "a7_weighted_mean" ->
      """SELECT l_returnflag,
         round(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS wavg_disc,
         round(sum(l_quantity), 2) AS sum_w
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "a8_collect_list" ->
      """SELECT l_orderkey,
         array_to_string(list_sort(list(CAST(l_quantity AS BIGINT))), ',') AS quantities,
         array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
         FROM lineitem WHERE l_orderkey <= 100
         GROUP BY l_orderkey ORDER BY l_orderkey""",
    "a9_pivot" ->
      """SELECT source,
         count(*) FILTER (lang = 'de') AS de,
         count(*) FILTER (lang = 'en') AS en,
         count(*) FILTER (lang = 'es') AS es,
         count(*) FILTER (lang = 'fr') AS fr,
         count(*) FILTER (lang = 'zh') AS zh
         FROM documents GROUP BY source ORDER BY source""",
    "a10_percentiles" ->
      """SELECT o_orderstatus,
         round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
         round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
         round(quantile_cont(o_totalprice, 0.9), 4) AS p90
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "a11_min_max_by" ->
      """SELECT p_brand, max_by(p_name, p_partkey) AS latest_part,
         min_by(p_name, p_partkey) AS first_part, count(*) AS n_parts
         FROM part GROUP BY p_brand ORDER BY p_brand""",
    "a12_conditional_agg" ->
      """SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
         count(*) AS n_events,
         round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS error_rate,
         round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_value
         FROM events GROUP BY user_id ORDER BY user_id""",
    "a13_approx_percentile" ->
      """WITH per AS (
           SELECT o_orderstatus, CAST(0.25 AS DOUBLE) AS q, count(*) AS n,
             quantile_cont(o_totalprice, 0.25) AS p FROM orders GROUP BY 1
           UNION ALL
           SELECT o_orderstatus, CAST(0.5 AS DOUBLE), count(*),
             quantile_cont(o_totalprice, 0.5) FROM orders GROUP BY 1
           UNION ALL
           SELECT o_orderstatus, CAST(0.9 AS DOUBLE), count(*),
             quantile_cont(o_totalprice, 0.9) FROM orders GROUP BY 1)
         SELECT o_orderstatus, q, CAST(n AS BIGINT) AS n,
           round(p, 4) AS exact_p, TRUE AS sketch_within_bound
         FROM per ORDER BY o_orderstatus, q""",
    "a14_histogram" ->
      """WITH b AS (
           SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
             count(*) AS n
           FROM lineitem GROUP BY 1)
         SELECT bucket, CAST(bucket * 5000 AS DOUBLE) AS bucket_lo,
           CAST((bucket + 1) * 5000 AS DOUBLE) AS bucket_hi,
           n, round(n / (SELECT sum(n) FROM b), 6) AS share
         FROM b ORDER BY bucket""",
  )
}
