package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2.5 W1–W5).
  *
  * Scale notes: each window partitions by a real key (nation, user, customer)
  * so the single shuffle it costs distributes evenly; no window here is
  * unpartitioned (a global ORDER BY window would serialize on one task at
  * 100 TB — deliberately avoided).
  */
object Windows {

  /** W1: ranking — top-3 customers by account balance per nation.
    * Tiebreak on the unique custkey keeps ranks deterministic. */
  def w1_rank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    customer(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select("c_nationkey", "rn", "rnk", "drnk", "c_custkey", "c_acctbal")
      .orderBy("c_nationkey", "rn")
  }

  /** W2: lag/lead — seconds between consecutive events per user. */
  def w2_lag_lead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("gap_sec", unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")))
      .select("user_id", "event_id", "event_type", "gap_sec", "next_type")
      .orderBy("user_id", "event_id")
  }

  /** W3: frame aggregates — running total + 3-row moving average of order
    * totals per customer. */
  def w3_running_total(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    orders(s, d)
      .withColumn("running_spend",
        round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .withColumn("ma3",
        round(avg(col("o_totalprice")).over(w.rowsBetween(-2, 0)), 4))
      .select("o_custkey", "o_orderkey", "running_spend", "ma3")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** W4: distribution — quartile + percent_rank of supplier balances. */
  def w4_distribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").asc, col("s_suppkey").asc)
    supplier(s, d)
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .select("s_nationkey", "s_suppkey", "quartile", "pct_rank", "cume")
      .orderBy("s_nationkey", "s_suppkey")
  }

  /** W5: dedup-keep-latest — canonical latest event per user
    * (row_number()=1 over ts DESC; the idempotent-upsert idiom). */
  def w5_dedup_latest(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("latest_event"),
        col("event_type").as("latest_type"))
      .orderBy("user_id")
  }

  /** W6: SCD Type-2 history build — the warehouse dimension-versioning
    * idiom: treat each customer's order stream as a change log of a
    * tracked attribute (o_orderpriority), collapse runs of the same
    * value (change detection via lag), then assign version numbers and
    * [effective_from, effective_to) validity ranges via lead; the open
    * row (effective_to IS NULL) is the current version. Scale shape:
    * two windows over the SAME (custkey; date, orderkey) partitioning —
    * Catalyst plans ONE shuffle+sort and runs both Window operators on
    * it (plan-asserted in RelationalSpec); no self-join, no global sort.
    * Subset to custkey % 97 = 0 to keep the verify artifact bounded. */
  def w6_scd2_history(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    orders(s, d)
      .filter(col("o_custkey") % 97 === 0)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority").as("attr"))
      .withColumn("prev_attr", lag(col("attr"), 1).over(w))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col("attr"))
      .withColumn("version", row_number().over(w))
      .withColumn("effective_from", col("o_orderdate"))
      .withColumn("effective_to", lead(col("o_orderdate"), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .select("o_custkey", "version", "attr", "effective_from",
        "effective_to", "is_current")
      .orderBy("o_custkey", "version")
  }

  /** W7: last-touch attribution — every purchase is credited to the
    * most recent PRIOR non-purchase event of the same user (the
    * marketing-attribution idiom; purchases with no prior touch credit
    * 'none'). The conditional last() with ignoreNulls over a
    * [-∞, -1) frame finds "latest preceding event of another type"
    * in ONE pass — no self-join of events against events, which is the
    * naive formulation and shuffles the stream twice. Scale shape: one
    * shuffle on user_id (the same partitioning w2/w5 use), then a
    * small channel-keyed aggregate. */
  def w7_attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .withColumn("prior",
        last(when(col("event_type") =!= "purchase", col("event_type")), true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("channel", coalesce(col("prior"), lit("none")))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("revenue"))
      .orderBy("channel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w1_rank" -> (w1_rank _),
    "w2_lag_lead" -> (w2_lag_lead _),
    "w3_running_total" -> (w3_running_total _),
    "w4_distribution" -> (w4_distribution _),
    "w5_dedup_latest" -> (w5_dedup_latest _),
    "w6_scd2_history" -> (w6_scd2_history _),
    "w7_attribution" -> (w7_attribution _),
  )

  val oracle: Map[String, String] = Map(
    "w1_rank" ->
      """SELECT c_nationkey, CAST(rn AS INT) AS rn, CAST(rnk AS INT) AS rnk,
           CAST(drnk AS INT) AS drnk, c_custkey, c_acctbal FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
           FROM customer
           WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC))
         WHERE rn <= 3 ORDER BY c_nationkey, rn""",
    "w2_lag_lead" ->
      """SELECT user_id, event_id, event_type,
           date_diff('second', lag(ts, 1) OVER w, ts) AS gap_sec,
           lead(event_type, 1) OVER w AS next_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         ORDER BY user_id, event_id""",
    "w3_running_total" ->
      """SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "w4_distribution" ->
      """SELECT s_nationkey, s_suppkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
         FROM supplier
         WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC)
         ORDER BY s_nationkey, s_suppkey""",
    "w5_dedup_latest" ->
      """SELECT user_id, event_id AS latest_event, event_type AS latest_type FROM (
           SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",
    "w6_scd2_history" ->
      """WITH src AS (
           SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority AS attr,
             lag(o_orderpriority, 1) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_attr
           FROM orders WHERE o_custkey % 97 = 0),
         chg AS (
           SELECT o_custkey, o_orderkey, o_orderdate, attr FROM src
           WHERE prev_attr IS NULL OR prev_attr <> attr)
         SELECT o_custkey,
           CAST(row_number() OVER w AS INT) AS version,
           attr,
           o_orderdate AS effective_from,
           lead(o_orderdate, 1) OVER w AS effective_to,
           (lead(o_orderdate, 1) OVER w IS NULL) AS is_current
         FROM chg
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_custkey, version""",
    "w7_attribution" ->
      """WITH touched AS (
           SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior
           FROM events)
         SELECT coalesce(prior, 'none') AS channel,
           count(*) AS n_purchases,
           round(sum(value), 2) AS revenue
         FROM touched WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY channel""",
  )
}
