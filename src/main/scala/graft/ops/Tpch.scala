package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H completion — the 15 query shapes Composite.scala doesn't carry
  * (Q2/Q4/Q7/Q8/Q9/Q11/Q12/Q14/Q15/Q16/Q17/Q19/Q20/Q21/Q22), adapted
  * where the harness corpus lacks the original's columns (TESTDATA.md:
  * no partsupp table, no l_commitdate/l_receiptdate/l_shipmode, no
  * c_phone, no p_container/p_mfgr). Each adaptation preserves the
  * query's DISTINCTIVE PLANNER SHAPE — that is what a 100 TB engine is
  * graded on, not the literal predicate constants:
  *
  *   - Q2: per-group min + join-back (min-cost supplier per part)
  *   - Q4: correlated EXISTS with a cross-table date predicate
  *   - Q7: same dim joined twice under an OR'd pair filter
  *   - Q8: conditional-share aggregation (CASE inside sum / sum)
  *   - Q9: multi-way fact expansion with a computed profit measure
  *   - Q11: HAVING against a scalar subquery over the same aggregate
  *   - Q12: two-way conditional counts over a derived class
  *   - Q14: single-row ratio aggregate over a selective month
  *   - Q15: view + scalar-max self-reference
  *   - Q16: count(DISTINCT) with a NOT IN exclusion list
  *   - Q17: correlated per-group average threshold
  *   - Q19: disjunction of conjunctive brackets pushed through a join
  *   - Q20: chained semi-join reduction (share-of-volume supplier)
  *   - Q21: EXISTS and NOT EXISTS on the SAME fact table, both correlated
  *   - Q22: scalar-subquery threshold + anti join
  *
  * Scale notes: O(1)-cardinality dims (nation: 25 rows, region: 5 —
  * fixed at ANY scale factor) are broadcast-pinned; sf-PROPORTIONAL
  * sides (supplier/part/customer, even behind selective filters) carry
  * no hint — the planner/AQE broadcasts them while they fit and falls
  * back to a shuffle join when they no longer do; every fact-fact
  * reduction shuffles on its natural keys (l_orderkey / l_partkey /
  * o_custkey); in Q21 the two RETURNED-side probes (driving scan and
  * NOT-EXISTS anti probe) share one filtered-scan shape the engine can
  * reuse, while the EXISTS probe necessarily reads the unfiltered fact
  * once more — three l_orderkey-clustered exchanges total, none
  * broadcast.
  */
object Tpch {

  private def rev: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** Q2 shape — min-cost supplier: for each LARGE small-size part, the
    * EUROPE supplier(s) with the lowest observed unit price. partsupp
    * does not exist in this corpus, so unit cost is derived from the
    * fact table itself: min(l_extendedprice / l_quantity) per
    * (part, supplier). The shape under test is aggregate → per-group
    * min → equality join-back, the classic "argmin per group without a
    * window" plan. Dims broadcast; the only fact shuffle is the
    * (partkey, suppkey) aggregation. */
  def q2_min_cost_supplier(s: SparkSession, d: String): DataFrame = {
    val eurSupp = supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    // NO broadcast hints on the filtered part / eurSupp sides (r20
    // verdict finding #3): both are constant-FRACTION cuts of
    // sf-proportional tables (~2% of part, ~20% of suppliers), so a
    // pinned broadcast still grows linearly with the corpus and dies at
    // the 100 TB design point. The planner broadcasts them while their
    // estimates fit (plan-time file-size estimates for part, AQE's
    // runtime size for the joined eurSupp) — ScaleDesignSpec pins that
    // the harness-scale plan still ends up all-broadcast.
    // r22 (guide §2.4, and the repo's own q17 idiom): the per-part min
    // becomes a WINDOW over the same aggregate instead of an
    // aggregate-then-rejoin — the join-back form re-derived the whole
    // costs subtree on BOTH join sides (two lineitem scans) and then
    // co-partitioned both on (p_partkey, unit_cost), a float key.
    // Distributing the pruned fact by p_partkey once lets the
    // per-(part, supplier) aggregate AND the per-part window share that
    // single exchange (hashpartitioning(p_partkey) satisfies both
    // clusterings): one fact scan, one fact exchange, no self-join.
    // min is order-independent and division IEEE-exact, so the argmin
    // equality is byte-stable cross-engine, as before. Lines per part
    // are a constant ratio of the corpus (no skew at any sf).
    val costs = lineitem(s, d)
      .join(part(s, d).filter(col("p_type") === "LARGE" && col("p_size") <= 10),
        col("l_partkey") === col("p_partkey"))
      .join(eurSupp, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      .repartition(col("p_partkey"))
      .groupBy(col("p_partkey"), col("s_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"))
      .agg(min(col("unit_price")).as("unit_cost"))
    val wPart = org.apache.spark.sql.expressions.Window.partitionBy(col("p_partkey"))
    costs.withColumn("min_cost", min(col("unit_cost")).over(wPart))
      .filter(col("unit_cost") === col("min_cost"))
      .select(round(col("s_acctbal"), 2).as("acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), round(col("unit_cost"), 2).as("cost"))
      .orderBy(col("acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Q4 shape — order priority checking. The original's "commit date
    * beaten by receipt date" lateness column pair doesn't exist here;
    * the correlated-EXISTS shape survives intact with "shipped more
    * than 60 days after the order date" as the lateness predicate.
    * Catalyst plans the EXISTS as a left-semi join whose condition
    * spans both sides (l_shipdate > o_orderdate + 60d) — the probe
    * shuffles once on l_orderkey. */
  def q4_order_priority(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
      .join(lineitem(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** Q7 shape — volume shipping between two trading nations: the nation
    * dim joins TWICE (supplier side and customer side) under an OR of
    * the two direction pairs. Both nation copies broadcast; the fact
    * chain shuffles on its two natural keys (l_orderkey for the orders
    * join, o_custkey for the customer join — customer is fact-sized at
    * TPC-H scale, so it follows the repo convention of no broadcast
    * hint and an AQE-decided build side). */
  def q7_volume_shipping(s: SparkSession, d: String): DataFrame = {
    // the OR'd pair filter below implies each side is one of the two
    // nations — state that single-side consequence explicitly on the
    // dims so the INNER nation joins prune ~92% of the fact rows at the
    // join, instead of relying on the optimizer to CNF-decompose the
    // disjunction (the pair filter still applies afterwards)
    val trading = nation(s, d).filter(col("n_name").isin("NATION_1", "NATION_2"))
    val n1 = broadcast(trading
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(trading
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    lineitem(s, d)
      .filter(col("l_shipdate").between(lit("1996-01-01"), lit("1997-12-31")))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(rev), 2).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q8 shape — national market share: NATION_5's share of ECONOMY-part
    * revenue delivered into ASIA, per order year. The conditional-share
    * aggregate (sum(CASE)/sum) runs on ONE aggregation pass — no second
    * scan for the denominator. */
  def q8_market_share(s: SparkSession, d: String): DataFrame = {
    val asiaCust = customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val suppNation = broadcast(nation(s, d)
      .select(col("n_nationkey").as("sn_nk"), col("n_name").as("supp_nation")))
    lineitem(s, d)
      .join(part(s, d).filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(suppNation, col("s_nationkey") === col("sn_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_5", rev).otherwise(lit(0.0))) / sum(rev),
        3).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q9 shape — product-type profit: the widest fact expansion in TPC-H
    * (lineitem × part × supplier × orders × nation) with a computed
    * profit measure. ps_supplycost doesn't exist; 60% of retail price
    * stands in as unit cost, which keeps the measure a multi-table
    * arithmetic over the joined row exactly like the original. */
  def q9_product_profit(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(part(s, d).filter(col("p_name").like("%red%")),
        col("l_partkey") === col("p_partkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(sum(rev - lit(0.6) * col("p_retailprice") * col("l_quantity")), 2)
        .as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** Q11 shape — important line value: per-part shipped value restricted
    * to a nation group, kept only where it clears TWICE THE AVERAGE
    * per-part value of the group. The original's fixed fraction of the
    * grand total is corpus-size-dependent (a 0.2% cut that selects 85
    * parts at sf0.01 selects none at sf1 because shares shrink as the
    * part count grows); an avg-relative threshold keeps the scalar-
    * subquery-over-the-same-aggregate shape AND a stable selectivity at
    * every scale. Spark computes the threshold as a 1-row broadcast
    * joined into the HAVING filter, so the fact scans once per
    * aggregate, never per candidate row. */
  def q11_value_share(s: SparkSession, d: String): DataFrame = {
    val perPart = lineitem(s, d)
      .join(supplier(s, d).filter(col("s_nationkey") <= 4),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice")).as("raw_value"))
    val thresh = perPart.agg((avg(col("raw_value")) * 2).as("threshold"))
    perPart.join(broadcast(thresh))
      .filter(col("raw_value") > col("threshold"))
      .select(col("l_partkey"), round(col("raw_value"), 2).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** Q12 shape — shipping-delay classes: l_shipmode doesn't exist, so
    * the class column is derived (FAST = shipped within 30 days of the
    * order). The signature two-way conditional count (high-priority vs
    * low-priority lines per class) is unchanged. */
  def q12_shipping_delay(s: SparkSession, d: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    orders(s, d)
      .join(lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01")),
        col("o_orderkey") === col("l_orderkey"))
      .withColumn("delay_class",
        when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"), "FAST")
          .otherwise("SLOW"))
      .groupBy(col("delay_class"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("delay_class"))
  }

  /** Q14 shape — promo revenue: single-row ratio over one selective
    * ship month. p_type carries a literal 'PROMO' class in this corpus,
    * so the query is faithful. The plan to insist on: the month filter
    * reaches the lineitem scan pushed, part broadcasts, ONE aggregate
    * produces both numerator and denominator. */
  def q14_promo_revenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-09-01") &&
        col("l_shipdate") < lit("1996-10-01"))
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) / sum(rev),
        2).as("promo_revenue"))

  /** Q15's revenue view, memoized per (session, corpus dir) so repeat
    * invocations (bench reps, spec calls) reuse ONE cached frame
    * instead of stacking a fresh persist per call — the FrameMemo
    * handles staleness (lineitem listing fingerprint) and unpersists
    * superseded entries. The frame is supplier-cardinality
    * (dim-bounded), so the cache is O(dim) at any scale. */
  private val q15RevenueMemo = new FrameMemo("lineitem.parquet")((s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(round(sum(rev), 2).as("total_revenue")))

  /** Q15 shape — top supplier: quarterly revenue per supplier, then the
    * supplier(s) matching the scalar max of that same frame. Revenue is
    * rounded INSIDE the view (as the original's view boundary does) AND
    * the view is persisted (memoized above): the max side and the join
    * side then read the SAME evaluation, so the equality compares one
    * set of doubles with itself — two independent evaluations could
    * drift in the last ulps (shuffle partial-merge order) and round to
    * different cents exactly at a boundary. */
  def q15_top_supplier(s: SparkSession, d: String): DataFrame = {
    val revenue = q15RevenueMemo(s, d)
    val mx = revenue.agg(max(col("total_revenue")).as("max_revenue"))
    supplier(s, d)
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(mx))
      .filter(col("total_revenue") === col("max_revenue"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q16 shape — supplier variety per part class: count(DISTINCT
    * suppkey) under brand/type/size exclusions, minus an excluded
    * supplier list (negative account balance stands in for the
    * original's complaint filter). The NOT IN list is dim-sized →
    * broadcast anti semantics; the distinct-count shuffles once on the
    * (brand, type, size) grouping key. */
  def q16_supplier_variety(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(part(s, d).filter(col("p_brand") =!= "Brand#3" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49)),
        col("l_partkey") === col("p_partkey"))
      .join(supplier(s, d).filter(col("s_acctbal") < 0)
          .select(col("s_suppkey").as("bad_suppkey")),
        col("l_suppkey") === col("bad_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))

  /** Q17 shape — small-quantity revenue: lineitems under half their
    * part's average quantity, for one brand + size band. The correlated
    * per-part average becomes a window aggregate over l_partkey: ONE
    * scan of the (broadcast-pruned) fact, one shuffle keyed on
    * l_partkey, every row compared against its own group's average
    * in-place — vs the aggregate-then-rejoin form, which scans the
    * fact twice. The arithmetic is identical (sum/count per part), so
    * the oracle keeps the textbook correlated-subquery SQL. */
  def q17_small_qty_revenue(s: SparkSession, d: String): DataFrame = {
    val brandParts = part(s, d)
      .filter(col("p_brand") === "Brand#5" && col("p_size") < 10)
      .select("p_partkey")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    lineitem(s, d)
      .join(brandParts, col("l_partkey") === col("p_partkey"))
      .withColumn("half_avg_qty", avg(col("l_quantity")).over(w) * 0.5)
      .filter(col("l_quantity") < col("half_avg_qty"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** Q19 shape — bracketed revenue: three OR'd conjunctive brackets
    * (brand × size band × quantity band). The disjunction must stay ONE
    * post-join filter (no union-of-three-scans); the p_partkey join
    * stays broadcast. As in q7, the single-side consequences of the
    * disjunction (brand ∈ the three brands, size ≤ 35, quantity 1–30)
    * are stated explicitly on the build side and the fact scan, so the
    * join prunes most rows before the bracket filter judges the rest.
    * p_container doesn't exist — size bands stand in. */
  def q19_bracket_revenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_quantity").between(1, 30))
      .join(part(s, d)
          .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
            col("p_size").between(1, 35)),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(round(sum(rev), 2).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Q20 shape — volume suppliers: suppliers who shipped more than 30%
    * of some PROMO part's 1996 volume, from the low-numbered nations.
    * Without partsupp, "availqty vs shipped" becomes "supplier share of
    * part volume" — the same chained reduction: per-(part,supp) sums →
    * per-part totals → threshold join → DISTINCT supplier semi-join. */
  def q20_volume_suppliers(s: SparkSession, d: String): DataFrame = {
    val shipped = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(part(s, d).filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    // per-part totals as a window over the SAME (part, supp) aggregate —
    // never a broadcast: the totals frame has part-table cardinality
    // (fact-derived, grows with scale), and the window reuses shipped's
    // l_partkey clustering instead of re-aggregating it
    val wPart = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    val qualifying = shipped
      .withColumn("total_qty", sum(col("qty")).over(wPart))
      .filter(col("qty") > col("total_qty") * 0.3)
      .select("l_suppkey")
    supplier(s, d).filter(col("s_nationkey") < 10)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), round(col("s_acctbal"), 2).as("acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** Q21 shape — suppliers who kept an order waiting: a supplier's
    * RETURNED line on a finished multi-supplier order where NO OTHER
    * supplier returned a line (l_returnflag='R' stands in for the
    * missing receipt-after-commit lateness). The signature plan is
    * EXISTS + NOT EXISTS against the SAME fact table: both probes
    * shuffle on l_orderkey and reuse that one exchange; supplier
    * broadcasts. */
  def q21_waiting_supplier(s: SparkSession, d: String): DataFrame = {
    // The EXISTS ("another supplier on the order") and NOT EXISTS ("no
    // other supplier returned") self-joins collapse into per-order
    // supplier stats — a returned line survives iff its order has >1
    // distinct supplier and exactly one distinct RETURNED supplier
    // (this row's own supplier is returned, so n_r_supp = 1 ⇔ nobody
    // else returned). The stats CASCADE: reduce to one row per
    // (order, supplier) first (map-side partial combine, no distinct
    // machinery), then per order — two countDistincts on different
    // expressions would instead Expand the scan ×2 before the shuffle
    // (the dq6 trap; measured 2× slower here).
    //
    // r21 (guide §2.4): the DRIVING side is derivable from the SAME
    // per-(order, supplier) aggregate — when n_r_supp = 1 the
    // qualifying order's waiting supplier is its unique returned one,
    // and that supplier's returned-line count rode along as
    // n_ret_lines. So the second fact scan and the returned-lines ⋈
    // stats fact shuffle are gone entirely: ONE fact scan, one narrow
    // (order, supplier) exchange, one per-order reduction (numwait =
    // Σ n_ret_lines over qualifying orders — identical arithmetic to
    // counting the driving rows). At sf0.1 the wall-clock is
    // floor-dominated and ~unchanged (~1.4s); the win is the plan at
    // scale — fact passes 2 → 1, fact-sized shuffles 2 → 1
    // (plans/r21/q21_waiting_supplier_{before,after}.txt).
    // r22 (guide §2.4 "two operations keyed the same way share one
    // exchange"): distribute by l_orderkey ONCE — hashpartitioning on
    // the order key satisfies the (order, supplier) clustering of the
    // first aggregate AND the order clustering of the second, so the
    // cascade costs one fact exchange instead of two (the ENSURE_
    // REQUIREMENTS pair partitioned by (orderkey, suppkey) then
    // re-shuffled by orderkey — plans/r22/q21_*_{before,after}.txt).
    // Order keys are skew-free by construction (≤7 lines per order at
    // any scale), and the partition count stays conf-derived.
    val perOrder = lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey").as("k_orderkey"), col("l_suppkey").as("k_suppkey"))
      .agg(count(when(col("l_returnflag") === "R", 1)).as("n_ret_lines"))
      .groupBy(col("k_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        count(when(col("n_ret_lines") > 0, 1)).as("n_r_supp"),
        max(when(col("n_ret_lines") > 0, col("k_suppkey"))).as("ret_supp"),
        max(when(col("n_ret_lines") > 0, col("n_ret_lines"))).as("ret_lines"))
      .filter(col("n_supp") > 1 && col("n_r_supp") === 1)
    perOrder
      .join(orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey"),
        col("k_orderkey") === col("o_orderkey"), "left_semi")
      .join(supplier(s, d), col("ret_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("ret_lines")).cast("long").as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Q22 shape — dormant high-balance customers: above the average
    * positive balance of their cohort (scalar subquery → 1-row
    * broadcast) and with no RECENT orders (anti join against the
    * filtered orders side — in this corpus every customer has at least
    * one lifetime order, so the original's "no orders at all" selects
    * nothing; "nothing since 1999" keeps the anti-join shape and a
    * non-trivial answer). c_phone country codes don't exist; nationkey
    * is the cohort. */
  def q22_dormant_customers(s: SparkSession, d: String): DataFrame = {
    val cohort = customer(s, d)
      .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
    val avgBal = cohort.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    cohort
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(orders(s, d).filter(col("o_orderdate") >= lit("1999-01-01"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> (q2_min_cost_supplier _),
    "q4_order_priority" -> (q4_order_priority _),
    "q7_volume_shipping" -> (q7_volume_shipping _),
    "q8_market_share" -> (q8_market_share _),
    "q9_product_profit" -> (q9_product_profit _),
    "q11_value_share" -> (q11_value_share _),
    "q12_shipping_delay" -> (q12_shipping_delay _),
    "q14_promo_revenue" -> (q14_promo_revenue _),
    "q15_top_supplier" -> (q15_top_supplier _),
    "q16_supplier_variety" -> (q16_supplier_variety _),
    "q17_small_qty_revenue" -> (q17_small_qty_revenue _),
    "q19_bracket_revenue" -> (q19_bracket_revenue _),
    "q20_volume_suppliers" -> (q20_volume_suppliers _),
    "q21_waiting_supplier" -> (q21_waiting_supplier _),
    "q22_dormant_customers" -> (q22_dormant_customers _),
  )

  val oracle: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      """WITH costs AS (
           SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
                  min(l_extendedprice / l_quantity) AS unit_cost
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE p_type = 'LARGE' AND p_size <= 10 AND r_name = 'EUROPE'
           GROUP BY 1, 2, 3, 4, 5)
         SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name, p_partkey,
                round(unit_cost, 2) AS cost
         FROM costs c
         WHERE unit_cost = (SELECT min(unit_cost) FROM costs i
                            WHERE i.p_partkey = c.p_partkey)
         ORDER BY acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-04-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q7_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
         FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                      year(l_shipdate) AS l_year,
                      l_extendedprice * (1 - l_discount) AS volume
               FROM supplier
               JOIN lineitem ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN customer ON c_custkey = o_custkey
               JOIN nation n1 ON s_nationkey = n1.n_nationkey
               JOIN nation n2 ON c_nationkey = n2.n_nationkey
               WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                 AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                                    AND TIMESTAMP '1997-12-31')
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q8_market_share" ->
      """SELECT o_year,
                round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                               ELSE 0 END) / sum(volume), 3) AS mkt_share
         FROM (SELECT year(o_orderdate) AS o_year,
                      l_extendedprice * (1 - l_discount) AS volume,
                      n2.n_name AS supp_nation
               FROM part
               JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN customer ON c_custkey = o_custkey
               JOIN nation n1 ON c_nationkey = n1.n_nationkey
               JOIN region ON n1.n_regionkey = r_regionkey
               JOIN nation n2 ON s_nationkey = n2.n_nationkey
               WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
         GROUP BY o_year ORDER BY o_year""",
    "q9_product_profit" ->
      """SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
         FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
                      l_extendedprice * (1 - l_discount)
                        - 0.6 * p_retailprice * l_quantity AS amount
               FROM part
               JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN nation ON s_nationkey = n_nationkey
               WHERE p_name LIKE '%red%')
         GROUP BY nation, o_year ORDER BY nation, o_year DESC""",
    "q11_value_share" ->
      """SELECT l_partkey, round(sum(l_extendedprice), 2) AS value
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         WHERE s_nationkey <= 4
         GROUP BY l_partkey
         HAVING sum(l_extendedprice) >
           (SELECT 2 * avg(v) FROM
             (SELECT sum(l_extendedprice) AS v
              FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              WHERE s_nationkey <= 4 GROUP BY l_partkey))
         ORDER BY value DESC, l_partkey""",
    "q12_shipping_delay" ->
      """SELECT delay_class,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM (SELECT o_orderpriority,
                      CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
                           THEN 'FAST' ELSE 'SLOW' END AS delay_class
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey
               WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate < TIMESTAMP '1997-01-01')
         GROUP BY delay_class ORDER BY delay_class""",
    "q14_promo_revenue" ->
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-09-01'
           AND l_shipdate < TIMESTAMP '1996-10-01'""",
    "q15_top_supplier" ->
      """WITH revenue AS (
           SELECT l_suppkey AS supplier_no,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue
         FROM supplier JOIN revenue ON s_suppkey = supplier_no
         WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
         ORDER BY s_suppkey""",
    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
           AND p_size IN (1, 4, 9, 16, 25, 36, 49)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q17_small_qty_revenue" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
         FROM lineitem l JOIN part ON l_partkey = p_partkey
         WHERE p_brand = 'Brand#5' AND p_size < 10
           AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem i
                             WHERE i.l_partkey = l.l_partkey)""",
    "q19_bracket_revenue" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                count(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 30)""",
    "q20_volume_suppliers" ->
      """WITH shipped AS (
           SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
             AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
           GROUP BY 1, 2),
         totals AS (SELECT l_partkey, sum(qty) AS total_qty FROM shipped GROUP BY 1)
         SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
         FROM supplier
         WHERE s_nationkey < 10
           AND s_suppkey IN (SELECT l_suppkey FROM shipped
                             JOIN totals USING (l_partkey)
                             WHERE qty > total_qty * 0.3)
         ORDER BY s_suppkey""",
    "q21_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
         FROM lineitem l1
         JOIN supplier ON l1.l_suppkey = s_suppkey
         WHERE l1.l_returnflag = 'R'
           AND l1.l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderstatus = 'F')
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_returnflag = 'R')
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""",
    "q22_dormant_customers" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, count(*) AS numcust,
                round(sum(c_acctbal), 2) AS totacctbal
         FROM customer
         WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
           AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                            WHERE c_acctbal > 0.0
                              AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '1999-01-01')
         GROUP BY c_nationkey ORDER BY cntrycode""",
  )
}
