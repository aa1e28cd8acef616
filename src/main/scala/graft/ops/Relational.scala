package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core (SURVEY.md §2.2 projections/filters, §2.3 joins,
  * §2.6 sorts/limits, §2.7 set ops).
  *
  * Scale notes (100 TB design intent, tested at sf≤0.1):
  *  - dims (region/nation/supplier at any SF) are broadcast — no shuffle;
  *  - fact⋈fact joins shuffle on the join key once and aggregate on the
  *    same key where possible so the exchange is reused;
  *  - every query ends in a deterministic ORDER BY for oracle parity.
  */
object Relational {
  private val D = 2 // money-ish rounding for cross-engine double parity

  // ---- §2.2 projection / filters ------------------------------------------

  /** P1: projection + rename + derived column; Catalyst prunes the scan to
    * the 4 referenced columns (ref: SURVEY §2.2 P1). */
  def p1_projection(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"), upper(col("p_name")).as("name_uc"),
        col("p_brand").as("brand"),
        round(col("p_retailprice") * lit(1.1), D).as("price_up"))
      .orderBy("p_partkey")

  /** P2: comparison + boolean predicates pushed to the parquet scan. */
  def p2_filter(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_quantity") < 24 && col("l_discount") >= 0.05
        && !(col("l_returnflag") === "N"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")

  /** P3: IN + BETWEEN predicates. */
  def p3_in_between(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        && col("o_totalprice").between(1000.0, 5000.0))
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy("o_orderkey")

  /** P4: LIKE / RLIKE pattern predicates. */
  def p4_like(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_type").like("%BRASS%") || col("p_name").rlike("^[ab]"))
      .select("p_partkey", "p_name", "p_type")
      .orderBy("p_partkey")

  /** P5: null semantics — nullif/coalesce/null-safe compare. The corpus has
    * no natural nulls, so nullif() introduces them deterministically. */
  def p5_nulls(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .withColumn("seg_or_null", nullif(col("c_mktsegment"), lit("BUILDING")))
      .withColumn("seg_filled", coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("-none-")))
      .withColumn("is_building", col("c_mktsegment") <=> lit("BUILDING"))
      .filter(col("seg_or_null").isNull || col("c_acctbal") < 0)
      .select("c_custkey", "seg_or_null", "seg_filled", "is_building")
      .orderBy("c_custkey")

  // ---- §2.3 joins ----------------------------------------------------------

  /** J1: broadcast hash join chain dim⋈dim⋈fact (customer⋈nation⋈region).
    * Both dims are broadcast: zero shuffle on the probe side at any scale. */
  def j1_broadcast_join(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), D).as("total_acctbal"))
      .orderBy("r_name", "n_name")

  /** J2: large⋈large sort-merge join (lineitem⋈orders), aggregated on the
    * probe key's dimension. The shuffle hash-partitions both sides on
    * orderkey; at 100 TB the same plan holds (MERGE hint pins SMJ so the
    * bench measures the scalable path, not a lucky broadcast). */
  def j2_sortmerge_join(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).hint("merge")
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), D).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")

  /** J3: left outer join keeping customers with zero orders. */
  def j3_left_outer(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), D).as("spend"))
      .orderBy("c_custkey")

  /** J3b: full outer join over two aggregate sides (per-nation customer vs
    * supplier balance) — unmatched nations survive from either side. */
  def j3_full_outer(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).groupBy(col("c_nationkey").as("nk"))
      .agg(round(sum(col("c_acctbal")), D).as("cust_bal"))
    val p = supplier(s, d).groupBy(col("s_nationkey").as("nk"))
      .agg(round(sum(col("s_acctbal")), D).as("supp_bal"))
    c.withColumnRenamed("nk", "c_nk")
      .join(p.withColumnRenamed("nk", "s_nk"), col("c_nk") === col("s_nk"), "full")
      .select(coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
        col("cust_bal"), col("supp_bal"))
      .orderBy("nationkey")
  }

  /** J4: left semi join = EXISTS (customers having ≥1 urgent order). */
  def j4_semi_join(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** J5: left anti join = NOT EXISTS (parts never shipped in bulk —
    * the high-quantity filter keeps the result non-trivially non-empty). */
  def j5_anti_join(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .join(lineitem(s, d).filter(col("l_quantity") >= 48),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")

  /** J6: cross join (bounded: 5×25 dim rows) — the brute-force all-pairs
    * primitive behind similarity search (T5/T6 use the same shape). */
  def j6_cross_join(s: SparkSession, d: String): DataFrame =
    region(s, d).select(col("r_name"))
      .crossJoin(nation(s, d).select(col("n_name")))
      .orderBy("r_name", "n_name")

  /** J7: theta/band join — lineitems bucketed into quantity bands via a
    * non-equi range predicate against a generated bands table. */
  def j7_band_join(s: SparkSession, d: String): DataFrame = {
    val bands = s.range(5).select(
      (col("id") * 10 + 1).cast("double").as("lo"),
      ((col("id") + 1) * 10).cast("double").as("hi"))
    lineitem(s, d)
      .join(broadcast(bands), col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"), round(avg(col("l_extendedprice")), D).as("avg_price"))
      .orderBy("lo")
  }

  /** J9: self join — candidate near-dup pairs of documents sharing
    * (lang, n_chars); a.id < b.id halves the pair space. */
  def j9_self_join(s: SparkSession, d: String): DataFrame = {
    val a = documents(s, d).select(col("doc_id").as("a_id"),
      col("lang").as("a_lang"), col("n_chars").as("a_n"))
    val b = documents(s, d).select(col("doc_id").as("b_id"),
      col("lang").as("b_lang"), col("n_chars").as("b_n"))
    a.join(b, col("a_lang") === col("b_lang") && col("a_n") === col("b_n")
        && col("a_id") < col("b_id"))
      .groupBy(col("a_lang").as("lang"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("lang")
  }

  /** J10: skew-salted join — the manual remedy for a hot join key when
    * AQE's runtime skew split can't help (e.g. the skew is in a single
    * key, not a single partition, or the engine predates AQE). A skewed
    * key is synthesized (half of lineitem lands on sk=0); the fix
    * replicates the dim side N_SALT times and fans the fact side's hot
    * rows across (sk, salt) sub-keys, so the hot key occupies N_SALT
    * partitions instead of one straggler. The salt is a hash of fact
    * columns taken mod N_SALT — full 0..15 coverage whatever the
    * column domains (l_linenumber alone only spans 1..7); any per-row
    * value works semantically because the salt joins only against the
    * replicated dim and cancels out of the aggregate; the oracle is
    * the plain unsalted join. The MERGE
    * hint pins a shuffle join (a broadcast would hide the skew problem
    * being demonstrated); RelationalSpec asserts the exchange
    * partitions on BOTH (sk, salt). */
  def j10_salted_join(s: SparkSession, d: String): DataFrame = {
    val nSalt = 16
    val fact = lineitem(s, d).select(
      when(col("l_orderkey") % 2 === 0, 0L)
        .otherwise(col("l_orderkey") % 500).as("sk"),
      col("l_quantity"), col("l_returnflag"),
      pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(nSalt)).as("salt"))
    val dim = s.range(500).select(col("id").as("sk"),
      (col("id") * 2 + 1).cast("double").as("w"))
    val saltedDim = dim.select(col("sk"), col("w"),
      explode(sequence(lit(0), lit(nSalt - 1))).as("salt"))
    fact.join(saltedDim.hint("merge"), Seq("sk", "salt"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum(col("w") * col("l_quantity")), 2).as("weighted_qty"))
      .orderBy("l_returnflag")
  }

  // ---- §2.6 sorts / limits -------------------------------------------------

  /** O1: global multi-column sort (range-partitioned SortExec). */
  def o1_sort(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy(col("s_nationkey").asc, col("s_acctbal").desc, col("s_suppkey").asc)

  /** O2: top-K — planner turns sort+limit into TakeOrderedAndProject,
    * which is O(k) memory per partition (scales to any row count). */
  def o2_topk(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_totalprice")

  /** O3: LIMIT/OFFSET pagination over a deterministic order. */
  def o3_limit_offset(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_orderkey").asc)
      .offset(10).limit(5)
      .select("o_orderkey", "o_custkey", "o_orderstatus")

  // ---- §2.7 set operations -------------------------------------------------

  /** U1: UNION ALL of two filtered branches (count additivity). */
  def u1_union_all(s: SparkSession, d: String): DataFrame = {
    val big = orders(s, d).filter(col("o_totalprice") > 4000)
      .select(col("o_orderkey"), lit("big").as("bucket"))
    val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), lit("urgent").as("bucket"))
    big.unionByName(urgent)
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** U2: UNION DISTINCT — same branches, deduped on (orderkey,bucket). */
  def u2_union_distinct(s: SparkSession, d: String): DataFrame = {
    val a = orders(s, d).filter(col("o_totalprice") > 4000).select("o_orderkey")
    val b = orders(s, d).filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    a.unionByName(b).distinct()
      .agg(count(lit(1)).as("n_distinct_orders"))
  }

  /** U3: INTERSECT — nationkeys present in BOTH customer and supplier. */
  def u3_intersect(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** U4: EXCEPT — big-ticket orders that are NOT urgent (regression-diff
    * idiom between two pipeline outputs). */
  def u4_except(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_totalprice") > 4900).select(col("o_orderkey"))
      .except(orders(s, d).filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")))
      .orderBy("o_orderkey")

  // ---- registry ------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_projection" -> (p1_projection _),
    "p2_filter" -> (p2_filter _),
    "p3_in_between" -> (p3_in_between _),
    "p4_like" -> (p4_like _),
    "p5_nulls" -> (p5_nulls _),
    "j1_broadcast_join" -> (j1_broadcast_join _),
    "j2_sortmerge_join" -> (j2_sortmerge_join _),
    "j3_left_outer" -> (j3_left_outer _),
    "j3_full_outer" -> (j3_full_outer _),
    "j4_semi_join" -> (j4_semi_join _),
    "j5_anti_join" -> (j5_anti_join _),
    "j6_cross_join" -> (j6_cross_join _),
    "j7_band_join" -> (j7_band_join _),
    "j9_self_join" -> (j9_self_join _),
    "j10_salted_join" -> (j10_salted_join _),
    "o1_sort" -> (o1_sort _),
    "o2_topk" -> (o2_topk _),
    "o3_limit_offset" -> (o3_limit_offset _),
    "u1_union_all" -> (u1_union_all _),
    "u2_union_distinct" -> (u2_union_distinct _),
    "u3_intersect" -> (u3_intersect _),
    "u4_except" -> (u4_except _),
  )

  val oracle: Map[String, String] = Map(
    "p1_projection" ->
      """SELECT p_partkey, upper(p_name) AS name_uc, p_brand AS brand,
         round(p_retailprice * 1.1, 2) AS price_up
         FROM part ORDER BY p_partkey""",
    "p2_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
         FROM lineitem
         WHERE l_quantity < 24 AND l_discount >= 0.05 AND NOT (l_returnflag = 'N')
         ORDER BY l_orderkey, l_linenumber""",
    "p3_in_between" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
         FROM orders
         WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
           AND o_totalprice BETWEEN 1000.0 AND 5000.0
         ORDER BY o_orderkey""",
    "p4_like" ->
      """SELECT p_partkey, p_name, p_type
         FROM part
         WHERE p_type LIKE '%BRASS%' OR regexp_matches(p_name, '^[ab]')
         ORDER BY p_partkey""",
    "p5_nulls" ->
      """SELECT c_custkey,
         nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
         coalesce(nullif(c_mktsegment, 'BUILDING'), '-none-') AS seg_filled,
         (c_mktsegment IS NOT DISTINCT FROM 'BUILDING') AS is_building
         FROM customer
         WHERE nullif(c_mktsegment, 'BUILDING') IS NULL OR c_acctbal < 0
         ORDER BY c_custkey""",
    "j1_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
         round(sum(c_acctbal), 2) AS total_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "j2_sortmerge_join" ->
      """SELECT o_orderpriority,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_lines
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "j3_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
         round(coalesce(sum(o_totalprice), 0.0), 2) AS spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "j3_full_outer" ->
      """SELECT coalesce(c.nk, p.nk) AS nationkey, c.cust_bal, p.supp_bal FROM
         (SELECT c_nationkey AS nk, round(sum(c_acctbal),2) AS cust_bal FROM customer GROUP BY 1) c
         FULL OUTER JOIN
         (SELECT s_nationkey AS nk, round(sum(s_acctbal),2) AS supp_bal FROM supplier GROUP BY 1) p
         ON c.nk = p.nk ORDER BY nationkey""",
    "j4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "j5_anti_join" ->
      """SELECT p_partkey, p_name FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_partkey = p_partkey AND l_quantity >= 48)
         ORDER BY p_partkey""",
    "j6_cross_join" ->
      """SELECT r_name, n_name FROM (SELECT r_name FROM region)
         CROSS JOIN (SELECT n_name FROM nation)
         ORDER BY r_name, n_name""",
    "j7_band_join" ->
      """SELECT CAST(i*10 + 1 AS DOUBLE) AS lo, CAST((i+1)*10 AS DOUBLE) AS hi,
         count(*) AS n, round(avg(l_extendedprice), 2) AS avg_price
         FROM (SELECT unnest(range(5)) AS i)
         JOIN lineitem ON l_quantity >= i*10 + 1 AND l_quantity <= (i+1)*10
         GROUP BY 1, 2 ORDER BY lo""",
    "j9_self_join" ->
      """SELECT a.lang AS lang, count(*) AS n_pairs
         FROM (SELECT doc_id, lang, n_chars FROM documents) a
         JOIN (SELECT doc_id, lang, n_chars FROM documents) b
           ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
         GROUP BY 1 ORDER BY lang""",
    "j10_salted_join" ->
      """WITH dim AS (
           SELECT unnest(range(500)) AS sk),
         dimw AS (
           SELECT sk, CAST(sk * 2 + 1 AS DOUBLE) AS w FROM dim),
         fact AS (
           SELECT CASE WHEN l_orderkey % 2 = 0 THEN 0
                       ELSE l_orderkey % 500 END AS sk,
             l_quantity, l_returnflag
           FROM lineitem)
         SELECT l_returnflag, count(*) AS n,
           round(sum(w * l_quantity), 2) AS weighted_qty
         FROM fact JOIN dimw USING (sk)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "o1_sort" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
         ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC""",
    "o2_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "o3_limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
         ORDER BY o_orderkey ASC LIMIT 5 OFFSET 10""",
    "u1_union_all" ->
      """SELECT bucket, count(*) AS n FROM (
           SELECT o_orderkey, 'big' AS bucket FROM orders WHERE o_totalprice > 4000
           UNION ALL
           SELECT o_orderkey, 'urgent' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT')
         GROUP BY bucket ORDER BY bucket""",
    "u2_union_distinct" ->
      """SELECT count(*) AS n_distinct_orders FROM (
           SELECT o_orderkey FROM orders WHERE o_totalprice > 4000
           UNION
           SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""",
    "u3_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT
         SELECT s_nationkey AS nationkey FROM supplier
         ORDER BY nationkey""",
    "u4_except" ->
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 4900
         EXCEPT
         SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY o_orderkey""",
  )
}
