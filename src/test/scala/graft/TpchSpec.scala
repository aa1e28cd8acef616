package graft

/** Plan-shape pins for the TPC-H completion queries (Tpch.scala). The
  * DuckDB differential at sf0.01 is the value gate; these assert the
  * PHYSICAL properties that gate can't see — which side broadcasts,
  * that disjunctions stay one filter, that correlated probes stay
  * semi/anti joins — the properties that decide whether the same plan
  * survives a 100 TB fact table. */
class TpchSpec extends SparkTestBase {

  private def plan(name: String): String =
    ops.Tpch.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q2: all dims broadcast — no sort-merge join anywhere in the plan") {
    val p = plan("q2_min_cost_supplier")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the only exchanges should be the two aggregations + the argmin
    // join-back keyed on p_partkey, never a fact-vs-dim shuffle
    assert(!p.contains("SortMergeJoin") || p.contains("p_partkey"), p.take(2000))
  }

  test("q4: correlated EXISTS plans as one left-semi probe on l_orderkey") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("q7: nation joined twice, both copies broadcast") {
    val p = plan("q7_volume_shipping")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(3000))
  }

  test("q14: numerator and denominator come from ONE aggregation pass") {
    val p = plan("q14_promo_revenue")
    // partial + final of a single global aggregate = exactly 2 HashAggregates
    assert("HashAggregate".r.findAllIn(p).size == 2, p.take(3000))
  }

  test("q15: max-equality self-reference selects exactly the max supplier(s)") {
    val df = ops.Tpch.q15_top_supplier(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).toSet
    assert(revs.size == 1, s"non-max rows leaked: $revs")
  }

  test("q19: OR'd brackets stay one post-join filter — no union of scans") {
    val p = plan("q19_bracket_revenue")
    assert(!p.contains("Union"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q21: the fact self-joins collapse into per-order stats — no anti join, ≤2 fact scans") {
    val p = plan("q21_waiting_supplier")
    // orders' EXISTS stays a semi probe; the supplier EXISTS / NOT
    // EXISTS pair must NOT survive as self-joins — they fold into one
    // per-order countDistinct aggregation (1 extra fact scan, not 2,
    // and no fact-fact anti shuffle)
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(!p.contains("LeftAnti"), p.take(3000))
    assert("lineitem\\.parquet".r.findAllIn(p).size <= 2, p.take(3000))
  }

  test("q21: the stats cascade shares ONE l_orderkey exchange") {
    // r22 (guide §2.4): the per-(order, supplier) -> per-order cascade
    // is pre-distributed by l_orderkey, whose hashpartitioning satisfies
    // BOTH group clusterings — exactly one fact exchange, partitioned on
    // the order key alone, and no (orderkey, suppkey) re-shuffle
    val p = plan("q21_waiting_supplier")
    val parts = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(parts.exists(k =>
      k.contains("l_orderkey") && !k.contains("l_suppkey")), parts)
    assert(!parts.exists(k =>
      k.contains("l_orderkey") && k.contains("l_suppkey")),
      s"cascade still re-shuffles by (orderkey, suppkey): $parts")
  }

  test("q22: scalar threshold broadcasts; dormancy is an anti join") {
    val p = plan("q22_dormant_customers")
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(3000))
  }

  test("q20: per-part totals are a window over the aggregate — no fact-derived broadcast") {
    val p = plan("q20_volume_suppliers")
    // the totals frame has part-table cardinality; broadcasting it was
    // the scale bug the round-6 review caught. The window reuses the
    // aggregate's l_partkey clustering; the only remaining broadcast of
    // derived rows is the qualifying supplier-ID list (dim-bounded).
    // The old broadcast form's signature — a SECOND aggregation summing
    // qty per part — must not reappear.
    assert(p.contains("Window"), p.take(3000))
    assert(!p.contains("partial_sum(qty"), p.take(3000))
  }

  test("q15: the revenue view is persisted — max side and join side share one evaluation") {
    val df = ops.Tpch.q15_top_supplier(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      p.take(3000))
  }

  test("q12: derived delay class counts both priority branches per row") {
    val rows = ops.Tpch.q12_shipping_delay(spark, sf).collect()
    val total = rows.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum
    // every joined line lands in exactly one (class, priority) cell
    val expect = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf)
          .filter(org.apache.spark.sql.functions.col("l_shipdate") >= "1996-01-01" &&
            org.apache.spark.sql.functions.col("l_shipdate") < "1997-01-01"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey")).count()
    assert(total == expect, s"$total != $expect")
  }
}
