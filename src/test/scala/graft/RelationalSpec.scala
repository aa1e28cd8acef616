package graft

import org.apache.spark.sql.functions._

/** Unit semantics for §2.2–2.7 operators on literal frames + smoke on the
  * sf0.001 corpus (the DuckDB differential at sf0.01 is the main gate;
  * these pin the semantics that differential can't see, e.g. plans). */
class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs non-empty on sf0.001") {
    // j5/u-ops may legitimately be empty at tiny scale; assert no throw
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("oracleSql covers every query except the documented exceptions") {
    // only the binary-input PDF family lacks a DuckDB oracle (each row
    // carries golden-fixture ScalaTests instead); a4 and t10 gained real
    // oracles in round 2 (tolerance-boolean / md5-derived simhash);
    // pdf_decode_audit (r11) is the decode-ceiling quarantine channel,
    // golden-pinned in ExtractionSpec
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("pdf_extract", "pdf_project_meta", "pdf_economics",
      "pdf_decode_audit"),
      s"unexpected oracle gaps: $noOracle")
  }

  test("semi/anti joins partition a table against any predicate") {
    val part = Tables.part(spark, sf)
    val li = Tables.lineitem(spark, sf).filter($"l_quantity" >= 48)
    val semi = part.join(li, $"p_partkey" === $"l_partkey", "left_semi").count()
    val anti = part.join(li, $"p_partkey" === $"l_partkey", "left_anti").count()
    assert(semi + anti == part.count())
  }

  test("broadcast join plan actually broadcasts the dim side") {
    val plan = ops.Relational.j1_broadcast_join(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("sort-merge join hint pins SMJ for the fact-fact join") {
    val plan = ops.Relational.j2_sortmerge_join(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("top-k compiles to TakeOrderedAndProject (O(k) memory)") {
    val plan = ops.Relational.o2_topk(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("filter is pushed down to the parquet scan") {
    val plan = ops.Relational.p2_filter(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("LessThan(l_quantity,24.0)"),
      plan.take(3000))
  }

  test("O4: sortWithinPartitions sorts locally without a global shuffle") {
    val df = Tables.lineitem(spark, sf).repartition(4, $"l_suppkey")
      .sortWithinPartitions($"l_shipdate")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Sort [l_shipdate") && plan.contains("false, 0"),
      plan.take(1500)) // global=false marks the partition-local sort
    val ok = df.mapPartitions { it =>
      // parquet NTZ timestamps surface as LocalDateTime
      val ts = it.map(_.getAs[java.time.LocalDateTime]("l_shipdate")).toSeq
      Iterator.single(ts.zip(ts.drop(1)).forall { case (a, b) => !a.isAfter(b) })
    }(org.apache.spark.sql.Encoders.scalaBoolean).collect()
    assert(ok.forall(identity))
  }

  test("union-all count additivity") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("x")
    assert(a.unionByName(b).count() == a.count() + b.count())
  }

  test("except/intersect partition the left side") {
    val a = Seq(1, 2, 3, 4).toDF("x")
    val b = Seq(3, 4, 5).toDF("x")
    val inter = a.intersect(b).count()
    val exc = a.except(b).count()
    assert(inter == 2 && exc == 2 && inter + exc == a.distinct.count())
  }

  test("as-of join picks the latest click at-or-before each purchase") {
    // tiny literal fixture: clicks at t=1,5,9; purchases at t=5,7
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:0$m:00")
    val ev = Seq(
      (1L, ts(1), 7L, "click", 0.0), (2L, ts(5), 7L, "click", 0.0),
      (3L, ts(9), 7L, "click", 0.0), (4L, ts(5), 7L, "purchase", 1.0),
      (5L, ts(7), 7L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_").toString
    // route through parquet so the query's events() loader sees NANOS-free data
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ops.Scalars.j8_asof_join(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // purchase 4 at t=5: click 2 (same ts counts); purchase 5 at t=7: click 2
    assert(got.toSet == Set((4L, 2L), (5L, 2L)))
  }

  test("w6 SCD2: valid version chains, one current row per key, one shuffle") {
    val rows = ops.Windows.w6_scd2_history(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (k, vs) =>
      val sorted = vs.sortBy(_.getInt(1))
      // versions are contiguous from 1
      assert(sorted.map(_.getInt(1)).toSeq == (1 to vs.length),
        s"custkey $k versions not contiguous")
      // exactly one open (current) row, and it is the last version
      val current = sorted.filter(_.getBoolean(5))
      assert(current.length == 1 && current.head.getInt(1) == vs.length,
        s"custkey $k current-row invariant broken")
      // ranges chain: effective_to of version v = effective_from of v+1
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.get(4) == b.get(3), s"custkey $k range gap")
          // change detection collapsed runs: consecutive attrs differ
          assert(a.getString(2) != b.getString(2), s"custkey $k no-op version")
        case _ => ()
      }
    }
    // both window operators share one (hash-partition, sort) pass: the
    // physical plan must contain exactly one exchange over o_custkey
    val plan = ops.Windows.w6_scd2_history(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(o_custkey".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 custkey exchange, got $exchanges:\n" +
      plan.take(2000))
  }

  test("j10: salted join spreads the hot key and matches the unsalted result") {
    val salted = ops.Relational.j10_salted_join(spark, sf)
    // the exchange must partition on BOTH the key and the salt — that is
    // the whole point: sk=0 fans out over 16 sub-partitions
    val plan = salted.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(sk#\\d+L?, salt".r.findFirstIn(plan).isDefined,
      "fact side not partitioned on (sk, salt):\n" + plan.take(3000))
    assert(plan.contains("SortMergeJoin"), "salt demo requires a shuffle join")
    // semantics: identical to the plain unsalted join
    import graft.Tables
    val fact = Tables.lineitem(spark, sf).select(
      when($"l_orderkey" % 2 === 0, 0L).otherwise($"l_orderkey" % 500).as("sk"),
      $"l_quantity", $"l_returnflag")
    val dim = spark.range(500).select($"id".as("sk"), ($"id" * 2 + 1).cast("double").as("w"))
    val plain = fact.join(dim, Seq("sk"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum($"w" * $"l_quantity"), 2).as("weighted_qty"))
      .orderBy("l_returnflag")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("w7: last-touch attribution credits the latest prior touch, 'none' when absent") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:0$m:00")
    // user 7: view, click, purchase(3), purchase(4) — both purchases credit
    // the click (the purchase between them is not a touch); user 8:
    // purchase(5) with no prior event credits 'none'
    val ev = Seq(
      (1L, ts(1), 7L, "view", 0.0), (2L, ts(2), 7L, "click", 0.0),
      (3L, ts(3), 7L, "purchase", 10.0), (4L, ts(4), 7L, "purchase", 5.0),
      (5L, ts(1), 8L, "purchase", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_w7_").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ops.Windows.w7_attribution(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("click", 2L, 15.0), ("none", 1L, 2.0)))
  }

  test("t36: splits partition the corpus by source, leakage-free, near 80/10/10") {
    val rows = ops.TextVector.t36_leakage_split(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"))
    rows.foreach(r => assert(r.getBoolean(4), "leakage_free must hold"))
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total, "splits must partition the corpus")
    val train = rows.find(_.getString(0) == "train").get.getLong(2).toDouble / total
    assert(train > 0.5 && train < 0.95, s"train share $train implausible for 80%")
  }

  test("t37: hard negatives stay inside the similarity band") {
    val rows = ops.TextVector.t37_hard_negatives(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 5)
      val sim = r.getDouble(3)
      assert(sim >= 0.2499 && sim <= 0.5001, s"sim $sim outside band")
    }
  }

  test("dq1: planted orphans are counted exactly per relation") {
    // the sf corpus is referentially intact, so the oracle only ever sees
    // zeros — this fixture BREAKS a copy of it (drop orders with key%7=0
    // and suppliers with key%5=0) and asserts the single-scan null-count
    // form counts exactly the planted orphans, relation by relation
    import graft.Tables
    val d = java.nio.file.Files.createTempDirectory("graft_dq1_").toString
    def put(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.parquet(s"$d/$name.parquet")
    put("lineitem", Tables.lineitem(spark, sf))
    put("orders", Tables.orders(spark, sf).filter($"o_orderkey" % 7 =!= 0))
    put("supplier", Tables.supplier(spark, sf).filter($"s_suppkey" % 5 =!= 0))
    put("customer", Tables.customer(spark, sf))
    put("nation", Tables.nation(spark, sf))
    put("part", Tables.part(spark, sf))
    val got = ops.Quality.dq1_referential_integrity(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, sf)
    val want = Map(
      "lineitem->orders" -> li.filter($"l_orderkey" % 7 === 0).count(),
      "lineitem->supplier" -> li.filter($"l_suppkey" % 5 === 0).count(),
      "lineitem->part" -> 0L, "orders->customer" -> 0L, "customer->nation" -> 0L)
    assert(got == want, s"got $got want $want")
    assert(got("lineitem->orders") > 0 && got("lineitem->supplier") > 0,
      "fixture degenerate: no orphans planted")
  }

  test("dq4: every planted anomaly is flagged, nothing else is") {
    import graft.Tables
    val planted = Tables.customer(spark, sf)
      .filter($"c_custkey" % 199 === 0)
      .groupBy($"c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ops.Quality.dq4_outliers(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) == planted.getOrElse(r.getString(0), 0L),
        s"segment ${r.getString(0)}: outliers != planted")
    }
  }
}
