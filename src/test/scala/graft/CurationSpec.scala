package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** T40/T41 — funnel semantics + plan shape. The oracle gate proves
  * cross-engine value equality; these pin the properties the hash can't
  * see: monotone retention, the planted-duplicate catches, and that the
  * single-plan design really produces no cartesian product and no more
  * than the two intended wide shuffles for the flag block.
  */
class CurationSpec extends SparkTestBase {

  private lazy val funnel =
    ops.Curation.t40_curation_pipeline(spark, sf).collect()

  test("t40: funnel is monotone and every stage does non-vacuous work") {
    assert(funnel.length == 7)
    val docs = funnel.sortBy(_.getInt(0)).map(_.getLong(2))
    val toks = funnel.sortBy(_.getInt(0)).map(_.getLong(3))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a },
      s"docs not monotone: ${docs.toSeq}")
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a },
      s"tokens not monotone: ${toks.toSeq}")
    // every stage must actually drop something on the planted corpus —
    // a stage with zero drops is a vacuous gate (the s19 lesson: a
    // passing hash on empty work proves nothing)
    assert(docs.zip(docs.tail).forall { case (a, b) => b < a },
      s"some stage dropped nothing: ${docs.toSeq}")
    // input = corpus + exact copies + near-dup copies
    val n = Tables.documents(spark, sf).count()
    assert(docs.head == 3 * n)
  }

  test("t40: exact-dedup stage removes every surviving exact copy") {
    // stage 4 drop count must be >= the number of +1M exact copies that
    // survived stages 1-3: an exact copy has the same lang/len/ratio as
    // its original, so survivors come in pairs and every copy must go.
    val d = funnel.sortBy(_.getInt(0)).map(_.getLong(2))
    val s3 = d(3); val s4 = d(4)
    assert(s4 <= s3 - s3 / 3, s"exact dedup too weak: $s3 -> $s4")
  }

  test("t40: plan has no cartesian product and joins nothing") {
    val plan = ops.Curation.t40_curation_pipeline(spark, sf)
      .queryExecution.executedPlan
    def all(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(all)
    val names = all(plan).map(_.nodeName)
    assert(!names.exists(_.contains("CartesianProduct")), names.distinct)
    assert(!names.exists(_.contains("Join")),
      s"single-plan funnel should need no join: ${names.distinct}")
  }

  test("t40: flag block costs exactly its two content-hash window shuffles") {
    val plan = ops.Curation.t40_curation_pipeline(spark, sf)
      .queryExecution.executedPlan.toString
    // the two min-over-survivors windows each repartition by their
    // content key; nothing else in the per-row flag block may shuffle
    // (the funnel rollup's single-partition exchange is 1 row per task)
    assert(plan.contains("Exchange hashpartitioning(h#") ||
      plan.contains("Exchange hashpartitioning(h,"), plan.take(3000))
    assert(plan.contains("Exchange hashpartitioning(sig#") ||
      plan.contains("Exchange hashpartitioning(sig,"), plan.take(3000))
    val nExchanges = "Exchange ".r.findAllIn(plan).length
    assert(nExchanges <= 4,
      s"flag block should shuffle only on h/sig (+tiny rollup): $nExchanges exchanges\n${plan.take(3000)}")
  }

  test("t40: gated compiled sig4 reproduces the ungated HOF funnel exactly") {
    // r22 rewrite lemma, both halves: (1) sig4 is byte-identical to the
    // transform/array_min md5-shingle chain it replaced; (2) gating the
    // signature on f3 (null sig for gate failures) cannot move any stage
    // count — non-f3 rows contribute nothing to min(CASE WHEN f4 ...)
    // and their own f5 is false either way. Proven by replaying the FULL
    // pre-r22 pipeline (ungated HOF sig) and comparing the 7 rows.
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val tri = base
      .unionByName(base.select((col("doc_id") + 1000000L).as("doc_id"),
        col("text"), col("lang"), col("source")))
      .unionByName(base.select((col("doc_id") + 2000000L).as("doc_id"),
        regexp_replace(col("text"), "\\s+\\S+$", "").as("text"),
        col("lang"), col("source")))
    val enr = ops.Curation.statelessGates(tri)
      .withColumn("mds", when(col("ntok") >= 3,
          expr("transform(sequence(0, size(t)-3), " +
            "i -> md5(concat_ws(' ', t[i], t[i+1], t[i+2])))"))
        .otherwise(array(md5(col("text")))))
      .withColumn("sig_hof", concat(
        expr("array_min(transform(mds, m -> substring(m, 1, 8)))"),
        expr("array_min(transform(mds, m -> substring(m, 9, 8)))"),
        expr("array_min(transform(mds, m -> substring(m, 17, 8)))"),
        expr("array_min(transform(mds, m -> substring(m, 25, 8)))")))
      .withColumn("sig_udf", ops.Curation.sig4(col("t"), col("text")))
    // (1) kernel equality on EVERY row (gating aside)
    assert(enr.filter(!(col("sig_udf") <=> col("sig_hof"))).count() == 0,
      "compiled sig4 diverged from the HOF chain")
    // (2) full-funnel equality: ungated HOF windows vs the shipped query
    import org.apache.spark.sql.expressions.Window
    val wH = Window.partitionBy("h")
    val wS = Window.partitionBy("sig_hof")
    val flagged = enr
      .withColumn("f4", col("f3") &&
        col("doc_id") === min(when(col("f3"), col("doc_id"))).over(wH))
      .withColumn("f5", col("f4") &&
        col("doc_id") === min(when(col("f4"), col("doc_id"))).over(wS))
    val oldCounts = flagged.agg(
        count(when(col("f4"), 1)).as("c4"), sum(when(col("f4"), col("ntok"))).as("k4"),
        count(when(col("f5"), 1)).as("c5"), sum(when(col("f5"), col("ntok"))).as("k5"))
      .head()
    val byIdx = funnel.map(r => r.getInt(0) -> r).toMap
    assert((byIdx(4).getLong(2), byIdx(4).getLong(3)) ==
      (oldCounts.getLong(0), oldCounts.getLong(1)), "exact-dedup stage moved")
    assert((byIdx(5).getLong(2), byIdx(5).getLong(3)) ==
      (oldCounts.getLong(2), oldCounts.getLong(3)), "near-dedup stage moved")
  }

  test("t41: plan rates are sane and de upsamples at sf0.001 scale too") {
    val rows = ops.Curation.t41_mixture_plan(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val have = r.getLong(1); val target = r.getLong(3)
      val rate = r.getDouble(4); val epochs = r.getInt(5)
      assert(rate > 0 && rate <= 1.0)
      assert(epochs >= 1)
      assert((epochs > 1) == (target > have),
        s"epochs must flag upsampling: have=$have target=$target epochs=$epochs")
    }
    val w = rows.map(_.getDouble(2)).sum
    assert(math.abs(w - 1.0) < 1e-9, s"weights must sum to 1: $w")
  }

  test("t42: packing conserves tokens; the two-level prefix sum equals a global cumsum") {
    import org.apache.spark.sql.expressions.Window
    val r = ops.Curation.t42_sequence_pack(spark, sf).head()
    val (nDocs, total, nSeq, straddlers, maxPer) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nDocs == Tables.documents(spark, sf).count())
    assert(nSeq == (total - 1) / 2048 + 1, "every token lands in a sequence")
    assert(straddlers < nDocs && straddlers <= nSeq,
      "at most one straddler per cut")
    assert(maxPer >= 1 && maxPer * 1L <= nDocs)
    // independent single-window recomputation (the shape that does NOT
    // scale, used here as the semantic oracle for the bucketed one)
    val toks = Tables.documents(spark, sf).select(col("doc_id"),
      greatest(lit(1L), ceil(coalesce(col("n_chars"), lit(0L)) / 4.0)
        .cast("long")).as("ntok"))
    val naive = toks.withColumn("st",
        coalesce(sum(col("ntok")).over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("straddles",
        floor((col("st") + col("ntok") - 1) / 2048L) =!= floor(col("st") / 2048L))
      .agg(count(when(col("straddles"), 1)).as("n")).head().getLong(0)
    assert(naive == straddlers,
      s"bucketed prefix sum diverged from global cumsum: $naive vs $straddlers")
  }

  test("t43: the hash split is deterministic, disjoint, and train-dominated") {
    val a = ops.Curation.t43_hash_split(spark, sf).collect()
    val b = ops.Curation.t43_hash_split(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "re-running must yield the identical split")
    val byName = a.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.values.sum == Tables.documents(spark, sf).count(),
      "splits must partition the corpus")
    assert(byName("train") > byName.getOrElse("val", 0L) &&
      byName("train") > byName.getOrElse("test", 0L))
    // stability under growth: a doc's split is a pure function of its
    // id, so restricting the corpus must not reassign anyone
    val half = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 0)
      .withColumn("h2", substring(md5(col("doc_id").cast("string")), 1, 2))
      .withColumn("split", when(col("h2") < "03", "test")
        .when(col("h2") < "06", "val").otherwise("train"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(half.values.sum > 0 && half.keySet.subsetOf(byName.keySet))
  }

  test("t45: the dataset card's figures are internally consistent") {
    val r = ops.Curation.t45_dataset_card(spark, sf).head()
    val nDocs = r.getLong(0)
    assert(nDocs == Tables.documents(spark, sf).count())
    assert(r.getLong(4) + r.getLong(5) + r.getLong(6) == nDocs,
      "splits must partition the corpus")
    assert(r.getLong(3) < nDocs, "dup count must be a strict subset")
    assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0)
    assert(r.getDouble(9) > 0.0 && r.getDouble(9) <= 1.0)
    assert(Set("de", "en", "es", "fr", "zh").contains(r.getString(7)))
  }

  test("t46: chunk windows overlap by 16 tokens and cover every token") {
    val chunks = graft.ops.Curation.t46_chunking(spark, sf)
    val toks = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        filter(split(col("text"), "\\s+"), t => t =!= "").as("t"))
      .withColumn("n", size(col("t"))).filter(col("n") > 0)
    val joined = chunks.join(toks, "doc_id")
    // window arithmetic: every chunk is full-width (64) except a
    // document's last, which carries the tail remainder; token coverage
    // is exact: last chunk's end == n
    val bad = joined.filter(
      (col("chunk_idx") * 48 + col("n_tokens")) =!=
        least(col("chunk_idx") * 48 + 64, col("n"))).count()
    assert(bad == 0L, "chunk width must be min(64, remainder)")
    val lastEnd = joined.groupBy("doc_id", "n")
      .agg(max(col("chunk_idx") * 48 + col("n_tokens")).as("end"))
      .filter(col("end") =!= col("n")).count()
    assert(lastEnd == 0L, "the last chunk must end exactly at the token count")
    // overlap: consecutive full chunks share exactly 16 tokens — check
    // via md5 of the shared slice on a sample document with >1 chunk
    val multi = joined.filter(col("n") > 64).limit(1)
      .select(col("doc_id"), col("t")).collect()
    if (multi.nonEmpty) {
      val t = multi.head.getSeq[String](1)
      val c0 = t.slice(0, 64)
      val c1 = t.slice(48, Math.min(48 + 64, t.length))
      assert(c0.takeRight(16) == c1.take(16), "16-token overlap")
    }
    // deterministic: same rows on re-run
    assert(chunks.collect().toSeq == graft.ops.Curation
      .t46_chunking(spark, sf).collect().toSeq)
  }

  test("t47: planted PII is counted and redacted; no raw pattern survives") {
    val out = graft.ops.Curation.t47_pii_redaction(spark, sf)
    val planted = out.filter(col("doc_id") >= 1000000L)
    assert(planted.count() > 0, "planting must fire")
    // every planted row carries at least the synthesized email+ssn+phone
    assert(planted.filter(col("n_emails") < 1 || col("n_ssns") < 1 ||
      col("n_phones") < 1).count() == 0)
    // and the redacted text itself contains no surviving raw pattern —
    // recompute the scrub and re-count on the redacted side
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val doc = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
    val redone = doc.filter(col("doc_id") % 50 === 0)
      .select(concat(lit("contact u"), col("doc_id"), lit("@example.com or "),
        lit("415-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ssn 123-45-6789 "), col("t")).as("t"))
      .select(regexp_replace(regexp_replace(regexp_replace(col("t"),
        email, "<EMAIL>"), "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
        "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>").as("r"))
    assert(redone.filter(regexp_count(col("r"), lit(email)) > 0).count() == 0,
      "raw emails survived the scrub")
    assert(redone.filter(col("r").rlike("\\b\\d{3}-\\d{2}-\\d{4}\\b")).count()
      == 0, "raw SSNs survived the scrub")
  }

  test("t48: the tokenized corpus is computed once, not per branch") {
    // four branches (budget agg, histogram, fullSel, boundarySel) read
    // the toks frame; the memoized persist must replace every branch's
    // documents scan with the shared cached relation — ONE corpus pass
    // per action (the r12 verdict's perf-weak finding)
    val df = graft.ops.Curation.t48_budget_selection(spark, sf)
    df.head() // materialize the memoized frame
    // assert on the OPTIMIZED LOGICAL plan: collect() does not descend
    // into InMemoryRelation's innerChildren (the one real scan lives
    // there), so any documents.parquet file relation found in the tree
    // is a branch that bypassed the shared cache
    val lp = df.queryExecution.optimizedPlan
    val memRelations = lp.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m }
    val docFileScans = lp.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case _ => ""
        }
    }.filter(_.contains("documents.parquet"))
    assert(memRelations.nonEmpty, lp.treeString.take(3000))
    assert(docFileScans.isEmpty,
      s"t48's plan still file-scans documents.parquet " +
        s"${docFileScans.length} time(s) outside the cache — branches not shared")
  }

  test("t48: two-level budget selection equals the naive global-sort greedy") {
    val r = graft.ops.Curation.t48_budget_selection(spark, sf).head()
    val (n, tok, budget) = (r.getLong(0), r.getLong(1), r.getLong(4))
    assert(n > 0 && tok <= budget, s"selection must respect the budget: $r")
    // a budget is BINDING at 25%: something must also be excluded
    val total = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).count()
    assert(n < total, "the budget must exclude some documents")
    // the naive replay INSIDE Spark: one global cumsum window — the
    // single-partition shape the two-level form avoids — must select
    // the identical set (checksum + counts)
    val toks = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        filter(split(col("text"), "\\s+"), t => t =!= "").as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), size(col("t")).cast("long").as("ntok"),
        round(size(array_distinct(col("t"))) / size(col("t")), 3).as("q"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("q").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = toks.withColumn("run", sum(col("ntok")).over(w))
      .filter(col("run") <= lit(budget))
      .agg(count(lit(1)), sum(col("ntok")), sum(col("doc_id"))).head()
    assert((naive.getLong(0), naive.getLong(1), naive.getLong(2)) ==
      (n, tok, r.getLong(2)), s"two-level != naive: $naive vs $r")
  }

  test("t44: planted contamination is found through shingle overlap, not identity") {
    val r = ops.Curation.t44_decontamination(spark, sf).collect()
    val total = r.map(_.getLong(1)).sum
    val hit = r.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, sf).count())
    // every eval doc's own source document (doc_id % 20 == 0 with ≥5
    // prompt tokens) must be flagged — the prompt IS its prefix
    val plantable = Tables.documents(spark, sf)
      .filter(col("doc_id") % 20 === 0 &&
        size(split(col("text"), " ")) >= 5).count()
    assert(hit >= plantable, s"flagged $hit < $plantable planted sources")
    assert(hit < total, "flagging everything means the filter is vacuous")
    r.foreach(row => assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0))
  }
}
