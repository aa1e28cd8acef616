package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.8 F1–F14) — the extraction
  * workhorses — plus the as-of join (§2.3 J8).
  *
  * All of these are built-in codegen'd expressions (no UDFs), so they fuse
  * into WholeStageCodegen with the surrounding scan/filter/project — the
  * per-row cost is a handful of JIT'd instructions regardless of data size.
  */
object Scalars {

  /** F1: regexp_extract / regexp_extract_all / regexp_replace over document
    * text (the spec's "Enfoque 1: Regex", TEST:81-82). */
  def f1_regex(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        regexp_extract(col("text"), "^(\\w+)", 1).as("first_token"),
        size(regexp_extract_all(col("text"), lit("(the|an?)\\b"), lit(0))).as("n_articles"),
        regexp_replace(col("text"), "\\d+", "#").as("digits_masked"))
      .filter(col("doc_id") <= 200)
      .orderBy("doc_id")

  /** F2: filename-metadata parse — `sedar__<company>__technical-report__
    * <HEX8>.pdf` (reference .MISSING_LARGE_BLOBS:1-4 naming scheme),
    * synthesized deterministically then parsed back with one regex. */
  def f2_filename_parse(s: SparkSession, d: String): DataFrame = {
    val fname = concat(lit("sedar__"), col("source"),
      lit("__technical-report__"),
      upper(substring(md5(col("doc_id").cast("string")), 1, 8)), lit(".pdf"))
    documents(s, d)
      .select(col("doc_id"), fname.as("fname"))
      .select(col("doc_id"), col("fname"),
        regexp_extract(col("fname"), "^([a-z]+)__", 1).as("source_system"),
        regexp_extract(col("fname"), "^[a-z]+__(.+?)__", 1).as("company"),
        regexp_extract(col("fname"), "__([0-9A-F]{8})\\.pdf$", 1).as("doc_hash"))
      .filter(col("doc_id") <= 100)
      .orderBy("doc_id")
  }

  /** F3: number normalization — `"1,893" → 1893.0` comma-stripping + cast
    * (the PDF table number format, reference PDF p.9). */
  def f3_number_norm(s: SparkSession, d: String): DataFrame = {
    val raw = concat(col("user_id").cast("string"), lit(","),
      lpad((col("event_id") % 1000).cast("string"), 3, "0"))
    events(s, d)
      .select(col("event_id"), raw.as("raw"),
        regexp_replace(raw, ",", "").cast("double").as("parsed"),
        regexp_extract(col("props"), "([0-9]+)", 1).cast("double").as("k_value"))
      .filter(col("event_id") <= 300)
      .orderBy("event_id")
  }

  /** F4: unit conversions — Mt→t and contained-ounce arithmetic
    * (oz = tonnes × g/t ÷ 31.1034768; reference PDF p.9 Table 1-2). */
  def f4_units(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_orderkey") <= 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity") * 1e6, 1).as("tonnes"),
        round(col("l_discount") * 100, 4).as("grade_gpt"))
      .withColumn("contained_oz",
        round(col("tonnes") * col("grade_gpt") / lit(graft.Units.GramsPerTroyOunce), 2))
      .orderBy("l_orderkey", "l_linenumber")

  /** F5: string toolkit — cleanup primitives for extracted fragments. */
  def f5_strings(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .filter(col("c_custkey") <= 300)
      .select(col("c_custkey"),
        lower(col("c_name")).as("lc"),
        upper(col("c_mktsegment")).as("uc"),
        trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"),
        substring(col("c_name"), 1, 8).as("prefix"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        lpad(col("c_custkey").cast("string"), 9, "0").as("padded"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
        reverse(col("c_mktsegment")).as("reversed"),
        length(col("c_name")).as("name_len"))
      .orderBy("c_custkey")

  /** F6: fuzzy matching — levenshtein distance for company-name
    * reconciliation (reference PDF p.20 §6.1 ownership history). */
  def f6_fuzzy(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_mktsegment")).distinct()
      .select(col("c_mktsegment"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("dist_building"),
        levenshtein(lower(col("c_mktsegment")), lit("machinery")).as("dist_machinery"))
      .orderBy("c_mktsegment")

  /** F7: date parsing & arithmetic — multi-format to_date fallback via
    * coalesce (TEST:36 "Effective September 30, 2023" prose dates). */
  def f7_dates(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderkey") <= 300)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"),
        year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2002"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3mo"))
      .orderBy("o_orderkey")

  /** F7b: prose-date parsing with explicit patterns + fallback chain. */
  def f7_parse_prose_dates(s: SparkSession, d: String): DataFrame = {
    val prose = date_format(col("o_orderdate"), "MMMM d, yyyy")
    val iso = date_format(col("o_orderdate"), "yyyy-MM-dd")
    orders(s, d)
      .filter(col("o_orderkey") <= 100)
      .select(col("o_orderkey"), prose.as("prose"),
        coalesce(
          try_to_date(prose, "yyyy/MM/dd"),   // wrong pattern → null (ANSI-safe)
          try_to_date(prose, "MMMM d, yyyy"), // matches
          try_to_date(iso, "yyyy-MM-dd")).as("parsed"))
      .orderBy("o_orderkey")
  }

  /** F8: math — round/abs/pow/ln/greatest/least + null-safe division. */
  def f8_math(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_orderkey") <= 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("rounded"),
        abs(col("l_discount") - 0.05).as("abs_c"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
        round(log(col("l_extendedprice") + 1), 6).as("ln_price"),
        greatest(col("l_quantity"), col("l_tax") * 100).as("gr"),
        least(col("l_quantity"), col("l_discount") * 100).as("le"),
        try_divide(col("l_extendedprice"), col("l_quantity") - col("l_quantity")).as("div0_null"))
      .orderBy("l_orderkey", "l_linenumber")

  /** F9: CASE/WHEN canonicalization (category enums, TEST:39/45). */
  def f9_case(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
          .when(col("o_orderpriority") === "3-MEDIUM", "warm")
          .otherwise("cold").as("urgency"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy("urgency")

  /** F10: array higher-order functions over tokenized text. Array-typed
    * results are serialized with concat_ws in the final projection — the
    * driver's pandas compare cannot sort/hash raw ndarray cells; the HOFs
    * themselves still run on real arrays. */
  def f10_arrays(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    documents(s, d)
      .filter(col("doc_id") <= 200)
      .select(col("doc_id"),
        size(toks).as("n_toks"),
        array_contains(toks, "the").as("has_the"),
        concat_ws(",", slice(array_sort(toks), 1, 3)).as("first3_sorted"),
        concat_ws(",", transform(slice(toks, 1, 3), x => upper(x))).as("head_uc"),
        aggregate(transform(toks, x => length(x)), lit(0),
          (acc, x) => acc + x).as("total_chars"),
        concat_ws(",", filter(toks, x => length(x) > 4)).as("long_toks"))
      .orderBy("doc_id")
  }

  /** F10b: generators — explode_outer (null-preserving unnest), inline
    * (struct-array to columns), stack (columns to rows): the UDTF surface
    * without a custom Generator (SURVEY §2.11 E3). */
  def f10_generators(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
      .filter(col("doc_id") <= 100)
      // empty array for every 10th doc: explode_outer must keep the row
      .withColumn("tags", when(col("doc_id") % 10 === 0, array().cast("array<string>"))
        .otherwise(array(col("lang"), col("source"))))
    base.select(col("doc_id"), explode_outer(col("tags")).as("tag"))
      .unionByName(
        base.select(col("doc_id"),
          expr("stack(2, 'lang', lang, 'source', source)").as(Seq("k", "v")))
          .select(col("doc_id"), concat_ws("=", col("k"), col("v")).as("tag")))
      .orderBy(col("doc_id").asc, col("tag").asc_nulls_first)
  }

  /** F11: map functions — build a map, explode to key/value rows. */
  def f11_maps(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_id") <= 100)
      .select(col("event_id"),
        map(lit("type"), col("event_type"),
            lit("user"), col("user_id").cast("string")).as("m"))
      .select(col("event_id"), explode(col("m")).as(Seq("k", "v")))
      .orderBy("event_id", "k")

  /** F12: JSON functions — parse events.props `{"k": 87}` payloads. */
  def f12_json(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_id") <= 300)
      .select(col("event_id"), col("props"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("k_typed"))
      .orderBy("event_id")

  /** F13: hashing — md5 / sha2 content fingerprints (dedup + doc ids). */
  def f13_hash(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("doc_id") <= 100)
      .select(col("doc_id"),
        md5(col("text")).as("md5_hex"),
        sha2(col("text"), 256).as("sha256_hex"),
        length(md5(col("text"))).as("md5_len"))
      .orderBy("doc_id")

  /** F14: surrogate ids — nondeterministic values, deterministic INVARIANT:
    * ids are unique, so the differential check compares the invariant. */
  def f14_surrogate_ids(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("mid", monotonically_increasing_id())
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("mid")).as("n_distinct_ids"))
      .select(col("n_rows"), (col("n_rows") === col("n_distinct_ids")).as("all_unique"))

  /** J8: AS-OF join — for each purchase, the latest click at-or-before it
    * by the same user. Implemented the scalable way: tag + union + one
    * window pass carrying the last click forward (single shuffle on
    * user_id; no non-equi join blow-up — at 100 TB a range join here
    * would be quadratic per user). */
  def j8_asof_join(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("kind"),
        col("event_id").as("click_id"), lit(null).cast("long").as("purchase_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("kind"),
        lit(null).cast("long").as("click_id"), col("event_id").as("purchase_id"))
    // kind orders clicks before purchases at equal ts => "at-or-before"
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("kind").asc, col("click_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn("last_click", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("purchase_id").isNotNull)
      .select(col("user_id"), col("purchase_id"), col("last_click"))
      .orderBy("user_id", "purchase_id")
  }

  /** F15: date-spine gap fill — the time-series resample idiom: a
    * complete month spine (fixed 1995-01..2001-08 range — data-
    * independent literals) cross-joined with the priority dimension,
    * LEFT-joined to the monthly aggregate, absent months coalesced to
    * zero. Reporting over sparse series breaks without this (a missing
    * month silently disappears from a chart; a window over months
    * misaligns). Scale shape: the spine is 80 rows × 5 priorities —
    * broadcast; the fact aggregates BEFORE the join, so the spine join
    * touches group-count rows, never the fact table. */
  def f15_date_spine(s: SparkSession, d: String): DataFrame = {
    val spine = s.range(1).select(explode(expr(
      "sequence(timestamp'1995-01-01', timestamp'2001-08-01', interval 1 month)")).as("month"))
      .crossJoin(s.range(1).select(explode(array(
        lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"), lit("4-NOT SPECIFIED"),
        lit("5-LOW"))).as("priority")))
    val monthly = orders(s, d)
      // a selective filter leaves genuinely empty (priority, month) cells
      // at every SF — the gaps this operator exists to make visible
      .filter(col("o_totalprice") > 4800.0)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("rev"))
    spine.join(monthly, Seq("month", "priority"), "left")
      .select(col("month").cast("date").as("month"), col("priority"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        coalesce(col("rev"), lit(0.0)).as("revenue"))
      .orderBy("priority", "month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f1_regex" -> (f1_regex _),
    "f2_filename_parse" -> (f2_filename_parse _),
    "f3_number_norm" -> (f3_number_norm _),
    "f4_units" -> (f4_units _),
    "f5_strings" -> (f5_strings _),
    "f6_fuzzy" -> (f6_fuzzy _),
    "f7_dates" -> (f7_dates _),
    "f7_parse_prose_dates" -> (f7_parse_prose_dates _),
    "f8_math" -> (f8_math _),
    "f9_case" -> (f9_case _),
    "f10_arrays" -> (f10_arrays _),
    "f10_generators" -> (f10_generators _),
    "f11_maps" -> (f11_maps _),
    "f12_json" -> (f12_json _),
    "f13_hash" -> (f13_hash _),
    "f14_surrogate_ids" -> (f14_surrogate_ids _),
    "f15_date_spine" -> (f15_date_spine _),
    "j8_asof_join" -> (j8_asof_join _),
  )

  val oracle: Map[String, String] = Map(
    "f1_regex" ->
      """SELECT doc_id, regexp_extract(text, '^(\w+)', 1) AS first_token,
         CAST(len(regexp_extract_all(text, '(the|an?)\b')) AS INT) AS n_articles,
         regexp_replace(text, '\d+', '#', 'g') AS digits_masked
         FROM documents WHERE doc_id <= 200 ORDER BY doc_id""",
    "f2_filename_parse" ->
      """WITH f AS (SELECT doc_id,
           'sedar__' || source || '__technical-report__' ||
           upper(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) || '.pdf' AS fname
         FROM documents WHERE doc_id <= 100)
         SELECT doc_id, fname,
           regexp_extract(fname, '^([a-z]+)__', 1) AS source_system,
           regexp_extract(fname, '^[a-z]+__(.+?)__', 1) AS company,
           regexp_extract(fname, '__([0-9A-F]{8})\.pdf$', 1) AS doc_hash
         FROM f ORDER BY doc_id""",
    "f3_number_norm" ->
      """WITH r AS (SELECT event_id,
           CAST(user_id AS VARCHAR) || ',' || lpad(CAST(event_id % 1000 AS VARCHAR), 3, '0') AS raw,
           props FROM events WHERE event_id <= 300)
         SELECT event_id, raw,
           CAST(regexp_replace(raw, ',', '', 'g') AS DOUBLE) AS parsed,
           CAST(regexp_extract(props, '([0-9]+)', 1) AS DOUBLE) AS k_value
         FROM r ORDER BY event_id""",
    "f4_units" ->
      """SELECT l_orderkey, l_linenumber,
         round(l_quantity * 1e6, 1) AS tonnes,
         round(l_discount * 100, 4) AS grade_gpt,
         round((l_quantity * 1e6) * (l_discount * 100) / 31.1034768, 2) AS contained_oz
         FROM lineitem WHERE l_orderkey <= 200 ORDER BY l_orderkey, l_linenumber""",
    "f5_strings" ->
      """SELECT c_custkey, lower(c_name) AS lc, upper(c_mktsegment) AS uc,
         trim('  ' || c_name || '  ') AS trimmed,
         substr(c_name, 1, 8) AS prefix,
         concat_ws('|', c_mktsegment, c_name) AS joined,
         lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded,
         translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
         reverse(c_mktsegment) AS reversed,
         CAST(length(c_name) AS INTEGER) AS name_len
         FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""",
    "f6_fuzzy" ->
      """SELECT c_mktsegment,
         CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS dist_building,
         CAST(levenshtein(lower(c_mktsegment), 'machinery') AS INTEGER) AS dist_machinery
         FROM (SELECT DISTINCT c_mktsegment FROM customer)
         ORDER BY c_mktsegment""",
    "f7_dates" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
         year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr, month(o_orderdate) AS mo,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
         CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3mo
         FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""",
    "f7_parse_prose_dates" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%B %-d, %Y') AS prose,
         CAST(o_orderdate AS DATE) AS parsed
         FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""",
    "f8_math" ->
      """SELECT l_orderkey, l_linenumber,
         round(l_extendedprice, 1) AS rounded,
         abs(l_discount - 0.05) AS abs_c,
         round(pow(l_quantity, 2), 2) AS qty_sq,
         round(ln(l_extendedprice + 1), 6) AS ln_price,
         greatest(l_quantity, l_tax * 100) AS gr,
         least(l_quantity, l_discount * 100) AS le,
         l_extendedprice / nullif(l_quantity - l_quantity, 0) AS div0_null
         FROM lineitem WHERE l_orderkey <= 200 ORDER BY l_orderkey, l_linenumber""",
    "f9_case" ->
      """SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hot'
                     WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
                     ELSE 'cold' END AS urgency,
         count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY 1 ORDER BY urgency""",
    "f10_arrays" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE doc_id <= 200)
         SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_toks,
           list_contains(toks, 'the') AS has_the,
           array_to_string(list_sort(toks)[1:3], ',') AS first3_sorted,
           array_to_string(list_transform(toks[1:3], x -> upper(x)), ',') AS head_uc,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS INTEGER) AS total_chars,
           array_to_string(list_filter(toks, x -> length(x) > 4), ',') AS long_toks
         FROM t ORDER BY doc_id""",
    "f10_generators" ->
      """WITH base AS (
           SELECT doc_id, lang, source,
             CASE WHEN doc_id % 10 = 0 THEN [] ELSE [lang, source] END AS tags
           FROM documents WHERE doc_id <= 100),
         ex AS (
           SELECT doc_id, CASE WHEN len(tags) = 0 THEN NULL ELSE unnest(tags) END AS tag
           FROM base WHERE len(tags) > 0
           UNION ALL
           SELECT doc_id, NULL AS tag FROM base WHERE len(tags) = 0),
         st AS (
           SELECT doc_id, 'lang=' || lang AS tag FROM base
           UNION ALL
           SELECT doc_id, 'source=' || source AS tag FROM base)
         SELECT doc_id, tag FROM (SELECT * FROM ex UNION ALL SELECT * FROM st)
         ORDER BY doc_id ASC, tag ASC NULLS FIRST""",
    "f11_maps" ->
      """SELECT event_id, k, v FROM (
           SELECT event_id, 'type' AS k, event_type AS v FROM events WHERE event_id <= 100
           UNION ALL
           SELECT event_id, 'user' AS k, CAST(user_id AS VARCHAR) AS v FROM events WHERE event_id <= 100)
         ORDER BY event_id, k""",
    "f12_json" ->
      """SELECT event_id, props,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
         FROM events WHERE event_id <= 300 ORDER BY event_id""",
    "f13_hash" ->
      """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex,
         CAST(length(md5(text)) AS INTEGER) AS md5_len
         FROM documents WHERE doc_id <= 100 ORDER BY doc_id""",
    "f14_surrogate_ids" ->
      """SELECT count(*) AS n_rows, TRUE AS all_unique FROM documents""",
    "f15_date_spine" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
             TIMESTAMP '2001-08-01', INTERVAL 1 MONTH)) AS month),
         prio AS (
           SELECT unnest(['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']) AS priority),
         monthly AS (
           SELECT date_trunc('month', o_orderdate) AS month,
             o_orderpriority AS priority,
             count(*) AS n, round(sum(o_totalprice), 2) AS rev
           FROM orders WHERE o_totalprice > 4800.0
           GROUP BY 1, 2)
         SELECT CAST(spine.month AS DATE) AS month, prio.priority,
           coalesce(n, 0) AS n_orders,
           coalesce(rev, 0.0) AS revenue
         FROM spine CROSS JOIN prio
         LEFT JOIN monthly ON monthly.month = spine.month
           AND monthly.priority = prio.priority
         ORDER BY prio.priority, month""",
    "j8_asof_join" ->
      """WITH u AS (
           SELECT user_id, ts, 0 AS kind, event_id AS click_id, NULL::BIGINT AS purchase_id
           FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, ts, 1 AS kind, NULL::BIGINT AS click_id, event_id AS purchase_id
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, purchase_id,
           last_value(click_id IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts ASC, kind ASC, click_id ASC NULLS LAST
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
           FROM u)
         SELECT user_id, purchase_id, last_click FROM c
         WHERE purchase_id IS NOT NULL ORDER BY user_id, purchase_id""",
  )
}
