package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming operators in their batch-equivalent form (SURVEY.md §2.10
  * X1–X5, X6, X7, X10) — the same expressions run unchanged under
  * readStream (see graft.streaming.Streams for the streaming wiring +
  * watermarks). Batch form keeps them DuckDB-oracle-able; X8 runs a
  * REAL bounded stream under the oracle gate (`x8_stream_ingest`); the
  * remaining streaming-only semantics (the stateful X6 forms, X9) are
  * covered by MemoryStream ScalaTests instead.
  */
object Streaming {

  /** Events-corpus memo: every x-family query scans the same events
    * table, and the bench runs the family back-to-back (2 reps each) —
    * one session-scoped persisted frame serves them all instead of 16
    * parquet scans + NANOS conversions (FrameMemo semantics: listing
    * fingerprint staleness, stopped-session sweep). The streaming twins
    * are untouched — they take their input frame as a parameter. At
    * 100 TB a raw fact table would stay on disk and the memo would hold
    * the SHARED DERIVED frames instead; MEMORY_AND_DISK spills rather
    * than OOMs if the corpus outgrows executor memory either way. */
  private val eventsMemo = new FrameMemo("events.parquet")((s, d) => events(s, d))
  private def ev(s: SparkSession, d: String): DataFrame = eventsMemo(s, d)

  /** X1: tumbling window — events per type per hour. window() is the same
    * expression streaming uses; start is emitted as a string for
    * cross-engine timestamp parity. */
  def x1_tumbling_window(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").cast("string").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy("hour_start", "event_type")

  /** X2: sliding window — 1-hour window sliding every 15 minutes (each
    * event lands in 4 overlapping windows). */
  def x2_sliding_window(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("string").as("win_start"), col("n"))
      .orderBy("win_start")

  /** X3: session window — per-user sessions with a 30-minute inactivity
    * gap. session_window end = last event + gap, which the oracle
    * reproduces with the lag-gap-cumsum idiom. */
  def x3_session_window(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"), col("w.start").cast("string").as("session_start"),
        col("w.end").cast("string").as("session_end"), col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")

  /** X4 (batch-equivalent form): late-data accounting — exactly the rows
    * a 10-minute watermark would DROP, under the oracle gate. Streaming
    * drop semantics need an arrival order, so one is simulated with a
    * bounded deterministic delivery jitter (0–20 min: `(event_id *
    * 2654435761) % 1200` seconds, a Knuth-multiplier spread — pure
    * function of the row, so both engines derive the identical order).
    * The watermark before each arrival is max(event time) over all
    * strictly-earlier arrivals minus 10 min; a row is late iff its event
    * time is below that — the ROW-level watermark rule, exactly what the
    * stateful operators enforce when filtering input (StreamingSpec
    * proves row-for-row parity against a row-at-a-time MemoryStream).
    * Windowed finalization (Streams.tumblingCounts) compares the same
    * watermark against the WINDOW end — coarser by at most one window. The arrival-order running max — inherently a
    * sequential definition — is computed scalably in two levels: a
    * partitioned window inside per-hour arrival buckets, plus a
    * cross-bucket prefix on the one-row-per-hour frame (the only
    * single-partition window, bounded by the corpus's hour span, then
    * broadcast back). Lateness mass is reported in exact integer
    * microseconds so the hash gate has no float tail to disagree on. */
  def x4_late_data(s: SparkSession, d: String): DataFrame = {
    val f = ev(s, d)
      .withColumn("arr_ts", expr(
        "ts + make_interval(0, 0, 0, 0, 0, 0, (event_id * 2654435761) % 1200)"))
      .withColumn("bkt", expr("unix_micros(arr_ts) div 3600000000"))
    val wB = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val prefix = f.groupBy("bkt").agg(max("ts").as("bmax"))
      .withColumn("prev_bkt_max", max(col("bmax")).over(wB))
      .select("bkt", "prev_bkt_max")
    val wIn = Window.partitionBy("bkt").orderBy(col("arr_ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    f.join(broadcast(prefix), "bkt")
      .withColumn("wm",
        greatest(max(col("ts")).over(wIn), col("prev_bkt_max"))
          - expr("interval 10 minutes"))
      .filter(col("ts") < col("wm"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_late"),
        sum(unix_micros(col("wm")) - unix_micros(col("ts"))).as("total_late_us"))
      .orderBy("event_type")
  }

  /** X5 (batch-equivalent form): streaming dedup within the watermark
    * horizon, under the oracle gate. The feed simulates at-least-once
    * delivery deterministically: every event once, plus redeliveries of
    * event_id % 10 == 0 at +5 min and event_id % 7 == 0 at +30 min
    * (event time = redelivery time, arrival order = event-time order).
    * `dropDuplicatesWithinWatermark("event_id")` with a 10-min watermark
    * keeps a key's state until the watermark passes firstSeen + 10 min,
    * and on an event-time-sorted feed the watermark at a redelivery with
    * event time t is t − 10 min (the continuous-arrival limit:
    * micro-batching lags it by at most one inter-arrival gap, seconds
    * here vs the 10–15 min margins the feed's offsets leave) — so a
    * duplicate is dropped iff it arrives within 2×10 min of the
    * original's event time: the +5 min redeliveries die, the +30 min
    * ones survive (state already evicted,
    * exactly the at-least-once seam the streaming API documents). That
    * closed-form rule is what this batch twin computes, with one
    * partitioned min-window per key — no sequential scan needed. */
  def x5_stream_dedup(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d).select(col("event_id"), col("event_type"), col("ts"))
    val feed = e
      .unionByName(e.filter(col("event_id") % 10 === 0)
        .withColumn("ts", col("ts") + expr("interval 5 minutes")))
      .unionByName(e.filter(col("event_id") % 7 === 0)
        .withColumn("ts", col("ts") + expr("interval 30 minutes")))
    val kept = col("ts") === col("first_ts") ||
      col("ts") > col("first_ts") + expr("interval 20 minutes")
    feed.withColumn("first_ts", min(col("ts")).over(Window.partitionBy("event_id")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_delivered"),
        count(when(kept, 1)).as("n_kept"))
      .withColumn("n_dropped", col("n_delivered") - col("n_kept"))
      .orderBy("event_type")
  }

  /** X6 (batch form): funnel — users progressing signup → view → purchase
    * in timestamp order. The stateful streaming twin is
    * graft.streaming.Streams.funnelStateful. */
  def x6_funnel(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      .agg(
        count(col("first_signup")).as("n_signed_up"),
        count(when(col("first_view") > col("first_signup"), lit(1))).as("n_viewed_after"),
        count(when(col("first_purchase") > col("first_view")
          && col("first_view") > col("first_signup"), lit(1))).as("n_full_funnel"))

  /** X7: stream-static join (batch form) — enrich events with the static
    * customer dim. NO broadcast hint (r20 verdict finding #2): customer
    * is sf-proportional (sf×150k rows), so a pinned broadcast dies at
    * the 100 TB design point; the planner picks broadcast itself while
    * the dim fits (it does at every harness sf — ScaleDesignSpec pins
    * that), and the true streaming form re-broadcasts per micro-batch
    * only when the planner so chooses, for the same reason. */
  def x7_stream_static_join(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .join(customer(s, d), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("c_mktsegment")

  /** X10 (batch form): stream-stream interval join — every purchase
    * matched to the same user's clicks in the preceding 30 minutes
    * (the attribution-candidate join). This batch form is the oracle
    * anchor; the streaming form (`Streams.intervalJoin`) is the SAME
    * join condition with watermarks on both sides, which is what lets
    * Spark bound the join state (a click older than the watermark +
    * 30 min can never match a future purchase and is evicted).
    * The equi-key (user_id) carries the shuffle; the time bound is a
    * post-match band predicate, never a blowup. */
  def x10_interval_join(s: SparkSession, d: String): DataFrame = {
    val evts = ev(s, d)
    val clicks = evts.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val purchases = evts.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    purchases
      .join(clicks, col("c_user") === col("user_id") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("interval 30 minutes"))
      .groupBy(col("purchase_id"), col("user_id"))
      .agg(count(lit(1)).as("n_clicks_before"),
        min(col("click_id")).as("first_click_id"))
      .orderBy("purchase_id")
  }

  /** X8 fixture: a REAL Structured Streaming ingest — the events
    * corpus staged as a file-source directory, tailed with
    * `Trigger.AvailableNow` through [[graft.streaming.Streams.appendSink]]
    * (foreachBatch → manifest append with per-batch txn watermarks)
    * into an append table. Bounded and exactly-once, so the result
    * table is deterministic and the ORACLE GATE applies to a streaming
    * sink for the first time: every prior X-sink stayed test-only. */
  private val ingestDemo = new graft.FixtureMemo((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("graft_x8_").toString
      // staged corpus + checkpoint + table are session-scoped scratch;
      // delete on JVM exit so repeated harness sessions don't accrete
      // corpus-sized copies in /tmp (the Sources.tmp discipline)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator()
            .asScala.toSeq.reverseIterator.foreach(p => p.toFile.delete())
        } catch { case _: Throwable => () }))
      val src = s"$root/src"; val tbl = s"$root/tbl"; val ck = s"$root/ck"
      val staged = ev(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      staged.write.parquet(src)
      graft.streaming.Streams.appendSink(
        s.readStream.schema(staged.schema).parquet(src),
        tbl, ck, statsCols = Seq("event_id"))
      tbl
  })

  /** X9 fixture: TWO AvailableNow streaming passes through the
    * idempotent upsert sink ([[graft.streaming.Streams.upsertSink]] —
    * the MergeInto kernel with an event-time tie order). Pass 1
    * streams the whole corpus into a fresh bucketed table (all
    * inserts); pass 2 streams a CDC changeset — every `purchase`
    * becomes a TOMBSTONE (user_id flagged -1, consumed by
    * `deleteWhen`), and every `user_id % 7 == 0` event re-arrives with
    * `value + 100` (an update: whole-row replace by key). Each
    * event_id appears at most once per pass, so the final table is
    * batching-invariant — however the source splits micro-batches,
    * the per-key outcome is the same. */
  private val upsertDemo = new graft.FixtureMemo((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("graft_x9_").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator()
            .asScala.toSeq.reverseIterator.foreach(p => p.toFile.delete())
        } catch { case _: Throwable => () }))
      val tbl = s"$root/tbl"
      val base = ev(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts"), col("value"))
      base.write.parquet(s"$root/src1")
      graft.streaming.Streams.upsertSink(
        s.readStream.schema(base.schema).parquet(s"$root/src1"),
        tbl, s"$root/ck1", nBuckets = 8,
        deleteWhen = col("user_id") < 0)
      val changes = base
        .filter(col("event_type") === "purchase" || col("user_id") % 7 === 0)
        .select(col("event_id"),
          when(col("event_type") === "purchase", lit(-1L))
            .otherwise(col("user_id")).as("user_id"),
          col("event_type"), col("ts"),
          when(col("event_type") =!= "purchase", col("value") + 100.0)
            .otherwise(col("value")).as("value"))
      changes.write.parquet(s"$root/src2")
      graft.streaming.Streams.upsertSink(
        s.readStream.schema(base.schema).parquet(s"$root/src2"),
        tbl, s"$root/ck2", nBuckets = 8,
        deleteWhen = col("user_id") < 0)
      tbl
  })

  /** X9: the idempotent streaming upsert sink under the oracle gate —
    * after an insert pass and a CDC pass (updates + tombstones), the
    * table must equal the SQL reconstruction: purchases gone, the
    * `user_id % 7` slice re-valued, everything else untouched. The
    * kernel itself (markers, window dedup, O(touched buckets) rewrite)
    * is s16's, oracle-green there; this row proves the STREAMING wiring
    * — checkpointed AvailableNow passes through foreachBatch —
    * delivers the same table. */
  def x9_upsert_stream(s: SparkSession, d: String): DataFrame = {
    val tbl = upsertDemo(s, d)
    graft.streaming.Streams.readUpserted(s, tbl)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"),
        sum(col("event_id")).as("id_checksum"))
      .orderBy("event_type")
  }

  /** X15 fixture: the corpus streamed into a graft table through the
    * NATIVE streaming write path — `writeStream.format("graft")`,
    * executor task writers, exactly-once epoch commits
    * ([[graft.sources.GraftStreamingWrite]]) — no foreachBatch loop. */
  private val nativeWriteDemo = new graft.FixtureMemo((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("graft_x15_").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator()
            .asScala.toSeq.reverseIterator.foreach(p => p.toFile.delete())
        } catch { case _: Throwable => () }))
      val src = s"$root/src"; val tbl = s"$root/tbl"; val ck = s"$root/ck"
      val staged = ev(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      staged.write.parquet(src)
      val q = s.readStream.schema(staged.schema).parquet(src)
        .writeStream.format("graft").option("path", tbl)
        .option("statsCols", "event_id")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      tbl
  })

  /** X15: NATIVE streaming write (`writeStream.format("graft")` —
    * executor task-writer commits, exactly-once epochs) under the
    * oracle gate: the streamed-in table must equal the corpus exactly,
    * like x8's foreachBatch route but through the engine's own
    * `StreamingWrite`. */
  def x15_stream_table_write(s: SparkSession, d: String): DataFrame = {
    val tbl = nativeWriteDemo(s, d)
    graft.sources.ManifestTable.read(s, tbl)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"),
        sum(col("event_id")).as("id_checksum"))
      .orderBy("event_type")
  }

  /** X16 fixture: the corpus streamed into a CLUSTERED graft table
    * through the native streaming write — the write declares
    * `RequiresDistributionAndOrdering` (ordered on `event_id`, k
    * partitions), Spark plans the per-epoch range shuffle, and each
    * epoch lands as ≤k disjoint sorted range dirs with per-dir
    * task-computed stats ([[graft.sources.GraftStreamingWrite]]). */
  private val clusteredWriteDemo = new graft.FixtureMemo((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("graft_x16_").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator()
            .asScala.toSeq.reverseIterator.foreach(p => p.toFile.delete())
        } catch { case _: Throwable => () }))
      val src = s"$root/src"; val tbl = s"$root/tbl"; val ck = s"$root/ck"
      val staged = ev(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      staged.write.parquet(src)
      val q = s.readStream.schema(staged.schema).parquet(src)
        .writeStream.format("graft").option("path", tbl)
        .option("clusterBy", "event_id")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      tbl
  })

  /** X16: native streaming write to a CLUSTERED table under the oracle
    * gate — a range-filtered aggregate over the streamed-in table must
    * equal the same aggregate off the corpus (the filter rides the
    * per-dir stats the task writers computed; clustering may re-range
    * and re-order rows, never drop or duplicate them). */
  def x16_stream_clustered_write(s: SparkSession, d: String): DataFrame = {
    val tbl = clusteredWriteDemo(s, d)
    graft.sources.ManifestTable.read(s, tbl)
      .filter(col("event_id").between(100, 3000))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"),
        sum(col("event_id")).as("id_checksum"))
      .orderBy("event_type")
  }

  /** X8: streaming ingestion → append table, verified through the
    * DuckDB gate — the aggregate over the streamed-in manifest table
    * must equal the same aggregate straight off the corpus (ingest may
    * reorder and re-batch, never drop or duplicate). */
  def x8_stream_ingest(s: SparkSession, d: String): DataFrame = {
    val tbl = ingestDemo(s, d)
    graft.sources.ManifestTable.read(s, tbl)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"),
        sum(col("event_id")).as("id_checksum"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_tumbling_window" -> (x1_tumbling_window _),
    "x2_sliding_window" -> (x2_sliding_window _),
    "x3_session_window" -> (x3_session_window _),
    "x4_late_data" -> (x4_late_data _),
    "x5_stream_dedup" -> (x5_stream_dedup _),
    "x6_funnel" -> (x6_funnel _),
    "x7_stream_static_join" -> (x7_stream_static_join _),
    "x8_stream_ingest" -> (x8_stream_ingest _),
    "x9_upsert_stream" -> (x9_upsert_stream _),
    "x10_interval_join" -> (x10_interval_join _),
    "x15_stream_table_write" -> (x15_stream_table_write _),
    "x16_stream_clustered_write" -> (x16_stream_clustered_write _),
  )

  val oracle: Map[String, String] = Map(
    "x1_tumbling_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_start, event_type,
         count(*) AS n, round(sum(value), 2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""",
    "x2_sliding_window" ->
      """SELECT CAST(time_bucket(INTERVAL 15 MINUTE, ts) - o * INTERVAL 15 MINUTE AS VARCHAR) AS win_start,
         count(*) AS n
         FROM events CROSS JOIN (SELECT unnest(range(4)) AS o)
         GROUP BY 1 ORDER BY win_start""",
    "x3_session_window" ->
      """WITH g AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         sid AS (
           SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM g)
         SELECT user_id,
           CAST(min(ts) AS VARCHAR) AS session_start,
           CAST(max(ts) + INTERVAL 30 MINUTE AS VARCHAR) AS session_end,
           count(*) AS n_events, round(sum(value), 2) AS session_value
         FROM sid GROUP BY user_id, session_id
         ORDER BY user_id, session_start""",
    "x4_late_data" ->
      """WITH f AS (SELECT event_id, event_type, ts,
           ts + ((event_id * 2654435761) % 1200) * INTERVAL 1 SECOND AS arr_ts
         FROM events),
         a AS (SELECT event_type, ts,
           max(ts) OVER (ORDER BY arr_ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             - INTERVAL 10 MINUTE AS wm
         FROM f)
         SELECT event_type, count(*) AS n_late,
           CAST(sum(epoch_us(wm) - epoch_us(ts)) AS BIGINT) AS total_late_us
         FROM a WHERE ts < wm GROUP BY event_type ORDER BY event_type""",
    "x5_stream_dedup" ->
      """WITH e AS (SELECT event_id, event_type, ts FROM events),
         feed AS (
           SELECT * FROM e
           UNION ALL SELECT event_id, event_type, ts + INTERVAL 5 MINUTE
             FROM e WHERE event_id % 10 = 0
           UNION ALL SELECT event_id, event_type, ts + INTERVAL 30 MINUTE
             FROM e WHERE event_id % 7 = 0),
         k AS (SELECT event_type, ts,
           min(ts) OVER (PARTITION BY event_id) AS first_ts FROM feed)
         SELECT event_type, count(*) AS n_delivered,
           count(CASE WHEN ts = first_ts
             OR ts > first_ts + INTERVAL 20 MINUTE THEN 1 END) AS n_kept,
           count(*) - count(CASE WHEN ts = first_ts
             OR ts > first_ts + INTERVAL 20 MINUTE THEN 1 END) AS n_dropped
         FROM k GROUP BY event_type ORDER BY event_type""",
    "x6_funnel" ->
      """WITH f AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
           FROM events GROUP BY user_id)
         SELECT count(first_signup) AS n_signed_up,
           count(CASE WHEN first_view > first_signup THEN 1 END) AS n_viewed_after,
           count(CASE WHEN first_purchase > first_view AND first_view > first_signup THEN 1 END) AS n_full_funnel
         FROM f""",
    "x7_stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS total_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // streamed-in table ≡ the corpus: ingest may re-batch, never
    // drop or duplicate
    "x8_stream_ingest" ->
      """SELECT event_type, count(*) AS n,
         round(sum(value), 2) AS total_value,
         CAST(sum(event_id) AS BIGINT) AS id_checksum
         FROM events GROUP BY event_type ORDER BY event_type""",
    // after the CDC pass: purchases tombstoned away, the user%7 slice
    // re-valued (+100), everything else as ingested
    "x9_upsert_stream" ->
      """SELECT event_type, count(*) AS n,
         round(sum(CASE WHEN user_id % 7 = 0 THEN value + 100.0
                        ELSE value END), 2) AS total_value,
         CAST(sum(event_id) AS BIGINT) AS id_checksum
         FROM events WHERE event_type <> 'purchase'
         GROUP BY event_type ORDER BY event_type""",
    // the native-path ingest must equal the corpus, like x8's route
    "x15_stream_table_write" ->
      """SELECT event_type, count(*) AS n,
         round(sum(value), 2) AS total_value,
         CAST(sum(event_id) AS BIGINT) AS id_checksum
         FROM events GROUP BY event_type ORDER BY event_type""",
    // the clustered native-path ingest must equal the corpus on a
    // range slice (pruned through the task-computed per-dir stats)
    "x16_stream_clustered_write" ->
      """SELECT event_type, count(*) AS n,
         round(sum(value), 2) AS total_value,
         CAST(sum(event_id) AS BIGINT) AS id_checksum
         FROM events WHERE event_id BETWEEN 100 AND 3000
         GROUP BY event_type ORDER BY event_type""",
    "x10_interval_join" ->
      """WITH clicks AS (
           SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
           FROM events WHERE event_type = 'click'),
         purchases AS (
           SELECT event_id AS purchase_id, user_id, ts AS p_ts
           FROM events WHERE event_type = 'purchase')
         SELECT purchase_id, user_id,
           count(*) AS n_clicks_before,
           min(click_id) AS first_click_id
         FROM purchases JOIN clicks
           ON c_user = user_id AND c_ts <= p_ts
           AND c_ts >= p_ts - INTERVAL 30 MINUTE
         GROUP BY purchase_id, user_id ORDER BY purchase_id""",
  )
}
