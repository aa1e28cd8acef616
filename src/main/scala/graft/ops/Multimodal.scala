package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star brief): image/audio/video as opaque
  * `binary` columns with typed metadata, decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The decode stage parses REAL container headers (pure-JVM JPEG/PNG/
  * GIF/BMP/WAV/MP4, `graft.media.MediaHeaders`) and only falls back to
  * a deterministic fake for blobs with no recognizable magic — which is
  * every row of the synthetic corpus, keeping the oracle checkable.
  * Full pixel/sample decode stays stubbed (the container ships no
  * codecs); binary schema, per-kind partitioning, UDF signatures over
  * byte arrays, batch shape, and aggregation plumbing are all real.
  *
  * Scale notes: media rows are processed row-local (no shuffle until the
  * final small aggregate); a real pipeline would set
  * spark.sql.files.maxPartitionBytes so one task holds O(100) blobs, and
  * partition output by kind/date exactly like S8.
  */
object Multimodal {

  /** Deterministic synthetic media table derived from `documents`:
    * a 4-byte magic + 2×2-byte fake dimensions header, then the text
    * bytes as payload. kind cycles image/audio/video. */
  private def media(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        col("n_chars"))

  // Decode stage: REAL container-header parsing first (pure-JVM JPEG/
  // PNG/GIF/BMP/WAV/MP4 via graft.media.MediaHeaders — a real blob
  // yields its true dimensions / channels / duration), then a deterministic
  // fake for payloads with no recognizable magic — which is every row
  // of the synthetic text-payload corpus, so the oracle can recompute
  // the fallback from payload length. Full pixel/sample decode remains
  // out of scope (no codecs in the container); the swap point is this
  // same UDF.
  private val decodeHeader = udf((payload: Array[Byte], kind: String) => {
    // The real-parse path is gated on the sniffed container matching the
    // row's declared kind: the tuple slots change meaning per kind
    // ((w,h,–) vs (channels,rate,seconds)), so e.g. a WAV blob filed
    // under 'image' must NOT leak channels into max_dim — it falls back
    // to the deterministic fake like any other kind-mismatched blob.
    val parsed = graft.media.MediaHeaders.parse(payload)
    parsed match {
      case Some(m) if m.format == "wav" && kind == "audio" =>
        (m.channels, m.sampleRate, m.durationSec)
      case Some(m) if m.format == "mp4" && kind == "video" =>
        (m.width, m.height, m.durationSec)
      case Some(m) if m.format != "wav" && m.format != "mp4" && kind == "image" =>
        (m.width, m.height, 0.0)
      case _ =>
        val n = payload.length
        kind match {                     // deterministic fake "dimensions"
          case "image" => (n % 640 + 16, n % 480 + 16, 0.0)  // (w, h, –)
          case "audio" => (1, 0, n.toDouble / 16000.0)       // (channels, –, seconds)
          case _       => (n % 1920 + 16, n % 1080 + 16, n.toDouble / 30.0)
        }
    }
  })

  /** Byte histogram (16 buckets) — the feature-extraction stage; a real
    * pipeline would emit embeddings here. Pure function of the bytes. */
  private val byteHistogram = udf((payload: Array[Byte]) => {
    val h = new Array[Long](16)
    payload.foreach(b => h((b & 0xff) / 16) += 1)
    h.toSeq
  })

  /** One media row's frame/sample measurement: count + checksum (the
    * stub shape), plus TRUE level stats when the payload decoded for
    * real — None on the stub path so corpus-wide aggregates stay
    * null-honest about what was actually decoded. */
  private[graft] final case class FrameStats(n: Long, checksum: Long,
    mean: Option[Double], min: Option[Double], max: Option[Double])

  /** Frame sampling with a TRUE decode tier (r9): an uncompressed BMP
    * under kind=image measures real per-pixel luminance, a PCM WAV
    * under kind=audio real sample values — count, checksum (rounded
    * value sum) and mean/min/max all from the actual pixels/samples
    * (`MediaHeaders.bmpPixelStats` / `wavSampleStats`, zero-dep byte
    * arithmetic). Compressed formats (JPEG/PNG/GIF/MP4, RLE BMPs,
    * non-PCM WAVs) still can't decode here — no codecs ship in this
    * container — so they fall to the byte-walk stub: every `stride`-th
    * byte stands in for every Nth frame, and the level stats are None.
    * Exposed as a plain function for direct spec coverage. */
  private[graft] def frameStatsOf(payload: Array[Byte], kind: String,
                                  stride: Int): FrameStats = {
    val real = kind match {
      case "image" => graft.media.MediaHeaders.bmpPixelStats(payload)
      case "audio" => graft.media.MediaHeaders.wavSampleStats(payload)
      case _       => None
    }
    real match {
      case Some(s) =>
        FrameStats(s.n, math.round(s.mean * s.n),
          Some(s.mean), Some(s.min), Some(s.max))
      case None =>
        var i = 0; var sum = 0L; var n = 0L
        while (i < payload.length) { sum += (payload(i) & 0xff); n += 1; i += stride }
        FrameStats(n, sum, None, None, None)
    }
  }

  private val frameSample = udf(frameStatsOf _)

  /** MM1: media metadata — binary sizes + stub-decoded dimensions per
    * kind. The decode output IS aggregated (max_dim), so the decode
    * stage actually executes (an unreferenced column would be pruned by
    * Catalyst) — and since the stub is a pure function of payload
    * length, the oracle recomputes it and checks it too. */
  def mm1_media_meta(s: SparkSession, d: String): DataFrame =
    media(s, d)
      .withColumn("meta", decodeHeader(col("payload"), col("kind")))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(octet_length(col("payload"))).as("total_bytes"),
        min(octet_length(col("payload"))).as("min_bytes"),
        max(octet_length(col("payload"))).as("max_bytes"),
        max(col("meta._1")).as("max_dim"))
      .orderBy("kind")

  /** MM2: feature extraction — corpus-wide 16-bucket byte histogram
    * (UDF over binary), oracle-checked against DuckDB recomputing it at
    * the OCTET level (hex(encode(text)) split into digit pairs), so the
    * comparison holds for multi-byte UTF-8 text too, not just the ASCII
    * corpus. */
  def mm2_byte_histogram(s: SparkSession, d: String): DataFrame =
    media(s, d)
      .select(posexplode(byteHistogram(col("payload"))).as(Seq("bucket", "n")))
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_bytes"))
      .filter(col("n_bytes") > 0)
      .orderBy("bucket")

  /** MM3: frame sampling — every 10th byte per media row (true
    * pixel/sample measurement where the payload decodes for real);
    * per-kind totals of sampled count + checksum, plus the decoded
    * LEVEL stats (mean of row means, global min/max) which are
    * null-honest: the synthetic text-payload corpus never takes the
    * true-decode path, so they aggregate to NULL there — the oracle
    * pins that — while a corpus of real BMP/WAV blobs reports actual
    * luminance/PCM levels (pinned by MediaHeadersSpec on byte-built
    * fixtures through this same function). */
  def mm3_frame_sample(s: SparkSession, d: String): DataFrame =
    media(s, d)
      .withColumn("sampled", frameSample(col("payload"), col("kind"), lit(10)))
      .groupBy(col("kind"))
      .agg(sum(col("sampled.n")).as("n_frames"),
        sum(col("sampled.checksum")).as("checksum"),
        round(avg(col("sampled.mean")), 2).as("mean_level"),
        round(min(col("sampled.min")), 2).as("min_level"),
        round(max(col("sampled.max")), 2).as("max_level"))
      .orderBy("kind")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_meta" -> (mm1_media_meta _),
    "mm2_byte_histogram" -> (mm2_byte_histogram _),
    "mm3_frame_sample" -> (mm3_frame_sample _),
  )

  val oracle: Map[String, String] = Map(
    "mm1_media_meta" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         count(*) AS n_media,
         CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         CAST(min(octet_length(encode(text))) AS INTEGER) AS min_bytes,
         CAST(max(octet_length(encode(text))) AS INTEGER) AS max_bytes,
         CAST(max(CASE doc_id % 3
           WHEN 0 THEN octet_length(encode(text)) % 640 + 16
           WHEN 1 THEN 1
           ELSE octet_length(encode(text)) % 1920 + 16 END) AS INTEGER) AS max_dim
         FROM documents GROUP BY 1 ORDER BY kind""",
    "mm2_byte_histogram" ->
      """SELECT CAST('0x' || b AS INTEGER) // 16 AS bucket, count(*) AS n_bytes
         FROM (SELECT unnest(regexp_extract_all(hex(encode(text)), '..')) AS b
               FROM documents)
         GROUP BY 1 HAVING count(*) > 0 ORDER BY bucket""",
    "mm3_frame_sample" ->
      """WITH s AS (SELECT
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           list_transform(range(1, length(text)+1, 10), i -> ascii(substr(text, CAST(i AS INTEGER), 1))) AS bytes
         FROM documents)
         SELECT kind, CAST(sum(len(bytes)) AS BIGINT) AS n_frames,
           CAST(sum(list_sum(bytes)) AS BIGINT) AS checksum,
           CAST(NULL AS DOUBLE) AS mean_level,
           CAST(NULL AS DOUBLE) AS min_level,
           CAST(NULL AS DOUBLE) AS max_level
         FROM s GROUP BY kind ORDER BY kind""",
  )
}
