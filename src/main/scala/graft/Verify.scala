package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local dev only; the driver passes 2): run just the
    // named queries, comma-separated — fast single-operator iteration.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // NANOS-encoded events corpora read as BIGINT instead of failing
      // (Tables.events normalizes; the conf lives at session build, not
      // as a loader side effect)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // S38 engine default: bucketed scans report KeyGroupedPartitioning,
      // so co-bucketed joins plan storage-partitioned (order-independent
      // of which query runs first — this is a session-wide stance)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir, only)
    spark.stop()
  }

  /** The board loop, separated from session lifecycle so a spec can
    * drive it with an injected query map (the watchdog leg). Every
    * query runs under [[Watchdog]]: one wedged query costs one err
    * row and at most `timeoutSec`, never the whole artifact (the r19
    * failure mode — a driver-side infinite loop at the first CALL
    * fixture blanked all 220 correctness rows). */
  private[graft] def run(spark: SparkSession, sfDir: String, outDir: String,
      only: Option[Set[String]] = None,
      queries: Map[String, (SparkSession, String) => DataFrame] =
        SparkEntry.queries,
      oracleSql: Map[String, String] = SparkEntry.oracleSql,
      timeoutSec: Long = Watchdog.defaultTimeoutSec): Unit = {
    new java.io.File(outDir).mkdirs()
    // per-query Spark-declared schema (col -> Spark SQL type), dumped for
    // the strict dtype gate in tools/compare.py: comparing the DECLARED
    // schema closes the blind spot where DuckDB's parquet reader erases a
    // type distinction the driver's typed hash would still see
    val schemas = scala.collection.mutable.LinkedHashMap.empty[String, Seq[(String, String)]]
    queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        // the worker writes a HIDDEN wip dir; only the MAIN thread
        // publishes it to the final path on success. An abandoned
        // timeout thread that un-wedges minutes later can therefore
        // only ever (re)write the wip dir — the compare never sees a
        // torn or resurrected result for a query reported as failed
        // (cancelJobGroup cannot cancel a job that hasn't started,
        // and a driver-side spin ignores the interrupt entirely)
        // the wip area is a SIBLING of outDir (the driver's compare
        // lists every dir under outDir — a resurrected wip must never
        // appear there, even as a NO-ORACLE row)
        val wip = s"$outDir.wip/$name"
        Watchdog.run(spark, name, timeoutSec) {
          val df = fn(spark, sfDir)
          val sch = df.schema.fields.toSeq.map(f => f.name -> f.dataType.sql)
          df.coalesce(1).write.mode("overwrite").parquet(wip)
          sch
        } match {
          case Right(sch) =>
            val fs = new org.apache.hadoop.fs.Path(outDir)
              .getFileSystem(spark.sessionState.newHadoopConf())
            val dst = new org.apache.hadoop.fs.Path(s"$outDir/$name")
            if (fs.exists(dst)) fs.delete(dst, true): Unit
            require(fs.rename(new org.apache.hadoop.fs.Path(wip), dst),
              s"cannot publish verify result for $name")
            schemas(name) = sch
          case Left(err) =>
            System.err.println(s"[verify] $name failed: $err")
            try {
              val fs = new org.apache.hadoop.fs.Path(outDir)
                .getFileSystem(spark.sessionState.newHadoopConf())
              fs.delete(new org.apache.hadoop.fs.Path(wip), true): Unit
            } catch { case _: Throwable => () }
        }
      }
    // drop the wip staging tree once the loop is done (best-effort: an
    // abandoned timeout thread may still be writing into it — IO errors
    // here must never fail a completed board). Orphaned wip dirs are
    // pure garbage: the compare lists only outDir (r20 ADVICE low).
    try {
      val fs = new org.apache.hadoop.fs.Path(outDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(s"$outDir.wip"), true): Unit
    } catch { case _: Throwable => () }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val schemaJson = schemas.map { case (k, cols) =>
      s"${q(k)}: ${cols.map { case (c, t) => s"${q(c)}: ${q(t)}" }.mkString("{", ",", "}")}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/spark_schemas.json"), schemaJson)
  }
}
