package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** X15 — NATIVE streaming writes: `df.writeStream.toTable("cat.ns.t")`
  * (or `.format("graft").option("path", dir)`) lands each micro-batch
  * as one commit dir written by EXECUTOR task writers — real
  * `StreamingWrite` task commit, no driver-side foreachBatch loop —
  * and published with the exactly-once epoch contract:
  *
  *  - Each task writes one parquet file straight into the epoch's
  *    staging dir `ss-<run>/e<epoch>` (files are uniquely named, so
  *    there is no rename protocol to coordinate; a failed task's file
  *    is deleted by its own abort, and a HARD-killed attempt's orphan
  *    — abort never ran — is deleted by the commit-time reconcile:
  *    only files named by COMMIT MESSAGES publish).
  *  - `commit(epoch)` publishes the staged dir through the same
  *    optimistic append loop every other write uses — schema contract,
  *    meta carry, ALTER-vs-write constraint guard, rebase over racing
  *    writers — recording `txn:stream-<queryId> -> epoch` so a crash
  *    between manifest commit and checkpoint ack re-delivers the epoch
  *    into a SKIP (the staged duplicate dir is deleted), Delta's
  *    (txnAppId, txnVersion) contract.
  *  - Restarts get a fresh run id, so a replayed epoch never collides
  *    with the committed one's files.
  *
  * When the table declares `statsCols`, the commit runs one tiny
  * aggregate over the just-written files (page-cache-warm) so streamed
  * dirs skip like appended ones. Tables whose write-side contracts
  * need a DRIVER-side plan — declared CHECK constraints (per-row
  * `raise_error` guards), `clusterBy` (a range shuffle), or a bucketed
  * layout (the merge kernel) — are refused with the `foreachBatch`
  * route named: a native task writer cannot run those plans, and
  * silently skipping a declared contract is worse than an error. */
class GraftStreamingWrite(tableDir: String, writeSchema: StructType,
                          queryId: String, statsCols: Seq[String],
                          retain: Int)
    extends StreamingWrite {

  private val runId = java.util.UUID.randomUUID().toString.take(8)
  private val txnKey = s"txn:stream-$queryId"

  private def spark: SparkSession = SparkSession.active
  private def fs = new Path(tableDir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def epochRel(epochId: Long): String = s"ss-$runId/e$epochId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    GraftStreamingWriterFactory(s"$tableDir/ss-$runId",
      GraftTaskWriters.writeConf(spark, writeSchema))

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val rel = epochRel(epochId)
    val files = messages.collect {
      case m: GraftTaskCommit if m.rows > 0 => m }
    // the engine constructs a fresh StreamingWrite (fresh run id) per
    // micro-batch, so dropping a skipped epoch must also remove the
    // now-empty run shell — otherwise every replayed epoch leaves one
    def dropStaged(): Unit = {
      fs.delete(new Path(tableDir, rel), true)
      val shell = new Path(tableDir, s"ss-$runId")
      if (fs.exists(shell) && fs.listStatus(shell).isEmpty)
        fs.delete(shell, true): Unit
    }
    // idempotence: an epoch at-or-below the recorded watermark is a
    // crash re-delivery — drop its freshly staged duplicate and move on
    val committedUpTo = ManifestTable.headVersion(spark, tableDir)
      .flatMap(v => ManifestTable.metaOf(fs, tableDir, v).get(txnKey))
      .flatMap(_.toLongOption)
    if (committedUpTo.exists(_ >= epochId)) { dropStaged(); return }
    if (files.isEmpty) { dropStaged(); return } // empty epoch: nothing lands
    // exactly-once under TASK death, not just epoch replay: a
    // hard-killed attempt (executor loss) never runs abort(), leaving
    // a partial/orphan parquet file in the staging dir. Deleting
    // orphans in place is not enough — a speculative attempt still
    // flushing can land its file AFTER the cleanup listing but before
    // the dir publishes, and readers list every *.parquet in a
    // published dir. So publication is by MOVE, not by dir: each
    // commit-message-named file is renamed into a fresh publish dir
    // (one NN rename per task, same order as a listing), and only
    // that dir enters the manifest — a late-landing orphan hits the
    // doomed staging dir, which is never reader-visible.
    val pubRel = s"ss-$runId/p$epochId"
    GraftTaskWriters.publishNamed(fs, new Path(tableDir, rel),
      new Path(tableDir, pubRel),
      files.map(m => new Path(m.file).getName).toSeq)
    fs.delete(new Path(tableDir, rel), true): Unit
    val stats =
      if (statsCols.isEmpty) Map.empty[String, String]
      else {
        import org.apache.spark.sql.functions.{col, count, lit, max, min}
        val aggs = count(lit(1)).as("rows") +: statsCols.flatMap(c => Seq(
          min(col(c)).cast("string").as(s"min:$c"),
          max(col(c)).cast("string").as(s"max:$c")))
        val r = spark.read.schema(writeSchema)
          .parquet(s"$tableDir/$pubRel").agg(aggs.head, aggs.tail: _*).head()
        Map(pubRel -> (Seq(r.getAs[Long]("rows").toString) ++
          statsCols.flatMap(c => Seq(
            java.net.URLEncoder.encode(c, "UTF-8"),
            Option(r.getAs[String](s"min:$c"))
              .map(java.net.URLEncoder.encode(_, "UTF-8")).getOrElse("%N"),
            Option(r.getAs[String](s"max:$c"))
              .map(java.net.URLEncoder.encode(_, "UTF-8")).getOrElse("%N"))))
          .mkString("\t"))
      }
    ManifestTable.appendCommitLoopCore(spark, writeSchema, tableDir,
      Seq(pubRel), stats, statsCols, retain,
      meta = Map(txnKey -> epochId.toString),
      recordingStats = stats.nonEmpty,
      // the guard set: this write refuses tables with declared checks
      // at build time, so any check key appearing at publish time was
      // declared MID-STREAM — the guard fails the epoch loudly
      boundChecks = Set.empty): Unit
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    fs.delete(new Path(tableDir, epochRel(epochId)), true): Unit
    fs.delete(new Path(tableDir, s"ss-$runId/p$epochId"), true): Unit
  }
}

case class GraftTaskCommit(file: String, rows: Long)
    extends WriterCommitMessage

/** Shared executor-task parquet-writer plumbing (X15 streaming writes
  * and the native row-level-operation writes, GraftRowLevelOps). */
private[sources] object GraftTaskWriters {

  /** Hadoop conf a [[GraftTaskWriter]] needs executor-side: exactly
    * the SQLConf keys ParquetWriteSupport.init and
    * SparkToParquetSchemaConverter(conf) read (they `.toBoolean` a
    * raw get — an unset key is an executor-side NPE, so every one
    * must be materialized from the session before shipping). */
  def writeConf(spark: SparkSession,
                writeSchema: StructType): SerializableConfiguration = {
    val conf = spark.sessionState.newHadoopConf()
    val sqlConf = spark.sessionState.conf
    ParquetWriteSupport.setSchema(writeSchema, conf)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlConf.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlConf.parquetFieldIdWriteEnabled.toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlConf.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sqlConf.sessionLocalTimeZone)
    new SerializableConfiguration(conf)
  }

  /** Move exactly the commit-message-named files from `stageDir` into
    * a fresh `pubDir` — the hard-killed-attempt orphan defense: only
    * the publish dir enters the manifest, so a straggler attempt's
    * file that lands in the staging dir at ANY point (even after a
    * cleanup listing) is never reader-visible. A named file that
    * cannot be moved is a loud failure — its task committed it, so
    * absence means the staging dir was tampered with or lost. */
  def publishNamed(fs: org.apache.hadoop.fs.FileSystem, stageDir: Path,
                   pubDir: Path, named: Seq[String]): Unit = {
    fs.mkdirs(pubDir)
    named.foreach { n =>
      require(fs.rename(new Path(stageDir, n), new Path(pubDir, n)),
        s"cannot publish $n: rename from $stageDir failed")
    }
  }
}

case class GraftStreamingWriterFactory(stageDir: String,
                                       conf: SerializableConfiguration)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftTaskWriter(
      s"$stageDir/e$epochId/part-$partitionId-$taskId-" +
        java.util.UUID.randomUUID().toString.take(8) + ".snappy.parquet",
      conf.value)
}

/** One task's parquet writer — opened lazily so zero-row tasks leave
  * nothing behind; `abort` deletes the file it may have started. */
class GraftTaskWriter(path: String, conf: Configuration)
    extends DataWriter[InternalRow] {

  private var writer: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _
  private var rows = 0L

  private class Builder(p: org.apache.parquet.hadoop.util.HadoopOutputFile)
      extends org.apache.parquet.hadoop.ParquetWriter.Builder[InternalRow, Builder](p) {
    override def getWriteSupport(c: Configuration) = new ParquetWriteSupport
    override def self(): Builder = this
  }

  override def write(record: InternalRow): Unit = {
    if (writer == null)
      writer = new Builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile
          .fromPath(new Path(path), conf))
        .withConf(conf)
        .withCompressionCodec(
          org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
        .build()
    writer.write(record) // consumed synchronously by the write support
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    GraftTaskCommit(path, rows)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    new Path(path).getFileSystem(conf).delete(new Path(path), false): Unit
  }

  override def close(): Unit = ()
}
