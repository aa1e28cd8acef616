package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.ManifestTable

/** X15 — native streaming writes (`writeStream.toTable` /
  * `.format("graft")`): executor task-writer commits, exactly-once
  * epochs across a real crash-replay, stats parity, contract
  * refusals. */
class GraftStreamingWriteSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-sw").toString
    spark.conf.set("spark.sql.catalog.gsw", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsw.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsw.lake")
    dir
  }
  private def fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())

  test("writeStream.toTable lands epochs as commit dirs with stats; exactly-once across a replayed epoch") {
    wh: Unit
    val s = spark; import s.implicits._
    spark.sql("DROP TABLE IF EXISTS gsw.lake.st")
    spark.sql("CREATE TABLE gsw.lake.st (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='20')")
    val dir = s"$wh/lake/st"
    // a 3-file source streamed one file per trigger = 3 epochs
    val src = Files.createTempDirectory("gsw-src").toString
    Seq(1 -> "a", 2 -> "b").toDF("k", "v").coalesce(1)
      .write.parquet(s"$src/f1")
    Seq(10 -> "p").toDF("k", "v").coalesce(1).write.parquet(s"$src/f2")
    Seq(20 -> "q", 21 -> "r").toDF("k", "v").coalesce(1)
      .write.parquet(s"$src/f3")
    val ck = Files.createTempDirectory("gsw-ck").toString
    def run(): Unit = {
      val q = spark.readStream
        .schema("k INT, v STRING").option("maxFilesPerTrigger", "1")
        .parquet(s"$src/*")
        .writeStream.option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .toTable("gsw.lake.st")
      q.awaitTermination()
    }
    run()
    val rows = spark.table("gsw.lake.st").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows == Map(1 -> "a", 2 -> "b", 10 -> "p", 20 -> "q", 21 -> "r"))
    // each epoch is one ss- staging dir in the manifest
    val paths = ManifestTable.livePaths(fs, dir)
    assert(paths.count(_.startsWith("ss-")) == 3, paths)
    // stats parity: a point scan prunes to the one epoch dir
    val pruned = ManifestTable.rangeScan(spark, dir, "k", "10", "10")
    assert(pruned.count() == 1L)
    assert(pruned.inputFiles.map(_.split("/").dropRight(1).last)
      .distinct.length == 1, "streamed dirs must skip like appended ones")

    // CRASH-REPLAY: torch the last checkpoint commit ack, so the
    // restart RE-DELIVERS the final epoch — the txn watermark must
    // recognize it and skip, leaving counts exact and no orphan dir
    val commits = fs.listStatus(new Path(ck, "commits"))
      .map(_.getPath).filter(!_.getName.startsWith("."))
      .sortBy(_.getName.toInt)
    fs.delete(commits.last, false)
    run()
    assert(spark.table("gsw.lake.st").count() == 5L,
      "replayed epoch must be skipped, not double-applied")
    val onDisk = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith("ss-")).toSet
    val live = ManifestTable.livePaths(fs, dir)
      .map(_.split("/", 2).head).toSet
    assert(onDisk == live, s"replay left staged orphans: ${onDisk -- live}")
  }

  test("a batch append racing the stream rebases cleanly") {
    wh: Unit
    val s = spark; import s.implicits._
    spark.sql("DROP TABLE IF EXISTS gsw.lake.mix")
    spark.sql("CREATE TABLE gsw.lake.mix (k INT, v STRING) " +
      "TBLPROPERTIES ('retainGenerations'='20')")
    val src = Files.createTempDirectory("gsw-mix").toString
    Seq(1 -> "s").toDF("k", "v").write.parquet(s"$src/f1")
    val ck = Files.createTempDirectory("gsw-mixck").toString
    val q = spark.readStream.schema("k INT, v STRING").parquet(s"$src/*")
      .writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).toTable("gsw.lake.mix")
    q.awaitTermination()
    spark.sql("INSERT INTO gsw.lake.mix VALUES (2, 'batch')")
    assert(spark.table("gsw.lake.mix").count() == 2L)
  }

  test("commit publishes ONLY commit-message files: a hard-killed attempt's orphan is deleted, not published") {
    wh: Unit
    val s = spark; import s.implicits._
    spark.sql("DROP TABLE IF EXISTS gsw.lake.orph")
    spark.sql("CREATE TABLE gsw.lake.orph (k INT, v STRING)")
    spark.sql("INSERT INTO gsw.lake.orph VALUES (0, 'seed')")
    val dir = s"$wh/lake/orph"
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k INT, v STRING")
    val w = new graft.sources.GraftStreamingWrite(
      dir, schema, "orph-q", Seq.empty, 20)
    val factory = w.createStreamingWriterFactory(
      new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
        override def numPartitions: Int = 1 })
    def runTask(pid: Int, taskId: Long, rows: Seq[(Int, String)]) = {
      val tw = factory.createWriter(pid, taskId, 7L)
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(schema)
      val ser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(enc)
        .createSerializer()
      rows.foreach(r => tw.write(ser(
        org.apache.spark.sql.Row(r._1, r._2)).copy()))
      tw.commit()
    }
    // attempt A: the winner — its message is delivered to commit()
    val winner = runTask(0, 1L, Seq(1 -> "a", 2 -> "b"))
    // attempt B: same partition, hard-killed AFTER flushing its file —
    // abort() never runs and its message is never delivered (the
    // speculative-duplicate / executor-death shape)
    runTask(0, 2L, Seq(1 -> "DUP", 2 -> "DUP"))
    val stageRel = "ss-" + winner.asInstanceOf[graft.sources.GraftTaskCommit]
      .file.split("/ss-")(1).split("/")(0) + "/e7"
    val staged = fs.listStatus(new Path(dir, stageRel))
    assert(staged.length == 2, "both attempts' files must be staged pre-commit")
    w.commit(7L, Array(winner))
    val got = spark.table("gsw.lake.orph").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSet
    assert(got == Set(0 -> "seed", 1 -> "a", 2 -> "b"),
      s"orphan rows leaked into the table: $got")
    // and the orphan file is gone from the published dir
    val live = ManifestTable.livePaths(fs, dir).filter(_.startsWith("ss-"))
    assert(live.size == 1)
    val pubFiles = fs.listStatus(new Path(dir, live.head))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    assert(pubFiles.length == 1 && winner
      .asInstanceOf[graft.sources.GraftTaskCommit].file.endsWith(pubFiles.head),
      s"published dir must hold exactly the winner's file: ${pubFiles.toSeq}")
    // the race a delete-in-place cleanup can NOT close: a straggler
    // attempt whose flush lands AFTER commit's cleanup listing. Here
    // it lands after commit entirely (recreating the staging dir) —
    // because publication is by move into a fresh dir, the straggler
    // is never reader-visible
    runTask(0, 3L, Seq(9 -> "LATE"))
    val after = spark.table("gsw.lake.orph").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSet
    assert(after == Set(0 -> "seed", 1 -> "a", 2 -> "b"),
      s"straggler attempt's rows leaked into the table: $after")
  }

  test("contract-bearing tables refuse the native path, naming the foreachBatch route") {
    wh: Unit
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    def tryStream(table: String): Seq[String] = {
      val src = Files.createTempDirectory("gsw-ref").toString
      val s = spark; import s.implicits._
      Seq(1 -> "a").toDF("k", "v").write.parquet(s"$src/f1")
      val e = intercept[Exception] {
        val q = spark.readStream.schema("k INT, v STRING")
          .parquet(s"$src/*")
          .writeStream.option("checkpointLocation",
            Files.createTempDirectory("gsw-refck").toString)
          .trigger(Trigger.AvailableNow()).toTable(table)
        q.awaitTermination()
      }
      msgs(e)
    }
    spark.sql("DROP TABLE IF EXISTS gsw.lake.chk")
    spark.sql("CREATE TABLE gsw.lake.chk (k INT, v STRING) " +
      "TBLPROPERTIES ('check.pos'='k > 0')")
    assert(tryStream("gsw.lake.chk").exists(_.contains("foreachBatch")))
    spark.sql("DROP TABLE IF EXISTS gsw.lake.clu")
    spark.sql("CREATE TABLE gsw.lake.clu (k INT, v STRING) " +
      "TBLPROPERTIES ('clusterBy'='k')")
    assert(tryStream("gsw.lake.clu").exists(_.contains("foreachBatch")))
    spark.sql("DROP TABLE IF EXISTS gsw.lake.bkt")
    spark.sql("CREATE TABLE gsw.lake.bkt (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('layout'='bucketed:k:4')")
    assert(tryStream("gsw.lake.bkt").exists(_.contains("foreachBatch")))
  }
}
