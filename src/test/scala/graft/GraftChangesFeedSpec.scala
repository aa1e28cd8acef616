package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S17/S32/X14 cost shape — the change feed's additive fast path:
  * spans made of appends / compactions / ALTERs produce the feed as a
  * plain scan of the appended dirs (zero shuffle, nothing read across
  * a compaction), while any DML step falls back to the bounded
  * manifest diff with identical semantics. */
class GraftChangesFeedSpec extends SparkTestBase {

  private def fs(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def hasExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange")

  private def freshDir(): String =
    Files.createTempDirectory("graft-cdcfast").toString + "/t"

  test("append-only span: the feed is a pure scan of the appended dirs — no shuffle") {
    val s = spark; import s.implicits._
    val dir = freshDir()
    ManifestTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir,
      Seq("k"), retainGenerations = 20)
    val v1 = ManifestTable.headVersion(spark, dir).get
    ManifestTable.append(Seq((3, "c")).toDF("k", "v"), dir, Seq("k"), 20)
    ManifestTable.append(Seq((4, "d"), (4, "d")).toDF("k", "v"), dir, Seq("k"), 20)
    val v3 = ManifestTable.headVersion(spark, dir).get
    val feed = ManifestTable.changes(spark, dir, v1, v3)
    val got = feed.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(got == Seq((3, "c", "insert"), (4, "d", "insert"),
      (4, "d", "insert")), got)
    assert(!hasExchange(feed),
      "append-only feed must be a plain scan:\n" +
        feed.queryExecution.executedPlan)
  }

  test("a feed ACROSS a compaction is empty and reads nothing") {
    val s = spark; import s.implicits._
    val dir = freshDir()
    ManifestTable.append((1 to 50).map(i => (i, s"v$i")).toDF("k", "v"),
      dir, Seq("k"), retainGenerations = 20)
    ManifestTable.append((51 to 90).map(i => (i, s"v$i")).toDF("k", "v"),
      dir, Seq("k"), 20)
    val before = ManifestTable.headVersion(spark, dir).get
    ManifestTable.compactAppend(spark, dir, Seq("k"), k = 2,
      retainGenerations = 20)
    val after = ManifestTable.headVersion(spark, dir).get
    val feed = ManifestTable.changes(spark, dir, before, after)
    assert(feed.count() == 0L)
    assert(feed.inputFiles.isEmpty,
      "a layout-only span must not open any data file")
    assert(!hasExchange(feed))
  }

  test("append + compact + ALTER + append span: feed = the appended batches only, still shuffle-free") {
    val s = spark; import s.implicits._
    val dir = freshDir()
    ManifestTable.append((1 to 30).map(i => (i, s"v$i")).toDF("k", "v"),
      dir, Seq("k"), retainGenerations = 30)
    val v1 = ManifestTable.headVersion(spark, dir).get
    ManifestTable.append(Seq((100, "x")).toDF("k", "v"), dir, Seq("k"), 30)
    ManifestTable.compactAppend(spark, dir, Seq("k"), k = 2,
      retainGenerations = 30)
    ManifestTable.alterClusterBy(spark, dir, Seq("k"),
      retainGenerations = 30)
    ManifestTable.append(Seq((200, "y")).toDF("k", "v"), dir, Seq("k"), 30)
    val vN = ManifestTable.headVersion(spark, dir).get
    val feed = ManifestTable.changes(spark, dir, v1, vN)
    val got = feed.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(got == Seq((100, "x", "insert"), (200, "y", "insert")), got)
    assert(!hasExchange(feed))
    // the compaction's output dirs are NOT in the feed's inputs — only
    // the two appended dirs are read
    assert(feed.inputFiles
      .map(_.split("/").dropRight(1).last).distinct.length == 2,
      feed.inputFiles.toSeq)
  }

  test("a DML step in the span falls back to the exact manifest diff") {
    val s = spark; import s.implicits._
    val dir = freshDir()
    ManifestTable.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"),
      dir, Seq("k"), retainGenerations = 20)
    val v1 = ManifestTable.headVersion(spark, dir).get
    ManifestTable.append(Seq((4, "d")).toDF("k", "v"), dir, Seq("k"), 20)
    ManifestTable.deleteWhere(spark, dir, col("k") === 2,
      retainGenerations = 20)
    val vN = ManifestTable.headVersion(spark, dir).get
    val feed = ManifestTable.changes(spark, dir, v1, vN)
    val got = feed.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    // endpoint semantics: +4 inserted, 2 deleted; 1/3 untouched.
    // (1,a)/(3,c) live in a REWRITTEN dir now, so the diff nets them out
    assert(got == Seq((2, "b", "delete"), (4, "d", "insert")), got)
  }
}
