package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.DataFrame

/** S47 — idempotent batch writes on the DSv2/V1 write surfaces:
  * Delta's (txnAppId, txnVersion) contract as WRITE OPTIONS. A write
  * whose appId watermark is already at-or-past its txnVersion is
  * recognized as a crash replay and skipped BEFORE the write job; a
  * higher version advances the watermark atomically with the data
  * commit (same manifest `#meta` channel the streaming writers use).
  */
class GraftTxnSpec extends SparkTestBase {

  private def nation: DataFrame =
    spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-txn-$name")
    d.toFile.deleteOnExit()
    d.resolve("t").toString
  }

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("append with the same (txnAppId, txnVersion) twice lands once") {
    val dir = tmp("app")
    val n = nation.count()
    def write(ver: Long): Unit = nation.write.format("graft")
      .mode("append")
      .option("txnAppId", "etl-job").option("txnVersion", ver.toString)
      .save(dir)
    write(1L)
    assert(spark.read.format("graft").load(dir).count() === n)
    val vAfterFirst = ManifestTable.headVersion(spark, dir).get
    write(1L) // crash replay: same watermark — must be a no-op
    assert(spark.read.format("graft").load(dir).count() === n)
    assert(ManifestTable.headVersion(spark, dir).get === vAfterFirst,
      "a replayed batch must not even commit a new version")
    write(2L) // the next batch advances
    assert(spark.read.format("graft").load(dir).count() === 2 * n)
    write(1L) // late replay of an OLDER batch: watermark 2 >= 1 — skip
    write(2L)
    assert(spark.read.format("graft").load(dir).count() === 2 * n)
  }

  test("watermarks are per-appId: a different writer is unaffected") {
    val dir = tmp("two-apps")
    val n = nation.count()
    nation.write.format("graft").mode("append")
      .option("txnAppId", "a").option("txnVersion", "7").save(dir)
    nation.write.format("graft").mode("append")
      .option("txnAppId", "b").option("txnVersion", "7").save(dir)
    assert(spark.read.format("graft").load(dir).count() === 2 * n)
    // both watermarks recorded, independently
    val fs = fsOf(dir)
    val head = ManifestTable.headVersion(spark, dir).get
    val meta = ManifestTable.metaOf(fs, dir, head)
    assert(meta.get("txn:a").contains("7") && meta.get("txn:b").contains("7"))
  }

  test("a replayed write leaves no staged dirs behind") {
    val dir = tmp("clean")
    nation.write.format("graft").mode("append")
      .option("txnAppId", "x").option("txnVersion", "3").save(dir)
    val fs = fsOf(dir)
    val before = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSet
    nation.write.format("graft").mode("append")
      .option("txnAppId", "x").option("txnVersion", "3").save(dir)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSet
    assert(after === before,
      "the replay fast-path skips before the write job — nothing staged")
  }

  test("idempotent OVERWRITE: replay converges to the same table") {
    val dir = tmp("ovw")
    val n = nation.count()
    nation.write.format("graft").mode("append").save(dir)
    nation.write.format("graft").mode("append").save(dir)
    assert(spark.read.format("graft").load(dir).count() === 2 * n)
    def ovw(): Unit = nation.limit(5).write.format("graft")
      .mode("overwrite")
      .option("txnAppId", "rebuild").option("txnVersion", "1").save(dir)
    ovw()
    assert(spark.read.format("graft").load(dir).count() === 5)
    val v = ManifestTable.headVersion(spark, dir).get
    ovw() // replay: watermark recorded on the overwrite's final commit
    assert(spark.read.format("graft").load(dir).count() === 5)
    assert(ManifestTable.headVersion(spark, dir).get === v)
  }

  test("clustered appends carry the watermark through their commit") {
    val dir = tmp("clustered")
    val n = nation.count()
    def write(ver: Long): Unit = nation.write.format("graft")
      .mode("append")
      .option("clusterBy", "n_nationkey").option("statsCols", "n_nationkey")
      .option("txnAppId", "ci").option("txnVersion", ver.toString)
      .save(dir)
    write(1L); write(1L)
    assert(spark.read.format("graft").load(dir).count() === n)
    write(2L)
    assert(spark.read.format("graft").load(dir).count() === 2 * n)
  }

  test("the V1 alias honors the same contract") {
    val dir = tmp("v1")
    val n = nation.count()
    def write(ver: Long): Unit = nation.write.format("graft-manifest")
      .mode("append")
      .option("txnAppId", "v1-job").option("txnVersion", ver.toString)
      .save(dir)
    write(1L); write(1L)
    assert(spark.read.format("graft").load(dir).count() === n)
    write(2L)
    assert(spark.read.format("graft").load(dir).count() === 2 * n)
  }

  test("option validation is loud") {
    val dir = tmp("bad")
    intercept[IllegalArgumentException] {
      nation.write.format("graft").mode("append")
        .option("txnAppId", "only-half").save(dir)
    }
    intercept[IllegalArgumentException] {
      nation.write.format("graft").mode("append")
        .option("txnAppId", "x").option("txnVersion", "not-a-number").save(dir)
    }
    intercept[IllegalArgumentException] {
      nation.write.format("graft").mode("append")
        .option("txnVersion", "4").save(dir)
    }
  }

  test("bucketed merge tables refuse txn options loudly") {
    val dir = tmp("bucketed")
    import org.apache.spark.sql.functions.col
    val keyed = nation.withColumnRenamed("n_nationkey", "k")
      .filter(col("k") >= 0)
    graft.sources.MergeInto.create(keyed, dir, "k", nBuckets = 2): Unit
    val e = intercept[IllegalArgumentException] {
      keyed.write.format("graft").mode("append")
        .option("txnAppId", "m").option("txnVersion", "1").save(dir)
    }
    assert(e.getMessage.contains("key-idempotent"))
  }
}
