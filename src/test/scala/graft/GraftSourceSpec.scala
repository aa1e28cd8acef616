package graft

import graft.sources.{GraftManifestSource, ManifestTable}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

/** S20 — the graft-manifest Spark data source: short-name registration,
  * filter→bounds translation, DIR pruning proven the hard way (a dir
  * physically deleted from disk stays unread when the pushed filter
  * prunes it — an unpruned scan throws), snapshot pinning / time
  * travel, SQL `CREATE TABLE USING`, and the write-side SaveModes. */
class GraftSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_src_").toString

  private def batch(year: Int, n: Int = 10) = {
    val rows = (0 until n).map(i =>
      (year * 1000L + i, s"$year-06-${10 + (i % 10)}", i * 1.5))
    rows.toDF("k", "ds", "v").withColumn("d", col("ds").cast("date")).drop("ds")
  }

  test("filter -> bounds translation is conservative and typed") {
    val b = GraftManifestSource.boundsOf(Seq(
      GreaterThanOrEqual("d", java.sql.Date.valueOf("1997-01-01")),
      LessThan("d", java.sql.Date.valueOf("1997-12-31")),
      EqualTo("k", 42L),
      In("v", Array[Any](3.5, 1.5, 2.5)),
      StringContains("name", "x"), // unsupported → no bound
      Or(EqualTo("k", 1L), EqualTo("k", 2L)) // OR → no bound
    ))
    assert(b("d") == ("1997-01-01", "1997-12-31"))
    assert(b("k") == ("42", "42"))
    assert(b("v") == ("1.5", "3.5"))
    assert(!b.contains("name"))
    // numeric compare is numeric, not lexicographic: 9 < 10
    val n = GraftManifestSource.boundsOf(Seq(
      GreaterThanOrEqual("k", 9L), LessThanOrEqual("k", 10L)))
    assert(n("k") == ("9", "10"))
    // half-bounded columns contribute nothing (closed-interval contract)
    assert(!GraftManifestSource.boundsOf(Seq(GreaterThan("k", 1L))).contains("k"))
    // timestamp rendering matches the stats encoding (no trailing ".0")
    val ts = GraftManifestSource.render(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00")).get
    assert(ts == "2024-01-01 10:00:00", ts)
    assert(GraftManifestSource.render(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00.5")).get
      == "2024-01-01 10:00:00.5")
  }

  test("read path: values match native read; pruning proven by a deleted dir") {
    val dir = freshDir()
    Seq(1995, 1996, 1997).foreach(y =>
      ManifestTable.append(batch(y), dir, statsCols = Seq("d")))
    val viaSource = spark.read.format("graft-manifest").load(dir)
    assert(viaSource.count() == 30)
    assert(viaSource.schema.fieldNames.toSeq == Seq("k", "v", "d"))
    // physically delete the 1995 commit dir: any scan that fails to
    // prune it now THROWS — surviving is proof the dir went unread
    val head = ManifestTable.headVersion(spark, dir).get
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val paths = ManifestTable.pathsOf(fs, dir, head)
    val stats = ManifestTable.statsOf(fs, dir, head)
    val p1995 = paths.find(p =>
      ManifestTable.statsFor(stats(p), "d").exists(_._2.exists(_.startsWith("1995")))).get
    fs.delete(new org.apache.hadoop.fs.Path(dir, p1995), true)
    val pruned = spark.read.format("graft-manifest").load(dir)
      .filter(col("d") >= lit("1997-01-01") && col("d") <= lit("1997-12-31"))
    assert(pruned.count() == 10)
    assert(pruned.agg(sum(col("k"))).head.getLong(0) == (0 until 10).map(1997000L + _).sum)
    // the unpruned full scan must now fail — proves the dir mattered
    intercept[Exception] {
      spark.read.format("graft-manifest").load(dir).count()
    }
  }

  test("snapshot pinning + versionAsOf time travel") {
    val dir = freshDir()
    ManifestTable.append(batch(2000), dir, statsCols = Seq("d"))
    val v1 = ManifestTable.headVersion(spark, dir).get
    val pinned = spark.read.format("graft-manifest").load(dir)
    ManifestTable.append(batch(2001), dir, statsCols = Seq("d"))
    // relation resolved at creation → still sees only v1's rows
    assert(pinned.count() == 10)
    assert(spark.read.format("graft-manifest").load(dir).count() == 20)
    assert(spark.read.format("graft-manifest")
      .option("versionAsOf", v1).load(dir).count() == 10)
  }

  test("SQL surface: CREATE TABLE USING + pushed-down WHERE") {
    val dir = freshDir()
    Seq(1995, 1996).foreach(y =>
      ManifestTable.append(batch(y), dir, statsCols = Seq("d")))
    spark.sql("DROP TABLE IF EXISTS graft_sql_t")
    spark.sql(s"CREATE TABLE graft_sql_t USING `graft-manifest` OPTIONS (path '$dir')")
    try {
      val got = spark.sql(
        """SELECT count(*) AS n, sum(k) AS ks FROM graft_sql_t
           WHERE d BETWEEN '1996-01-01' AND '1996-12-31'""").head
      assert(got.getLong(0) == 10)
      assert(got.getLong(1) == (0 until 10).map(1996000L + _).sum)
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_t")
  }

  test("write side: append / errorIfExists / ignore / overwrite SaveModes") {
    val dir = freshDir()
    batch(1995).write.format("graft-manifest")
      .option("statsCols", "d").mode(SaveMode.Append).save(dir)
    batch(1996).write.format("graft-manifest")
      .option("statsCols", "d").mode(SaveMode.Append).save(dir)
    assert(spark.read.format("graft-manifest").load(dir).count() == 20)
    intercept[IllegalStateException] {
      batch(1997).write.format("graft-manifest")
        .mode(SaveMode.ErrorIfExists).save(dir)
    }
    batch(1997).write.format("graft-manifest").mode(SaveMode.Ignore).save(dir)
    assert(spark.read.format("graft-manifest").load(dir).count() == 20) // ignored
    batch(1998).write.format("graft-manifest")
      .option("statsCols", "d").mode(SaveMode.Overwrite).save(dir)
    val after = spark.read.format("graft-manifest").load(dir)
    assert(after.count() == 10)
    assert(after.agg(min(col("d")).cast("string")).head.getString(0)
      .startsWith("1998"))
    // overwrite carried its stats: a disjoint range prunes to zero dirs
    // without touching the data (empty-relation fast path)
    val none = spark.read.format("graft-manifest").load(dir)
      .filter(col("d") >= lit("1995-01-01") && col("d") <= lit("1995-12-31"))
    assert(none.count() == 0)
  }
}
