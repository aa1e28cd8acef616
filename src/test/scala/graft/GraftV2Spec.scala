package graft

import graft.sources.{GraftStreamOffset, GraftTableProvider, ManifestTable}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** S21 — the `graft` DataSource V2 surface: vectorized batch reads with
  * manifest-dir pruning (proven by a deleted dir), snapshot pinning /
  * versionAsOf, V1Write-bridged append/overwrite (including the first
  * write to an uncommitted path), statistics-driven broadcast, and the
  * marquee: complete aggregate pushdown answered from `#stats` manifest
  * headers with ZERO data files opened — proven by physically deleting
  * every data dir and still answering count/min/max. */
class GraftV2Spec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_v2_").toString

  private def batch(year: Int, n: Int = 10) = {
    val rows = (0 until n).map(i =>
      (year * 1000L + i, s"$year-06-${10 + (i % 10)}", i * 1.5))
    rows.toDF("k", "ds", "v").withColumn("d", col("ds").cast("date")).drop("ds")
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame) = {
    // AQE wraps shuffling plans (the DECLINED-pushdown shape) in an
    // AdaptiveSparkPlanExec whose children are not in the outer tree
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    p.collectFirst { case b: BatchScanExec => b.scan }
  }

  test("short name registers; read path is a V2 BatchScan with value parity") {
    val dir = freshDir()
    Seq(1995, 1996, 1997).foreach(y =>
      ManifestTable.append(batch(y), dir, statsCols = Seq("d")))
    val v2 = spark.read.format("graft").load(dir)
    assert(scanOf(v2).isDefined, "expected a DSv2 BatchScanExec")
    assert(v2.count() == 30)
    assert(v2.schema.fieldNames.toSeq == Seq("k", "v", "d"))
    // row-for-row parity with the native manifest read
    val native = ManifestTable.read(spark, dir)
      .select("k", "v", "d").collect().map(_.toString).sorted.toSeq
    val got = v2.select("k", "v", "d").collect().map(_.toString).sorted.toSeq
    assert(got == native)
  }

  test("dir pruning through V2: a physically deleted dir stays unread when pushed filters prune it") {
    val dir = freshDir()
    Seq(1995, 1996, 1997).foreach(y =>
      ManifestTable.append(batch(y), dir, statsCols = Seq("d")))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head = ManifestTable.headVersion(spark, dir).get
    val paths = ManifestTable.pathsOf(fs, dir, head)
    val stats = ManifestTable.statsOf(fs, dir, head)
    val p1995 = paths.find(p =>
      ManifestTable.statsFor(stats(p), "d").exists(_._2.exists(_.startsWith("1995")))).get
    fs.delete(new org.apache.hadoop.fs.Path(dir, p1995), true)
    val pruned = spark.read.format("graft").load(dir)
      .filter(col("d") >= lit("1997-01-01") && col("d") <= lit("1997-12-31"))
    assert(pruned.count() == 10)
    assert(pruned.agg(sum(col("k"))).head.getLong(0)
      == (0 until 10).map(1997000L + _).sum)
    // an unpruned, unpushable scan must fail — proves the dir mattered.
    // (NOT .count(): the aggregate pushdown answers that from manifest
    // stats without touching the deleted dir — by design.)
    intercept[Exception] {
      spark.read.format("graft").load(dir).agg(sum(col("k"))).head
    }
  }

  test("snapshot pinning at load + versionAsOf time travel") {
    val dir = freshDir()
    ManifestTable.append(batch(2000), dir, statsCols = Seq("d"))
    val v1 = ManifestTable.headVersion(spark, dir).get
    val pinned = spark.read.format("graft").load(dir)
    ManifestTable.append(batch(2001), dir, statsCols = Seq("d"))
    assert(pinned.count() == 10)
    assert(spark.read.format("graft").load(dir).count() == 20)
    assert(spark.read.format("graft")
      .option("versionAsOf", v1).load(dir).count() == 10)
  }

  test("write side: first write to an uncommitted path, append, truncate-overwrite") {
    val dir = freshDir()
    // first write: no manifest exists — ACCEPT_ANY_SCHEMA path
    batch(1995).write.format("graft").option("statsCols", "d")
      .mode(SaveMode.Append).save(dir)
    assert(spark.read.format("graft").load(dir).count() == 10)
    batch(1996).write.format("graft").option("statsCols", "d")
      .mode(SaveMode.Append).save(dir)
    assert(spark.read.format("graft").load(dir).count() == 20)
    // stats were recorded through the V2 write: disjoint range prunes all
    val none = spark.read.format("graft").load(dir)
      .filter(col("d") >= lit("1990-01-01") && col("d") <= lit("1990-12-31"))
    assert(none.count() == 0)
    // overwrite = truncate + append through SupportsTruncate
    batch(1998, n = 4).write.format("graft").option("statsCols", "d")
      .mode(SaveMode.Overwrite).save(dir)
    val after = spark.read.format("graft").load(dir)
    assert(after.count() == 4)
    assert(after.agg(min(col("d")).cast("string")).head.getString(0)
      .startsWith("1998"))
    // V1 alias reads the SAME table (one format family, two API surfaces)
    assert(spark.read.format("graft-manifest").load(dir).count() == 4)
  }

  test("aggregate pushdown: count/min/max answered from manifest stats with every data dir DELETED") {
    val dir = freshDir()
    Seq(1995, 1996, 1997).foreach(y =>
      ManifestTable.append(batch(y), dir, statsCols = Seq("d", "k", "v")))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head = ManifestTable.headVersion(spark, dir).get
    // the hard proof: no data dir survives, only _manifests
    ManifestTable.pathsOf(fs, dir, head).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, p), true))
    val t = spark.read.format("graft").load(dir)
    val got = t.agg(
      count(lit(1)).as("n"), min(col("d")).as("lo_d"), max(col("d")).as("hi_d"),
      min(col("k")).as("lo_k"), max(col("k")).as("hi_k"),
      min(col("v")).as("lo_v"), max(col("v")).as("hi_v")).head
    assert(got.getLong(0) == 30L)
    assert(got.getDate(1).toString == "1995-06-10")
    assert(got.getDate(2).toString == "1997-06-19")
    assert(got.getLong(3) == 1995000L && got.getLong(4) == 1997009L)
    assert(got.getDouble(5) == 0.0 && got.getDouble(6) == 13.5)
    // count() goes through the same pushdown
    assert(t.count() == 30L)
    // the plan carries the pushed aggregate (description surface)
    val scan = scanOf(t.groupBy().agg(count(lit(1)).as("n"))).get
    assert(scan.description().contains("PushedAggregates"), scan.description())
  }

  test("aggregate pushdown under deletion vectors: COUNT(*) answers metadata-only, per-column aggs decline") {
    val wh = java.nio.file.Files.createTempDirectory("graft-v2mc").toString
    spark.conf.set("spark.sql.catalog.gvmc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvmc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvmc.lake")
    spark.sql("CREATE TABLE gvmc.lake.t (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='10', " +
      "'dml.mode'='merge-on-read')")
    (0 until 3).foreach { b =>
      spark.sql(s"INSERT INTO gvmc.lake.t VALUES " +
        (b * 10 until b * 10 + 10).map(k => s"($k,'v$k')").mkString(","))
    }
    spark.sql("DELETE FROM gvmc.lake.t WHERE k % 5 = 0") // masks 6 of 30
    // per-column extremes DECLINE under masks (a mask can hide the
    // extreme) but stay correct through the scan fallback
    val mm = spark.table("gvmc.lake.t").agg(min(col("k")), max(col("k"))).head
    assert(mm.getInt(0) == 1 && mm.getInt(1) == 29)
    val mmScan = scanOf(spark.table("gvmc.lake.t")
      .groupBy().agg(min(col("k")))).get
    assert(!mmScan.description().contains("PushedAggregates"),
      mmScan.description())
    // the hard proof of metadata-only COUNT(*): no data dir (nor mask
    // file) survives — the logical count is pure manifest arithmetic
    val tdir = s"$wh/lake/t"
    val tfs = new org.apache.hadoop.fs.Path(tdir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head = ManifestTable.headVersion(spark, tdir).get
    ManifestTable.pathsOf(tfs, tdir, head).foreach(p =>
      tfs.delete(new org.apache.hadoop.fs.Path(tdir, p), true))
    tfs.delete(new org.apache.hadoop.fs.Path(tdir, "_dv"), true)
    val counted = spark.table("gvmc.lake.t").groupBy()
      .agg(count(lit(1)).as("n"))
    assert(scanOf(counted).get.description().contains("PushedAggregates"))
    assert(counted.head.getLong(0) == 24L)
    assert(spark.table("gvmc.lake.t").count() == 24L)
  }

  test("MIN/MAX under masks: served when an UNMASKED dir attains the extreme, declined otherwise") {
    val wh = java.nio.file.Files.createTempDirectory("graft-v2me").toString
    spark.conf.set("spark.sql.catalog.gvme", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvme.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvme.lake")
    spark.sql("CREATE TABLE gvme.lake.t (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='10', " +
      "'dml.mode'='merge-on-read')")
    (0 until 3).foreach { b =>
      spark.sql(s"INSERT INTO gvme.lake.t VALUES " +
        (b * 10 until b * 10 + 10).map(k => s"($k,'v$k')").mkString(","))
    }
    // mask ONLY the middle dir: both extremes live in unmasked dirs,
    // so they are PROVABLY exact (a mask only removes rows) and the
    // pushdown serves them — with the masked-count — metadata-only
    spark.sql("DELETE FROM gvme.lake.t WHERE k = 15")
    val served = spark.table("gvme.lake.t")
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
    assert(scanOf(served).get.description().contains("PushedAggregates"),
      scanOf(served).get.description())
    // the hard proof: no data dir nor mask file survives
    val tdir = s"$wh/lake/t"
    val tfs = new org.apache.hadoop.fs.Path(tdir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head = ManifestTable.headVersion(spark, tdir).get
    ManifestTable.pathsOf(tfs, tdir, head).foreach(p =>
      tfs.delete(new org.apache.hadoop.fs.Path(tdir, p), true))
    tfs.delete(new org.apache.hadoop.fs.Path(tdir, "_dv"), true)
    val got = served.head
    assert(got.getInt(0) == 0 && got.getInt(1) == 29)
    assert(spark.table("gvme.lake.t").count() == 29L)
    // a second table masks the dir that ATTAINS the minimum: min must
    // decline (the extreme row itself may be the deleted one) while
    // max — attained by an unmasked dir — still serves
    spark.sql("CREATE TABLE gvme.lake.u (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='10', " +
      "'dml.mode'='merge-on-read')")
    (0 until 2).foreach { b =>
      spark.sql(s"INSERT INTO gvme.lake.u VALUES " +
        (b * 10 until b * 10 + 10).map(k => s"($k,'v$k')").mkString(","))
    }
    spark.sql("DELETE FROM gvme.lake.u WHERE k = 0")
    val lo = spark.table("gvme.lake.u").agg(min(col("k")))
    assert(!scanOf(lo).get.description().contains("PushedAggregates"),
      "min attained only by the masked dir must decline")
    assert(lo.head.getInt(0) == 1, "scan fallback stays correct")
    val hi = spark.table("gvme.lake.u").agg(max(col("k")))
    assert(scanOf(hi).get.description().contains("PushedAggregates"),
      "max attained by the unmasked dir must serve")
    assert(hi.head.getInt(0) == 19)
  }

  test("COUNT(col) answers from the #nulls lane with every data dir deleted") {
    val dir = freshDir()
    def slice(ks: Range, nullify: Long => Boolean) =
      ks.map(i => (i.toLong, if (nullify(i.toLong)) None else Some(s"x$i")))
        .toDF("k", "s")
    ManifestTable.append(slice(0 until 10, _ => false), dir,
      statsCols = Seq("k", "s"))
    ManifestTable.append(slice(10 until 20, _ % 2 == 0), dir,
      statsCols = Seq("k", "s"))
    ManifestTable.append(slice(20 until 30, _ => true), dir,
      statsCols = Seq("k", "s"))
    // COUNT(DISTINCT col) is NOT stats-answerable — it declines (and
    // answers through a real scan, so this runs while the files exist)
    val t = spark.read.format("graft").load(dir)
    val d = t.agg(countDistinct(col("s")).as("nd"))
    assert(scanOf(d).forall(!_.description().contains("PushedAggregates")))
    assert(d.head.getLong(0) == 15L)
    // the hard proof: COUNT(*)/COUNT(col) answer with no data file left
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head = ManifestTable.headVersion(spark, dir).get
    ManifestTable.pathsOf(fs, dir, head).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, p), true))
    val got = spark.read.format("graft").load(dir)
      .agg(count(lit(1)).as("n"), count(col("s")).as("nv")).head
    assert(got.getLong(0) == 30L && got.getLong(1) == 15L)
  }

  test("IS NULL / IS NOT NULL prune dirs via the #nulls lane (deleted-dir proof)") {
    def slice(ks: Range, nullify: Long => Boolean) =
      ks.map(i => (i.toLong, if (nullify(i.toLong)) None else Some(s"x$i")))
        .toDF("k", "s")
    def dirOfAllNonNull(dir: String): String = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val head = ManifestTable.headVersion(spark, dir).get
      val stats = ManifestTable.statsOf(fs, dir, head)
      ManifestTable.pathsOf(fs, dir, head).find(p =>
        ManifestTable.nullsFor(stats(p), "s").contains(0L)).get
    }
    // IS NULL skips the all-non-null dir (recorded nulls = 0)
    val d1 = freshDir()
    ManifestTable.append(slice(0 until 10, _ => false), d1,
      statsCols = Seq("k", "s"))
    ManifestTable.append(slice(10 until 20, _ % 2 == 0), d1,
      statsCols = Seq("k", "s"))
    val fs1 = new org.apache.hadoop.fs.Path(d1)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs1.delete(new org.apache.hadoop.fs.Path(d1, dirOfAllNonNull(d1)), true)
    val hit = spark.read.format("graft").load(d1)
      .filter(col("s").isNull).select("k").collect().map(_.getLong(0)).sorted
    assert(hit.toSeq == Seq(10L, 12L, 14L, 16L, 18L))
    // IS NOT NULL skips the all-null dir (min/max both %N)
    val d2 = freshDir()
    ManifestTable.append(slice(10 until 20, _ % 2 == 0), d2,
      statsCols = Seq("k", "s"))
    ManifestTable.append(slice(20 until 30, _ => true), d2,
      statsCols = Seq("k", "s"))
    val fs2 = new org.apache.hadoop.fs.Path(d2)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head2 = ManifestTable.headVersion(spark, d2).get
    val stats2 = ManifestTable.statsOf(fs2, d2, head2)
    val allNull = ManifestTable.pathsOf(fs2, d2, head2).find(p =>
      ManifestTable.statsFor(stats2(p), "s").exists(t =>
        t._2.isEmpty && t._3.isEmpty)).get
    fs2.delete(new org.apache.hadoop.fs.Path(d2, allNull), true)
    val hit2 = spark.read.format("graft").load(d2)
      .filter(col("s").isNotNull).select("k").collect().map(_.getLong(0)).sorted
    assert(hit2.toSeq == Seq(11L, 13L, 15L, 17L, 19L))
    // `s <=> NULL` (EqualNullSafe) prunes like IS NULL: d1's surviving
    // dir answers even though the all-non-null dir is deleted
    val hit3 = spark.read.format("graft").load(d1)
      .filter(col("s") <=> lit(null)).select("k")
      .collect().map(_.getLong(0)).sorted
    assert(hit3.toSeq == Seq(10L, 12L, 14L, 16L, 18L))
  }

  test("aggregate pushdown declines safely: stats-less dir, WHERE clause, unsupported func") {
    val dir = freshDir()
    ManifestTable.append(batch(1995), dir, statsCols = Seq("d"))
    ManifestTable.append(batch(1996), dir) // no stats → manifest can't answer
    val t = spark.read.format("graft").load(dir)
    // falls back to a real scan and still answers correctly
    val r = t.agg(count(lit(1)), min(col("d")).cast("string")).head
    assert(r.getLong(0) == 20L && r.getString(1) == "1995-06-10")
    // WHERE blocks pushdown (filters are residual) but stays correct
    val dir2 = freshDir()
    Seq(1995, 1996).foreach(y =>
      ManifestTable.append(batch(y), dir2, statsCols = Seq("d", "k")))
    val t2 = spark.read.format("graft").load(dir2)
    assert(t2.filter(col("d") >= lit("1996-01-01")).count() == 10L)
    // SUM is not stats-answerable: normal scan, correct value
    assert(t2.agg(sum(col("k"))).head.getLong(0)
      == (0 until 10).map(1995000L + _).sum + (0 until 10).map(1996000L + _).sum)
  }

  test("typed extremes: decimal, timestamp, string, and double NaN/Infinity round-trip the stats encoding") {
    val dir = freshDir()
    val rows = Seq(
      (BigDecimal("12.34"), java.sql.Timestamp.valueOf("2024-01-01 10:00:00.5"), "apple", 1.5),
      (BigDecimal("-99.99"), java.sql.Timestamp.valueOf("2024-06-30 23:59:59"), "zebra", Double.NegativeInfinity),
      (BigDecimal("500.01"), java.sql.Timestamp.valueOf("2023-12-31 00:00:01"), "mango", Double.NaN))
    val df = rows.toDF("dec", "ts", "s", "x")
      .withColumn("dec", col("dec").cast("decimal(10,2)"))
    ManifestTable.append(df, dir, statsCols = Seq("dec", "ts", "s", "x"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head = ManifestTable.headVersion(spark, dir).get
    ManifestTable.pathsOf(fs, dir, head).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, p), true))
    val t = spark.read.format("graft").load(dir)
    val g = t.agg(
      min(col("dec")), max(col("dec")), min(col("ts")).cast("string"),
      max(col("ts")).cast("string"), min(col("s")), max(col("s")),
      min(col("x")), max(col("x"))).head
    assert(g.getDecimal(0).toString == "-99.99" && g.getDecimal(1).toString == "500.01")
    assert(g.getString(2) == "2023-12-31 00:00:01")
    assert(g.getString(3) == "2024-06-30 23:59:59.5".replace("30 23", "30 23")
      || g.getString(3) == "2024-06-30 23:59:59") // max is the June ts
    assert(g.getString(4) == "apple" && g.getString(5) == "zebra")
    assert(g.getDouble(6) == Double.NegativeInfinity)
    assert(g.getDouble(7).isNaN) // Spark: NaN is greatest
  }

  test("estimateStatistics: small graft dim auto-broadcasts in a fact join") {
    val dir = freshDir()
    ManifestTable.append(batch(1995), dir, statsCols = Seq("d"))
    val dim = spark.read.format("graft").load(dir)
    val fact = spark.range(100000).selectExpr("id % 10000 AS k", "id AS payload")
    val plan = fact.join(dim, "k").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("SQL surface: CREATE TABLE USING graft + INSERT INTO/OVERWRITE") {
    val dir = freshDir()
    ManifestTable.append(batch(1995), dir, statsCols = Seq("d"))
    spark.sql("DROP TABLE IF EXISTS graft_v2_t")
    spark.sql(s"""CREATE TABLE graft_v2_t USING graft
                  OPTIONS (path '$dir', statsCols 'd')""")
    try {
      assert(spark.sql("SELECT count(*) FROM graft_v2_t").head.getLong(0) == 10)
      val got = spark.sql(
        """SELECT count(*) AS n, sum(k) AS ks FROM graft_v2_t
           WHERE d BETWEEN '1995-01-01' AND '1995-12-31'""").head
      assert(got.getLong(0) == 10)
      spark.sql("INSERT INTO graft_v2_t VALUES (1996000, 1.5, DATE'1996-06-10')")
      assert(spark.sql("SELECT count(*) FROM graft_v2_t").head.getLong(0) == 11)
      spark.sql("INSERT OVERWRITE graft_v2_t SELECT * FROM graft_v2_t WHERE k >= 1996000")
      assert(spark.sql("SELECT count(*) FROM graft_v2_t").head.getLong(0) == 1)
    } finally spark.sql("DROP TABLE IF EXISTS graft_v2_t")
  }

  test("board query s21_agg_pushdown actually pushes (plan-asserted) and matches a plain scan") {
    val q = graft.sources.Sources.s21_agg_pushdown(spark, sf)
    val scan = scanOf(q).get
    assert(scan.description().contains("PushedAggregates"), scan.description())
    // same numbers as computing the aggregate the ordinary way
    val plain = graft.Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) >= 1995)
      .agg(count(lit(1)), min(col("o_orderdate")), max(col("o_orderdate"))).head
    val got = q.head
    assert(got.getLong(0) == plain.getLong(0))
    assert(got.get(1) == plain.get(1) && got.get(2) == plain.get(2))
  }

  test("clusterBy write OPTION declares the spec once; compactAppend realizes it") {
    val dir = freshDir()
    batch(1995, n = 40).write.format("graft")
      .option("statsCols", "k,d").option("clusterBy", "k")
      .mode(SaveMode.Append).save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def head = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.clusterSpecOf(fs, dir, head).contains(Seq("k")))
    val v = head
    // same spec again → NO new metadata commit
    batch(1996, n = 40).write.format("graft")
      .option("statsCols", "k,d").option("clusterBy", "k")
      .mode(SaveMode.Append).save(dir)
    assert(head == v + 1, "unchanged spec must not add a metadata commit")
    ManifestTable.compactAppend(spark, dir, statsCols = Seq("k", "d"), k = 4)
    // k-clustered: a point-k scan opens one dir
    val paths = ManifestTable.prunePaths(fs, dir, head,
      Map("k" -> ("1995010", "1995010")),
      ManifestTable.declaredSchemaOf(spark, dir, head).get)
    assert(paths.size == 1, s"expected 1 dir, got ${paths.size}")
  }

  test("runtime filtering (DPP seam): a join-derived IN-set re-prunes commit dirs before execution") {
    val dir = freshDir()
    Seq(1995, 1996, 1997).foreach(y =>
      ManifestTable.append(batch(y), dir, statsCols = Seq("k", "d")))
    val head = ManifestTable.headVersion(spark, dir).get
    val schema = ManifestTable.declaredSchemaOf(spark, dir, head).get
    val scan = graft.sources.GraftScanBuilder(dir, head, schema).build()
      .asInstanceOf[graft.sources.GraftScan]
    // stats-covered columns are declared filterable
    assert(scan.filterAttributes().map(_.describe()).toSet == Set("k", "d"))
    def dirsOf(ps: Array[org.apache.spark.sql.connector.read.InputPartition]) =
      ps.flatMap {
        case f: org.apache.spark.sql.execution.datasources.FilePartition =>
          f.files.map(_.filePath.toString.split("/").dropRight(1).last)
      }.toSet
    val before = dirsOf(scan.planInputPartitions())
    assert(before.size == 3, s"expected 3 commit dirs, got $before")
    // the runtime filter Spark would plant from a dimension join:
    // an IN-set on k — folds to its envelope, prunes to 1996's dir
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array(1996003L, 1996007L))))
    val after = dirsOf(scan.planInputPartitions())
    assert(after.size == 1, s"runtime filter did not prune: $after")
    assert(after.subsetOf(before))
    // statistics follow the pruned set (broadcast planning sees reality)
    val st = scan.estimateStatistics()
    assert(st.numRows.getAsLong == 10L, st.numRows)
  }

  test("DPP end-to-end: Spark plants a dynamic-pruning filter on the graft scan and only the matching dir is read") {
    val dir = freshDir()
    (0 until 8).foreach { b =>
      val rows = (0 until 20000).map(i => (b * 100000L + i, i * 1.0))
      ManifestTable.append(rows.toDF("k", "v"), dir,
        statsCols = Seq("k"), retainGenerations = 10)
    }
    // dim must be file-backed: Spark's partition-pruning heuristic
    // requires a scan under the filtering side
    (0 until 50).map(i => (700000L + i, s"n$i")).toDF("k", "name")
      .write.mode("overwrite").parquet(dir + "_dim")
    val fact = spark.read.format("graft").load(dir)
    val dim = spark.read.parquet(dir + "_dim").filter(col("name") =!= "nope")
    val joined = fact.join(dim, "k")
    // drive the SAME queryExecution whose metrics we inspect below
    // (count() would plan and execute a separate aggregate QE)
    assert(joined.collect().length == 50)
    val finalPlan = joined.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(finalPlan.toString.contains("dynamicpruningexpression"),
      finalPlan.toString.split("\n").filter(_.contains("BatchScan")).mkString("\n"))
    // behavioral proof: the scan emitted ONE dir's rows (the dim's keys
    // all live in the [700000, 719999] dir), not the table's 160k —
    // the runtime IN-set reached GraftScan.filter and re-pruned dirs
    // before execution. (A deleted-dir proof is impossible here:
    // BatchScanExec eagerly plans the unfiltered partition list once
    // during planning, by design.)
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
      p.collect {
        case b: BatchScanExec => Seq(b)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      }.flatten
    val graftScan = scans(finalPlan)
      .find(_.scan.isInstanceOf[graft.sources.GraftScan]).get
    val scanRows = graftScan.metrics("numOutputRows").value
    assert(scanRows == 20000L, s"scan emitted $scanRows rows — runtime filter not applied")
  }

  test("limit pushdown: a pure LIMIT opens just enough commit dirs to cover it") {
    val dir = freshDir()
    Seq(1995, 1996, 1997, 1998).foreach(y =>
      ManifestTable.append(batch(y), dir, statsCols = Seq("d"))) // 4 dirs x 10 rows
    val limited = spark.read.format("graft").load(dir).limit(12)
    val scan = scanOf(limited).get
    assert(scan.description().contains("PushedLimit=12"), scan.description())
    // 12 rows need 2 of the 4 dirs (rowcounts from #stats)
    val dirs = limited.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.inputRDD.partitions.flatMap {
        case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
          p.inputPartitions.flatMap {
            case f: org.apache.spark.sql.execution.datasources.FilePartition =>
              f.files.map(_.filePath.toString.split("/").dropRight(1).last)
          }
      }.toSet
    }.get
    assert(dirs.size == 2, s"expected 2 dirs planned, got $dirs")
    assert(limited.count() == 12)
    // a LIMIT under a filter is NOT dir-truncated (partial-push rules):
    // matching rows beyond a prefix must survive
    val filtered = spark.read.format("graft").load(dir)
      .filter(col("d") >= lit("1998-01-01")).limit(5)
    assert(filtered.count() == 5)
    assert(!scanOf(filtered).get.description().contains("PushedLimit"),
      scanOf(filtered).get.description())
  }

  test("a stream outlives GC of its pinned manifest (colmap cached at construction)") {
    val dir = freshDir()
    ManifestTable.append(batch(1995), dir, statsCols = Seq("d"),
      retainGenerations = 10)
    val v1 = ManifestTable.headVersion(spark, dir).get
    // the stream pins v1's column map AT CONSTRUCTION
    val stream = new graft.sources.GraftMicroBatchStream(dir,
      batch(1995).schema, batch(1995).schema, Array.empty, Map.empty,
      schemaVersion = v1)
    // retention-2 appends GC manifest v1 out from under the stream
    // (head and head-1 stay retained so the batch itself can plan)
    ManifestTable.append(batch(1996), dir, statsCols = Seq("d"),
      retainGenerations = 2)
    ManifestTable.append(batch(1997), dir, statsCols = Seq("d"),
      retainGenerations = 2)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!ManifestTable.versions(fs, dir).contains(v1),
      "fixture must GC the pinned version")
    // a per-batch manifest read of v1 would now kill the query with
    // FileNotFound — the cached map must keep serving batches
    val head = ManifestTable.headVersion(spark, dir).get
    stream.planInputPartitions(graft.sources.GraftStreamOffset(head - 1),
      graft.sources.GraftStreamOffset(head)): Unit
    stream.createReaderFactory(): Unit
  }

  test("limit pushdown under deletion vectors: masked dirs count their logical lower bound") {
    // catalog table (MoR routing needs table props) — 4 dirs x 10 rows
    val wh = java.nio.file.Files.createTempDirectory("graft-v2lim").toString
    spark.conf.set("spark.sql.catalog.gvl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvl.lake")
    spark.sql("CREATE TABLE gvl.lake.t (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='10', " +
      "'dml.mode'='merge-on-read')")
    (0 until 4).foreach { b =>
      spark.sql(s"INSERT INTO gvl.lake.t VALUES " +
        (b * 10 until b * 10 + 10).map(k => s"($k,'v$k')").mkString(","))
    }
    // mask 6 of the LEXICALLY-FIRST dir's 10 rows (dir names are random
    // cids, so the limit prefix is lexical, not insert order): its
    // logical lower bound drops to 4, so LIMIT 20 must now plan THREE
    // dirs (4+10+10 = 24 covers it; unmasked 10+10 took two) — and
    // still deliver exactly 20 rows
    val tdir = s"$wh/lake/t"
    val tfs = new org.apache.hadoop.fs.Path(tdir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head0 = ManifestTable.headVersion(spark, tdir).get
    val first = ManifestTable.pathsOf(tfs, tdir, head0).min
    val lo = ManifestTable.statsFor(
      ManifestTable.statsOf(tfs, tdir, head0)(first), "k").get._2.get.toInt
    spark.sql(s"DELETE FROM gvl.lake.t WHERE k >= $lo AND k < ${lo + 6}")
    val limited = spark.table("gvl.lake.t").limit(20)
    val dirs = limited.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputRDD.partitions.flatMap {
        case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
          p.inputPartitions.flatMap {
            case f: org.apache.spark.sql.execution.datasources.FilePartition =>
              f.files.map(_.filePath.toString.split("/").dropRight(1).last)
          }
      }.toSet
    }.headOption.getOrElse(Set.empty[String])
    assert(dirs.size == 3, s"expected 3 dirs planned under masks, got $dirs")
    assert(limited.count() == 20)
    // the masked prefix alone cannot cover the limit — a LIMIT larger
    // than the logical table still returns every surviving row
    assert(spark.table("gvl.lake.t").limit(50).count() == 34)
  }

  private def streamOnce(dir: String, ckpt: String,
                         readOpts: Map[String, String] = Map.empty): Seq[Long] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var reader = spark.readStream.format("graft")
    readOpts.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.synchronized { buf ++= b.select("k").collect().map(_.getLong(0)) }: Unit)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    buf.toSeq
  }

  test("X13 streaming source: snapshot first batch, exactly-once tail across restarts") {
    val dir = freshDir()
    val ckpt = freshDir() + "/ckpt"
    ManifestTable.append(batch(1995), dir, statsCols = Seq("d"),
      retainGenerations = 10)
    ManifestTable.append(batch(1996), dir, statsCols = Seq("d"),
      retainGenerations = 10)
    def ks(y: Int) = (0 until 10).map(y * 1000L + _)
    // first run: the whole current table as the initial snapshot
    assert(streamOnce(dir, ckpt).sorted == (ks(1995) ++ ks(1996)).sorted)
    // tail: only the new commit dir's rows, exactly once
    ManifestTable.append(batch(1997), dir, statsCols = Seq("d"),
      retainGenerations = 10)
    assert(streamOnce(dir, ckpt).sorted == ks(1997).sorted)
    // nothing new → empty run, offset stands still
    assert(streamOnce(dir, ckpt).isEmpty)
  }

  test("startingVersion at the retention edge fails AT QUERY START naming the remedy (r19 review find)") {
    val dir = freshDir()
    // age the table so the oldest retained version is well past 1
    (1 to 6).foreach(i =>
      ManifestTable.append(batch(1990 + i), dir, retainGenerations = 2))
    val fsx = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val oldest = ManifestTable.versions(fsx, dir).head
    assert(oldest > 1)
    // pointing at the OLDEST retained version needs its predecessor to
    // diff against, which is gone by definition — the refusal must be
    // immediate and name the usable floor, not blame retention sizing
    val e = intercept[Exception] {
      streamOnce(dir, freshDir() + "/ck",
        Map("startingVersion" -> oldest.toString))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("predecessor") &&
      m.contains(s"startingVersion >= ${oldest + 1}")), msgs(e))
    // the named floor WORKS
    val tail = streamOnce(dir, freshDir() + "/ck2",
      Map("startingVersion" -> (oldest + 1).toString))
    assert(tail.nonEmpty)
  }

  test("X13 streaming source: startingVersion, and removed dirs fail without ignoreChanges") {
    val dir = freshDir()
    ManifestTable.append(batch(1995), dir, retainGenerations = 10)
    val v1 = ManifestTable.headVersion(spark, dir).get
    ManifestTable.append(batch(1996), dir, retainGenerations = 10)
    // startingVersion: begin from v2's additions, skip the v1 snapshot
    val tail = streamOnce(dir, freshDir() + "/ck",
      Map("startingVersion" -> (v1 + 1).toString))
    assert(tail.sorted == (0 until 10).map(1996000L + _).sorted)
    // an overwrite REMOVES dirs: the append-only stream must fail loudly
    val ckpt2 = freshDir() + "/ck2"
    assert(streamOnce(dir, ckpt2).size == 20)
    batch(1999, n = 4).write.format("graft").option("retainGenerations", 10)
      .mode(SaveMode.Overwrite).save(dir)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      streamOnce(dir, ckpt2)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("ignoreChanges")), e.getMessage)
    // ...and proceeds under ignoreChanges, emitting the added dir
    val got = streamOnce(dir, ckpt2, Map("ignoreChanges" -> "true"))
    assert(got.sorted == (0 until 4).map(1999000L + _).sorted)
  }

  test("X13 admission control: a commit backlog drains in bounded batches, exactly once") {
    val dir = freshDir()
    (1995 to 2000).foreach(y => ManifestTable.append(batch(y), dir,
      statsCols = Seq("d"), retainGenerations = 20))
    // unit leg: latestOffset honors ReadLimit at version granularity —
    // maxFiles(1) admits exactly one version per call (at-least-one
    // progress: even the first version exceeds a 1-file budget)
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val stream = new graft.sources.GraftMicroBatchStream(dir,
      ManifestTable.read(spark, dir).schema,
      ManifestTable.read(spark, dir).schema, Array.empty, Map.empty)
    val o1 = stream.latestOffset(GraftStreamOffset(0L), ReadLimit.maxFiles(1))
      .asInstanceOf[GraftStreamOffset]
    assert(o1.version == 1L, s"one oversized version per call, got $o1")
    val o2 = stream.latestOffset(o1, ReadLimit.maxFiles(1))
      .asInstanceOf[GraftStreamOffset]
    assert(o2.version == 2L)
    // a generous byte budget admits several versions but not all
    val oBig = stream.latestOffset(GraftStreamOffset(0L),
      ReadLimit.allAvailable()).asInstanceOf[GraftStreamOffset]
    assert(oBig.version == 6L)
    // end-to-end: AvailableNow + maxFilesPerTrigger=1 drains the
    // 6-commit backlog as 6 one-version batches through the checkpoint
    val ckpt = freshDir() + "/ckpt"
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1").load(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.synchronized { sizes += b.count() }: Unit)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val real = sizes.filter(_ > 0)
    assert(real.length == 6 && real.forall(_ == 10L),
      s"expected 6 bounded batches of one version each, got $sizes")
    // restart with more data: pacing resumes from the checkpoint,
    // exactly once — only the new version flows
    ManifestTable.append(batch(2001), dir, statsCols = Seq("d"),
      retainGenerations = 20)
    assert(streamOnce(dir, ckpt, Map("maxFilesPerTrigger" -> "1"))
      .sorted == (0 until 10).map(2001000L + _).sorted)
  }

  test("V2 read equals V1 read over a compacted multi-dir table (rb= layout)") {
    val dir = freshDir()
    Seq(1995, 1996, 1997, 1998).foreach(y =>
      ManifestTable.append(batch(y, n = 50), dir, statsCols = Seq("d")))
    ManifestTable.compactAppend(spark, dir, statsCols = Seq("d"), k = 3)
    val v2 = spark.read.format("graft").load(dir)
      .select("k", "v", "d").collect().map(_.toString).sorted.toSeq
    val v1 = spark.read.format("graft-manifest").load(dir)
      .select("k", "v", "d").collect().map(_.toString).sorted.toSeq
    assert(v2 == v1 && v2.size == 200)
  }
}
