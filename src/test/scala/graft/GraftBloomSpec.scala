package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S44 — per-dir bloom point indexes (`bloomCols` table property): on a
  * high-cardinality column whose values scatter across every commit dir
  * (ids, urls, hashes), min/max stats prune nothing — each dir's range
  * spans the keyspace — while a per-dir membership sketch prunes every
  * dir that provably lacks the probed key. Sidecars live under `_idx/`,
  * the `#bloomidx` manifest channel references them (auto-carried by
  * every commit, keyed by PHYSICAL column name so renames cannot
  * detach them), compactions rebuild them, and GC sweeps unreferenced
  * names. Pruning-only: a missing/corrupt sidecar just prunes less. */
class GraftBloomSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-bloom").toString
    spark.conf.set("spark.sql.catalog.gbl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbl.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbl.lake")
    dir
  }
  private def fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())

  /** Four dirs whose key sets INTERLEAVE (dir b holds k ≡ b mod 4), so
    * every dir's [min, max] spans the keyspace — range stats cannot
    * prune a point lookup; only the membership sketch can. */
  private def interleavedTable(name: String,
                               extraProps: String = ""): String = {
    wh: Unit
    spark.sql(s"DROP TABLE IF EXISTS gbl.lake.$name")
    spark.sql(s"CREATE TABLE gbl.lake.$name (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'bloomCols'='k', " +
      s"'bloomFpp'='0.001', 'retainGenerations'='10'$extraProps)")
    (0 until 4).foreach { b =>
      spark.sql(s"INSERT INTO gbl.lake.$name VALUES " +
        (0 until 50).map(i => s"(${4 * i + b},'v${4 * i + b}')").mkString(","))
    }
    s"$wh/lake/$name"
  }

  private def plannedDirs(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputRDD.partitions.flatMap {
          case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
            p.inputPartitions.flatMap {
              case f: org.apache.spark.sql.execution.datasources.FilePartition =>
                f.files.map(_.filePath.toString.split("/").dropRight(1).last)
            }
        }.toSet
    }.headOption.getOrElse(Set.empty)

  test("point lookups prune dirs whose ranges all cover the key") {
    val dir = interleavedTable("b1")
    val head = ManifestTable.headVersion(spark, dir).get
    val blooms = ManifestTable.bloomsOf(fs, dir, head)
    assert(blooms.size == 4, s"every dir indexed: $blooms")
    assert(fs.exists(new Path(dir, "_idx")))
    // range stats are useless here: every dir's range covers k=8
    val schema = ManifestTable.declaredSchemaOf(spark, dir, head).get
    assert(ManifestTable.prunePaths(fs, dir, head,
      Map("k" -> ("8", "8")), schema).size == 4,
      "interleaved ranges must defeat min/max pruning (the fixture's point)")
    // ...the bloom prunes to the one dir that holds it
    val q = spark.table("gbl.lake.b1").where(col("k") === 8L)
    assert(q.collect().map(_.getString(1)).toSeq == Seq("v8"))
    assert(plannedDirs(q).size == 1,
      s"bloom must prune 3 of 4 dirs, planned ${plannedDirs(q)}")
    // IN over two residue classes keeps exactly those dirs
    val q2 = spark.table("gbl.lake.b1").where(col("k").isin(8L, 13L))
    assert(q2.collect().map(_.getString(1)).sorted.toSeq == Seq("v13", "v8"))
    assert(plannedDirs(q2).size == 2, plannedDirs(q2))
    // an absent key plans ZERO dirs and returns nothing
    val q3 = spark.table("gbl.lake.b1").where(col("k") === 999999L)
    assert(q3.isEmpty && plannedDirs(q3).isEmpty)
    // $files surfaces the coverage per dir
    val bc = spark.sql("SELECT bloom_cols FROM gbl.lake.`b1$files`")
      .collect().map(r => Option(r.getString(0)))
    assert(bc.length == 4 && bc.forall(_.contains("k")), bc.toSeq)
  }

  test("probe budgets: sidecar cap leaves the tail unpruned but exact; point cap skips pruning") {
    val dir = interleavedTable("b9")
    val head = ManifestTable.headVersion(spark, dir).get
    val paths = ManifestTable.pathsOf(fs, dir, head)
    val blooms = ManifestTable.bloomsOf(fs, dir, head)
    val holds8 = paths.filter(p => spark.read
      .parquet(s"$dir/$p").where(col("k") === 8L).limit(1).count() > 0)
    assert(holds8.size == 1)
    val (oldSc, oldPts) = (graft.ScaleKnobs.BloomProbeMaxSidecars,
      graft.ScaleKnobs.BloomProbeMaxPoints)
    try {
      // sidecar budget 2: only the first two dirs (plan order) probe;
      // the tail passes UNPRUNED — exact answer, bounded driver I/O
      graft.ScaleKnobs.BloomProbeMaxSidecars = 2
      val budget = new java.util.concurrent.atomic.AtomicInteger(2)
      val sharedCache = scala.collection.mutable.Map.empty[String,
        Option[org.apache.spark.util.sketch.BloomFilter]]
      val kept = ManifestTable.pruneByBloom(fs, dir, paths, blooms,
        Seq("k" -> Set("8")), sharedCache, budget)
      val tail = paths.drop(2)
      assert(tail.forall(kept.contains), s"budget tail must survive: $kept")
      val expectProbedKeep = paths.take(2).filter(holds8.contains)
      assert(kept.filterNot(tail.contains).sorted ==
        expectProbedKeep.sorted, s"probed prefix prunes exactly: $kept")
      // end-to-end under the budget: fewer dirs than unbudgeted-but-
      // unpruned, and the value is exact
      val q = spark.table("gbl.lake.b9").where(col("k") === 8L)
      assert(q.collect().map(_.getString(1)).toSeq == Seq("v8"))
      assert(plannedDirs(q).size < 4 && plannedDirs(q).nonEmpty)
      // point cap: a probe set past it skips bloom pruning outright
      // (a huge IN-set is a join, not a point lookup) — still exact
      graft.ScaleKnobs.BloomProbeMaxSidecars = oldSc
      // the budget is PER SCAN, shared across invocations (the DPP
      // runtime-filter call reuses the static prune's allowance): a
      // drained budget loads nothing new, but already-cached sidecars
      // still prune — bounded I/O, never bounded correctness
      assert(budget.get() == 0, s"2 loads must drain the budget: ${budget.get()}")
      val keptAgain = ManifestTable.pruneByBloom(fs, dir, paths, blooms,
        Seq("k" -> Set("8")), sharedCache, budget)
      assert(keptAgain == kept,
        "drained budget + warm cache must reproduce the probed answer")
      graft.ScaleKnobs.BloomProbeMaxPoints = 1
      val kept2 = ManifestTable.pruneByBloom(fs, dir, paths, blooms,
        Seq("k" -> Set("8", "13")), scala.collection.mutable.Map.empty,
        new java.util.concurrent.atomic.AtomicInteger(
          graft.ScaleKnobs.BloomProbeMaxSidecars))
      assert(kept2 == paths, "past the point cap, nothing prunes")
      val q2 = spark.table("gbl.lake.b9").where(col("k").isin(8L, 13L))
      assert(q2.collect().map(_.getString(1)).sorted.toSeq ==
        Seq("v13", "v8"))
      assert(plannedDirs(q2).size == 4)
    } finally {
      graft.ScaleKnobs.BloomProbeMaxSidecars = oldSc
      graft.ScaleKnobs.BloomProbeMaxPoints = oldPts
    }
  }

  test("blooms carry across metadata commits, rebuild on compaction, drop with rewritten dirs") {
    val dir = interleavedTable("b2")
    // pointer commits auto-carry the channel
    spark.sql("ALTER TABLE gbl.lake.b2 SET TBLPROPERTIES ('note'='x')")
    ManifestTable.tag(spark, dir, "t1", retainGenerations = 10)
    val v1 = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.bloomsOf(fs, dir, v1).size == 4,
      "ALTER/tag must carry bloom entries")
    // a CoW DELETE on the interleaved layout touches EVERY dir (each
    // range covers the key — exactly the workload this index exists
    // for): all four entries drop with their rewritten paths — never
    // stale — and the REPLACEMENT dir gets a fresh index of its own
    // (publishRewrite builds one), so point pruning survives CoW DML.
    // The deleted key is now absent from the new sketch: the lookup
    // plans ZERO dirs.
    spark.sql("DELETE FROM gbl.lake.b2 WHERE k = 8")
    val v2 = ManifestTable.headVersion(spark, dir).get
    val after = ManifestTable.bloomsOf(fs, dir, v2)
    assert(after.size == 1 && after.keySet.forall(!_.startsWith("a-")),
      s"the replacement dir must carry a fresh index: $after")
    val gone = spark.table("gbl.lake.b2").where(col("k") === 8L)
    assert(gone.isEmpty && plannedDirs(gone).isEmpty,
      "the rewritten sketch must prove the deleted key absent")
    assert(spark.table("gbl.lake.b2").where(col("k") === 12L).count() == 1)
    // full compaction rebuilds the index over its output dirs
    spark.sql("CALL gbl.system.compact(table => 'lake.b2', k => 2)")
    val v3 = ManifestTable.headVersion(spark, dir).get
    val rebuilt = ManifestTable.bloomsOf(fs, dir, v3)
    assert(rebuilt.nonEmpty && rebuilt.keySet.forall(_.startsWith("a-")),
      s"compaction must rebuild blooms over its outputs: $rebuilt")
    val q = spark.table("gbl.lake.b2").where(col("k") === 13L)
    assert(q.collect().map(_.getString(1)).toSeq == Seq("v13"))
    assert(plannedDirs(q).size == 1, plannedDirs(q))
  }

  test("RENAME COLUMN cannot detach the index (physical-name keys)") {
    val dir = interleavedTable("b3")
    spark.sql("ALTER TABLE gbl.lake.b3 RENAME COLUMN k TO id")
    val q = spark.table("gbl.lake.b3").where(col("id") === 8L)
    assert(q.collect().map(_.getString(1)).toSeq == Seq("v8"))
    assert(plannedDirs(q).size == 1,
      s"bloom pruning must survive a rename: ${plannedDirs(q)}")
    dir: Unit
  }

  test("GC sweeps unreferenced _idx names; referenced ones survive") {
    val dir = interleavedTable("b4")
    // compact with tiny retention: the pre-compaction sidecars lose
    // their last referencing manifest, the rebuilt ones stay referenced
    ManifestTable.compactAppend(spark, dir, Seq("k"), k = 2,
      retainGenerations = 1)
    val idxRoot = new Path(dir, "_idx")
    assert(fs.exists(idxRoot) && fs.listStatus(idxRoot).length >= 2)
    ageTree(fs, idxRoot, 3L * 60 * 60 * 1000)
    ManifestTable.vacuum(spark, dir, retainGenerations = 1)
    val left = fs.listStatus(idxRoot).map(_.getPath.getName).toSeq
    assert(left.length == 1, s"exactly the live index survives: $left")
    val head = ManifestTable.headVersion(spark, dir).get
    val referenced = ManifestTable.bloomsOf(fs, dir, head).values
      .flatMap(ManifestTable.bloomEntries(_).values)
      .map(_.split("/")(1)).toSet
    assert(left.toSet == referenced)
    // and the surviving index still prunes
    val q = spark.table("gbl.lake.b4").where(col("k") === 8L)
    assert(q.collect().map(_.getString(1)).toSeq == Seq("v8"))
    assert(plannedDirs(q).size == 1, plannedDirs(q))
  }

  test("string bloom columns; unsupported types skip loudly-safely") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gbl.lake.b5")
    spark.sql("CREATE TABLE gbl.lake.b5 (url STRING, d DOUBLE) " +
      "TBLPROPERTIES ('statsCols'='url', 'bloomCols'='url,d', " +
      "'bloomFpp'='0.001', 'retainGenerations'='10')")
    (0 until 3).foreach { b =>
      spark.sql(s"INSERT INTO gbl.lake.b5 VALUES " +
        (0 until 40).map(i => s"('https://h${3 * i + b}.example/p',${i * 1.0})")
          .mkString(","))
    }
    val dir = s"$wh/lake/b5"
    val head = ManifestTable.headVersion(spark, dir).get
    val blooms = ManifestTable.bloomsOf(fs, dir, head)
    // only the string column indexed — DOUBLE's rendering is not
    // probe-reproducible, so it is skipped, not wrong
    assert(blooms.size == 3 &&
      blooms.values.forall(p => ManifestTable.bloomEntries(p).keySet == Set("url")),
      blooms.toString)
    val q = spark.table("gbl.lake.b5")
      .where(col("url") === "https://h4.example/p")
    assert(q.count() == 1L)
    assert(plannedDirs(q).size == 1, plannedDirs(q))
  }

  test("s44 board query matches the recomputed oracle on sf0.001") {
    val r = graft.sources.Sources.s44_bloom_lookup(spark, sf).head()
    assert(r.getLong(0) == 3L, r.toString) // three probed keys, one row each
    assert(r.getBoolean(3), "bloom_pruned witness must hold: " + r.toString)
    assert(graft.sources.Sources.s44_bloom_lookup(spark, sf).head() == r)
  }

  test("masks and blooms compose: a deleted key's dir is opened, row masked") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gbl.lake.b6")
    spark.sql("CREATE TABLE gbl.lake.b6 (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'bloomCols'='k', " +
      "'bloomFpp'='0.001', 'retainGenerations'='10', " +
      "'dml.mode'='merge-on-read')")
    (0 until 4).foreach { b =>
      spark.sql(s"INSERT INTO gbl.lake.b6 VALUES " +
        (0 until 50).map(i => s"(${4 * i + b},'v${4 * i + b}')").mkString(","))
    }
    spark.sql("DELETE FROM gbl.lake.b6 WHERE k = 8")
    // the bloom is a SUPERSET sketch — masks never update it — so the
    // dir is still opened; the mask filter removes the row: empty
    // result, no resurrect, and unrelated keys keep full pruning
    assert(spark.table("gbl.lake.b6").where(col("k") === 8L).isEmpty)
    val q = spark.table("gbl.lake.b6").where(col("k") === 13L)
    assert(q.collect().map(_.getString(1)).toSeq == Seq("v13"))
    assert(plannedDirs(q).size == 1, plannedDirs(q))
  }
}
