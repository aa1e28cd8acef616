package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S49 — write-audit-publish branches: a branch is a full manifest
  * table at `_branches/<name>` (shallow clone of the parent head —
  * every surface works on it), and publish fast-forwards the parent to
  * the branch head in one atomic commit, moving branch-local dirs into
  * the parent tree with stats/dv/bloom channels re-keyed in step. */
class GraftBranchSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-br").toString
    spark.conf.set("spark.sql.catalog.gbr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbr.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbr.lake")
    dir
  }
  private def fs =
    new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())

  private def freshTable(name: String, rows: Seq[(Int, String)]): String = {
    wh: Unit
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory(s"graft-br-$name").toString + "/t"
    ManifestTable.append(rows.toDF("k", "v"), dir,
      statsCols = Seq("k"), retainGenerations = 10): Unit
    dir
  }

  test("WAP cycle: cut, write in isolation, audit, publish, consumed") {
    val s = spark; import s.implicits._
    val dir = freshTable("wap", Seq((1, "a"), (2, "b")))
    ManifestTable.createBranch(spark, dir, "audit"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "audit")
    // stage a load on the branch
    ManifestTable.append(Seq((3, "c"), (4, "d")).toDF("k", "v"), bdir,
      statsCols = Seq("k")): Unit
    // audit isolation: the branch sees old+new, the parent only old
    assert(ManifestTable.read(spark, bdir).count() === 4)
    assert(ManifestTable.read(spark, dir).count() === 2)
    val parentHeadBefore = ManifestTable.headVersion(spark, dir).get
    val v = ManifestTable.publishBranch(spark, dir, "audit")
    assert(v === parentHeadBefore + 1, "fast-forward = exactly one commit")
    val got = ManifestTable.read(spark, dir).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    // the branch is consumed
    assert(!fs.exists(new Path(bdir)))
    assert(ManifestTable.branches(spark, dir).isEmpty)
    // every published path resolves inside the PARENT tree and stats
    // re-keyed with them (pruning keeps working on published dirs)
    val head = ManifestTable.headVersion(spark, dir).get
    val paths = ManifestTable.pathsOf(fs, dir, head)
    assert(paths.forall(p => !ManifestTable.isForeign(p)),
      s"published entries must be parent-relative, got $paths")
    val stats = ManifestTable.statsOf(fs, dir, head)
    assert(paths.forall(stats.contains),
      "stats must follow the moved dirs through the re-key")
  }

  test("rebase publish: disjoint parent appends during the audit land with the branch") {
    val s = spark; import s.implicits._
    val dir = freshTable("div", Seq((1, "a")))
    ManifestTable.createBranch(spark, dir, "b1"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "b1")
    ManifestTable.append(Seq((9, "z")).toDF("k", "v"), bdir,
      statsCols = Seq("k")): Unit
    // the parent moves on — continuous ingest during the audit window
    // (retention must keep the base version: the three-way anchor)
    ManifestTable.append(Seq((2, "b")).toDF("k", "v"), dir,
      statsCols = Seq("k"), retainGenerations = 10): Unit
    ManifestTable.append(Seq((3, "c")).toDF("k", "v"), dir,
      statsCols = Seq("k"), retainGenerations = 10): Unit
    val headBefore = ManifestTable.headVersion(spark, dir).get
    ManifestTable.publishBranch(spark, dir, "b1"): Unit
    assert(ManifestTable.headVersion(spark, dir).get === headBefore + 1,
      "a rebase publish is still exactly ONE parent commit")
    // BOTH lineages land exactly once
    val got = ManifestTable.read(spark, dir).collect()
      .map(_.getInt(0)).sorted.toSeq
    assert(got === Seq(1, 2, 3, 9))
    assert(ManifestTable.branches(spark, dir).isEmpty, "branch consumed")
    val head = ManifestTable.headVersion(spark, dir).get
    val paths = ManifestTable.pathsOf(fs, dir, head)
    assert(paths.forall(p => !ManifestTable.isForeign(p)))
    assert(paths.forall(ManifestTable.statsOf(fs, dir, head).contains),
      "stats carry for parent AND branch dirs through the rebase")
  }

  test("rebase publish refuses when both lineages touched the same dir") {
    val s = spark; import s.implicits._
    val dir = freshTable("ovl", (1 to 10).map(i => (i, s"v$i")))
    ManifestTable.createBranch(spark, dir, "b2"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "b2")
    // both sides rewrite the SAME base dir (CoW delete each)
    ManifestTable.deleteWhere(spark, bdir, col("k") === 1, Map.empty): Unit
    ManifestTable.deleteWhere(spark, dir, col("k") === 10, Map.empty): Unit
    val e = intercept[IllegalStateException] {
      ManifestTable.publishBranch(spark, dir, "b2")
    }
    assert(e.getMessage.contains("touched"))
    // parent unharmed, branch intact and still readable, then drops
    assert(ManifestTable.read(spark, dir).count() === 9)
    assert(ManifestTable.read(spark, bdir).count() === 9)
    ManifestTable.dropBranch(spark, dir, "b2")
    assert(ManifestTable.read(spark, dir).count() === 9)
  }

  test("rebase publish refuses when identity ids were minted on both lineages") {
    wh: Unit
    spark.sql("""CREATE TABLE gbr.lake.idc (
      id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)
      TBLPROPERTIES ('retainGenerations'='10')""")
    spark.sql("INSERT INTO gbr.lake.idc (v) VALUES ('p1')")
    spark.sql("CALL gbr.system.create_branch(table => 'lake.idc', name => 'm2')")
    spark.sql("INSERT INTO gbr.lake.`idc$branch$m2` (v) VALUES ('b1')")
    // the PARENT also mints during the audit — both advanced the same
    // watermark; the staged branch ids could collide
    spark.sql("INSERT INTO gbr.lake.idc (v) VALUES ('p2')")
    val e = intercept[Exception] {
      spark.sql("CALL gbr.system.publish_branch(table => 'lake.idc', name => 'm2')")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("idwm:") || m.contains("identity")))
    spark.sql("CALL gbr.system.drop_branch(table => 'lake.idc', name => 'm2')")
  }

  test("rebase publish refuses when retention outran the branch base") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-br-ret").toString + "/t"
    // retainGenerations = 2: two parent commits retire the base manifest
    ManifestTable.append(Seq((1, "a")).toDF("k", "v"), dir,
      statsCols = Seq("k"), retainGenerations = 2): Unit
    ManifestTable.createBranch(spark, dir, "old"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "old")
    ManifestTable.append(Seq((9, "z")).toDF("k", "v"), bdir,
      statsCols = Seq("k")): Unit
    (2 to 5).foreach(i => ManifestTable.append(
      Seq((i, s"v$i")).toDF("k", "v"), dir,
      statsCols = Seq("k"), retainGenerations = 2): Unit)
    val e = intercept[IllegalStateException] {
      ManifestTable.publishBranch(spark, dir, "old")
    }
    assert(e.getMessage.contains("retained"))
    ManifestTable.dropBranch(spark, dir, "old")
  }

  test("rebase publish: a branch MoR mask and parent appends merge cleanly") {
    val s = spark; import s.implicits._
    val dir = freshTable("morr", (1 to 8).map(i => (i, s"v$i")))
    ManifestTable.createBranch(spark, dir, "mk"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "mk")
    // branch stages a mask on a BASE dir; parent appends a new dir
    ManifestTable.deleteWhereMoR(spark, bdir, col("k") === 5, Map.empty): Unit
    ManifestTable.append(Seq((20, "p")).toDF("k", "v"), dir,
      statsCols = Seq("k")): Unit
    ManifestTable.publishBranch(spark, dir, "mk"): Unit
    val got = ManifestTable.read(spark, dir).collect()
      .map(_.getInt(0)).sorted.toSeq
    assert(got === Seq(1, 2, 3, 4, 6, 7, 8, 20),
      "mask applied AND the parent append kept through the rebase")
    val head = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.dvOf(fs, dir, head).nonEmpty,
      "the staged deletion stayed a MASK through the rebase publish")
  }

  test("mask-union rebase: disjoint MoR masks on the SAME dir merge; overlapping masks refuse") {
    val s = spark; import s.implicits._
    val dir = freshTable("mu", (1 to 10).map(i => (i, s"v$i")))
    ManifestTable.createBranch(spark, dir, "mm"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "mm")
    // both lineages mask rows of the SAME base dir — different rows
    ManifestTable.deleteWhereMoR(spark, bdir, col("k") === 2): Unit
    ManifestTable.deleteWhereMoR(spark, dir, col("k") === 5,
      retainGenerations = 10): Unit
    ManifestTable.publishBranch(spark, dir, "mm"): Unit
    val got = ManifestTable.read(spark, dir).collect()
      .map(_.getInt(0)).sorted.toSeq
    assert(got === Seq(1, 3, 4, 6, 7, 8, 9, 10),
      s"BOTH masks must land through the union merge: $got")
    val head = ManifestTable.headVersion(spark, dir).get
    val payload = ManifestTable.dvOf(fs, dir, head).values.headOption
    assert(payload.exists(_.split(",").length == 2),
      s"the merged dir stacks both lineages' mask entries: $payload")
    // overlapping masks — BOTH sides deleted the same row — refuse
    ManifestTable.createBranch(spark, dir, "mm2"): Unit
    val bdir2 = ManifestTable.branchDirOf(dir, "mm2")
    ManifestTable.deleteWhereMoR(spark, bdir2, col("k") === 7): Unit
    ManifestTable.deleteWhereMoR(spark, dir, col("k") === 7,
      retainGenerations = 10): Unit
    val e = intercept[IllegalStateException] {
      ManifestTable.publishBranch(spark, dir, "mm2")
    }
    assert(e.getMessage.contains("touched"), e.getMessage)
    ManifestTable.dropBranch(spark, dir, "mm2")
    assert(ManifestTable.read(spark, dir).filter(col("k") === 7).count() === 0,
      "the parent's own mask stands after the refusal")
  }

  test("rebase publish merges DERIVED state: parent ANALYZE + bloom refresh mid-audit never block (r19)") {
    val s = spark; import s.implicits._
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gbr.lake.drv")
    spark.sql("CREATE TABLE gbr.lake.drv (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k,v', 'retainGenerations'='10')")
    spark.sql("INSERT INTO gbr.lake.drv VALUES (1,'a'),(2,'b'),(3,'c')")
    val dir = s"$wh/lake/drv"
    ManifestTable.createBranch(spark, dir, "audit"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "audit")
    // the branch stages an append AND a MoR mask on a BASE dir — the
    // dv (data) channel of a kept dir changes on the BRANCH side
    ManifestTable.append(Seq((9, "z")).toDF("k", "v"), bdir,
      statsCols = Seq("k", "v")): Unit
    ManifestTable.deleteWhereMoR(spark, bdir, col("k") === 2, Map.empty): Unit
    // mid-audit parent MAINTENANCE: approx ANALYZE rewrites the `#ndv`
    // section of EVERY dir's stats payload (the nightly job) ...
    spark.sql("CALL gbr.system.analyze(table => 'lake.drv', " +
      "columns => 'k', approx => true)").collect()
    // ... and a bloom rebuild lands a fresh sidecar payload on the same
    // base dir the branch masked
    val head0 = ManifestTable.headVersion(spark, dir).get
    val base0 = ManifestTable.pathsOf(fs, dir, head0).head
    assert(ManifestTable.statsOf(fs, dir, head0).values.forall(pl =>
      ManifestTable.ndvSketchFor(pl, "k").isDefined),
      "the approx analyze persisted per-dir sketches on the parent")
    val rebuiltBloom = "k\t_idx/rebuilt/d0-k.bloom"
    assert(ManifestTable.commitIf(spark, dir,
      ManifestTable.pathsOf(fs, dir, head0), head0,
      retainGenerations = 10,
      schemaDdl = ManifestTable.schemaOf(fs, dir, head0),
      stats = ManifestTable.statsOf(fs, dir, head0),
      meta = ManifestTable.metaOf(fs, dir, head0),
      dv = ManifestTable.dvOf(fs, dir, head0),
      blooms = Map(base0 -> rebuiltBloom)).isDefined)
    // stats AND bloom changed on the parent for dirs the branch masked
    // — DERIVED channels, so the publish merges instead of refusing
    // (pre-r19 this refused with 'both ... touched the same dir')
    ManifestTable.publishBranch(spark, dir, "audit"): Unit
    val head = ManifestTable.headVersion(spark, dir).get
    // data merged: the branch's mask applies and its append landed
    val got = ManifestTable.read(spark, dir).orderBy("k")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 3, 9), s"mask + append must both land: $got")
    // the PARENT's derived refresh carried through the merge: kept dirs
    // keep their fresh `#ndv` sketches and the rebuilt bloom payload
    val stats = ManifestTable.statsOf(fs, dir, head)
    val keptDirs = ManifestTable.pathsOf(fs, dir, head0).toSet
    ManifestTable.pathsOf(fs, dir, head).filter(keptDirs).foreach { p =>
      assert(ManifestTable.ndvSketchFor(stats(p), "k").isDefined,
        s"parent's ANALYZE sketch must survive the publish on $p")
    }
    assert(ManifestTable.bloomsOf(fs, dir, head).get(base0)
      .contains(rebuiltBloom),
      "parent's rebuilt bloom payload must survive the publish")
    // and NDV answers stay EXACT post-publish: the standing mask makes
    // ANALYZE fall back to the full (mask-aware) pass
    val ndv = spark.sql("CALL gbr.system.analyze(table => 'lake.drv', " +
      "columns => 'k', approx => true)").head().getLong(1)
    assert(ndv === 3L, s"k in {1,3,9} post-publish, got $ndv")
  }

  test("rebase publish refuses a branch-declared contract over unvalidated parent appends") {
    wh: Unit
    spark.sql("CREATE TABLE gbr.lake.ctr (k INT, v STRING) " +
      "TBLPROPERTIES ('retainGenerations'='10')")
    spark.sql("INSERT INTO gbr.lake.ctr VALUES (1, 'a')")
    spark.sql("CALL gbr.system.create_branch(table => 'lake.ctr', name => 'c1')")
    // the branch declares a CHECK — its add-time scan sees only the
    // branch snapshot (all positive)
    spark.sql("ALTER TABLE gbr.lake.`ctr$branch$c1` " +
      "ADD CONSTRAINT pos CHECK (k > 0)")
    // the parent lands rows the constraint never judged (one violates)
    spark.sql("INSERT INTO gbr.lake.ctr VALUES (-5, 'rogue')")
    val e = intercept[Exception] {
      spark.sql("CALL gbr.system.publish_branch(table => 'lake.ctr', name => 'c1')")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("check.pos") && m.contains("contract")),
      s"got: ${messages(e).take(2)}")
    // parent intact (no silently-violated constraint), branch drops
    assert(spark.sql("SELECT count(*) FROM gbr.lake.ctr").head.getLong(0) === 2L)
    spark.sql("CALL gbr.system.drop_branch(table => 'lake.ctr', name => 'c1')")
  }

  test("a publish that crashed between commit and branch delete resumes by consuming") {
    val s = spark; import s.implicits._
    val dir = freshTable("crs", Seq((1, "a")))
    ManifestTable.createBranch(spark, dir, "cr"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "cr")
    ManifestTable.append(Seq((7, "g"), (8, "h")).toDF("k", "v"), bdir,
      statsCols = Seq("k")): Unit
    // snapshot the branch's MANIFESTS before publishing — restoring
    // them after the publish recreates the exact crash state (parent
    // commit landed, branch-local dirs moved out, branch delete never
    // ran: manifests present, data dirs gone)
    val conf = spark.sessionState.newHadoopConf()
    val saved = java.nio.file.Files.createTempDirectory("graft-brcrash")
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(bdir, "_manifests"),
      fs, new Path(saved.toString, "_manifests"), false, conf): Unit
    val published = ManifestTable.publishBranch(spark, dir, "cr")
    assert(!fs.exists(new Path(bdir)))
    fs.mkdirs(new Path(bdir))
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(saved.toString, "_manifests"),
      fs, new Path(bdir, "_manifests"), false, conf): Unit
    // the retried publish must RECOGNIZE the landed delta and consume
    // the stale branch — not refuse its own published data as a
    // both-lineages conflict, and not double-apply anything
    val resumed = ManifestTable.publishBranch(spark, dir, "cr")
    assert(resumed === published, "resume consumes at the landed head")
    assert(!fs.exists(new Path(bdir)), "the stale branch is consumed")
    assert(ManifestTable.read(spark, dir).collect()
      .map(_.getInt(0)).sorted.toSeq === Seq(1, 7, 8),
      "nothing double-applied")
  }

  test("publish is crash-resumable: pre-moved dirs are recognized") {
    val s = spark; import s.implicits._
    val dir = freshTable("resume", Seq((1, "a")))
    ManifestTable.createBranch(spark, dir, "crash"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "crash")
    ManifestTable.append(Seq((2, "b")).toDF("k", "v"), bdir,
      statsCols = Seq("k")): Unit
    // simulate a publish that crashed after moving the local dir: move
    // it to its deterministic target by hand
    val bHead = ManifestTable.headVersion(spark, bdir).get
    val local = ManifestTable.pathsOf(fs, bdir, bHead)
      .filterNot(ManifestTable.isForeign)
    assert(local.nonEmpty)
    val top = local.head.split("/", 2).head
    assert(fs.rename(new Path(bdir, top),
      new Path(dir, s"br-crash-v$bHead-$top")))
    // the retried publish resumes instead of failing
    ManifestTable.publishBranch(spark, dir, "crash"): Unit
    assert(ManifestTable.read(spark, dir).count() === 2)
  }

  test("DML on the branch publishes: a delete is auditable before it lands") {
    val s = spark; import s.implicits._
    val dir = freshTable("dml", (1 to 10).map(i => (i, s"v$i")))
    ManifestTable.createBranch(spark, dir, "purge"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "purge")
    // the candidate deletion runs on the BRANCH (copy-on-write rewrite
    // of the touched foreign dir into a branch-local dir)
    ManifestTable.deleteWhere(spark, bdir, col("k") <= 3, Map.empty): Unit
    assert(ManifestTable.read(spark, bdir).count() === 7)
    assert(ManifestTable.read(spark, dir).count() === 10,
      "the parent must not see the staged delete")
    ManifestTable.publishBranch(spark, dir, "purge"): Unit
    assert(ManifestTable.read(spark, dir).agg(min(col("k"))).head.getInt(0) === 4)
    assert(ManifestTable.read(spark, dir).count() === 7)
  }

  test("merge-on-read masks staged on a branch publish as masks") {
    val s = spark; import s.implicits._
    val dir = freshTable("mor", (1 to 8).map(i => (i, s"v$i")))
    ManifestTable.createBranch(spark, dir, "mask"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "mask")
    ManifestTable.deleteWhereMoR(spark, bdir, col("k") === 5, Map.empty): Unit
    assert(ManifestTable.read(spark, bdir).count() === 7)
    assert(ManifestTable.read(spark, dir).count() === 8)
    ManifestTable.publishBranch(spark, dir, "mask"): Unit
    assert(ManifestTable.read(spark, dir).count() === 7)
    val head = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.dvOf(fs, dir, head).nonEmpty,
      "the deletion stayed a MASK through the publish (no rewrite)")
    // the moved mask dirs resolve inside the parent tree
    ManifestTable.dvOf(fs, dir, head).values.foreach { payload =>
      assert(!payload.contains(bdir.split("/").last) ||
        fs.exists(new Path(dir, "_dv")))
    }
    assert(ManifestTable.read(spark, dir)
      .filter(col("k") === 5).count() === 0)
  }

  test("a mask on a branch-LOCAL dir survives the publish MOVE (dv paths rewritten)") {
    val s = spark; import s.implicits._
    val dir = freshTable("dvmv", Seq((1, "a")))
    ManifestTable.createBranch(spark, dir, "mv"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "mv")
    // branch appends a LOCAL dir, then masks one of its own fresh rows:
    // the dv records the file URI under _branches/, but the publish
    // MOVES that dir — the dv parquet must be rewritten in step or the
    // masked row resurrects (the fuzz caught exactly this)
    ManifestTable.append(Seq((10, "keep"), (11, "dead")).toDF("k", "v"),
      bdir, statsCols = Seq("k")): Unit
    ManifestTable.deleteWhereMoR(spark, bdir, col("k") === 11, Map.empty): Unit
    assert(ManifestTable.read(spark, bdir).count() === 2)
    ManifestTable.publishBranch(spark, dir, "mv"): Unit
    val got = ManifestTable.read(spark, dir).collect()
      .map(_.getInt(0)).sorted.toSeq
    assert(got === Seq(1, 10), s"masked row must stay masked: $got")
    val head = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.dvOf(fs, dir, head).nonEmpty,
      "still merge-on-read: the mask moved, it was not materialized")
    // and the rewritten dv references resolve inside the PARENT tree
    ManifestTable.dvOf(fs, dir, head).values.foreach { payload =>
      payload.split(",").foreach(e => assert(e.startsWith("_dv/"),
        s"published dv entry must be parent-relative, got $e"))
    }
  }

  test("a parent-MoR mask survives the branch round-trip RELATIVE (sweep safety)") {
    val s = spark; import s.implicits._
    val dir = freshTable("morparent", (1 to 6).map(i => (i, s"v$i")))
    // the PARENT carries a standing mask before the branch is cut
    ManifestTable.deleteWhereMoR(spark, dir, col("k") === 2, Map.empty): Unit
    assert(ManifestTable.read(spark, dir).count() === 5)
    ManifestTable.createBranch(spark, dir, "rt"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "rt")
    ManifestTable.append(Seq((9, "z")).toDF("k", "v"), bdir,
      statsCols = Seq("k")): Unit
    ManifestTable.publishBranch(spark, dir, "rt"): Unit
    val head = ManifestTable.headVersion(spark, dir).get
    // the clone absolutized the parent's own mask refs; the publish
    // must have re-keyed them back to RELATIVE — the parent's _dv
    // sweep counts only relative own-names as referenced, so an
    // absolute self-reference would age out and resurrect the row
    ManifestTable.dvOf(fs, dir, head).values.foreach { payload =>
      payload.split(",").foreach(e => assert(e.startsWith("_dv/"),
        s"published dv entry must be parent-relative, got $e"))
    }
    assert(ManifestTable.read(spark, dir).count() === 6) // 5 + appended
    assert(ManifestTable.read(spark, dir).filter(col("k") === 2).count() === 0)
  }

  test("refusals: duplicate name, branch-of-branch, bad name") {
    val s = spark; import s.implicits._
    val dir = freshTable("ref", Seq((1, "a")))
    ManifestTable.createBranch(spark, dir, "dup"): Unit
    intercept[IllegalArgumentException] {
      ManifestTable.createBranch(spark, dir, "dup")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.createBranch(spark,
        ManifestTable.branchDirOf(dir, "dup"), "nested")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.createBranch(spark, dir, "bad/name")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.createBranch(spark, dir, "_sneaky")
    }
    ManifestTable.dropBranch(spark, dir, "dup")
  }

  test("bucketed tables branch (r19): a WAP merge audits in isolation, publishes, zero-shuffle joins survive") {
    val s = spark; import s.implicits._
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gbr.lake.bk1")
    spark.sql("DROP TABLE IF EXISTS gbr.lake.bk2")
    spark.sql("CREATE TABLE gbr.lake.bk1 (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('layout'='bucketed:k:4')")
    spark.sql("INSERT INTO gbr.lake.bk1 SELECT id, concat('v', id) " +
      "FROM range(1, 17)")
    val dir = s"$wh/lake/bk1"
    ManifestTable.createBranch(spark, dir, "audit"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "audit")
    // the branch MERGES under the parent's exact geometry (the markers
    // pinned onto the clone): an update of key 3 plus two fresh keys —
    // the kernel rewrites only the touched buckets
    graft.sources.MergeInto.merge(
      Seq((3L, "V3"), (21L, "v21"), (22L, "v22")).toDF("k", "v"),
      bdir): Unit
    // audit isolation
    assert(graft.sources.MergeInto.read(spark, bdir).count() === 18)
    assert(spark.table("gbr.lake.bk1").count() === 16)
    assert(graft.sources.MergeInto.read(spark, bdir)
      .filter(col("k") === 3L).head().getString(1) === "V3")
    val v = ManifestTable.publishBranch(spark, dir, "audit")
    val got = spark.table("gbr.lake.bk1").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size === 18 && got(3L) === "V3" && got(21L) === "v21",
      s"publish must land the branch's merge: $got")
    // bucket-leaf geometry survived the publish re-key
    val fsx = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val paths = ManifestTable.pathsOf(fsx, dir,
      ManifestTable.headVersion(spark, dir).get)
    assert(paths.forall(_.matches(".*b=\\d+$")),
      s"published entries must stay bucket leaves: $paths")
    assert(v === ManifestTable.headVersion(spark, dir).get)
    // zero-shuffle co-bucketed join still plans (S12/S38; the bucket
    // transform resolves through the CATALOG relation's funCatalog)
    spark.sql("CREATE TABLE gbr.lake.bk2 (k BIGINT, w STRING) " +
      "TBLPROPERTIES ('layout'='bucketed:k:4')")
    spark.sql("INSERT INTO gbr.lake.bk2 SELECT id, concat('w', id) " +
      "FROM range(1, 17)")
    val confPairs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val olds = confPairs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confPairs.foreach { case (k, vv) => spark.conf.set(k, vv) }
      val j = spark.table("gbr.lake.bk1").join(spark.table("gbr.lake.bk2"), "k")
      assert(j.count() === 16L) // keys 1..16 on both sides
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        "co-bucketed join after a bucketed publish must stay " +
          s"zero-shuffle:\n${j.queryExecution.executedPlan}")
    } finally olds.foreach { case (k, vv) => spark.conf.set(k, vv) }
    // both lineages merging the SAME bucket still refuses
    ManifestTable.createBranch(spark, dir, "clash"): Unit
    val bdir2 = ManifestTable.branchDirOf(dir, "clash")
    graft.sources.MergeInto.merge(Seq((5L, "B")).toDF("k", "v"), bdir2): Unit
    graft.sources.MergeInto.merge(Seq((5L, "P")).toDF("k", "v"), dir): Unit
    val e = intercept[IllegalStateException] {
      ManifestTable.publishBranch(spark, dir, "clash")
    }
    assert(e.getMessage.contains("touched") ||
      e.getMessage.contains("bucket"),
      s"same-bucket merges must conflict: ${e.getMessage}")
    ManifestTable.dropBranch(spark, dir, "clash")
  }

  test("bucketed publish conflicts are BUCKET-granular: both lineages inserting into an EMPTY bucket refuse (r19 review find)") {
    val s = spark; import s.implicits._
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gbr.lake.bk3")
    spark.sql("CREATE TABLE gbr.lake.bk3 (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('layout'='bucketed:k:4')")
    val dir = s"$wh/lake/bk3"
    // seed ONE key, leaving some bucket EMPTY (no standing dir); then
    // find two DIFFERENT keys hashing to the same empty bucket
    spark.sql("INSERT INTO gbr.lake.bk3 VALUES (1, 'seed')")
    val byBucket = spark.sql(
      "SELECT id, gbr.system.bucket(4, id) AS b FROM range(2, 200)")
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val fsx = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    def occupied(): Set[Int] = ManifestTable.pathsOf(fsx, dir,
      ManifestTable.headVersion(spark, dir).get)
      .map(p => p.substring(p.lastIndexOf("b=") + 2).toInt).toSet
    val emptyBucket = (0 until 4).find(!occupied().contains(_)).getOrElse(
      fail("key 1 occupied every bucket?"))
    val Seq(kBranch, kParent, _*) =
      byBucket.filter(_._2 == emptyBucket).map(_._1).toSeq
    ManifestTable.createBranch(spark, dir, "eb"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "eb")
    // both lineages insert DIFFERENT keys into the same EMPTY bucket:
    // no common dir is touched (neither had one), so the dir-granular
    // test alone would commit TWO b=N dirs for one bucket — and the
    // merge kernel's one-dir-per-bucket map would silently drop one
    graft.sources.MergeInto.merge(
      Seq((kBranch, "b")).toDF("k", "v"), bdir): Unit
    graft.sources.MergeInto.merge(
      Seq((kParent, "p")).toDF("k", "v"), dir): Unit
    val e = intercept[IllegalStateException] {
      ManifestTable.publishBranch(spark, dir, "eb")
    }
    assert(e.getMessage.contains("bucket"),
      s"empty-bucket cross-inserts must refuse naming the bucket: " +
        e.getMessage)
    // parent intact, exactly one dir per occupied bucket
    val paths = ManifestTable.pathsOf(fsx, dir,
      ManifestTable.headVersion(spark, dir).get)
    val buckets = paths.map(p => p.substring(p.lastIndexOf("b=") + 2))
    assert(buckets.distinct.length === buckets.length,
      s"one dir per bucket must hold: $paths")
    assert(spark.table("gbr.lake.bk3").count() === 2L)
    ManifestTable.dropBranch(spark, dir, "eb")
  }


  test("orphaned publish moves: vacuum reaps aged br-* dirs, a resumed publish still consumes (r19)") {
    val s = spark; import s.implicits._
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gbr.lake.orp")
    spark.sql("CREATE TABLE gbr.lake.orp (k INT, v STRING) " +
      "TBLPROPERTIES ('retainGenerations'='10','statsCols'='k')")
    spark.sql("INSERT INTO gbr.lake.orp VALUES (1,'a')")
    val dir = s"$wh/lake/orp"
    def crashAfterMove(name: String): (String, Long) = {
      ManifestTable.createBranch(spark, dir, name): Unit
      val bdir = ManifestTable.branchDirOf(dir, name)
      ManifestTable.append(Seq((9, "z")).toDF("k", "v"), bdir,
        statsCols = Seq("k")): Unit
      val bHead = ManifestTable.headVersion(spark, bdir).get
      // simulate a publish crashing AFTER its move sweep, BEFORE the
      // parent commit: the branch-local data dir sits in the parent
      // tree under its deterministic publish name, referenced by no
      // retained parent manifest
      val top = ManifestTable.pathsOf(fs, bdir, bHead)
        .filter(p => !ManifestTable.isForeign(p)).head.split("/").head
      assert(fs.rename(new Path(bdir, top),
        new Path(dir, s"br-$name-v$bHead-$top")))
      (s"br-$name-v$bHead-$top", bHead)
    }
    // (a) ABANDONED: the operator drops the branch — the br-* dir is a
    // plain unreferenced orphan; vacuum spares it fresh, reaps it aged
    val (orphan, _) = crashAfterMove("crash")
    ManifestTable.dropBranch(spark, dir, "crash")
    spark.sql("CALL gbr.system.vacuum('lake.orp')").collect()
    assert(fs.exists(new Path(dir, orphan)),
      "a FRESH crashed-publish dir must survive the grace window " +
        "(it could be an in-flight publish's move)")
    ageTree(fs, new Path(dir, orphan), 2L * 60 * 60 * 1000)
    spark.sql("CALL gbr.system.vacuum('lake.orp')").collect()
    assert(!fs.exists(new Path(dir, orphan)),
      "an AGED crashed-publish orphan must be reaped")
    assert(spark.table("gbr.lake.orp").count() === 1L,
      "vacuum must never touch referenced parent data")
    // (b) RESUMED: the same crash shape, but the operator retries the
    // publish — the idempotent move recognizes the pre-moved dir and
    // the branch consumes normally
    crashAfterMove("crash2"): Unit
    ManifestTable.publishBranch(spark, dir, "crash2"): Unit
    val got = spark.table("gbr.lake.orp").collect()
      .map(_.getInt(0)).sorted.toSeq
    assert(got === Seq(1, 9), s"resumed publish must land the audit: $got")
    assert(ManifestTable.branches(spark, dir).isEmpty)
  }

  test("parent maintenance leaves a standing branch alone") {
    val s = spark; import s.implicits._
    val dir = freshTable("gc", Seq((1, "a")))
    ManifestTable.createBranch(spark, dir, "keep"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "keep")
    ManifestTable.append(Seq((7, "g")).toDF("k", "v"), bdir,
      statsCols = Seq("k")): Unit
    // parent churns (append + compaction both run gc)
    (2 to 4).foreach(i => ManifestTable.append(
      Seq((i, s"v$i")).toDF("k", "v"), dir, statsCols = Seq("k")): Unit)
    ManifestTable.compactAppend(spark, dir, Seq("k"), 2): Unit
    assert(fs.exists(new Path(bdir)),
      "_branches is under the protected prefix — the sweeps never touch it")
    assert(ManifestTable.branches(spark, dir).map(_._1) === Seq("keep"))
    // the branch still reads (its foreign refs may dangle only when
    // parent retention drops dirs — retainGenerations=10 here)
    assert(ManifestTable.read(spark, bdir).count() === 2)
    // ...but is no longer publishable (parent moved) — the meta table says so
    ManifestTable.dropBranch(spark, dir, "keep")
  }

  test("publish racing a parent writer: both lineages land, exactly once") {
    val s = spark; import s.implicits._
    (1 to 6).foreach { round =>
      val dir = freshTable(s"race$round", Seq((1, "a")))
      ManifestTable.createBranch(spark, dir, "r"): Unit
      val bdir = ManifestTable.branchDirOf(dir, "r")
      ManifestTable.append(Seq((100, "branch")).toDF("k", "v"), bdir,
        statsCols = Seq("k")): Unit
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val publish = Future(
        try Right(ManifestTable.publishBranch(spark, dir, "r"))
        catch { case e: IllegalStateException => Left(e) })
      val write = Future(
        ManifestTable.append(Seq((200, "writer")).toDF("k", "v"), dir,
          statsCols = Seq("k")))
      val pubRes = Await.result(publish, 120.seconds)
      Await.result(write, 120.seconds): Unit
      pool.shutdown()
      val rows = ManifestTable.read(spark, dir).collect()
        .map(_.getInt(0)).toSet
      pubRes match {
        // the common outcome: a disjoint append mid-publish is NOT a
        // conflict — the publish re-merges against the new head and
        // lands; whichever side committed second rebased on the other
        case Right(_) => assert(rows === Set(1, 100, 200))
        // only bounded-contention refusal remains possible (>10 lost
        // head races) — then the branch survives intact, nothing leaks
        case Left(e) =>
          assert(e.getMessage.contains("contention"), e.getMessage)
          assert(rows === Set(1, 200))
          assert(ManifestTable.read(spark, bdir).collect()
            .map(_.getInt(0)).toSet === Set(1, 100),
            "a refused publish returns the moved dirs to the branch")
          ManifestTable.dropBranch(spark, dir, "r")
      }
    }
  }

  test("two branches with disjoint work publish CONCURRENTLY: both land exactly once") {
    val s = spark; import s.implicits._
    val dir = freshTable("two", Seq((1, "a")))
    Seq("x", "y").foreach { n =>
      ManifestTable.createBranch(spark, dir, n): Unit
      ManifestTable.append(
        Seq((if (n == "x") 100 else 200, n)).toDF("k", "v"),
        ManifestTable.branchDirOf(dir, n), statsCols = Seq("k")): Unit
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val fx = Future(ManifestTable.publishBranch(spark, dir, "x"))
    val fy = Future(ManifestTable.publishBranch(spark, dir, "y"))
    Await.result(fx, 120.seconds): Unit
    Await.result(fy, 120.seconds): Unit
    pool.shutdown()
    // whichever lost the head race re-merged and landed on top
    assert(ManifestTable.read(spark, dir).collect()
      .map(_.getInt(0)).sorted.toSeq === Seq(1, 100, 200),
      "both lineages land exactly once")
    assert(ManifestTable.branches(spark, dir).isEmpty, "both consumed")
  }

  test("publish merges txn watermarks by MAX — replays stay skipped after it") {
    val s = spark; import s.implicits._
    val dir = freshTable("txnwm", Seq((1, "a")))
    def write(target: String, ver: Long): Unit =
      Seq((ver.toInt * 10, s"b$ver")).toDF("k", "v")
        .write.format("graft").mode("append")
        .option("txnAppId", "loader").option("txnVersion", ver.toString)
        .save(target)
    write(dir, 5L) // parent watermark: 5
    ManifestTable.createBranch(spark, dir, "wm"): Unit
    val bdir = ManifestTable.branchDirOf(dir, "wm")
    write(bdir, 6L) // batches 6-7 staged on the branch
    write(bdir, 7L)
    ManifestTable.publishBranch(spark, dir, "wm"): Unit
    val n = ManifestTable.read(spark, dir).count()
    // a crash-replay of batch 6 against the PARENT must be recognized:
    // the publish carried the branch-advanced watermark (max merge),
    // not the base's 5
    write(dir, 6L)
    write(dir, 7L)
    assert(ManifestTable.read(spark, dir).count() === n,
      "replays of branch-published batches must no-op on the parent")
    val head = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.metaOf(fs, dir, head).get("txn:loader")
      .contains("7"))
  }

  test("identity watermarks carry through a publish: post-publish mints never collide") {
    wh: Unit
    spark.sql("""CREATE TABLE gbr.lake.idb (
      id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)
      TBLPROPERTIES ('retainGenerations'='10')""")
    spark.sql("INSERT INTO gbr.lake.idb (v) VALUES ('p1'), ('p2')")
    spark.sql("CALL gbr.system.create_branch(table => 'lake.idb', name => 'mint')")
    // the branch mints from the CARRIED watermark (clone keeps idwm)
    spark.sql("INSERT INTO gbr.lake.`idb$branch$mint` (v) VALUES ('b1'), ('b2')")
    spark.sql("CALL gbr.system.publish_branch(table => 'lake.idb', name => 'mint')")
    // post-publish mints continue from the branch-advanced watermark
    spark.sql("INSERT INTO gbr.lake.idb (v) VALUES ('p3')")
    val ids = spark.sql("SELECT id FROM gbr.lake.idb")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.size === 5 && ids.distinct.size === 5,
      s"ids must stay unique across cut/mint/publish/mint: $ids")
  }

  test("RENAME TABLE refuses while branches stand (absolute refs would dangle)") {
    wh: Unit
    spark.sql("CREATE TABLE gbr.lake.rn (k INT, v STRING)")
    spark.sql("INSERT INTO gbr.lake.rn VALUES (1, 'a')")
    spark.sql("CALL gbr.system.create_branch(table => 'lake.rn', name => 'hold')")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gbr.lake.rn RENAME TO lake.rn2")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("hold")))
    // dropping the branch frees the rename
    spark.sql("CALL gbr.system.drop_branch(table => 'lake.rn', name => 'hold')")
    spark.sql("ALTER TABLE gbr.lake.rn RENAME TO lake.rn2")
    assert(spark.sql("SELECT count(*) FROM gbr.lake.rn2").head.getLong(0) === 1L)
  }

  test("SQL surface: procedures, t$branches, t$branch$<name> read and write") {
    wh: Unit
    spark.sql("CREATE TABLE gbr.lake.w (k INT, v STRING) " +
      "TBLPROPERTIES ('retainGenerations'='10', 'statsCols'='k')")
    spark.sql("INSERT INTO gbr.lake.w VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL gbr.system.create_branch(table => 'lake.w', name => 'sqlb')")
    // write to the branch THROUGH SQL (the branch table is addressable)
    spark.sql("INSERT INTO gbr.lake.`w$branch$sqlb` VALUES (3, 'c')")
    assert(spark.sql("SELECT count(*) FROM gbr.lake.`w$branch$sqlb`")
      .head.getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM gbr.lake.w").head.getLong(0) === 2L)
    val row = spark.sql("SELECT name, publishable FROM gbr.lake.`w$branches`")
      .head()
    assert(row.getString(0) === "sqlb" && row.getBoolean(1))
    spark.sql("CALL gbr.system.publish_branch(table => 'lake.w', name => 'sqlb')")
    assert(spark.sql("SELECT count(*) FROM gbr.lake.w").head.getLong(0) === 3L)
    assert(spark.sql("SELECT * FROM gbr.lake.`w$branches`").count() === 0L)
    // drop_branch route
    spark.sql("CALL gbr.system.create_branch(table => 'lake.w', name => 'tmp')")
    // time-travel sugar: VERSION AS OF 'branch:<name>' reads the branch
    spark.sql("INSERT INTO gbr.lake.`w$branch$tmp` VALUES (9, 'staged')")
    assert(spark.sql(
      "SELECT count(*) FROM gbr.lake.w VERSION AS OF 'branch:tmp'")
      .head.getLong(0) === 4L)
    assert(spark.sql("SELECT count(*) FROM gbr.lake.w").head.getLong(0) === 3L)
    intercept[Exception] {
      spark.sql("SELECT * FROM gbr.lake.w VERSION AS OF 'branch:nope'").collect()
    }
    spark.sql("CALL gbr.system.drop_branch(table => 'lake.w', name => 'tmp')")
    assert(spark.sql("SELECT * FROM gbr.lake.`w$branches`").count() === 0L)
  }
}
