package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S24 — SQL `DELETE FROM` / `TRUNCATE TABLE` on manifest tables:
  * dir-granular copy-on-write with manifest-stats pruning, SQL null
  * semantics (FALSE and NULL rows survive), metadata-only truncate,
  * and time travel across the delete. */
class GraftDeleteSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-del").toString
    spark.conf.set("spark.sql.catalog.gdel", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdel.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdel.lake")
    dir
  }
  private def fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())

  /** Two disjoint-range inserts → two commit dirs with k stats. */
  private def twoDirTable(name: String): String = {
    wh: Unit // force catalog registration
    spark.sql(s"DROP TABLE IF EXISTS gdel.lake.$name")
    spark.sql(s"CREATE TABLE gdel.lake.$name (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='10')")
    spark.sql(s"INSERT INTO gdel.lake.$name " +
      "VALUES (0,'a'),(1,'b'),(2,'c'),(3,'d'),(4,'e')")
    spark.sql(s"INSERT INTO gdel.lake.$name " +
      "VALUES (10,'p'),(11,'q'),(12,'r'),(13,'s'),(14,'t')")
    s"$wh/lake/$name"
  }

  test("DELETE rewrites only the dirs the stats say may match") {
    val dir = twoDirTable("d1")
    val before = ManifestTable.livePaths(fs, dir)
    assert(before.size == 2)
    // the manifest path list is cid-sorted, not insert-ordered —
    // identify the dirs by their recorded k ranges
    val v0 = ManifestTable.headVersion(spark, dir).get
    val stats0 = ManifestTable.statsOf(fs, dir, v0)
    def kMax(p: String): Long =
      ManifestTable.statsFor(stats0(p), "k").get._3.get.toLong
    val lowDir = before.minBy(kMax)  // the 0..4 dir
    val highDir = before.maxBy(kMax) // the 10..14 dir
    // k IN (12, 13): envelope [12,13] — the 0..4 dir must be untouched
    spark.sql("DELETE FROM gdel.lake.d1 WHERE k IN (12, 13)")
    val after = ManifestTable.livePaths(fs, dir)
    assert(spark.table("gdel.lake.d1").collect().map(_.getInt(0)).sorted
      .toSeq == Seq(0, 1, 2, 3, 4, 10, 11, 14))
    assert(after.contains(lowDir), "pruned-out dir must be carried, not rewritten")
    assert(!after.contains(highDir), "touched dir must be replaced")
    assert(after.exists(_.startsWith("d-")), "rewrite publishes a d- dir")
    // the rewritten dir re-records k stats, so skipping still works
    val head = ManifestTable.headVersion(spark, dir).get
    val rewritten = after.filter(_.startsWith("d-")).head
    assert(ManifestTable.statsOf(fs, dir, head).contains(rewritten))
  }

  test("DELETE whose rows all match drops the dir without publishing one") {
    val dir = twoDirTable("d2")
    spark.sql("DELETE FROM gdel.lake.d2 WHERE k >= 10 AND k <= 99")
    assert(spark.table("gdel.lake.d2").count() == 5L)
    val after = ManifestTable.livePaths(fs, dir)
    assert(after.size == 1 && !after.exists(_.startsWith("d-")),
      "an all-match dir contributes no rewrite dir")
  }

  test("DELETE keeps NULL-predicate rows (SQL semantics), IS NULL deletes them") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gdel.lake.dn")
    spark.sql("CREATE TABLE gdel.lake.dn (k INT, v STRING)")
    spark.sql("INSERT INTO gdel.lake.dn VALUES (1,'x'),(2,NULL),(3,'y')")
    // v = 'x' is NULL for row 2 → row 2 survives
    spark.sql("DELETE FROM gdel.lake.dn WHERE v = 'x'")
    assert(spark.table("gdel.lake.dn").collect().map(_.getInt(0)).sorted
      .toSeq == Seq(2, 3))
    spark.sql("DELETE FROM gdel.lake.dn WHERE v IS NULL")
    assert(spark.table("gdel.lake.dn").collect().map(_.getInt(0)).toSeq == Seq(3))
  }

  test("DELETE without WHERE and TRUNCATE TABLE are metadata-only empties") {
    val dir = twoDirTable("d3")
    val dataBefore = ManifestTable.livePaths(fs, dir)
    spark.sql("DELETE FROM gdel.lake.d3")
    assert(spark.table("gdel.lake.d3").count() == 0L)
    assert(ManifestTable.livePaths(fs, dir).isEmpty)
    // metadata-only: no d- rewrite dir was ever written
    assert(!fs.listStatus(new Path(dir)).exists(_.getPath.getName.startsWith("d-")))
    // schema survives the truncate; inserts keep working
    spark.sql("INSERT INTO gdel.lake.d3 VALUES (7,'z')")
    assert(spark.table("gdel.lake.d3").count() == 1L)
    spark.sql("TRUNCATE TABLE gdel.lake.d3")
    assert(spark.table("gdel.lake.d3").count() == 0L)
    // retained pre-truncate versions still resolve (retention 10)
    assert(spark.sql("SELECT * FROM gdel.lake.d3 VERSION AS OF 3").count() ==
      dataBefore.size * 5L)
  }

  test("time travel to the pre-delete snapshot still works") {
    twoDirTable("d4") // v1 create, v2 insert, v3 insert
    spark.sql("DELETE FROM gdel.lake.d4 WHERE k < 5") // v4
    assert(spark.table("gdel.lake.d4").count() == 5L)
    assert(spark.sql("SELECT * FROM gdel.lake.d4 VERSION AS OF 3").count() == 10L)
  }

  test("a non-Filter-translatable DELETE runs Spark's group CoW rewrite with runtime group filtering") {
    // pre-r12 these failed loudly at canDeleteWhere; since the native
    // SupportsRowLevelOperations adoption, ANY deterministic condition
    // plans as Spark's own ReplaceData rewrite, with runtime group
    // filtering on the _graft_dir metadata column narrowing the CoW to
    // exactly the dirs holding matches
    twoDirTable("d5") // k in {0..4, 10..14}, single-char v
    spark.sql("DELETE FROM gdel.lake.d5 WHERE length(v) + k > 10")
    // length(v)=1 everywhere → deletes k>9 → the 10..14 dir empties
    assert(spark.table("gdel.lake.d5").count() == 5L)
    assert(spark.table("gdel.lake.d5").agg(max(col("k"))).head().getInt(0) == 4)
    // the native rewrite is the plan — ReplaceData over the group CoW
    // write, with the dir-IN dynamic pruning subquery attached
    val plan = spark.sql(
      "EXPLAIN DELETE FROM gdel.lake.d5 WHERE length(v) > 99")
      .head().getString(0)
    assert(plan.contains("ReplaceData"), plan)
    assert(plan.contains("GraftGroupWrite"), plan)
    assert(plan.contains(s"dynamicpruningexpression(${
      graft.sources.GraftRowLevel.DirCol}"), plan)
  }

  test("a subquery DELETE condition works through the native rewrite") {
    // the extension seam refused subqueries (its SQL transport could
    // not re-resolve them); Spark's RewriteDeleteFromTable plans them
    // as joins, so they now just work
    twoDirTable("d6")
    spark.sql("DELETE FROM gdel.lake.d6 WHERE k IN " +
      "(SELECT k FROM gdel.lake.d6 WHERE k > 5)")
    assert(spark.table("gdel.lake.d6").collect().map(_.getInt(0)).sorted
      .toSeq == Seq(0, 1, 2, 3, 4))
  }

  test("direct-API deleteWhere prunes by bounds and rebases over racing appends") {
    val dir = Files.createTempDirectory("graft-del-api").toString + "/t"
    val s = spark; import s.implicits._
    ManifestTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir,
      statsCols = Seq("k"), retainGenerations = 10)
    ManifestTable.append(Seq((10, "p"), (11, "q")).toDF("k", "v"), dir,
      statsCols = Seq("k"), retainGenerations = 10)
    val before = ManifestTable.livePaths(fs, dir)
    val v0 = ManifestTable.headVersion(spark, dir).get
    val stats0 = ManifestTable.statsOf(fs, dir, v0)
    val lowDir = before.minBy(p => // the (1,2) dir — cid order is random
      ManifestTable.statsFor(stats0(p), "k").get._3.get.toLong)
    val v = ManifestTable.deleteWhere(spark, dir, col("k") === 10,
      bounds = Map("k" -> ("10", "10")), retainGenerations = 10)
    assert(v > 0)
    assert(ManifestTable.read(spark, dir).collect().map(_.getInt(0)).sorted
      .toSeq == Seq(1, 2, 11))
    assert(ManifestTable.livePaths(fs, dir).contains(lowDir),
      "the out-of-bounds dir is carried untouched")
    // a provable no-op (bounds miss every dir) commits nothing
    val head = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.deleteWhere(spark, dir, col("k") === 999,
      bounds = Map("k" -> ("999", "999")), retainGenerations = 10) == head)
  }

  test("DELETE racing concurrent appends loses no append and deletes its slice") {
    val dir = Files.createTempDirectory("graft-del-race").toString + "/t"
    val s = spark; import s.implicits._
    ManifestTable.append((1 to 100).map(i => (i, "seed")).toDF("k", "v"), dir,
      statsCols = Seq("k"), retainGenerations = 10)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(3)
    val go = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    def task(body: => Unit): Runnable = () => {
      go.await()
      try body catch { case t: Throwable => errs.add(t): Unit }
    }
    // the delete's snapshot is the seed dir; the appends land disjoint
    // key ranges, so the final state is deterministic whatever the
    // interleaving: optimistic rebase must carry both appends
    pool.submit(task {
      ManifestTable.deleteWhere(spark, dir, col("k") <= 50,
        bounds = Map("k" -> ("1", "50")), retainGenerations = 10): Unit
    })
    pool.submit(task {
      ManifestTable.append((1001 to 1050).map(i => (i, "a1")).toDF("k", "v"),
        dir, statsCols = Seq("k"), retainGenerations = 10): Unit
    })
    pool.submit(task {
      ManifestTable.append((2001 to 2050).map(i => (i, "a2")).toDF("k", "v"),
        dir, statsCols = Seq("k"), retainGenerations = 10): Unit
    })
    go.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"no racer may fail: ${errs.peek()}")
    val ks = ManifestTable.read(spark, dir).collect().map(_.getInt(0)).sorted
    assert(ks.toSeq == ((51 to 100) ++ (1001 to 1050) ++ (2001 to 2050)),
      "delete removed exactly its slice; both racing appends survived")
  }

  test("overlapping row-level rewrites abort loudly, never corrupt") {
    val dir = Files.createTempDirectory("graft-del-race2").toString + "/t"
    val s = spark; import s.implicits._
    ManifestTable.append((1 to 100).map(i => (i, "seed")).toDF("k", "v"), dir,
      statsCols = Seq("k"), retainGenerations = 10)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val go = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    def del(lo: Int, hi: Int): Runnable = () => {
      go.await()
      try ManifestTable.deleteWhere(spark, dir,
        col("k") >= lo && col("k") <= hi,
        bounds = Map("k" -> (lo.toString, hi.toString)),
        retainGenerations = 10): Unit
      catch { case t: Throwable => errs.add(t): Unit }
    }
    pool.submit(del(1, 30)); pool.submit(del(20, 60))
    go.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    // a loser that lost its touched dir must abort with the loud
    // incompatible-change error, not silently resurrect rows
    errs.forEach(t => assert(
      t.getMessage.contains("changed incompatibly during the rewrite"),
      s"unexpected failure shape: $t"))
    val ks = ManifestTable.read(spark, dir).collect().map(_.getInt(0)).toSet
    // rows outside both ranges always survive; rows inside a SUCCESSFUL
    // delete's range are gone; no row is ever duplicated or invented
    assert((61 to 100).forall(ks.contains), "untargeted rows must survive")
    assert(ks.subsetOf((1 to 100).toSet), "no invented rows")
    val winners = 2 - errs.size
    if (winners == 2) assert(!(1 to 60).exists(ks.contains))
    else assert(!(1 to 30).exists(ks.contains) || !(20 to 60).exists(ks.contains))
  }

  test("fuzz: random DELETE conditions round-trip the Filter translation") {
    wh: Unit
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(20260815L)
    def randCond(): String = rnd.nextInt(8) match {
      case 0 => s"k > ${rnd.nextInt(40)}"
      case 1 => s"k >= ${rnd.nextInt(40)} AND k < ${rnd.nextInt(40) + 10}"
      case 2 => s"v IN (${Seq.fill(4)(s"'s${rnd.nextInt(40)}'").mkString(",")})"
      case 3 => "v IS NULL"
      case 4 => s"v LIKE 's1%' OR k = ${rnd.nextInt(40)}"
      case 5 => s"NOT (k <= ${rnd.nextInt(40)})"
      case 6 => s"v LIKE '%${rnd.nextInt(4)}' AND k != ${rnd.nextInt(40)}"
      case 7 => s"k <=> ${rnd.nextInt(40)}"
    }
    for (it <- 1 to 10) {
      spark.sql("DROP TABLE IF EXISTS gdel.lake.fz")
      spark.sql("CREATE TABLE gdel.lake.fz (k INT, v STRING)")
      (1 to 40).map(i => (i, if (i % 9 == 0) null else s"s$i"))
        .toDF("k", "v").writeTo("gdel.lake.fz").append()
      val cond = randCond()
      // SQL DELETE keeps rows where cond is FALSE or NULL — the model
      // computes the kept set with DataFrame primitives directly
      val expected = spark.table("gdel.lake.fz")
        .filter(!coalesce(expr(cond), lit(false)))
        .collect().map(r => (r.getInt(0), Option(r.getString(1)))).sorted.toSeq
      spark.sql(s"DELETE FROM gdel.lake.fz WHERE $cond")
      val got = spark.table("gdel.lake.fz")
        .collect().map(r => (r.getInt(0), Option(r.getString(1)))).sorted.toSeq
      assert(got == expected, s"iteration $it diverged: DELETE WHERE $cond")
    }
  }

  test("s24 board query matches the recomputed oracle on sf0.001") {
    val r = graft.sources.Sources.s24_delete_where(spark, sf).head()
    val o = Tables.orders(spark, sf)
    val kept = o.filter(not(col("o_orderdate") >= lit("1997-01-01").cast("date")
      && col("o_orderpriority") === "1-URGENT"))
    assert(r.getLong(0) == kept.count())
    assert(r.getLong(0) < o.count(), "the delete must remove a real slice")
    // second invocation reuses the cached fixture and agrees
    assert(graft.sources.Sources.s24_delete_where(spark, sf).head() == r)
  }
}
