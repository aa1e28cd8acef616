package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S41 model fuzz — random op sequences (append, merge-on-read DELETE,
  * copy-on-write UPDATE over masks, direct MoR update, full and
  * incremental compaction) against a `dml.mode=merge-on-read` table,
  * tracked by an in-memory MULTISET model. The adversarial net under
  * the deletion-vector protocol: a stale mask, a resurrect through a
  * rewrite, a mis-keyed dv carry on any commit surface, or an inexact
  * dv-aware change feed diverges the model within a step or two.
  * Every step checks BOTH read stacks (the V2 catalog scan's
  * row-position filter and the engine's anti-join path), every other
  * step replays the adjacent change feed onto the previous model, and
  * the end replays time travel against the recorded history. */
class GraftDvFuzzSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-dvfz").toString
    spark.conf.set("spark.sql.catalog.gdfz", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdfz.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdfz.lake")
    dir
  }

  private type Multiset = Map[(Int, String), Int]
  private def ms(rows: Seq[(Int, String)]): Multiset =
    rows.groupBy(identity).view.mapValues(_.size).toMap
  private def plus(a: Multiset, rows: Seq[(Int, String)]): Multiset =
    rows.foldLeft(a)((m, r) => m + (r -> (m.getOrElse(r, 0) + 1)))
  private def minus(a: Multiset, rows: Seq[(Int, String)]): Multiset =
    rows.foldLeft(a) { (m, r) =>
      m.get(r) match {
        case Some(1) => m - r
        case Some(n) => m + (r -> (n - 1))
        case None => fail(s"feed removed a row the model lacks: $r")
      }
    }

  private def counts(df: DataFrame): Multiset =
    ms(df.select("k", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq)

  test("fuzz: random MoR/CoW/compact sequences track a multiset model; feed and travel stay exact") {
    runFuzz("f1", 20260815L)
  }

  test("fuzz: a second seed walks a different op interleaving") {
    runFuzz("f2", 7L)
  }

  private def runFuzz(table: String, seed: Long): Unit = {
    wh: Unit
    val rnd = new scala.util.Random(seed)
    spark.sql(s"DROP TABLE IF EXISTS gdfz.lake.$table")
    spark.sql(s"CREATE TABLE gdfz.lake.$table (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='40', " +
      "'dml.mode'='merge-on-read')")
    val dir = s"$wh/lake/$table"
    var model: Multiset = Map.empty
    val history = scala.collection.mutable.LinkedHashMap.empty[Long, Multiset]

    def insert(rows: Seq[(Int, String)]): Unit = {
      spark.sql(s"INSERT INTO gdfz.lake.$table VALUES " +
        rows.map { case (k, v) => s"($k,'$v')" }.mkString(","))
      model = plus(model, rows)
    }
    insert((0 until 12).map(i => (rnd.nextInt(25), s"seed$i")))

    def record(): Unit = {
      val head = ManifestTable.headVersion(spark, dir).get
      history(head) = model
    }
    record()

    for (step <- 1 to 16) {
      rnd.nextInt(6) match {
        case 0 =>
          insert((0 until 1 + rnd.nextInt(5))
            .map(i => (rnd.nextInt(25), s"i$step-$i")))
        case 1 => // merge-on-read DELETE (translatable IN predicate)
          val ks = (0 until 1 + rnd.nextInt(4)).map(_ => rnd.nextInt(25)).distinct
          spark.sql(s"DELETE FROM gdfz.lake.$table WHERE k IN (${ks.mkString(",")})")
          model = model.filterNot { case ((k, _), _) => ks.contains(k) }
        case 2 => // CoW UPDATE over whatever masks exist
          val key = rnd.nextInt(25)
          spark.sql(s"UPDATE gdfz.lake.$table SET v = 'u$step' WHERE k = $key")
          model = model.foldLeft(Map.empty: Multiset) {
            case (m, ((k, v), n)) =>
              val r = if (k == key) (k, s"u$step") else (k, v)
              m + (r -> (m.getOrElse(r, 0) + n))
          }
        case 3 => // direct MoR update (mask + fresh dir)
          val key = rnd.nextInt(25)
          ManifestTable.updateWhereMoR(spark, dir, col("k") === key,
            Seq("v" -> lit(s"m$step")),
            bounds = Map("k" -> (key.toString, key.toString)),
            retainGenerations = 40)
          model = model.foldLeft(Map.empty: Multiset) {
            case (m, ((k, v), n)) =>
              val r = if (k == key) (k, s"m$step") else (k, v)
              m + (r -> (m.getOrElse(r, 0) + n))
          }
        case 4 =>
          if (model.nonEmpty)
            ManifestTable.compactAppend(spark, dir, Seq("k"), k = 3,
              retainGenerations = 40)
        case 5 =>
          ManifestTable.compactIncremental(spark, dir, Seq("k"), k = 3,
            retainGenerations = 40)
      }
      // both read stacks, every step
      assert(counts(spark.table(s"gdfz.lake.$table")) == model,
        s"V2 scan diverged from the model at step $step")
      assert(counts(ManifestTable.read(spark, dir)) == model,
        s"engine read diverged from the model at step $step")
      record()
      // replay the newest ADJACENT feed step onto the previous model
      if (step % 2 == 0 && history.size >= 2) {
        val vs = history.keys.toSeq.takeRight(2)
        if (vs(0) != vs(1)) {
          val feed = ManifestTable.changes(spark, dir, vs(0), vs(1)).collect()
          val ins = feed.filter(_.getAs[String]("change_type") == "insert")
            .map(r => (r.getAs[Int]("k"), r.getAs[String]("v"))).toSeq
          val del = feed.filter(_.getAs[String]("change_type") == "delete")
            .map(r => (r.getAs[Int]("k"), r.getAs[String]("v"))).toSeq
          assert(plus(minus(history(vs(0)), del), ins) == history(vs(1)),
            s"feed ${vs(0)}->${vs(1)} does not reconstruct the model at step $step")
        }
      }
    }
    // time travel: every still-retained recorded version reads back as
    // exactly its recorded model (masks are per-version state)
    val retained = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      ManifestTable.versions(fs, dir).toSet
    }
    val checkable = history.filter { case (v, m) =>
      retained.contains(v) && m.nonEmpty }
    assert(checkable.size >= 5, s"fuzz should retain history: ${history.keys}")
    checkable.foreach { case (v, m) =>
      assert(counts(ManifestTable.readVersion(spark, dir, v)) == m,
        s"time travel to v$v diverged from the recorded model")
    }
  }
}
