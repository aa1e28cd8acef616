package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S42 model fuzz — random RENAME/DROP/ADD COLUMN interleaved with
  * append, merge-on-read DELETE, SQL position-delta UPDATE and both
  * compactions, tracked by an in-memory model of (current logical
  * schema, row multiset). The adversarial net under the column-mapping
  * protocol: a read resolving a renamed column to the wrong physical
  * name, a resurrect through a frozen-name collision, stats/spec
  * re-keying missed by any commit surface, or dv masks detaching from
  * their rows across a rename all diverge the model within a step.
  * Every step checks BOTH read stacks; schema-change steps assert an
  * EMPTY change feed (pointer commits) while DML steps replay theirs;
  * the end replays time travel against each version's recorded schema
  * AND model. */
class GraftColumnMappingFuzzSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-cmfz").toString
    spark.conf.set("spark.sql.catalog.gcmf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcmf.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcmf.lake")
    dir
  }

  // a row = logical column -> rendered value (absent key = NULL);
  // the table = a multiset of rows (duplicates are legal)
  private type Row = Map[String, String]
  private type Multiset = Map[Row, Int]
  private def plus(m: Multiset, rs: Seq[Row]): Multiset =
    rs.foldLeft(m)((a, r) => a + (r -> (a.getOrElse(r, 0) + 1)))

  private def collectRows(df: DataFrame, cols: Seq[String]): Multiset = {
    val sel = df.select(cols.map(c => col(c).cast("string")): _*)
    plus(Map.empty, sel.collect().map { r =>
      cols.zipWithIndex.flatMap { case (c, i) =>
        if (r.isNullAt(i)) None else Some(c -> r.getString(i))
      }.toMap
    }.toIndexedSeq)
  }

  test("fuzz: schema evolution interleaved with MoR DML tracks the model") {
    runFuzz("f1", 20260816L)
  }

  test("fuzz: a second seed walks a different evolution order") {
    runFuzz("f2", 41L)
  }

  private def runFuzz(table: String, seed: Long): Unit = {
    wh: Unit
    val rnd = new scala.util.Random(seed)
    spark.sql(s"DROP TABLE IF EXISTS gcmf.lake.$table")
    // bloomCols crosses the families: every append/compaction under
    // the evolution walk also rebuilds point-index sidecars, so a
    // rename whose bloom re-key went wrong surfaces as a model
    // divergence (a bloom that wrongly prunes = missing rows)
    spark.sql(s"CREATE TABLE gcmf.lake.$table (k INT, c0 STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='40', " +
      "'dml.mode'='merge-on-read', 'bloomCols'='k')")
    val dir = s"$wh/lake/$table"

    var keyName = "k"
    var cols: Vector[String] = Vector("k", "c0")
    var model: Multiset = Map.empty
    // version -> (schema then, model then); LinkedHashMap keeps order
    val history =
      scala.collection.mutable.LinkedHashMap.empty[Long, (Seq[String], Multiset)]

    def rowOf(key: Int, mk: String => String): Row =
      cols.map(c => c -> (if (c == keyName) key.toString else mk(c))).toMap

    def insert(rows: Seq[Row]): Unit = {
      val values = rows.map(r => cols.map { c =>
        if (c == keyName) r(c) else s"'${r(c)}'"
      }.mkString("(", ",", ")")).mkString(",")
      spark.sql(s"INSERT INTO gcmf.lake.$table VALUES $values")
      model = plus(model, rows)
    }
    insert((0 until 10).map(i => rowOf(rnd.nextInt(20), c => s"seed-$i-$c")))

    def head(): Long = ManifestTable.headVersion(spark, dir).get
    def record(): Unit = history(head()) = (cols, model)
    record()

    for (step <- 1 to 16) {
      val prevV = head()
      val metaStep = rnd.nextInt(9) match {
        case 0 =>
          insert((0 until 1 + rnd.nextInt(4))
            .map(i => rowOf(rnd.nextInt(20), c => s"i$step-$i-$c")))
          false
        case 1 => // merge-on-read DELETE
          val ks = (0 until 1 + rnd.nextInt(3)).map(_ => rnd.nextInt(20)).distinct
          spark.sql(s"DELETE FROM gcmf.lake.$table " +
            s"WHERE $keyName IN (${ks.mkString(",")})")
          model = model.filter { case (r, _) =>
            !ks.map(_.toString).contains(r(keyName)) }
          false
        case 2 => // SQL UPDATE = position delta (mask + fresh images)
          val key = rnd.nextInt(20)
          val target = cols.find(_ != keyName).get
          spark.sql(s"UPDATE gcmf.lake.$table SET $target = 'u$step' " +
            s"WHERE $keyName = $key")
          model = model.foldLeft(Map.empty: Multiset) { case (m, (r, n)) =>
            val r2 = if (r(keyName) == key.toString) r + (target -> s"u$step") else r
            m + (r2 -> (m.getOrElse(r2, 0) + n))
          }
          false
        case 3 => // RENAME a column (the key included) to a fresh name
          val from = cols(rnd.nextInt(cols.size))
          val to = s"n$step"
          spark.sql(s"ALTER TABLE gcmf.lake.$table RENAME COLUMN $from TO $to")
          cols = cols.map(c => if (c == from) to else c)
          if (keyName == from) keyName = to
          model = model.map { case (r, n) =>
            r.map { case (c, v) => (if (c == from) to else c) -> v } -> n }
          true
        case 4 => // DROP a non-key column (keep at least one)
          val droppable = cols.filter(_ != keyName)
          if (droppable.size >= 2) {
            val victim = droppable(rnd.nextInt(droppable.size))
            spark.sql(s"ALTER TABLE gcmf.lake.$table DROP COLUMN $victim")
            cols = cols.filterNot(_ == victim)
            model = model.foldLeft(Map.empty: Multiset) { case (m, (r, n)) =>
              val r2 = r - victim
              m + (r2 -> (m.getOrElse(r2, 0) + n))
            }
            true
          } else false
        case 5 => // ADD a fresh column; standing rows null-fill
          spark.sql(s"ALTER TABLE gcmf.lake.$table ADD COLUMN a$step STRING")
          cols = cols :+ s"a$step"
          true
        case 6 =>
          if (model.nonEmpty)
            ManifestTable.compactAppend(spark, dir, Seq(keyName), k = 3,
              retainGenerations = 40)
          false
        case 7 =>
          ManifestTable.compactIncremental(spark, dir, Seq(keyName), k = 3,
            retainGenerations = 40)
          false
        case 8 => // S48 crossing: ADD COLUMN with an EXISTENCE default —
          // every STANDING row serves the frozen constant from this
          // moment on (the model gains it), later inserts write
          // explicit values, and every subsequent RENAME/DROP/
          // compaction/DML step now also exercises the default
          // channels' physical keying (a default detaching from its
          // column diverges the model at that step)
          spark.sql(s"ALTER TABLE gcmf.lake.$table " +
            s"ADD COLUMN d$step STRING DEFAULT 'dv$step'")
          cols = cols :+ s"d$step"
          model = model.foldLeft(Map.empty: Multiset) { case (m, (r, n)) =>
            val r2 = r + (s"d$step" -> s"dv$step")
            m + (r2 -> (m.getOrElse(r2, 0) + n))
          }
          true
      }
      // both read stacks, every step
      assert(collectRows(spark.table(s"gcmf.lake.$table"), cols) == model,
        s"V2 scan diverged from the model at step $step (cols=$cols)")
      assert(collectRows(ManifestTable.read(spark, dir), cols) == model,
        s"engine read diverged from the model at step $step (cols=$cols)")
      // a point lookup probes the bloom sidecars (full scans don't):
      // a rename whose bloom re-key broke either prunes live rows away
      // or stops pruning — only the former is data loss, and this
      // catches it at the step it happens
      val probe = rnd.nextInt(20)
      assert(collectRows(spark.table(s"gcmf.lake.$table")
          .where(col(keyName) === probe), cols) ==
        model.filter { case (r, _) => r(keyName) == probe.toString },
        s"bloom point lookup for $keyName=$probe diverged at step $step")
      val newV = head()
      // schema changes are POINTER commits: the feed must be empty;
      // DML/append feeds must reconstruct the model delta
      if (newV != prevV) {
        val feed = ManifestTable.changes(spark, dir, prevV, newV)
        if (metaStep)
          assert(feed.isEmpty,
            s"schema-change step $step leaked ${feed.count()} feed rows")
        else {
          val fcols = cols.filter(feed.columns.contains)
          val ins = collectRows(feed.filter(col("change_type") === "insert"), fcols)
          val del = collectRows(feed.filter(col("change_type") === "delete"), fcols)
          val replayed = del.foldLeft(history(prevV)._2) { case (m, (r, n)) =>
            val have = m.getOrElse(r, 0)
            assert(have >= n, s"feed step $step deletes $r the model lacks")
            if (have == n) m - r else m + (r -> (have - n))
          }
          assert(ins.foldLeft(replayed) { case (m, (r, n)) =>
            m + (r -> (m.getOrElse(r, 0) + n)) } == model,
            s"feed $prevV->$newV does not reconstruct the model at step $step")
        }
      }
      record()
    }
    // time travel: every retained recorded version reads back as its
    // recorded schema and model (masks and mappings are per-version)
    val retained = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      ManifestTable.versions(fs, dir).toSet
    }
    val checkable = history.filter { case (v, (_, m)) =>
      retained.contains(v) && m.nonEmpty }
    assert(checkable.size >= 5, s"fuzz should retain history: ${history.keys}")
    checkable.foreach { case (v, (colsThen, m)) =>
      val df = ManifestTable.readVersion(spark, dir, v)
      assert(df.columns.toSeq == colsThen,
        s"time travel to v$v shows ${df.columns.toSeq}, recorded $colsThen")
      assert(collectRows(df, colsThen) == m,
        s"time travel to v$v diverged from the recorded model")
    }
  }
}
