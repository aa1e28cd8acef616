package graft

import java.nio.file.Files

import graft.sources.ManifestTable

/** Concurrency fuzz — REAL multi-threaded contention over one
  * `dml.mode=merge-on-read` table: three writer threads (each owning a
  * disjoint key space) race inserts, merge-on-read DELETEs and SQL
  * position-delta UPDATEs against a maintenance thread running full and
  * incremental compactions, all through the engine's optimistic commit
  * loops. After the first compaction the threads' keys MIX within
  * shared dirs, so their mask advances genuinely conflict — the
  * designed outcome is a LOUD abort ("changed incompatibly" /
  * contention), which each thread treats as a retry at a fresh
  * snapshot. The invariant is interleaving-independent because the key
  * spaces are disjoint: at the end the table must equal exactly the
  * union of the per-thread sequential models — any lost append, lost
  * mask, double-applied update or resurrect through a racing rewrite
  * breaks it. This also hammers the snapshot cache (shared LRU, file
  * identity keys) from concurrent driver threads. */
class GraftConcurrencyFuzzSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-ccfz").toString
    spark.conf.set("spark.sql.catalog.gccf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gccf.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gccf.lake")
    dir
  }

  /** The abort messages the optimistic protocol DEFINES as retryable:
    * a racing rewrite/mask advance invalidated this op's snapshot. */
  private def retryable(e: Throwable): Boolean = {
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    msgs.contains("changed incompatibly") || msgs.contains("contention")
  }

  private def retrying[T](what: String)(f: => T): T = {
    var attempts = 0
    while (true) {
      try return f
      catch {
        case e: Throwable if retryable(e) && attempts < 30 =>
          attempts += 1
          Thread.sleep(20L * attempts)
      }
    }
    throw new IllegalStateException(s"unreachable: $what")
  }

  test("3 writers + a compactor race one MoR table: nothing lost, nothing resurrected") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gccf.lake.t")
    // bloomCols rides along: every insert/compaction builds sidecars
    // under the same contention, and the end-state point lookups below
    // read through whatever index survived the races
    spark.sql("CREATE TABLE gccf.lake.t (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='200', " +
      "'dml.mode'='merge-on-read', 'bloomCols'='k')")
    val dir = s"$wh/lake/t"
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]

    class Writer(t: Int) extends Thread {
      val model = scala.collection.mutable.LinkedHashMap.empty[Int, String]
      private val rnd = new scala.util.Random(1000L + t)
      private var next = t * 1000 // disjoint key space per thread
      override def run(): Unit = try {
        for (step <- 1 to 10) {
          rnd.nextInt(3) match {
            case 0 => // insert fresh keys (append rebases under race)
              val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
                val k = next; next += 1; (k, s"t$t-i$step-$k")
              }
              retrying(s"t$t insert")(spark.sql(
                s"INSERT INTO gccf.lake.t VALUES " +
                  rows.map { case (k, v) => s"($k,'$v')" }.mkString(",")))
              rows.foreach { case (k, v) => model(k) = v }
            case 1 if model.nonEmpty => // merge-on-read DELETE (mask)
              val ks = rnd.shuffle(model.keys.toList).take(1 + rnd.nextInt(3))
              retrying(s"t$t delete")(spark.sql(
                s"DELETE FROM gccf.lake.t WHERE k IN (${ks.mkString(",")})"))
              ks.foreach(model.remove)
            case 2 if model.nonEmpty => // SQL position-delta UPDATE
              val k = rnd.shuffle(model.keys.toList).head
              val v = s"t$t-u$step"
              retrying(s"t$t update")(spark.sql(
                s"UPDATE gccf.lake.t SET v = '$v' WHERE k = $k"))
              model(k) = v
            case _ => // model empty: seed a row instead
              val k = next; next += 1
              retrying(s"t$t seed")(spark.sql(
                s"INSERT INTO gccf.lake.t VALUES ($k,'t$t-s$step')"))
              model(k) = s"t$t-s$step"
          }
        }
      } catch { case e: Throwable => failures.add(e): Unit }
    }

    class Compactor extends Thread {
      override def run(): Unit = try {
        for (i <- 1 to 6) {
          Thread.sleep(150)
          // racing mask advances abort these LOUDLY by design — that is
          // the protocol working, not a failure; skip and try again
          try {
            if (i % 2 == 0)
              ManifestTable.compactAppend(spark, dir, Seq("k"), k = 3,
                retainGenerations = 200): Unit
            else
              ManifestTable.compactIncremental(spark, dir, Seq("k"), k = 3,
                retainGenerations = 200): Unit
          } catch { case e: Throwable if retryable(e) => () }
        }
      } catch { case e: Throwable => failures.add(e): Unit }
    }

    val writers = (0 until 3).map(new Writer(_))
    val compactor = new Compactor
    (writers :+ compactor).foreach(_.start())
    (writers :+ compactor).foreach(_.join(600000))
    val died = Option(failures.peek())
    assert(died.isEmpty, died.map(e =>
      s"worker died: $e\n${e.getStackTrace.take(12).mkString("\n")}")
      .getOrElse(""))

    val expected = writers.flatMap(_.model).toMap
    def observed(df: org.apache.spark.sql.DataFrame): Map[Int, String] =
      df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    // both read stacks serve exactly the union of the thread models
    val got = observed(spark.table("gccf.lake.t"))
    assert(got == expected,
      s"diverged: missing=${(expected.keySet -- got.keySet).toSeq.sorted.take(8)} " +
        s"extra=${(got.keySet -- expected.keySet).toSeq.sorted.take(8)} " +
        s"changed=${expected.collect { case (k, v) if got.get(k).exists(_ != v) =>
          (k, v, got(k)) }.take(5)}")
    assert(observed(ManifestTable.read(spark, dir)) == expected)
    // a quiesced full compaction materializes every standing mask and
    // preserves the exact content
    ManifestTable.compactAppend(spark, dir, Seq("k"), k = 3,
      retainGenerations = 200)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(ManifestTable.dvOf(fs, dir,
      ManifestTable.headVersion(spark, dir).get).isEmpty)
    assert(observed(spark.table("gccf.lake.t")) == expected)
    // bloom-indexed point lookups agree with the model (the sketches
    // survived inserts, deltas and compactions racing each other)
    expected.keys.take(3).foreach { k =>
      assert(spark.table("gccf.lake.t")
        .where(org.apache.spark.sql.functions.col("k") === k)
        .collect().map(_.getString(1)).toSeq == Seq(expected(k)),
        s"point lookup diverged for key $k")
    }
  }
}
