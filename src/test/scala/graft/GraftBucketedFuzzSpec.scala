package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S31 model fuzz — random SQL op sequences (INSERT-upsert, MERGE with
  * mixed clauses, UPDATE, DELETE, compact) against a bucketed catalog
  * table, tracked row-for-row by an in-memory Map model. This is the
  * adversarial net under the clause-translation code (`runBucketed`):
  * a mis-rendered condition, a wrong bucket probe, or a dropped
  * standing row diverges the model within a step or two. */
class GraftBucketedFuzzSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-bfz").toString
    spark.conf.set("spark.sql.catalog.gbfz", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbfz.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbfz.lake")
    dir
  }

  test("fuzz: random SQL DML sequences on a bucketed table track a keyed model") {
    wh: Unit
    val rnd = new scala.util.Random(20260814L)
    spark.sql("DROP TABLE IF EXISTS gbfz.lake.f1")
    spark.sql("CREATE TABLE gbfz.lake.f1 (k BIGINT, v STRING, amt DOUBLE) " +
      "TBLPROPERTIES ('layout'='bucketed:k:4', 'retainGenerations'='10')")
    val dir = s"$wh/lake/f1"
    var model = Map.empty[Long, (String, Double)]
    def tableRows: Map[Long, (String, Double)] =
      spark.table("gbfz.lake.f1").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    def amt(r: scala.util.Random): Double = r.nextInt(1000) / 10.0
    for (step <- 1 to 14) {
      rnd.nextInt(5) match {
        case 0 => // INSERT = upsert by key (distinct keys per batch)
          val rows = (1 to 1 + rnd.nextInt(6))
            .map(_ => rnd.nextInt(30).toLong).distinct
            .map(k => (k, s"i$step-$k", amt(rnd)))
          spark.sql(s"INSERT INTO gbfz.lake.f1 VALUES " +
            rows.map { case (k, v, a) => s"($k,'$v',$a)" }.mkString(","))
          model = model ++ rows.map { case (k, v, a) => k -> (v, a) }
        case 1 => // MERGE: conditional delete, update referencing t.*, insert
          val keys = (1 to 1 + rnd.nextInt(8))
            .map(_ => rnd.nextInt(35).toLong).distinct
          val cut = amt(rnd)
          val bump = rnd.nextInt(50).toDouble
          val src = keys.map(k => s"($k, $bump)").mkString(",")
          spark.sql(
            s"""MERGE INTO gbfz.lake.f1 AS t
                USING (SELECT * FROM VALUES $src AS s(k, bump)) AS s
                ON t.k = s.k
                WHEN MATCHED AND t.amt < $cut THEN DELETE
                WHEN MATCHED THEN UPDATE SET amt = t.amt + s.bump,
                     v = concat(t.v, '+')
                WHEN NOT MATCHED AND s.bump > 10 THEN
                     INSERT (k, v, amt) VALUES (s.k, 'm$step', s.bump)""")
          keys.foreach { k =>
            model.get(k) match {
              case Some((v, a)) if a < cut => model -= k
              case Some((v, a)) => model += k -> (v + "+", a + bump)
              case None if bump > 10 => model += k -> (s"m$step", bump)
              case None => ()
            }
          }
        case 2 if model.nonEmpty => // UPDATE with a value-band predicate
          val lo = amt(rnd); val hi = lo + rnd.nextInt(300) / 10.0
          spark.sql(s"UPDATE gbfz.lake.f1 SET v = concat(v, '*') " +
            s"WHERE amt >= $lo AND amt <= $hi")
          model = model.map { case (k, (v, a)) =>
            if (a >= lo && a <= hi) k -> (v + "*", a) else k -> (v, a) }
        case 3 if model.nonEmpty =>
          // DELETE mixing a translatable key bound with a
          // NON-translatable conjunct (length(v) % 2) — the r12
          // full-expression path with partial dir pruning
          val cut = rnd.nextInt(30).toLong
          val par = rnd.nextInt(2)
          spark.sql(s"DELETE FROM gbfz.lake.f1 " +
            s"WHERE k >= $cut AND length(v) % 2 = $par")
          model = model.filterNot { case (k, (v, _)) =>
            k >= cut && v.length % 2 == par }
        case _ => // compact under the pinned geometry
          spark.sql("CALL gbfz.system.compact(table => 'lake.f1')")
      }
      assert(tableRows == model, s"step $step diverged: " +
        s"extra=${(tableRows.toSet -- model.toSet).take(3)} " +
        s"missing=${(model.toSet -- tableRows.toSet).take(3)}")
    }
  }
  test("fuzz: a brancher races writers on a BUCKETED table — bucket-granular conflicts, one dir per bucket always (r19)") {
    // The r19 publish rule under randomized contention: branch merges
    // race parent merges; a publish lands iff its touched BUCKETS are
    // disjoint from everything the parent merged since the cut, else
    // it refuses (reversing the moves) and the branch drops. The
    // invariants are interleaving-independent: (a) the table equals
    // the parent writers' model plus exactly the PUBLISHED branches'
    // rows, (b) every live manifest is bucket-leaf-shaped with AT MOST
    // ONE dir per bucket — the invariant the review-found bug broke.
    wh: Unit
    val sp = spark; import sp.implicits._
    for (seed <- 1 to 2) {
      spark.sql("DROP TABLE IF EXISTS gbfz.lake.fb")
      spark.sql("CREATE TABLE gbfz.lake.fb (k BIGINT, v STRING) " +
        "TBLPROPERTIES ('layout'='bucketed:k:4', 'retainGenerations'='200')")
      spark.sql("INSERT INTO gbfz.lake.fb VALUES (1, 'seed')")
      val dir = s"$wh/lake/fb"
      val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val model = new java.util.concurrent.ConcurrentHashMap[Long, String]
      model.put(1L, "seed")

      class Writer(t: Int) extends Thread {
        private val rnd = new scala.util.Random(7000L * seed + t)
        private var next = 100L * (t + 1)
        override def run(): Unit = try {
          for (step <- 1 to 6) {
            val k = next; next += 1
            var done = false; var attempts = 0
            while (!done) {
              attempts += 1
              try {
                graft.sources.MergeInto.merge(
                  Seq((k, s"w$t-$step")).toDF("k", "v"),
                  dir): Unit
                done = true
              } catch {
                case e: Throwable if attempts < 30 &&
                    Option(e.getMessage).exists(m =>
                      m.contains("contention") ||
                      m.contains("changed incompatibly")) => ()
              }
            }
            model.put(k, s"w$t-$step")
            if (rnd.nextBoolean()) Thread.sleep(20)
          }
        } catch { case e: Throwable => failures.add(e): Unit }
      }

      class Brancher extends Thread {
        private var next = 9000L
        override def run(): Unit = try {
          for (i <- 1 to 4) {
            Thread.sleep(40)
            val name = s"bz$i"
            ManifestTable.createBranch(spark, dir, name): Unit
            val bdir = ManifestTable.branchDirOf(dir, name)
            val rows = (0 until 2).map { _ =>
              val k = next; next += 1; (k, s"br$i-$k") }
            graft.sources.MergeInto.merge(rows.toDF("k", "v"), bdir): Unit
            try {
              ManifestTable.publishBranch(spark, dir, name): Unit
              rows.foreach { case (k, v) => model.put(k, v) }
            } catch {
              // a BUCKET conflict with a parent merge since the cut:
              // the refusal reversed the moves — drop, nothing landed
              case _: IllegalStateException =>
                ManifestTable.dropBranch(spark, dir, name)
            }
          }
        } catch { case e: Throwable => failures.add(e): Unit }
      }

      val racers = (0 until 2).map(new Writer(_)) :+ new Brancher
      racers.foreach(_.start())
      racers.foreach(_.join(600000))
      assert(racers.forall(!_.isAlive),
        s"seed $seed: a racer is still running after the join timeout " +
          "— invariants below would read a moving table")
      val died = Option(failures.peek())
      assert(died.isEmpty, died.map(e =>
        s"seed $seed worker died: $e\n" +
          e.getStackTrace.take(12).mkString("\n")).getOrElse(""))
      import scala.jdk.CollectionConverters._
      val expected = model.asScala.toMap
      val got = spark.table("gbfz.lake.fb").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected, s"seed $seed diverged: " +
        s"missing=${(expected.keySet -- got.keySet).toSeq.sorted.take(8)} " +
        s"extra=${(got.keySet -- expected.keySet).toSeq.sorted.take(8)}")
      // THE invariant: bucket-leaf dirs only, at most one per bucket
      val paths = ManifestTable.pathsOf(fs, dir,
        ManifestTable.headVersion(spark, dir).get)
      assert(paths.forall(_.matches(".*b=\\d+$")),
        s"seed $seed: non-bucket-leaf dir leaked: $paths")
      val buckets = paths.map(p => p.substring(p.lastIndexOf("b=") + 2))
      assert(buckets.distinct.length == buckets.length,
        s"seed $seed: TWO dirs for one bucket: $paths")
      assert(ManifestTable.branches(spark, dir).isEmpty,
        s"seed $seed left branches standing")
    }
  }

}
