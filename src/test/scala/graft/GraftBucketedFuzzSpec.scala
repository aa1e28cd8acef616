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
}
