package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Capstone: the whole r11 SQL surface composed in one journey —
  * CREATE (clusterBy + CHECK + retention) → clustered INSERTs →
  * streaming tail by name → UPDATE / DELETE / MERGE → metadata tables →
  * CALL compact/vacuum → time travel — each stage asserted, so a
  * regression anywhere in the catalog/DML/maintenance stack breaks
  * THIS story, not just its unit. */
class LakehouseSqlJourneySpec extends SparkTestBase {

  test("the full SQL lakehouse journey holds end to end") {
    val wh = Files.createTempDirectory("graft-journey").toString
    spark.conf.set("spark.sql.catalog.gj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gj.warehouse", wh)
    val fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())
    spark.sql("CREATE NAMESPACE gj.lake")

    // 1. declare the table: clustered, constrained, deep retention
    spark.sql(
      """CREATE TABLE gj.lake.fact (k INT, amt DOUBLE, v STRING)
         TBLPROPERTIES ('clusterBy'='k', 'statsCols'='k',
                        'check.amt_pos'='amt >= 0',
                        'retainGenerations'='20')""")

    // 2. two clustered ingests — arrival layout must prune
    spark.sql("INSERT INTO gj.lake.fact " +
      "SELECT id, CAST(id AS DOUBLE), concat('r', id) FROM range(0, 100)")
    spark.sql("INSERT INTO gj.lake.fact " +
      "SELECT id, CAST(id AS DOUBLE), concat('r', id) FROM range(1000, 1100)")
    val dir = s"$wh/lake/fact"
    val headAfterIngest = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.livePaths(fs, dir).forall(_.startsWith("ci-")))
    val schema = ManifestTable.declaredSchemaOf(spark, dir, headAfterIngest).get
    assert(ManifestTable.prunePaths(fs, dir, headAfterIngest,
      Map("k" -> ("1050", "1050")), schema).size == 1,
      "a point read opens one arrival dir")

    // 3. a violating batch is refused whole
    intercept[Exception] {
      spark.sql("INSERT INTO gj.lake.fact VALUES (5, -1.0, 'bad')")
    }
    assert(spark.table("gj.lake.fact").count() == 200L)

    // 4. tail the table by name while DML happens (ignoreChanges: the
    // copy-on-write rewrites re-deliver, never silently drop)
    val ck = Files.createTempDirectory("gj-ck").toString
    val tail = spark.readStream.option("ignoreChanges", "true")
      .table("gj.lake.fact")
      .writeStream.format("memory").queryName("gj_tail")
      .option("checkpointLocation", ck).start()
    try {
      tail.processAllAvailable()
      assert(spark.table("gj_tail").count() == 200L)

      // 5. the DML trio
      spark.sql("UPDATE gj.lake.fact SET v = upper(v) WHERE k < 10")
      spark.sql("DELETE FROM gj.lake.fact WHERE k >= 1090")
      spark.sql(
        """MERGE INTO gj.lake.fact AS t
           USING (SELECT * FROM VALUES (0, 999.0), (7777, 1.0) AS s(k, amt)) AS s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET amt = s.amt
           WHEN NOT MATCHED THEN INSERT (k, amt, v) VALUES (s.k, s.amt, 'new')""")
      val now = spark.table("gj.lake.fact")
      assert(now.count() == 191L) // 200 - 10 deleted + 1 inserted
      assert(now.filter("k = 0").head().getDouble(1) == 999.0)
      assert(now.filter("k = 3").head().getString(2) == "R3")
      assert(now.filter("k = 7777").head().getString(2) == "new")

      tail.processAllAvailable()
      // the tail saw every LIVE row at least once (re-delivery allowed)
      val tailKeys = spark.table("gj_tail").select("k").distinct()
        .collect().map(_.getInt(0)).toSet
      assert(now.collect().map(_.getInt(0)).toSet.subsetOf(tailKeys))
    } finally tail.stop()

    // 6. observability: history grew, files carry stats, props persist
    val hist = spark.sql("SELECT count(*) FROM gj.lake.`fact$history`")
      .head().getLong(0)
    assert(hist >= 6, s"create + 2 inserts + 3 DML commits, got $hist")
    assert(spark.sql("SELECT CAST(sum(rows) AS BIGINT) FROM gj.lake.`fact$files`")
      .head().getLong(0) == 191L)

    // 7. maintenance by SQL: compact re-clusters, vacuum reports
    val compacted = spark.sql(
      "CALL gj.system.compact(table => 'lake.fact', k => 3)").head()
    assert(compacted.getInt(1) <= 3)
    assert(spark.table("gj.lake.fact").count() == 191L)
    assert(spark.sql("CALL gj.system.vacuum('lake.fact')").head().getLong(0) == 0L)

    // 8. time travel: the pre-DML snapshot is intact; restore works
    assert(spark.sql(
      s"SELECT count(*) FROM gj.lake.fact VERSION AS OF $headAfterIngest")
      .head().getLong(0) == 200L)
    spark.sql(s"CALL gj.system.restore(table => 'lake.fact', " +
      s"version => $headAfterIngest)")
    assert(spark.table("gj.lake.fact").count() == 200L)
  }
}
