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

    // ---- the r12 chapters ----

    // 9. tag the restored state; it survives retention churn by name
    spark.sql("CALL gj.system.tag(table => 'lake.fact', name => 'baseline')")
    spark.sql("INSERT INTO gj.lake.fact VALUES (9001, 1.0, 'post')")
    assert(spark.sql(
      "SELECT count(*) FROM gj.lake.fact VERSION AS OF 'baseline'")
      .head().getLong(0) == 200L)

    // 10. the CDC surfaces: t$changes answers in SQL; the stream tails
    // the same feed with maintenance invisible
    assert(spark.sql(
      """SELECT count(*) FROM gj.lake.`fact$changes`
         WHERE change_type = 'insert' AND k = 9001""").head().getLong(0) == 1L)
    val cdcCk = Files.createTempDirectory("gj-cdc").toString
    val cdcOut = Files.createTempDirectory("gj-cdcout").toString
    val cdc = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.format("parquet").option("path", cdcOut)
      .option("checkpointLocation", cdcCk).start()
    try {
      cdc.processAllAvailable()
      spark.sql("DELETE FROM gj.lake.fact WHERE k = 9001")
      cdc.processAllAvailable()
      val cdcSchema = graft.sources.GraftMetaTables.changesSchemaOf(spark, dir)
      val feed = spark.read.schema(cdcSchema).parquet(cdcOut)
      assert(feed.filter("change_type = 'delete' AND k = 9001").count() == 1L)
    } finally cdc.stop()

    // 11. a persistent view over the fact table + its metadata table
    spark.sql("CREATE VIEW gj.lake.big AS " +
      "SELECT k, amt FROM gj.lake.fact WHERE amt > 500")
    assert(spark.table("gj.lake.big").count() ==
      spark.table("gj.lake.fact").filter("amt > 500").count())
    assert(spark.sql("SHOW VIEWS IN gj.lake").collect()
      .map(_.getString(1)).contains("big"))

    // 12. zero-copy clone, diverge it, prove independence
    spark.sql("CALL gj.system.clone(source => 'lake.fact', target => 'lake.fork')")
    spark.sql("DELETE FROM gj.lake.fork WHERE k < 50")
    assert(spark.table("gj.lake.fork").count() ==
      spark.table("gj.lake.fact").filter("k >= 50").count())
    assert(spark.table("gj.lake.fact").count() == 200L)

    // 13. a bucketed sibling: upsert-by-key SQL end to end
    spark.sql(
      """CREATE TABLE gj.lake.kv (k BIGINT, v STRING)
         TBLPROPERTIES ('layout'='bucketed:k:4')""")
    spark.sql("INSERT INTO gj.lake.kv VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT INTO gj.lake.kv VALUES (2,'B!')") // replace by key
    spark.sql(
      """MERGE INTO gj.lake.kv AS t
         USING (SELECT * FROM VALUES (1,'gone'),(3,'c') AS s(k, v)) AS s
         ON t.k = s.k
         WHEN MATCHED THEN DELETE
         WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(spark.table("gj.lake.kv").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(2L -> "B!", 3L -> "c"))
    assert(spark.sql(
      "CALL gj.system.lookup(table => 'lake.kv', keys => '2')")
      .head().getString(1) == "B!")
  }
}
