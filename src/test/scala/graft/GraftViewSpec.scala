package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** S35 — persistent catalog views (`ViewCatalog`): CREATE/SELECT/ALTER/
  * RENAME/DROP, SHOW VIEWS, nesting over tables and metadata tables. */
class GraftViewSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-view").toString
    spark.conf.set("spark.sql.catalog.gvw", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvw.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvw.lake")
    dir
  }

  private def seed(): Unit = {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gvw.lake.t")
    spark.sql("CREATE TABLE gvw.lake.t (k INT, v STRING, amt DOUBLE)")
    spark.sql("INSERT INTO gvw.lake.t VALUES " +
      "(1,'a',10.0),(2,'b',20.0),(3,'c',30.0)")
  }

  test("CREATE VIEW persists; SELECT resolves through the stored SQL") {
    seed()
    spark.sql("DROP VIEW IF EXISTS gvw.lake.big")
    spark.sql("CREATE VIEW gvw.lake.big AS " +
      "SELECT k, amt * 2 AS amt2 FROM gvw.lake.t WHERE amt > 15")
    val rows = spark.sql("SELECT k, amt2 FROM gvw.lake.big ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(rows == Seq((2, 40.0), (3, 60.0)))
    // the view tracks the TABLE, not a snapshot
    spark.sql("INSERT INTO gvw.lake.t VALUES (4,'d',40.0)")
    assert(spark.table("gvw.lake.big").count() == 3L)
    // and it survives a fresh catalog instance (persistence, not a
    // session temp view): re-registering the catalog re-reads the file
    spark.conf.set("spark.sql.catalog.gvw2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvw2.warehouse", wh)
    assert(spark.sql("SELECT count(*) FROM gvw2.lake.big").head().getLong(0) == 3L)
  }

  test("SHOW VIEWS, properties/rename via the catalog API, DROP") {
    seed()
    spark.sql("DROP VIEW IF EXISTS gvw.lake.v1")
    spark.sql("DROP VIEW IF EXISTS gvw.lake.v2")
    spark.sql("CREATE VIEW gvw.lake.v1 AS SELECT k FROM gvw.lake.t")
    val shown = spark.sql("SHOW VIEWS IN gvw.lake").collect()
      .map(_.getString(1)).toSet
    assert(shown.contains("v1"), shown)
    // property edits + rename ride the ViewCatalog API (ALTER VIEW SQL
    // resolves through session-view machinery upstream of any
    // injectable seam in this Spark — documented in GraftViewDdl)
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange}
    val cat = spark.sessionState.catalogManager.catalog("gvw")
      .asInstanceOf[graft.sources.GraftCatalog]
    val id1 = Identifier.of(Array("lake"), "v1")
    val id2 = Identifier.of(Array("lake"), "v2")
    cat.alterView(id1, ViewChange.setProperty("owner.team", "data"))
    assert(cat.loadView(id1).properties.get("owner.team") == "data")
    cat.alterView(id1, ViewChange.removeProperty("owner.team"))
    assert(!cat.loadView(id1).properties.containsKey("owner.team"))
    cat.renameView(id1, id2)
    assert(spark.table("gvw.lake.v2").count() == 3L)
    intercept[Exception] { spark.table("gvw.lake.v1").collect() }
    spark.sql("DROP VIEW gvw.lake.v2")
    intercept[Exception] { spark.table("gvw.lake.v2").collect() }
    // DROP VIEW on nothing: IF EXISTS no-ops, bare form is loud
    spark.sql("DROP VIEW IF EXISTS gvw.lake.v2")
    intercept[Exception] { spark.sql("DROP VIEW gvw.lake.v2") }
  }

  test("views over metadata tables and tags; name collisions refused") {
    seed()
    spark.sql("DROP VIEW IF EXISTS gvw.lake.hist")
    // a view over a metadata table: observability dashboards as SQL
    spark.sql("CREATE VIEW gvw.lake.hist AS " +
      "SELECT version, n_paths FROM gvw.lake.`t$history`")
    assert(spark.table("gvw.lake.hist").count() >= 2L)
    // CREATE TABLE under a standing view name is refused (no shadowing)
    intercept[Exception] {
      spark.sql("CREATE TABLE gvw.lake.hist (x INT)")
    }
    // CREATE VIEW under a standing table name is refused
    intercept[Exception] {
      spark.sql("CREATE VIEW gvw.lake.t AS SELECT 1 AS one")
    }
    // CREATE OR REPLACE replaces the definition
    spark.sql("CREATE OR REPLACE VIEW gvw.lake.hist AS " +
      "SELECT count(*) AS n FROM gvw.lake.t")
    assert(spark.table("gvw.lake.hist").head().getLong(0) == 3L)
  }

  test("view bodies resolve in the CREATOR's persisted context, not the reader's") {
    wh: Unit
    val cm = spark.sessionState.catalogManager
    val (prevCat, prevNs) = (cm.currentCatalog.name, cm.currentNamespace)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gvw.ns1")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gvw.ns2")
      for (ns <- Seq("ns1", "ns2")) {
        spark.sql(s"DROP VIEW IF EXISTS gvw.$ns.whose")
        spark.sql(s"DROP TABLE IF EXISTS gvw.$ns.shared")
        spark.sql(s"CREATE TABLE gvw.$ns.shared (who STRING)")
        spark.sql(s"INSERT INTO gvw.$ns.shared VALUES ('$ns')")
      }
      // created under ns1 with an UNQUALIFIED body name
      spark.sql("USE gvw.ns1")
      spark.sql("CREATE VIEW whose AS SELECT who FROM shared")
      // a reader defaulted to ns2 must STILL read ns1.shared — the
      // wrong-results class the persisted context closes
      spark.sql("USE gvw.ns2")
      assert(spark.sql("SELECT who FROM gvw.ns1.whose").head().getString(0)
        == "ns1", "body bound to the READER's namespace")
      // read-lifecycle symmetry (ADVICE): ns.v and bare v resolve when
      // the graft catalog is current, like CREATE/DROP already did
      assert(spark.sql("SELECT who FROM ns1.whose").head().getString(0) == "ns1")
      spark.sql("USE gvw.ns1")
      assert(spark.sql("SELECT who FROM whose").head().getString(0) == "ns1")
      // CTE names inside a body stay scope-local, never qualified
      spark.sql("CREATE OR REPLACE VIEW cted AS " +
        "WITH shared AS (SELECT 'cte' AS who) SELECT who FROM shared")
      spark.sql("USE gvw.ns2")
      assert(spark.sql("SELECT who FROM gvw.ns1.cted").head().getString(0)
        == "cte", "CTE name was qualified away from its scope")
    } finally {
      cm.setCurrentCatalog(prevCat)
      if (prevCat == cm.currentCatalog.name && prevNs.nonEmpty)
        cm.setCurrentNamespace(prevNs)
    }
  }

  test("recursive views fail loudly at the depth ceiling, never hang") {
    seed()
    spark.sql("DROP VIEW IF EXISTS gvw.lake.cyc_a")
    spark.sql("DROP VIEW IF EXISTS gvw.lake.cyc_b")
    spark.sql("CREATE VIEW gvw.lake.cyc_a AS SELECT k FROM gvw.lake.t")
    spark.sql("CREATE VIEW gvw.lake.cyc_b AS SELECT k FROM gvw.lake.cyc_a")
    // legitimate nesting still works
    assert(spark.sql("SELECT k FROM gvw.lake.cyc_b").count() >= 3L)
    // CREATE OR REPLACE closes the loop: a -> b -> a
    spark.sql("CREATE OR REPLACE VIEW gvw.lake.cyc_a AS " +
      "SELECT k FROM gvw.lake.cyc_b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT k FROM gvw.lake.cyc_a").collect()
    }
    assert(e.getMessage.toLowerCase.contains("recursive"), e.getMessage)
    spark.sql("DROP VIEW gvw.lake.cyc_a")
    spark.sql("DROP VIEW gvw.lake.cyc_b")
  }

  test("a catalog-qualified name never binds relative to the current catalog") {
    seed()
    val cm = spark.sessionState.catalogManager
    val (prevCat, prevNs) = (cm.currentCatalog.name, cm.currentNamespace)
    try {
      // a second REGISTERED catalog with its own (empty) warehouse
      val otherWh = Files.createTempDirectory("graft-view-other").toString
      spark.conf.set("spark.sql.catalog.gvwother", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.gvwother.warehouse", otherWh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gvwother.lake")
      // a view stored in gvw at the ADVERSARIAL namespace [gvwother, lake]
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gvw.gvwother.lake")
      spark.sql("DROP VIEW IF EXISTS gvw.gvwother.lake.leak")
      spark.sql("CREATE VIEW gvw.gvwother.lake.leak AS " +
        "SELECT k FROM gvw.lake.t")
      spark.sql("USE gvw.lake")
      // gvwother.lake.leak is catalog-qualified and gvwother holds no
      // such view: this must be table-not-found, NOT a silent bind to
      // gvw's view stored at namespace [gvwother, lake]
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT k FROM gvwother.lake.leak").collect()
      }
      // while the full 4-part address still reads it
      assert(spark.sql("SELECT k FROM gvw.gvwother.lake.leak").count() == 3L)
      spark.sql("DROP VIEW gvw.gvwother.lake.leak")
    } finally {
      cm.setCurrentCatalog(prevCat)
      if (prevCat == cm.currentCatalog.name && prevNs.nonEmpty)
        cm.setCurrentNamespace(prevNs)
    }
  }

  test("view DDL: other-catalog names unclaimed, temp views shadow DROP, relative SHOW VIEWS (r20 review finds)") {
    seed()
    val cm = spark.sessionState.catalogManager
    val (prevCat, prevNs) = (cm.currentCatalog.name, cm.currentNamespace)
    try {
      spark.sql("USE gvw.lake")
      // (1) DDL qualified with ANOTHER registered catalog's name is
      // never claimed relative to the current graft catalog — the old
      // fallback bound `spark_catalog.default.v` to a graft view at
      // namespace [spark_catalog, default], which the read rule
      // refuses, so the view would have been unreadable
      spark.sql("CREATE VIEW spark_catalog.default.sesv AS SELECT 1 AS one")
      assert(spark.sql("SELECT * FROM spark_catalog.default.sesv")
        .head().getInt(0) == 1, "the session-catalog view must exist THERE")
      assert(!new java.io.File(s"$wh/spark_catalog").exists(),
        "no graft view dir may appear for the other catalog's name")
      spark.sql("DROP VIEW spark_catalog.default.sesv")
      // (2) a session TEMP view SHADOWS the persisted graft view on a
      // single-part DROP (standard resolution order)
      spark.sql("DROP VIEW IF EXISTS gvw.lake.shade")
      spark.sql("CREATE VIEW gvw.lake.shade AS SELECT k FROM gvw.lake.t")
      spark.sql("CREATE TEMP VIEW shade AS SELECT 42 AS k")
      spark.sql("DROP VIEW shade") // must drop the TEMP view
      assert(spark.sql("SELECT count(*) FROM gvw.lake.shade")
        .head().getLong(0) == 3L,
        "the persisted view must survive the temp-view drop")
      spark.sql("DROP VIEW gvw.lake.shade")
      // (3) bare and relative SHOW VIEWS under a current graft catalog
      spark.sql("DROP VIEW IF EXISTS gvw.lake.sv1")
      spark.sql("CREATE VIEW gvw.lake.sv1 AS SELECT 1 AS one")
      assert(spark.sql("SHOW VIEWS").collect()
        .map(_.getString(1)).contains("sv1"),
        "bare SHOW VIEWS must list the current namespace's views")
      assert(spark.sql("SHOW VIEWS IN lake").collect()
        .map(_.getString(1)).contains("sv1"),
        "a relative namespace must list like CREATE/DROP resolve")
      spark.sql("DROP VIEW gvw.lake.sv1")
    } finally {
      cm.setCurrentCatalog(prevCat)
      if (prevCat == cm.currentCatalog.name && prevNs.nonEmpty)
        cm.setCurrentNamespace(prevNs)
    }
  }

  test("s35 board query matches the recomputed oracle on sf0.001") {
    val r = graft.sources.Sources.s35_catalog_view(spark, sf).head()
    assert(r.getLong(1) > 0)
    assert(graft.sources.Sources.s35_catalog_view(spark, sf).head() == r)
  }
}
