package graft

import java.nio.file.Files

/** S52 — standard SQL constraint syntax (capability-gated): ADD/DROP
  * CONSTRAINT ... CHECK maps onto the SAME prop channel + validation
  * scan + enforcement machine the TBLPROPERTIES route uses; inline
  * CREATE constraints fold in before the first commit; informational
  * PK/UNIQUE/FK refuse (this engine only declares what it enforces). */
class GraftConstraintSqlSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-con").toString
    spark.conf.set("spark.sql.catalog.gcon", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcon.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcon.lake")
    dir
  }

  test("ADD CONSTRAINT CHECK validates existing rows and binds writers") {
    wh: Unit
    spark.sql("CREATE TABLE gcon.lake.c1 (k INT, amt DOUBLE)")
    spark.sql("INSERT INTO gcon.lake.c1 VALUES (1, 5.0), (2, 10.0)")
    spark.sql("ALTER TABLE gcon.lake.c1 ADD CONSTRAINT amt_pos CHECK (amt > 0)")
    // a violating insert refuses through the same machine
    intercept[Exception] {
      spark.sql("INSERT INTO gcon.lake.c1 VALUES (3, -1.0)")
    }
    assert(spark.sql("SELECT count(*) FROM gcon.lake.c1").head.getLong(0) === 2L)
    // adding a constraint existing rows violate refuses
    intercept[Exception] {
      spark.sql("ALTER TABLE gcon.lake.c1 ADD CONSTRAINT amt_big CHECK (amt > 6)")
    }
    // DROP CONSTRAINT frees the writers
    spark.sql("ALTER TABLE gcon.lake.c1 DROP CONSTRAINT amt_pos")
    spark.sql("INSERT INTO gcon.lake.c1 VALUES (3, -1.0)")
    assert(spark.sql("SELECT count(*) FROM gcon.lake.c1").head.getLong(0) === 3L)
    // dropping a missing constraint refuses without IF EXISTS
    intercept[Exception] {
      spark.sql("ALTER TABLE gcon.lake.c1 DROP CONSTRAINT nope")
    }
    // ...and with IF EXISTS is a TRUE no-op: no metadata version burned
    val dir = s"$wh/lake/c1"
    val before = graft.sources.ManifestTable.headVersion(spark, dir).get
    spark.sql("ALTER TABLE gcon.lake.c1 DROP CONSTRAINT IF EXISTS nope")
    assert(graft.sources.ManifestTable.headVersion(spark, dir)
      .contains(before))
  }

  test("a pure-removal DELETE lands on a CHECK table; a violating MoR insert leaves no orphans (r20 review finds)") {
    wh: Unit
    // (1) full-group DELETE (subquery condition → group CoW, every
    // row of the dir matches → cid = None): the ALTER-vs-write guard
    // must not fire for a standing CHECK — a removal writes no rows a
    // constraint could judge
    spark.sql("CREATE TABLE gcon.lake.c9 (k INT, v STRING)")
    spark.sql("INSERT INTO gcon.lake.c9 VALUES (1,'a'),(2,'b')")
    spark.sql("ALTER TABLE gcon.lake.c9 ADD CONSTRAINT kp CHECK (k > 0)")
    spark.sql(
      "DELETE FROM gcon.lake.c9 WHERE k IN (SELECT k FROM gcon.lake.c9)")
    assert(spark.sql("SELECT count(*) FROM gcon.lake.c9")
      .head.getLong(0) === 0L)
    // (2) a MERGE insert violating the CHECK on a merge-on-read table
    // aborts BEFORE the commit and cleans its staged image dirs — the
    // pd-*/dv leavings used to orphan permanently in the table root
    spark.sql("CREATE TABLE gcon.lake.c10 (k INT, v STRING) " +
      "TBLPROPERTIES ('dml.mode'='merge-on-read')")
    spark.sql("INSERT INTO gcon.lake.c10 VALUES (1,'a')")
    spark.sql("ALTER TABLE gcon.lake.c10 ADD CONSTRAINT kcap CHECK (k < 100)")
    intercept[Exception](spark.sql(
      """MERGE INTO gcon.lake.c10 t
         USING (SELECT 500 AS k, 'big' AS v) s
         ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""))
    val dir = new org.apache.hadoop.fs.Path(s"$wh/lake/c10")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val leftovers = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("pd-") || n.startsWith("rl-")).toSeq
    assert(leftovers.isEmpty,
      s"a refused MoR statement must clean its staged dirs: $leftovers")
    assert(spark.sql("SELECT count(*) FROM gcon.lake.c10")
      .head.getLong(0) === 1L)
  }

  test("inline CREATE constraints bind from the first insert") {
    wh: Unit
    spark.sql("""CREATE TABLE gcon.lake.c2 (
      k INT, v STRING, CONSTRAINT v_nn CHECK (v IS NOT NULL))""")
    spark.sql("INSERT INTO gcon.lake.c2 VALUES (1, 'ok')")
    intercept[Exception] {
      spark.sql("INSERT INTO gcon.lake.c2 VALUES (2, NULL)")
    }
    assert(spark.sql("SELECT count(*) FROM gcon.lake.c2").head.getLong(0) === 1L)
  }

  test("informational constraints refuse loudly") {
    wh: Unit
    spark.sql("CREATE TABLE gcon.lake.c3 (k INT, v STRING)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcon.lake.c3 ADD CONSTRAINT pk PRIMARY KEY (k)")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("informational") ||
      m.contains("not supported") || m.contains("PRIMARY KEY")),
      s"got: ${messages(e).take(2)}")
  }

  test("constraints() surfaces the declared checks") {
    wh: Unit
    spark.sql("CREATE TABLE gcon.lake.c4 (k INT)")
    spark.sql("ALTER TABLE gcon.lake.c4 ADD CONSTRAINT k_pos CHECK (k >= 0)")
    val cat = spark.sessionState.catalogManager.catalog("gcon")
      .asInstanceOf[graft.sources.GraftCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("lake"), "c4"))
    val cs = t.constraints()
    assert(cs.length === 1 && cs.head.name === "k_pos" && cs.head.enforced())
  }
}
