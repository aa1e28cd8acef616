package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.sources.ManifestTable

/** S50 — GENERATED ALWAYS AS columns: declared at CREATE (Spark
  * validates the expression through the catalog capability), computed
  * and enforced at the same write choke point as CHECK constraints —
  * an omitted/null value fills with the expression, a provided
  * non-null value must null-safe-equal it, and DML write-backs
  * RECOMPUTE (updating a source column refreshes the generated one). */
class GraftGeneratedSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-gen").toString
    spark.conf.set("spark.sql.catalog.ggen", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ggen.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ggen.lake")
    dir
  }
  private def fs =
    new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())

  test("omitted generated columns compute at INSERT") {
    wh: Unit
    spark.sql("""CREATE TABLE ggen.lake.g1 (
      k INT, d DATE,
      y INT GENERATED ALWAYS AS (year(d)),
      ym STRING GENERATED ALWAYS AS (date_format(d, 'yyyy-MM')))""")
    spark.sql("INSERT INTO ggen.lake.g1 (k, d) VALUES " +
      "(1, DATE'2021-03-05'), (2, DATE'1999-12-31')")
    val got = spark.sql("SELECT k, y, ym FROM ggen.lake.g1 ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(got === Seq((1, 2021, "2021-03"), (2, 1999, "1999-12")))
  }

  test("provided values must match; a matching one passes") {
    wh: Unit
    spark.sql("""CREATE TABLE ggen.lake.g2 (
      k INT, amt DOUBLE,
      cents BIGINT GENERATED ALWAYS AS (CAST(round(amt * 100) AS BIGINT)))""")
    spark.sql("INSERT INTO ggen.lake.g2 VALUES (1, 2.5, 250)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO ggen.lake.g2 VALUES (2, 2.5, 999)")
    }
    assert(e.getMessage.contains("generated column") ||
      Option(e.getCause).exists(_.getMessage.contains("generated column")))
    assert(spark.sql("SELECT cents FROM ggen.lake.g2 WHERE k = 1")
      .head.getLong(0) === 250L)
    assert(spark.sql("SELECT count(*) FROM ggen.lake.g2").head.getLong(0) === 1L)
  }

  test("path-API writers are bound too (the choke point is the engine's)") {
    val s = spark; import s.implicits._
    wh: Unit
    spark.sql("""CREATE TABLE ggen.lake.g3 (
      k INT, v STRING,
      vlen INT GENERATED ALWAYS AS (length(v)))""")
    val dir = s"$wh/lake/g3"
    // a direct append with NULL in the generated column: filled
    ManifestTable.append(
      Seq((1, "hello", null.asInstanceOf[Integer]))
        .toDF("k", "v", "vlen").selectExpr("k", "v", "CAST(vlen AS INT) vlen"),
      dir): Unit
    assert(spark.sql("SELECT vlen FROM ggen.lake.g3 WHERE k = 1")
      .head.getInt(0) === 5)
    // a direct append with a WRONG value: refused
    intercept[Exception] {
      ManifestTable.append(
        Seq((2, "xx", Integer.valueOf(99)))
          .toDF("k", "v", "vlen").selectExpr("k", "v", "CAST(vlen AS INT) vlen"),
        dir): Unit
    }
    assert(spark.sql("SELECT count(*) FROM ggen.lake.g3").head.getLong(0) === 1L)
  }

  test("UPDATE of a source column recomputes the generated value") {
    wh: Unit
    spark.sql("""CREATE TABLE ggen.lake.g4 (
      k INT, v STRING,
      vlen INT GENERATED ALWAYS AS (length(v)))""")
    spark.sql("INSERT INTO ggen.lake.g4 (k, v) VALUES (1, 'abc'), (2, 'de')")
    spark.sql("UPDATE ggen.lake.g4 SET v = 'longer-now' WHERE k = 1")
    val got = spark.sql("SELECT k, vlen FROM ggen.lake.g4 ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got === Seq((1, 10), (2, 2)),
      "the rewrite recomputed vlen for the updated row and kept the other")
  }

  test("schema-evolution guards: rename/drop of a referenced source refuses") {
    wh: Unit
    spark.sql("""CREATE TABLE ggen.lake.g5 (
      k INT, v STRING,
      vlen INT GENERATED ALWAYS AS (length(v)))""")
    spark.sql("INSERT INTO ggen.lake.g5 (k, v) VALUES (1, 'a')")
    intercept[Exception] {
      spark.sql("ALTER TABLE ggen.lake.g5 RENAME COLUMN v TO w")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE ggen.lake.g5 DROP COLUMN v")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE ggen.lake.g5 ALTER COLUMN vlen SET DEFAULT 7")
    }
    // renaming the GENERATED column itself is fine (physical keying) —
    // and the channel keeps firing under the new name
    spark.sql("ALTER TABLE ggen.lake.g5 RENAME COLUMN vlen TO v_len")
    spark.sql("INSERT INTO ggen.lake.g5 (k, v) VALUES (2, 'word')")
    assert(spark.sql("SELECT v_len FROM ggen.lake.g5 WHERE k = 2")
      .head.getInt(0) === 4)
    // dropping the generated column clears its channel
    spark.sql("ALTER TABLE ggen.lake.g5 DROP COLUMN v_len")
    val dir = s"$wh/lake/g5"
    val head = ManifestTable.headVersion(spark, dir).get
    assert(!ManifestTable.metaOf(fs, dir, head).keys
      .exists(_.startsWith(ManifestTable.GenColPrefix)))
  }

  test("DESCRIBE surfaces the generation expression") {
    wh: Unit
    spark.sql("""CREATE TABLE ggen.lake.g6 (
      k INT, d DATE, y INT GENERATED ALWAYS AS (year(d)))""")
    val described = spark.sql("DESCRIBE TABLE ggen.lake.g6").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(described.contains("y"))
  }
}
