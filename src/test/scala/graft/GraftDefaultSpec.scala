package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.sources.ManifestTable

/** S48 — column DEFAULT values: CREATE-time current defaults (future
  * INSERT resolution), ADD COLUMN existence defaults (pre-ADD rows
  * serve the frozen constant with zero rewrite — Spark's parquet
  * readers fill from EXISTS_DEFAULT field metadata), the SET/DROP
  * DEFAULT split (current changes, existence never), physical-name
  * keying under RENAME, and the `col-defaults` reader feature gate. */
class GraftDefaultSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-def").toString
    spark.conf.set("spark.sql.catalog.gdef", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdef.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdef.lake")
    dir
  }
  private def fs =
    new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())

  test("CREATE TABLE with DEFAULT: omitted columns resolve at INSERT") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.lake.c1 (k INT, tag STRING DEFAULT 'fresh')")
    spark.sql("INSERT INTO gdef.lake.c1 (k) VALUES (1)")
    spark.sql("INSERT INTO gdef.lake.c1 VALUES (2, 'explicit')")
    spark.sql("INSERT INTO gdef.lake.c1 VALUES (3, DEFAULT)")
    val got = spark.sql("SELECT k, tag FROM gdef.lake.c1 ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "fresh"), (2, "explicit"), (3, "fresh")))
  }

  test("ADD COLUMN DEFAULT: pre-ADD rows serve the frozen constant, no rewrite") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.lake.a1 (k INT, v STRING)")
    spark.sql("INSERT INTO gdef.lake.a1 VALUES (1, 'a'), (2, 'b')")
    val dir = s"$wh/lake/a1"
    val filesBefore = ManifestTable.headVersion(spark, dir)
      .map(v => ManifestTable.pathsOf(fs, dir, v)).get
    spark.sql("ALTER TABLE gdef.lake.a1 ADD COLUMN score INT DEFAULT 42")
    // metadata-only: the data dirs are untouched
    val filesAfter = ManifestTable.headVersion(spark, dir)
      .map(v => ManifestTable.pathsOf(fs, dir, v)).get
    assert(filesAfter === filesBefore)
    spark.sql("INSERT INTO gdef.lake.a1 (k, v) VALUES (3, 'c')")
    spark.sql("INSERT INTO gdef.lake.a1 VALUES (4, 'd', 7)")
    val got = spark.sql("SELECT k, score FROM gdef.lake.a1 ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got === Seq((1, 42), (2, 42), (3, 42), (4, 7)),
      "pre-ADD rows AND post-ADD default inserts both read 42")
    // aggregate over the defaulted column sees the fill
    assert(spark.sql("SELECT sum(score) FROM gdef.lake.a1")
      .head().getLong(0) === 42L * 3 + 7)
    // the WHERE surface sees it too (filter above the scan)
    assert(spark.sql(
      "SELECT count(*) FROM gdef.lake.a1 WHERE score = 42")
      .head().getLong(0) === 3L)
  }

  test("SET DEFAULT moves the current default; existence stays frozen") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.lake.s1 (k INT, v STRING)")
    spark.sql("INSERT INTO gdef.lake.s1 VALUES (1, 'a')")
    spark.sql("ALTER TABLE gdef.lake.s1 ADD COLUMN band STRING DEFAULT 'low'")
    spark.sql("INSERT INTO gdef.lake.s1 (k, v) VALUES (2, 'b')")
    spark.sql("ALTER TABLE gdef.lake.s1 ALTER COLUMN band SET DEFAULT 'high'")
    spark.sql("INSERT INTO gdef.lake.s1 (k, v) VALUES (3, 'c')")
    val got = spark.sql("SELECT k, band FROM gdef.lake.s1 ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "low"), (2, "low"), (3, "high")),
      "row 1 keeps the ADD-time constant under the later SET DEFAULT")
    // DROP DEFAULT: a later short insert falls back to Spark's
    // nullable-column null fill (the pre-default behavior), and
    // existing rows are untouched by the drop
    spark.sql("ALTER TABLE gdef.lake.s1 ALTER COLUMN band DROP DEFAULT")
    spark.sql("INSERT INTO gdef.lake.s1 (k, v) VALUES (4, 'd')")
    assert(spark.sql("SELECT band FROM gdef.lake.s1 WHERE k = 4")
      .head().isNullAt(0))
    assert(spark.sql("SELECT band FROM gdef.lake.s1 WHERE k = 1")
      .head().getString(0) === "low")
  }

  test("SET DEFAULT validates the clause at ALTER time") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.lake.bad1 (k INT, n INT)")
    spark.sql("INSERT INTO gdef.lake.bad1 VALUES (1, 1)")
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE gdef.lake.bad1 ALTER COLUMN n SET DEFAULT 'not-an-int'")
    }
  }

  test("RENAME COLUMN keeps both defaults (physical-name keying)") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.lake.r1 (k INT, v STRING)")
    spark.sql("INSERT INTO gdef.lake.r1 VALUES (1, 'a')")
    spark.sql("ALTER TABLE gdef.lake.r1 ADD COLUMN w INT DEFAULT 9")
    spark.sql("ALTER TABLE gdef.lake.r1 RENAME COLUMN w TO weight")
    spark.sql("INSERT INTO gdef.lake.r1 (k, v) VALUES (2, 'b')")
    val got = spark.sql("SELECT k, weight FROM gdef.lake.r1 ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got === Seq((1, 9), (2, 9)),
      "pre-ADD fill and current default both survive the rename")
  }

  test("DROP COLUMN clears its default channels") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.lake.d1 (k INT, v STRING)")
    spark.sql("INSERT INTO gdef.lake.d1 VALUES (1, 'a')")
    spark.sql("ALTER TABLE gdef.lake.d1 ADD COLUMN gone INT DEFAULT 5")
    spark.sql("ALTER TABLE gdef.lake.d1 DROP COLUMN gone")
    val dir = s"$wh/lake/d1"
    val head = ManifestTable.headVersion(spark, dir).get
    val meta = ManifestTable.metaOf(fs, dir, head)
    assert(!meta.keys.exists(_.startsWith(ManifestTable.DefaultPrefix)))
    assert(!meta.keys.exists(_.startsWith(ManifestTable.ExistsDefaultPrefix)))
    // ...and the reader feature demand drops with them
    assert(!meta.get(ManifestTable.RequireReaderKey)
      .exists(_.contains("col-defaults")))
  }

  test("existence defaults derive the col-defaults reader feature") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.lake.f1 (k INT, v STRING DEFAULT 'x')")
    spark.sql("INSERT INTO gdef.lake.f1 (k) VALUES (1)")
    val dir = s"$wh/lake/f1"
    def readerReq = ManifestTable.headVersion(spark, dir)
      .flatMap(v => ManifestTable.metaOf(fs, dir, v)
        .get(ManifestTable.RequireReaderKey)).getOrElse("")
    // CREATE-time defaults are current-only: every dir stores the
    // column physically, no read-semantics change, no gate
    assert(!readerReq.contains("col-defaults"))
    spark.sql("ALTER TABLE gdef.lake.f1 ADD COLUMN n INT DEFAULT 3")
    spark.sql("INSERT INTO gdef.lake.f1 (k) VALUES (2)")
    assert(readerReq.contains("col-defaults"),
      "an existence default changes what a read RETURNS — old engines must refuse")
  }

  test("defaults serve through time travel, path loads and DML reads") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.lake.t1 (k INT, v STRING) " +
      "TBLPROPERTIES ('retainGenerations'='10')")
    spark.sql("INSERT INTO gdef.lake.t1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE gdef.lake.t1 ADD COLUMN tag STRING DEFAULT 'old'")
    spark.sql("INSERT INTO gdef.lake.t1 (k, v) VALUES (3, 'c')")
    val dir = s"$wh/lake/t1"
    // path-loaded V2 read sees the same fill
    val viaPath = spark.read.format("graft").load(dir)
      .selectExpr("k", "tag").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(viaPath === Set((1, "old"), (2, "old"), (3, "old")))
    // time travel to a post-ADD version serves the constant for
    // pre-ADD rows (the decoration follows the version's own meta)
    val postAdd = spark.sql(
      "SELECT k, tag FROM gdef.lake.t1 VERSION AS OF 3")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(postAdd === Set((1, "old"), (2, "old")))
    // SQL UPDATE predicated on the defaulted column: the rewrite's
    // source scan must see the fill or it rewrites nothing
    spark.sql("UPDATE gdef.lake.t1 SET v = 'patched' WHERE tag = 'old' AND k = 1")
    assert(spark.sql("SELECT v FROM gdef.lake.t1 WHERE k = 1")
      .head().getString(0) === "patched")
    assert(spark.sql("SELECT tag FROM gdef.lake.t1 WHERE k = 1")
      .head().getString(0) === "old",
      "the copy-on-write rewrite materializes the constant, not null")
  }

  test("typed defaults: date, numeric and negative literals fill exactly") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.lake.ty1 (k INT)")
    spark.sql("INSERT INTO gdef.lake.ty1 VALUES (1)")
    spark.sql("ALTER TABLE gdef.lake.ty1 ADD COLUMN d DATE DEFAULT DATE'2020-06-15'")
    spark.sql("ALTER TABLE gdef.lake.ty1 ADD COLUMN f DOUBLE DEFAULT -2.5")
    spark.sql("ALTER TABLE gdef.lake.ty1 ADD COLUMN b BIGINT DEFAULT 7000000000")
    val r = spark.sql("SELECT d, f, b FROM gdef.lake.ty1 WHERE k = 1").head()
    assert(r.getDate(0).toString === "2020-06-15")
    assert(r.getDouble(1) === -2.5)
    assert(r.getLong(2) === 7000000000L)
  }
}
