package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S25 — SQL `UPDATE` on manifest tables via Spark's native row-level
  * rewrite onto the group copy-on-write operation (GraftRowLevelOps):
  * dir-granular copy-on-write, SQL null semantics, expression values,
  * store-assignment casts, and pass-through for non-graft tables. */
class GraftUpdateSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-upd").toString
    spark.conf.set("spark.sql.catalog.gupd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gupd.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gupd.lake")
    dir
  }
  private def fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())

  private def twoDirTable(name: String): String = {
    wh: Unit
    spark.sql(s"DROP TABLE IF EXISTS gupd.lake.$name")
    spark.sql(s"CREATE TABLE gupd.lake.$name (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='10')")
    spark.sql(s"INSERT INTO gupd.lake.$name " +
      "VALUES (0,'a'),(1,'b'),(2,'c'),(3,'d'),(4,'e')")
    spark.sql(s"INSERT INTO gupd.lake.$name " +
      "VALUES (10,'p'),(11,'q'),(12,'r'),(13,'s'),(14,'t')")
    s"$wh/lake/$name"
  }

  test("UPDATE rewrites predicated rows, leaves the rest byte-identical") {
    twoDirTable("u1")
    spark.sql("UPDATE gupd.lake.u1 SET v = 'ZZ' WHERE k = 2")
    val rows = spark.table("gupd.lake.u1").orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows(2) == ((2, "ZZ")))
    assert(rows.filterNot(_._1 == 2) ==
      Seq((0, "a"), (1, "b"), (3, "d"), (4, "e"),
        (10, "p"), (11, "q"), (12, "r"), (13, "s"), (14, "t")))
  }

  test("UPDATE carries dirs the stats prove cannot match") {
    val dir = twoDirTable("u2")
    val before = ManifestTable.livePaths(fs, dir)
    val v0 = ManifestTable.headVersion(spark, dir).get
    val stats0 = ManifestTable.statsOf(fs, dir, v0)
    val lowDir = before.minBy(p =>
      ManifestTable.statsFor(stats0(p), "k").get._3.get.toLong)
    spark.sql("UPDATE gupd.lake.u2 SET v = upper(v) WHERE k >= 12 AND k <= 13")
    val after = ManifestTable.livePaths(fs, dir)
    assert(after.contains(lowDir), "out-of-bounds dir must be carried untouched")
    assert(after.exists(_.startsWith("c-rl-")),
      "native group rewrite publishes a c-rl- dir")
    assert(spark.table("gupd.lake.u2").filter(col("k") >= 10)
      .orderBy("k").collect().map(_.getString(1)).toSeq ==
      Seq("p", "q", "R", "S", "t"))
  }

  test("UPDATE values may reference columns; assignment casts to the column type") {
    twoDirTable("u3")
    // k + 30 is LONG in SQL; store-assignment casts back to the INT column
    spark.sql("UPDATE gupd.lake.u3 SET k = k + 30, v = concat(v, '!') WHERE k < 2")
    val rows = spark.table("gupd.lake.u3").orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows.take(3) == Seq((2, "c"), (3, "d"), (4, "e")))
    assert(rows.takeRight(2) == Seq((30, "a!"), (31, "b!")))
  }

  test("UPDATE keeps NULL-predicate rows untouched; WHERE v IS NULL hits them") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gupd.lake.un")
    spark.sql("CREATE TABLE gupd.lake.un (k INT, v STRING)")
    spark.sql("INSERT INTO gupd.lake.un VALUES (1,'x'),(2,NULL),(3,'y')")
    spark.sql("UPDATE gupd.lake.un SET v = 'hit' WHERE v != 'y'")
    assert(spark.table("gupd.lake.un").orderBy("k").collect()
      .map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("hit"), None, Some("y")))
    spark.sql("UPDATE gupd.lake.un SET v = 'wasnull' WHERE v IS NULL")
    assert(spark.table("gupd.lake.un").filter("k = 2").head().getString(1) ==
      "wasnull")
  }

  test("UPDATE without WHERE updates every row; time travel sees the past") {
    twoDirTable("u4") // v1 create, v2+v3 inserts
    spark.sql("UPDATE gupd.lake.u4 SET v = 'all'")
    assert(spark.table("gupd.lake.u4").collect().forall(_.getString(1) == "all"))
    assert(spark.sql("SELECT * FROM gupd.lake.u4 VERSION AS OF 3")
      .collect().count(_.getString(1) == "all") == 0)
  }

  test("UPDATE on a non-graft table still fails with Spark's own error") {
    val df = spark.range(3).toDF("id")
    df.createOrReplaceTempView("plain_view")
    intercept[Exception] {
      spark.sql("UPDATE plain_view SET id = 0 WHERE id = 1")
    }
  }

  test("direct-API updateWhere prunes by bounds") {
    val dir = Files.createTempDirectory("graft-upd-api").toString + "/t"
    val s = spark; import s.implicits._
    ManifestTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir,
      statsCols = Seq("k"), retainGenerations = 10)
    ManifestTable.append(Seq((10, "p"), (11, "q")).toDF("k", "v"), dir,
      statsCols = Seq("k"), retainGenerations = 10)
    val before = ManifestTable.livePaths(fs, dir)
    val v0 = ManifestTable.headVersion(spark, dir).get
    val stats0 = ManifestTable.statsOf(fs, dir, v0)
    val lowDir = before.minBy(p =>
      ManifestTable.statsFor(stats0(p), "k").get._3.get.toLong)
    ManifestTable.updateWhere(spark, dir, col("k") === 11,
      Seq("v" -> lit("Q!")), bounds = Map("k" -> ("11", "11")),
      retainGenerations = 10)
    assert(ManifestTable.read(spark, dir).orderBy("k").collect()
      .map(_.getString(1)).toSeq == Seq("a", "b", "p", "Q!"))
    assert(ManifestTable.livePaths(fs, dir).contains(lowDir))
    // provable no-op commits nothing
    val head = ManifestTable.headVersion(spark, dir).get
    assert(ManifestTable.updateWhere(spark, dir, col("k") === 999,
      Seq("v" -> lit("x")), bounds = Map("k" -> ("999", "999")),
      retainGenerations = 10) == head)
  }

  test("fuzz: random conditions/assignments round-trip through the SQL transport") {
    wh: Unit
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(20260814L)
    spark.sql("DROP TABLE IF EXISTS gupd.lake.fz")
    spark.sql("CREATE TABLE gupd.lake.fz (k INT, amt DOUBLE, v STRING)")
    (1 to 40).map(i => (i, (i * 7 % 23) + 0.5,
        if (i % 7 == 0) null else s"s$i"))
      .toDF("k", "amt", "v").writeTo("gupd.lake.fz").append()
    def randCond(): String = rnd.nextInt(6) match {
      case 0 => s"k > ${rnd.nextInt(40)}"
      case 1 => s"amt <= ${rnd.nextInt(23)}.5"
      case 2 => "v IS NULL"
      case 3 => s"(k % ${2 + rnd.nextInt(5)}) = 0 AND amt > ${rnd.nextInt(10)}"
      case 4 => "upper(v) LIKE 'S1%'"
      case 5 => s"k IN (${Seq.fill(3)(rnd.nextInt(40)).mkString(",")}) OR v = 's5'"
    }
    def randAssign(): (String, String) = rnd.nextInt(4) match {
      case 0 => "k" -> s"k + ${rnd.nextInt(100)}"
      case 1 => "amt" -> "round(amt * 2.0, 2)"
      case 2 => "v" -> "concat(coalesce(v, 'x'), '!')"
      case 3 => "amt" -> "CAST(k AS DOUBLE) / 4"
    }
    def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
      rows.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    for (it <- 1 to 12) {
      val cond = randCond()
      val assigns = Seq(randAssign())
      val cur = spark.table("gupd.lake.fz")
      // the semantic model, computed on the PRE-update state with
      // DataFrame primitives (no SQL-text round-trip to share a bug with)
      val expected = canon(cur.select(cur.columns.toIndexedSeq.map { c =>
        assigns.toMap.get(c) match {
          case Some(vs) => when(coalesce(expr(cond), lit(false)),
            expr(vs).cast(cur.schema(c).dataType)).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }: _*).collect())
      spark.sql(s"UPDATE gupd.lake.fz SET " +
        assigns.map { case (c, v) => s"$c = $v" }.mkString(", ") +
        s" WHERE $cond")
      assert(canon(spark.table("gupd.lake.fz").collect()) == expected,
        s"iteration $it diverged: UPDATE ... SET ${assigns} WHERE $cond")
    }
  }

  test("s25 board query matches the recomputed oracle on sf0.001") {
    val r = graft.sources.Sources.s25_update_where(spark, sf).head()
    val o = Tables.orders(spark, sf)
    val hit = o.filter(col("o_orderpriority") === "5-LOW" &&
      col("o_orderdate") < lit("1996-06-01").cast("date"))
    assert(hit.count() > 0, "the update must hit a real slice")
    assert(r.getLong(0) == o.count(), "UPDATE must not change the row count")
    // second invocation reuses the cached fixture and agrees
    assert(graft.sources.Sources.s25_update_where(spark, sf).head() == r)
  }
}
