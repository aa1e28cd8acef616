package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** S26 — SQL `MERGE INTO` on manifest tables via Spark's native merge
  * rewrite onto the group copy-on-write operation: full clause surface
  * (matched UPDATE/DELETE with conditions, NOT MATCHED INSERT, NOT
  * MATCHED BY SOURCE), first-match-wins, the cardinality rule,
  * source-envelope dir pruning, and subquery sources. */
class GraftMergeSqlSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-mrg").toString
    spark.conf.set("spark.sql.catalog.gmrg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmrg.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmrg.lake")
    dir
  }
  private def fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())

  private def freshTable(name: String): String = {
    wh: Unit
    spark.sql(s"DROP TABLE IF EXISTS gmrg.lake.$name")
    spark.sql(s"CREATE TABLE gmrg.lake.$name (k INT, v STRING, amt DOUBLE) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='10')")
    spark.sql(s"INSERT INTO gmrg.lake.$name " +
      "VALUES (1,'a',10.0),(2,'b',20.0),(3,'c',30.0)")
    s"$wh/lake/$name"
  }

  test("MERGE upsert: matched UPDATE + not-matched INSERT") {
    freshTable("m1")
    spark.range(0).createOrReplaceTempView("__unused") // force session init
    spark.sql(
      """MERGE INTO gmrg.lake.m1 AS t
         USING (SELECT * FROM VALUES (2,'B2',200.0), (9,'i',90.0) AS s(k, v, amt)) AS s
         ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
         WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)""")
    val rows = spark.table("gmrg.lake.m1").orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1, "a", 10.0), (2, "B2", 200.0), (3, "c", 30.0),
      (9, "i", 90.0)))
  }

  test("MERGE clause conditions: first-match-wins, conditional DELETE") {
    freshTable("m2")
    spark.sql(
      """MERGE INTO gmrg.lake.m2 AS t
         USING (SELECT * FROM VALUES (1, 0.0), (2, 999.0), (3, 5.0) AS s(k, bump)) AS s
         ON t.k = s.k
         WHEN MATCHED AND s.bump > 100 THEN DELETE
         WHEN MATCHED AND s.bump > 1 THEN UPDATE SET amt = t.amt + s.bump
         WHEN MATCHED THEN UPDATE SET v = 'zeroed'""")
    val rows = spark.table("gmrg.lake.m2").orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    // k=1: bump 0 → third clause (v zeroed); k=2: deleted; k=3: amt+5
    assert(rows == Seq((1, "zeroed", 10.0), (3, "c", 35.0)))
  }

  test("MERGE NOT MATCHED BY SOURCE updates/deletes unreferenced target rows") {
    freshTable("m3")
    spark.sql(
      """MERGE INTO gmrg.lake.m3 AS t
         USING (SELECT * FROM VALUES (1) AS s(k)) AS s
         ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET v = 'kept'
         WHEN NOT MATCHED BY SOURCE AND t.k = 3 THEN DELETE
         WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""")
    val rows = spark.table("gmrg.lake.m3").orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "kept"), (2, "stale")))
  }

  test("MERGE cardinality: multiple source matches for one target row fail") {
    val dir = freshTable("m4")
    val headBefore = ManifestTable.headVersion(spark, dir).get
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO gmrg.lake.m4 AS t
           USING (SELECT * FROM VALUES (2,'x'), (2,'y') AS s(k, v)) AS s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("MERGE_CARDINALITY_VIOLATION")),
      s"cardinality failure must be loud and named: ${msgs(e)}")
    // the table is unchanged — the guard fires inside the rewrite job,
    // which dies before any manifest commit
    assert(spark.table("gmrg.lake.m4").count() == 3L)
    assert(ManifestTable.headVersion(spark, dir).contains(headBefore))
  }

  test("MERGE runs its join ONCE — the cardinality check rides the rewrite pass") {
    // r11 ran a SEPARATE duplicate-detection job over a second
    // full-outer join before the rewrite (2× merge cost at scale); the
    // check now rides a window over the same join output. Pin it: of
    // all plans executed by the statement, exactly ONE contains a join.
    freshTable("m7")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString): Unit
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      spark.sql(
        """MERGE INTO gmrg.lake.m7 AS t
           USING (SELECT * FROM VALUES (2,'B2',200.0), (9,'i',90.0) AS s(k, v, amt)) AS s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
           WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)""")
      // listener delivery is async: wait until the join-bearing plan
      // lands, then a settle window to catch any SECOND one
      import scala.jdk.CollectionConverters._
      def joins = plans.asScala.count(_.contains("Join"))
      val deadline = System.currentTimeMillis() + 20000
      while (joins < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      Thread.sleep(1500)
      assert(joins == 1,
        s"expected exactly one join-bearing execution, got $joins of ${plans.size}")
    } finally spark.listenerManager.unregister(listener)
    assert(spark.table("gmrg.lake.m7").count() == 4L)
  }

  test("MERGE prunes target dirs outside the source key envelope") {
    val dir = freshTable("m5")
    spark.sql("INSERT INTO gmrg.lake.m5 VALUES (100,'z',1.0),(101,'zz',2.0)")
    val before = ManifestTable.livePaths(fs, dir)
    val v0 = ManifestTable.headVersion(spark, dir).get
    val stats0 = ManifestTable.statsOf(fs, dir, v0)
    val lowDir = before.minBy(p =>
      ManifestTable.statsFor(stats0(p), "k").get._3.get.toLong)
    // source keys 100..101: the 1..3 dir lies outside the envelope
    spark.sql(
      """MERGE INTO gmrg.lake.m5 AS t
         USING (SELECT * FROM VALUES (100,'Z!') AS s(k, v)) AS s
         ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET v = s.v""")
    val after = ManifestTable.livePaths(fs, dir)
    assert(after.contains(lowDir), "out-of-envelope dir must be carried")
    assert(after.exists(_.startsWith("c-rl-")),
      "native group rewrite publishes a c-rl- dir")
    assert(spark.table("gmrg.lake.m5").filter("k = 100").head().getString(1)
      == "Z!")
    assert(spark.table("gmrg.lake.m5").count() == 5L)
  }

  test("MERGE insert-only into an empty table works (no touched dirs)") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gmrg.lake.m6")
    spark.sql("CREATE TABLE gmrg.lake.m6 (k INT, v STRING, amt DOUBLE)")
    spark.sql(
      """MERGE INTO gmrg.lake.m6 AS t
         USING (SELECT * FROM VALUES (7,'new',70.0) AS s(k, v, amt)) AS s
         ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)""")
    assert(spark.table("gmrg.lake.m6").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((7, "new")))
  }

  test("MERGE with a real subquery source and expression values") {
    freshTable("m7")
    Tables.orders(spark, sf).limit(0) // warm nothing; keep source local
    spark.sql(
      """MERGE INTO gmrg.lake.m7 AS t
         USING (SELECT k * 1 AS kk, upper(v) AS uv
                FROM VALUES (1,'q'), (8,'r') AS raw(k, v)) AS s
         ON t.k = s.kk
         WHEN MATCHED THEN UPDATE SET v = concat(t.v, '+', s.uv)
         WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.kk, s.uv, 0.0)""")
    val rows = spark.table("gmrg.lake.m7").orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "a+Q"), (2, "b"), (3, "c"), (8, "R")))
  }

  test("MERGE time travel: the pre-merge snapshot is intact") {
    freshTable("m8") // v1 create, v2 insert
    spark.sql(
      """MERGE INTO gmrg.lake.m8 AS t
         USING (SELECT * FROM VALUES (1) AS s(k)) AS s
         ON t.k = s.k
         WHEN MATCHED THEN DELETE""")
    assert(spark.table("gmrg.lake.m8").count() == 2L)
    assert(spark.sql("SELECT * FROM gmrg.lake.m8 VERSION AS OF 2").count() == 3L)
  }

  test("no-MATCHED merge with a multi-matching source never duplicates target rows") {
    freshTable("m9")
    // k=2 matches TWO source rows — legal with no WHEN MATCHED clause;
    // the target row must appear exactly once, and both k=8 source
    // rows insert (SQL inserts each source row)
    spark.sql(
      """MERGE INTO gmrg.lake.m9 AS t
         USING (SELECT * FROM VALUES (2,'x'), (2,'y'), (8,'i'), (8,'j')
                AS s(k, v)) AS s
         ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, 0.0)""")
    val rows = spark.table("gmrg.lake.m9").orderBy("k", "v")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "a"), (2, "b"), (3, "c"), (8, "i"), (8, "j")),
      s"got $rows")
    // ... and NOT MATCHED BY SOURCE still applies in the same statement
    spark.sql(
      """MERGE INTO gmrg.lake.m9 AS t
         USING (SELECT * FROM VALUES (2,'x'), (2,'y') AS s(k, v)) AS s
         ON t.k = s.k
         WHEN NOT MATCHED BY SOURCE AND t.k > 7 THEN DELETE""")
    assert(spark.table("gmrg.lake.m9").collect().map(_.getInt(0)).sorted
      .toSeq == Seq(1, 2, 3))
  }

  test("fuzz: random MERGE clause combinations track an in-memory model") {
    wh: Unit
    val rnd = new scala.util.Random(20260814L)
    // model rows: unique keys on both sides (multi-match is its own
    // tested lane); no nulls, so the Scala mirror's two-valued
    // evaluation matches SQL exactly
    case class R(k: Int, amt: Double)
    // condition grammar: one node renders BOTH the SQL and the Scala
    // evaluation, so the two sides derive from a single AST
    case class Cond(sql: String, eval: (Double, Double) => Boolean)
    def randCond(tRef: String, sRef: String): Cond = rnd.nextInt(4) match {
      case 0 => val c = rnd.nextInt(40)
        Cond(s"$tRef.amt > $c.0", (t, _) => t > c)
      case 1 => val c = rnd.nextInt(40)
        Cond(s"$sRef.amt <= $c.0", (_, s) => s <= c)
      case 2 => val c = rnd.nextInt(20)
        Cond(s"$tRef.amt + $sRef.amt < ${2 * c}.0", (t, s) => t + s < 2 * c)
      case 3 => Cond("1 = 1", (_, _) => true)
    }
    def randTCond(tRef: String): Cond = rnd.nextInt(3) match {
      case 0 => val c = rnd.nextInt(40); Cond(s"$tRef.amt > $c.0", (t, _) => t > c)
      case 1 => val c = rnd.nextInt(40); Cond(s"$tRef.amt <= $c.0", (t, _) => t <= c)
      case 2 => Cond("1 = 1", (_, _) => true)
    }
    for (it <- 1 to 8) {
      spark.sql("DROP TABLE IF EXISTS gmrg.lake.fz")
      spark.sql("CREATE TABLE gmrg.lake.fz (k INT, amt DOUBLE)")
      val target = (1 to 30).map(k => R(k, (k * 13 % 47).toDouble))
      val source = rnd.shuffle((15 to 45).toList).take(20)
        .map(k => R(k, (k * 7 % 31).toDouble))
      spark.sql("INSERT INTO gmrg.lake.fz VALUES " +
        target.map(r => s"(${r.k}, ${r.amt})").mkString(","))
      // clause mix: matched UPDATE then DELETE (first-match-wins),
      // a conditional INSERT, an optional BY SOURCE DELETE
      val mUpd = randCond("t", "s")
      val mDel = randCond("t", "s")
      val ins = randCond("s", "s") // only s-side refs are valid here
      val insC = Cond(ins.sql.replace("t.amt", "s.amt"),
        (t, s) => ins.eval(s, s))
      val useBySource = rnd.nextBoolean()
      val bySrc = randTCond("t")
      val sql = new StringBuilder(
        s"""MERGE INTO gmrg.lake.fz AS t
            USING (SELECT * FROM VALUES
              ${source.map(r => s"(${r.k}, ${r.amt})").mkString(",")}
              AS s(k, amt)) AS s
            ON t.k = s.k
            WHEN MATCHED AND ${mUpd.sql} THEN UPDATE SET amt = t.amt + s.amt
            WHEN MATCHED AND ${mDel.sql} THEN DELETE
            WHEN NOT MATCHED AND ${insC.sql} THEN INSERT (k, amt)
                 VALUES (s.k, s.amt)""")
      if (useBySource)
        sql.append(s"\n            WHEN NOT MATCHED BY SOURCE AND ${bySrc.sql} THEN DELETE")
      spark.sql(sql.toString)
      // the Scala mirror of SQL MERGE semantics
      val srcByK = source.map(r => r.k -> r).toMap
      val fromTarget = target.flatMap { t =>
        srcByK.get(t.k) match {
          case Some(s) => // matched: first-match-wins across clauses
            if (mUpd.eval(t.amt, s.amt)) Some(R(t.k, t.amt + s.amt))
            else if (mDel.eval(t.amt, s.amt)) None
            else Some(t)
          case None =>
            if (useBySource && bySrc.eval(t.amt, 0)) None else Some(t)
        }
      }
      val inserted = source.filter(s => !target.exists(_.k == s.k))
        .filter(s => insC.eval(0, s.amt))
      val expected = (fromTarget ++ inserted).map(r => (r.k, r.amt))
        .sorted.toSeq
      val got = spark.table("gmrg.lake.fz").collect()
        .map(r => (r.getInt(0), r.getDouble(1))).sorted.toSeq
      assert(got == expected, s"iteration $it diverged:\n$sql")
    }
  }

  test("s26 board query matches the recomputed oracle on sf0.001") {
    val r = graft.sources.Sources.s26_merge_sql(spark, sf).head()
    assert(r.getLong(0) > 0)
    // second invocation reuses the cached fixture and agrees
    assert(graft.sources.Sources.s26_merge_sql(spark, sf).head() == r)
  }
}
