package graft

import java.nio.file.Files

import graft.sources.ManifestTable

/** Concurrency fuzz — REAL multi-threaded contention over one
  * `dml.mode=merge-on-read` table: three writer threads (each owning a
  * disjoint key space) race inserts, merge-on-read DELETEs and SQL
  * position-delta UPDATEs against a maintenance thread running full and
  * incremental compactions, all through the engine's optimistic commit
  * loops. After the first compaction the threads' keys MIX within
  * shared dirs, so their mask advances genuinely conflict — the
  * designed outcome is a LOUD abort ("changed incompatibly" /
  * contention), which each thread treats as a retry at a fresh
  * snapshot. The invariant is interleaving-independent because the key
  * spaces are disjoint: at the end the table must equal exactly the
  * union of the per-thread sequential models — any lost append, lost
  * mask, double-applied update or resurrect through a racing rewrite
  * breaks it. This also hammers the snapshot cache (shared LRU, file
  * identity keys) from concurrent driver threads. */
class GraftConcurrencyFuzzSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-ccfz").toString
    spark.conf.set("spark.sql.catalog.gccf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gccf.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gccf.lake")
    dir
  }

  /** The abort messages the optimistic protocol DEFINES as retryable:
    * a racing rewrite/mask advance invalidated this op's snapshot. */
  private def retryable(e: Throwable): Boolean = {
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    msgs.contains("changed incompatibly") || msgs.contains("contention")
  }

  /** Under concurrent DDL a client can also lose the name race: it
    * resolved the key column, a RENAME landed, its statement now
    * references a column that no longer exists. That is an ANALYSIS
    * error, not a commit abort — but the correct client move is the
    * same (re-resolve at fresh metadata and retry), so the crossed
    * fuzz treats it as transient alongside the protocol aborts. */
  private def transientUnderDdl(e: Throwable): Boolean = retryable(e) || {
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    msgs.contains("UNRESOLVED_COLUMN") || msgs.contains("cannot be resolved") ||
      msgs.contains("FIELD_NOT_FOUND") || msgs.contains("does not exist") ||
      msgs.contains("Schema of the graft table") ||
      msgs.contains("UNRESOLVED_FIELD") ||
      // a write planned at the old name committing after the rename:
      // the engine's loud schema-mismatch refusal (the Delta
      // MetadataChangedException analogue) — re-plan and retry
      msgs.contains("schema mismatch")
  }

  private def retrying[T](what: String)(f: => T): T = {
    var attempts = 0
    while (true) {
      try return f
      catch {
        case e: Throwable if retryable(e) && attempts < 30 =>
          attempts += 1
          Thread.sleep(20L * attempts)
      }
    }
    throw new IllegalStateException(s"unreachable: $what")
  }

  test("3 writers + a compactor race one MoR table: nothing lost, nothing resurrected") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gccf.lake.t")
    // bloomCols rides along: every insert/compaction builds sidecars
    // under the same contention, and the end-state point lookups below
    // read through whatever index survived the races
    spark.sql("CREATE TABLE gccf.lake.t (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='200', " +
      "'dml.mode'='merge-on-read', 'bloomCols'='k')")
    val dir = s"$wh/lake/t"
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]

    class Writer(t: Int) extends Thread {
      val model = scala.collection.mutable.LinkedHashMap.empty[Int, String]
      private val rnd = new scala.util.Random(1000L + t)
      private var next = t * 1000 // disjoint key space per thread
      override def run(): Unit = try {
        for (step <- 1 to 10) {
          rnd.nextInt(3) match {
            case 0 => // insert fresh keys (append rebases under race)
              val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
                val k = next; next += 1; (k, s"t$t-i$step-$k")
              }
              retrying(s"t$t insert")(spark.sql(
                s"INSERT INTO gccf.lake.t VALUES " +
                  rows.map { case (k, v) => s"($k,'$v')" }.mkString(",")))
              rows.foreach { case (k, v) => model(k) = v }
            case 1 if model.nonEmpty => // merge-on-read DELETE (mask)
              val ks = rnd.shuffle(model.keys.toList).take(1 + rnd.nextInt(3))
              retrying(s"t$t delete")(spark.sql(
                s"DELETE FROM gccf.lake.t WHERE k IN (${ks.mkString(",")})"))
              ks.foreach(model.remove)
            case 2 if model.nonEmpty => // SQL position-delta UPDATE
              val k = rnd.shuffle(model.keys.toList).head
              val v = s"t$t-u$step"
              retrying(s"t$t update")(spark.sql(
                s"UPDATE gccf.lake.t SET v = '$v' WHERE k = $k"))
              model(k) = v
            case _ => // model empty: seed a row instead
              val k = next; next += 1
              retrying(s"t$t seed")(spark.sql(
                s"INSERT INTO gccf.lake.t VALUES ($k,'t$t-s$step')"))
              model(k) = s"t$t-s$step"
          }
        }
      } catch { case e: Throwable => failures.add(e): Unit }
    }

    class Compactor extends Thread {
      override def run(): Unit = try {
        for (i <- 1 to 6) {
          Thread.sleep(150)
          // racing mask advances abort these LOUDLY by design — that is
          // the protocol working, not a failure; skip and try again
          try {
            if (i % 2 == 0)
              ManifestTable.compactAppend(spark, dir, Seq("k"), k = 3,
                retainGenerations = 200): Unit
            else
              ManifestTable.compactIncremental(spark, dir, Seq("k"), k = 3,
                retainGenerations = 200): Unit
          } catch { case e: Throwable if retryable(e) => () }
        }
      } catch { case e: Throwable => failures.add(e): Unit }
    }

    val writers = (0 until 3).map(new Writer(_))
    val compactor = new Compactor
    (writers :+ compactor).foreach(_.start())
    (writers :+ compactor).foreach(_.join(600000))
    val died = Option(failures.peek())
    assert(died.isEmpty, died.map(e =>
      s"worker died: $e\n${e.getStackTrace.take(12).mkString("\n")}")
      .getOrElse(""))

    val expected = writers.flatMap(_.model).toMap
    def observed(df: org.apache.spark.sql.DataFrame): Map[Int, String] =
      df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    // both read stacks serve exactly the union of the thread models
    val got = observed(spark.table("gccf.lake.t"))
    assert(got == expected,
      s"diverged: missing=${(expected.keySet -- got.keySet).toSeq.sorted.take(8)} " +
        s"extra=${(got.keySet -- expected.keySet).toSeq.sorted.take(8)} " +
        s"changed=${expected.collect { case (k, v) if got.get(k).exists(_ != v) =>
          (k, v, got(k)) }.take(5)}")
    assert(observed(ManifestTable.read(spark, dir)) == expected)
    // a quiesced full compaction materializes every standing mask and
    // preserves the exact content
    ManifestTable.compactAppend(spark, dir, Seq("k"), k = 3,
      retainGenerations = 200)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(ManifestTable.dvOf(fs, dir,
      ManifestTable.headVersion(spark, dir).get).isEmpty)
    assert(observed(spark.table("gccf.lake.t")) == expected)
    // bloom-indexed point lookups agree with the model (the sketches
    // survived inserts, deltas and compactions racing each other)
    expected.keys.take(3).foreach { k =>
      assert(spark.table("gccf.lake.t")
        .where(org.apache.spark.sql.functions.col("k") === k)
        .collect().map(_.getString(1)).toSeq == Seq(expected(k)),
        s"point lookup diverged for key $k")
    }
  }

  test("writers + compactor + brancher race one table: publishes land exactly once, refusals leave no orphans") {
    // S49 under randomized contention: a brancher cuts WAP branches,
    // stages appends + branch-local MoR masks, and publishes (now a
    // REBASE — the parent is guaranteed to have moved under it), while
    // writers churn DML and a compactor rewrites base dirs. Branch
    // work only touches branch-local dirs, so every publish is
    // conflict-free by design and must eventually land (bounded
    // contention refusals reverse the moves and retry whole); dropped
    // branches must leave nothing behind. Invariant: the end state is
    // exactly the writers' models plus the PUBLISHED branch rows —
    // a lost publish move, a leaked reversed dir, or a double-landed
    // branch row all break it.
    wh: Unit
    val s = spark; import s.implicits._
    for (seed <- 1 to 2) {
      spark.sql("DROP TABLE IF EXISTS gccf.lake.b")
      spark.sql("CREATE TABLE gccf.lake.b (k INT, v STRING) " +
        "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='200', " +
        "'dml.mode'='merge-on-read', 'bloomCols'='k')")
      spark.sql("INSERT INTO gccf.lake.b VALUES (1, 'seed')")
      val dir = s"$wh/lake/b"
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]

      class Writer(t: Int) extends Thread {
        val model = scala.collection.mutable.LinkedHashMap.empty[Int, String]
        private val rnd = new scala.util.Random(3000L * seed + t)
        private var next = t * 1000 + 10
        override def run(): Unit = try {
          for (step <- 1 to 8) {
            rnd.nextInt(3) match {
              case 0 =>
                val k = next; next += 1
                retrying(s"t$t insert")(spark.sql(
                  s"INSERT INTO gccf.lake.b VALUES ($k,'t$t-i$step')"))
                model(k) = s"t$t-i$step"
              case 1 if model.nonEmpty =>
                val ks = rnd.shuffle(model.keys.toList).take(1 + rnd.nextInt(2))
                retrying(s"t$t delete")(spark.sql(
                  s"DELETE FROM gccf.lake.b WHERE k IN (${ks.mkString(",")})"))
                ks.foreach(model.remove)
              case _ =>
                val k = next; next += 1
                retrying(s"t$t seed")(spark.sql(
                  s"INSERT INTO gccf.lake.b VALUES ($k,'t$t-s$step')"))
                model(k) = s"t$t-s$step"
            }
          }
        } catch { case e: Throwable => failures.add(e): Unit }
      }

      class Compactor extends Thread {
        override def run(): Unit = try {
          for (i <- 1 to 4) {
            Thread.sleep(100)
            try ManifestTable.compactAppend(spark, dir, Seq("k"), k = 3,
              retainGenerations = 200): Unit
            catch { case e: Throwable if retryable(e) => () }
          }
        } catch { case e: Throwable => failures.add(e): Unit }
      }

      class Brancher extends Thread {
        val model = scala.collection.mutable.LinkedHashMap.empty[Int, String]
        private val rnd = new scala.util.Random(4000L * seed)
        private var next = 9000
        override def run(): Unit = try {
          for (i <- 1 to 4) {
            Thread.sleep(50)
            val name = s"fz$i"
            ManifestTable.createBranch(spark, dir, name): Unit
            val bdir = ManifestTable.branchDirOf(dir, name)
            val rows = (0 until 2).map { _ =>
              val k = next; next += 1; (k, s"br$i-$k") }
            ManifestTable.append(rows.toDF("k", "v"), bdir,
              statsCols = Seq("k"), retainGenerations = 10): Unit
            // sometimes mask one of the branch's OWN fresh rows — a
            // branch-local dv dir that must move through the publish
            val masked: Option[Int] =
              if (rnd.nextBoolean()) {
                val k = rows.head._1
                ManifestTable.deleteWhereMoR(spark, bdir,
                  org.apache.spark.sql.functions.col("k") === k,
                  Map.empty): Unit
                Some(k)
              } else None
            // on even rounds ALSO mask a previously-PUBLISHED row — a
            // BASE-dir mask racing the compactor's rewrites and the
            // writers' own masks: lands via the mask-union merge when
            // the dir only accreted masks, refuses (reversing the
            // moves) when a rewrite touched it
            val baseMasked: Option[Int] =
              if (i % 2 == 0 && model.nonEmpty) {
                val k = model.keys.head
                try {
                  ManifestTable.deleteWhereMoR(spark, bdir,
                    org.apache.spark.sql.functions.col("k") === k,
                    Map.empty): Unit
                  Some(k)
                } catch { case e: Throwable if retryable(e) => None }
              } else None
            if (i == 3) {
              // one audit "fails": the branch drops, its rows vanish
              ManifestTable.dropBranch(spark, dir, name)
            } else {
              val published =
                try {
                  retrying(s"publish $name")(
                    ManifestTable.publishBranch(spark, dir, name)): Unit
                  true
                } catch {
                  // a REAL conflict (the compactor rewrote the masked
                  // base dir): the refusal must have reversed the
                  // moves — drop the intact branch, nothing landed
                  case _: IllegalStateException =>
                    ManifestTable.dropBranch(spark, dir, name)
                    false
                }
              if (published) {
                rows.filterNot { case (k, _) => masked.contains(k) }
                  .foreach { case (k, v) => model(k) = v }
                baseMasked.foreach(model.remove)
              }
            }
          }
        } catch { case e: Throwable => failures.add(e): Unit }
      }

      // derived-state MAINTENANCE racing the brancher (r19): a
      // parent-wide approx ANALYZE rewrites every dir's `#ndv` stats
      // section mid-audit — pre-r19 that made every touched branch
      // unpublishable; now the publish merges the refreshed payloads.
      // The maintainer must neither crash nor block a publish. (Masks
      // standing at analyze time route it to the full mask-aware pass;
      // masks landing MID-analyze abort the incremental publish via
      // the head validator — both paths exercised by this schedule.)
      class Maintainer extends Thread {
        override def run(): Unit = try {
          for (_ <- 1 to 4) {
            Thread.sleep(80)
            try spark.sql("CALL gccf.system.analyze(table => 'lake.b', " +
              "columns => 'k', approx => true)").collect(): Unit
            catch { case e: Throwable if retryable(e) => () }
          }
        } catch { case e: Throwable => failures.add(e): Unit }
      }
      val writers = (0 until 2).map(new Writer(_))
      val brancher = new Brancher
      val racers = writers ++ Seq(new Compactor, brancher, new Maintainer)
      racers.foreach(_.start())
      racers.foreach(_.join(600000))
      val died = Option(failures.peek())
      assert(died.isEmpty, died.map(e =>
        s"seed $seed worker died: $e\n${e.getStackTrace.take(12).mkString("\n")}")
        .getOrElse(""))

      val expected = (writers.flatMap(_.model) ++ brancher.model)
        .toMap + (1 -> "seed")
      val got = spark.table("gccf.lake.b").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(got == expected,
        s"seed $seed diverged: missing=${(expected.keySet -- got.keySet).toSeq.sorted.take(8)} " +
          s"extra=${(got.keySet -- expected.keySet).toSeq.sorted.take(8)}")
      // every schedule consumes or drops its branches — nothing orphaned
      assert(ManifestTable.branches(spark, dir).isEmpty,
        s"seed $seed left branches standing")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_branches")) ||
        fs.listStatus(new org.apache.hadoop.fs.Path(dir, "_branches")).isEmpty,
        s"seed $seed left orphaned branch dirs")
      // quiesced compaction materializes surviving masks, content intact
      ManifestTable.compactAppend(spark, dir, Seq("k"), k = 3,
        retainGenerations = 200)
      val got2 = spark.table("gccf.lake.b").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(got2 == expected, s"seed $seed diverged after final compaction")
    }
  }

  test("writers + compactor + schema evolver race one table: renames never corrupt stats/bloom re-keys") {
    // THE seam the single-family fuzzes miss: a RENAME of the
    // stats/bloom column racing a compaction's sidecar rebuild and
    // other writers' DML. The evolver renames the KEY column (the one
    // every stats payload and bloom sidecar is keyed by) back and
    // forth and churns payload columns; writers re-resolve the key
    // name at every attempt, treating lost name races as transient;
    // the compactor derives its sort column fresh per pass. Invariant:
    // the end state equals the union of the writer models — a stats
    // re-key or sidecar rebuild gone wrong under the race surfaces as
    // pruned-away (lost) rows or a crash, and every read below runs
    // through whatever indexes the races left standing.
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gccf.lake.e")
    spark.sql("CREATE TABLE gccf.lake.e (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='200', " +
      "'dml.mode'='merge-on-read', 'bloomCols'='k')")
    val dir = s"$wh/lake/e"
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]

    def keyCol(): String = spark.table("gccf.lake.e").columns
      .find(_.startsWith("k")).get // evolver renames k -> k<i> -> ...

    def retryingDdl[T](what: String)(f: => T): T = {
      var attempts = 0
      while (true) {
        try return f
        catch {
          case e: Throwable if transientUnderDdl(e) && attempts < 40 =>
            attempts += 1
            Thread.sleep(15L * attempts)
        }
      }
      throw new IllegalStateException(s"unreachable: $what")
    }

    class Writer(t: Int) extends Thread {
      val model = scala.collection.mutable.LinkedHashMap.empty[Int, String]
      private val rnd = new scala.util.Random(2000L + t)
      private var next = t * 1000
      override def run(): Unit = try {
        for (step <- 1 to 8) {
          rnd.nextInt(3) match {
            case 0 =>
              val k = next; next += 1
              val v = s"t$t-i$step"
              // column-list INSERT: the key name moves under us, and a
              // payload column the evolver added must null-fill
              retryingDdl(s"t$t insert")(spark.sql(
                s"INSERT INTO gccf.lake.e (${keyCol()}, v) VALUES ($k,'$v')"))
              model(k) = v
            case 1 if model.nonEmpty =>
              val ks = rnd.shuffle(model.keys.toList).take(1 + rnd.nextInt(2))
              retryingDdl(s"t$t delete")(spark.sql(
                s"DELETE FROM gccf.lake.e WHERE ${keyCol()} IN (${ks.mkString(",")})"))
              ks.foreach(model.remove)
            case 2 if model.nonEmpty =>
              val k = rnd.shuffle(model.keys.toList).head
              val v = s"t$t-u$step"
              retryingDdl(s"t$t update")(spark.sql(
                s"UPDATE gccf.lake.e SET v = '$v' WHERE ${keyCol()} = $k"))
              model(k) = v
            case _ =>
              val k = next; next += 1
              retryingDdl(s"t$t seed")(spark.sql(
                s"INSERT INTO gccf.lake.e (${keyCol()}, v) VALUES ($k,'t$t-s$step')"))
              model(k) = s"t$t-s$step"
          }
        }
      } catch { case e: Throwable => failures.add(e): Unit }
    }

    class Evolver extends Thread {
      private val added = scala.collection.mutable.Queue.empty[String]
      override def run(): Unit = try {
        for (i <- 1 to 6) {
          Thread.sleep(80)
          // rename the stats/bloom key column — every sidecar and
          // stats payload must follow through whatever compaction or
          // DML commit it races
          retryingDdl(s"rename $i")(spark.sql(
            s"ALTER TABLE gccf.lake.e RENAME COLUMN ${keyCol()} TO k$i"))
          if (i % 2 == 1) {
            retryingDdl(s"add $i")(spark.sql(
              s"ALTER TABLE gccf.lake.e ADD COLUMN x$i STRING"))
            added.enqueue(s"x$i")
          } else if (added.nonEmpty) {
            val victim = added.dequeue()
            retryingDdl(s"drop $victim")(spark.sql(
              s"ALTER TABLE gccf.lake.e DROP COLUMN $victim"))
          }
        }
      } catch { case e: Throwable => failures.add(e): Unit }
    }

    class Compactor extends Thread {
      override def run(): Unit = try {
        for (i <- 1 to 5) {
          Thread.sleep(120)
          // sort/stats column resolved fresh per pass — and even so the
          // evolver can rename between the read and the rewrite; both
          // the optimistic abort and the lost name race are skips here
          try {
            if (i % 2 == 0)
              ManifestTable.compactAppend(spark, dir, Seq(keyCol()), k = 3,
                retainGenerations = 200): Unit
            else
              ManifestTable.compactIncremental(spark, dir, Seq(keyCol()), k = 3,
                retainGenerations = 200): Unit
          } catch { case e: Throwable if transientUnderDdl(e) => () }
        }
      } catch { case e: Throwable => failures.add(e): Unit }
    }

    val writers = (0 until 2).map(new Writer(_))
    val racers = writers ++ Seq(new Evolver, new Compactor)
    racers.foreach(_.start())
    racers.foreach(_.join(600000))
    val died = Option(failures.peek())
    assert(died.isEmpty, died.map(e =>
      s"worker died: $e\n${e.getStackTrace.take(12).mkString("\n")}")
      .getOrElse(""))

    val expected = writers.flatMap(_.model).toMap
    val key = keyCol()
    assert(key != "k", "the evolver must have renamed the key column")
    def observed(df: org.apache.spark.sql.DataFrame): Map[Int, String] =
      df.select(key, "v").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(observed(spark.table("gccf.lake.e")) == expected,
      s"V2 read diverged after the crossed race (key=$key)")
    assert(observed(ManifestTable.read(spark, dir)) == expected)
    // quiesced compaction under the FINAL name: stats + blooms re-key
    // one last time, masks materialize away, content is preserved
    ManifestTable.compactAppend(spark, dir, Seq(key), k = 3,
      retainGenerations = 200)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(ManifestTable.dvOf(fs, dir,
      ManifestTable.headVersion(spark, dir).get).isEmpty)
    assert(observed(spark.table("gccf.lake.e")) == expected)
    // point lookups through the rebuilt indexes under the renamed key
    expected.keys.take(3).foreach { k =>
      assert(spark.table("gccf.lake.e")
        .where(org.apache.spark.sql.functions.col(key) === k)
        .select("v").collect().map(_.getString(0)).toSeq ==
        Seq(expected(k)), s"point lookup diverged for $key=$k")
    }
  }
}
