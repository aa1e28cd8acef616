package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The driver-contract hang-proofing (r20): one wedged query must
  * cost one err row and one timeout window, never the whole artifact
  * — round 19's single driver-side infinite loop blanked all 220
  * correctness rows and timed out the bench with zero diagnostics. */
class WatchdogSpec extends SparkTestBase {

  test("a driver-spinning body times out; the caller moves on") {
    val t0 = System.nanoTime()
    val r = Watchdog.run(spark, "spin", timeoutSec = 2) {
      while (true) {} // the r19 shape: no Spark job, no wait, no throw
      42
    }
    val sec = (System.nanoTime() - t0) / 1e9
    // the err row carries a POST-MORTEM of the wedged worker (r21):
    // the timeout prefix stays (Bench's never-re-rep guard keys on
    // it) and the stack names the spin site, so the next r19-style
    // wedge self-diagnoses from the artifact alone
    r match {
      case Left(msg) =>
        assert(msg.startsWith("timeout after 2s"), msg)
        assert(msg.contains("wedged at:") && msg.contains("WatchdogSpec"),
          s"timeout row must carry the wedged worker's frames: $msg")
      case Right(v) => fail(s"spin must not Right-complete: $v")
    }
    assert(sec < 30, s"the watchdog must return promptly, took ${sec}s")
    // the harness thread pool is NOT wedged: the next body still runs
    assert(Watchdog.run(spark, "next", 30)(1 + 1) == Right(2))
  }

  test("a Spark-job body is cancelled through the job group on timeout") {
    val r = Watchdog.run(spark, "bigjob", timeoutSec = 2) {
      // ~forever at local[4] without cancellation; cancelJobGroup +
      // interruptOnCancel must kill it inside the grace window
      spark.range(Long.MaxValue / 4).selectExpr("sum(id * id)").collect()
    }
    assert(r.isLeft, r)
    // whichever side won the race (cancel exception vs bare timeout),
    // the message is diagnostic, and the session stays healthy
    assert(spark.range(10).count() == 10L)
  }

  test("failures surface as Left with the exception, not a timeout") {
    val r = Watchdog.run(spark, "boom", 30) {
      throw new IllegalStateException("expected-boom")
    }
    assert(r == Left("IllegalStateException: expected-boom"), r)
  }

  test("Verify.run: a spinning query costs ONE missing row — the rest of the board lands (r19 regression)") {
    val out = Files.createTempDirectory("graft-wdog").toString
    // warm the parquet write machinery: a COLD first write can exceed
    // a tight watchdog bound and would flake the healthy queries
    spark.range(1).write.mode("overwrite").parquet(s"$out-warm")
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "wd_good1" -> ((s, _) => s.range(3).toDF("id")),
      "wd_spin" -> ((_, _) => { while (true) {}; null }),
      "wd_good2" -> ((s, _) => s.range(5).toDF("id")))
    val t0 = System.nanoTime()
    Verify.run(spark, sf, out, queries = queries,
      oracleSql = Map("wd_good1" -> "SELECT 1"), timeoutSec = 10)
    val sec = (System.nanoTime() - t0) / 1e9
    def landed(n: String) = new java.io.File(s"$out/$n").exists()
    assert(landed("wd_good1") && landed("wd_good2"),
      "healthy queries must land despite the wedged sibling")
    assert(!landed("wd_spin"),
      "the wedged query must yield a MISSING row, not a torn parquet")
    assert(new java.io.File(s"$out/oracle_sql.json").exists() &&
      new java.io.File(s"$out/spark_schemas.json").exists(),
      "the artifact must complete: oracle + schema dumps written")
    assert(sec < 120, s"one spinning query must cost ~timeoutSec, not " +
      s"the artifact window: ${sec}s")
  }

  test("a timed-out worker that submits its job LATE is still swept: group inherited pre-start, future jobs cancelled (r21)") {
    // the r20 ADVICE race: the job group used to be set INSIDE the
    // worker, so a body that had not yet reached setJobGroup (or that
    // submits only after the cancel) was never cancelled — the
    // abandoned daemon thread kept running full Spark jobs that
    // silently inflated every later Bench measurement. Now the group
    // rides the inheritable local properties from before start() and
    // the timeout path uses cancelJobGroupAndFutureJobs, so a job
    // submitted MINUTES after the deadline is rejected at submission.
    val computed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val r = Watchdog.run(spark, "late-submit", 1L) {
      try Thread.sleep(60000) catch { case _: InterruptedException => () }
      // buffer so the async cancel event is processed before the submit
      Thread.sleep(500)
      val n = spark.range(100).count() // the worker's FIRST job, post-deadline
      computed.set(true)
      n
    }
    r match {
      case Left(msg) => assert(msg.startsWith("timeout"),
        s"deadline kill must keep the timeout prefix: $msg")
      case Right(v) => fail(s"deadline-killed body must not Right-complete: $v")
    }
    Thread.sleep(1500) // let the abandoned worker run past its submit
    assert(!computed.get,
      "a post-deadline job computed — the future-jobs cancel failed")
  }
}
