package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Direct contract tests for [[FrameMemo]] — the session-scoped shared-
  * frame cache behind the tokenization/pair/revenue/events memos. The
  * operators test it indirectly (reuse plan-asserts in ScaleDesignSpec);
  * this spec pins the cache semantics themselves: build-once, listing-
  * fingerprint staleness, reset, per-key build mutual exclusion, and
  * per-dir entry isolation. */
class FrameMemoSpec extends graft.SparkTestBase {

  private def corpus(rows: Int): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_memo_").toString
    spark.range(rows).toDF("k").write.mode("overwrite").parquet(s"$d/t.parquet")
    d
  }

  test("builds once per (session, dir) and returns the same frame") {
    val builds = new java.util.concurrent.atomic.AtomicInteger
    val memo = new FrameMemo("t.parquet")((s, d) => {
      builds.incrementAndGet(); s.read.parquet(s"$d/t.parquet")
    })
    val dir = corpus(5)
    val a = memo(spark, dir)
    val b = memo(spark, dir)
    assert(builds.get() == 1, s"built ${builds.get()} times")
    assert(a.eq(b), "second apply returned a different frame instance")
    assert(a.count() == 5)
  }

  test("a changed table listing invalidates the entry (staleness fingerprint)") {
    val builds = new java.util.concurrent.atomic.AtomicInteger
    val memo = new FrameMemo("t.parquet")((s, d) => {
      builds.incrementAndGet(); s.read.parquet(s"$d/t.parquet")
    })
    val dir = corpus(5)
    assert(memo(spark, dir).count() == 5)
    // overwrite with different contents: part filenames change, so the
    // (name, length, mtime) fingerprint differs even within one tick
    spark.range(9).toDF("k").write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(memo(spark, dir).count() == 9, "stale frame served after rewrite")
    assert(builds.get() == 2, s"expected rebuild, built ${builds.get()} times")
  }

  test("reset drops the entry; next apply rebuilds") {
    val builds = new java.util.concurrent.atomic.AtomicInteger
    val memo = new FrameMemo("t.parquet")((s, d) => {
      builds.incrementAndGet(); s.read.parquet(s"$d/t.parquet")
    })
    val dir = corpus(3)
    memo(spark, dir).count()
    memo.reset(spark, dir)
    memo(spark, dir).count()
    assert(builds.get() == 2)
  }

  test("concurrent applies on one key build exactly once") {
    val builds = new java.util.concurrent.atomic.AtomicInteger
    val memo = new FrameMemo("t.parquet")((s, d) => {
      builds.incrementAndGet()
      Thread.sleep(200) // widen the window two racing builders would hit
      s.read.parquet(s"$d/t.parquet")
    })
    val dir = corpus(4)
    val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val threads = (1 to 4).map(_ => new Thread(() => {
      try assert(memo(spark, dir).count() == 4)
      catch { case t: Throwable => errs.compareAndSet(null, t) }
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.get() == null, s"racing apply failed: ${errs.get()}")
    assert(builds.get() == 1, s"per-key lock broken: ${builds.get()} builds")
  }

  test("distinct dirs get distinct entries") {
    val memo = new FrameMemo("t.parquet")((s, d) => s.read.parquet(s"$d/t.parquet"))
    val d1 = corpus(2)
    val d2 = corpus(7)
    assert(memo(spark, d1).count() == 2)
    assert(memo(spark, d2).count() == 7)
    assert(!memo(spark, d1).eq(memo(spark, d2)))
  }
}
