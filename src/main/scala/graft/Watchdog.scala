package graft

import org.apache.spark.sql.SparkSession

/** Per-query watchdog for the driver-contract mains ([[Verify]],
  * [[Bench]]): one wedged query must cost ONE `err` row, never the
  * whole artifact. Round 19 proved the failure mode — a single
  * driver-side infinite loop in a maintenance procedure wedged the
  * serial Verify main at its first CALL fixture, blanking all 220
  * correctness rows and timing out the bench with zero diagnostics.
  *
  * The body runs on a daemon worker thread inside its own Spark job
  * group; on timeout the group's jobs are cancelled
  * (`interruptOnCancel = true`) and the worker is interrupted. A body
  * spinning in DRIVER-side code (the r19 shape — no Spark job, no
  * interruptible wait) cannot be stopped from outside; the daemon
  * flag keeps the abandoned thread from pinning JVM exit, and the
  * caller moves on to the next query with an honest "timeout" row.
  */
object Watchdog {
  /** Default per-query bound. The slowest board query runs ~1.2s at
    * sf0.1 on the driver host — 120s is two orders of magnitude of
    * headroom, while still costing a wedged board at most
    * 120s × (few bad queries), not the whole round. */
  def defaultTimeoutSec: Long =
    sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "120").toLong

  def run[T](spark: SparkSession, name: String, timeoutSec: Long)
            (body: => T): Either[String, T] = {
    val result =
      new java.util.concurrent.atomic.AtomicReference[Either[String, T]](null)
    val group = s"watchdog-$name-${System.nanoTime()}"
    // The job group is pinned from the PARENT before start (local
    // properties are an InheritableThreadLocal, so the worker inherits
    // them at Thread construction): a worker that had not yet reached
    // its own setJobGroup when the deadline fired used to be
    // uncancellable — the abandoned thread kept submitting full Spark
    // jobs that competed with every later timed query (r20 ADVICE).
    // The worker's own setJobGroup with the same ids is kept for the
    // description field; the parent's copy is restored afterwards so a
    // caller-level group (if any) is not clobbered.
    val sc = spark.sparkContext
    val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
    val prevDesc = sc.getLocalProperty("spark.job.description")
    val prevInt = sc.getLocalProperty("spark.job.interruptOnCancel")
    sc.setLocalProperty("spark.jobGroup.id", group)
    sc.setLocalProperty("spark.job.description", name)
    sc.setLocalProperty("spark.job.interruptOnCancel", "true")
    val t = new Thread(() => {
      try {
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        result.compareAndSet(null, Right(body)): Unit
      } catch {
        case e: Throwable =>
          result.compareAndSet(null, Left(
            s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse(""))): Unit
      } finally spark.sparkContext.clearJobGroup()
    }, s"graft-$group")
    t.setDaemon(true)
    t.start()
    sc.setLocalProperty("spark.jobGroup.id", prevGroup)
    sc.setLocalProperty("spark.job.description", prevDesc)
    sc.setLocalProperty("spark.job.interruptOnCancel", prevInt)
    t.join(timeoutSec * 1000L)
    Option(result.get()).getOrElse {
      // ...AndFutureJobs: a worker that had not yet SUBMITTED its job
      // when the deadline fired used to dodge a plain cancelJobGroup
      // (which only sweeps currently-active jobs) and burn executor
      // slots under every later timed query. With the future-jobs
      // cancel, anything the abandoned thread submits in this group —
      // now or minutes later — is rejected at submission (r20 ADVICE).
      spark.sparkContext.cancelJobGroupAndFutureJobs(group)
      // POST-MORTEM before the interrupt disturbs it (r20 verdict #4):
      // capture where the worker is wedged, so the artifact's err row
      // diagnoses the next r19-style spin instead of just bounding it.
      // Top frames only — the row must stay one readable line.
      val stack = t.getStackTrace.take(6)
        .map(f => s"${f.getClassName}.${f.getMethodName}(${f.getLineNumber})")
        .mkString(" <- ")
      t.interrupt()
      // brief grace: a cancel-responsive body surfaces its own error
      // (SparkException: job cancelled) — fold it INTO the timeout
      // message rather than replacing it, so callers can always
      // recognize a deadline kill by the "timeout" prefix (Bench's
      // never-re-rep guard keys on it) while keeping the diagnostics.
      // A body that RIGHT-completes inside the grace genuinely
      // finished — return its result.
      t.join(2000L)
      Option(result.get()) match {
        case Some(r @ Right(_)) => r
        case Some(Left(err)) =>
          Left(s"timeout after ${timeoutSec}s (cancelled: $err)")
        case None =>
          Left(s"timeout after ${timeoutSec}s; wedged at: $stack")
      }
    }
  }
}
