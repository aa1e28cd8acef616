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
    t.join(timeoutSec * 1000L)
    Option(result.get()).getOrElse {
      spark.sparkContext.cancelJobGroup(group)
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
        case None => Left(s"timeout after ${timeoutSec}s")
      }
    }
  }
}
