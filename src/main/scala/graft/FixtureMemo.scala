package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped one-shot fixture: run `build` exactly once per
  * (session, sfDir) and cache its result string (a catalog name or a
  * table dir). The board's demo fixtures share this shape — a CREATE
  * plus some DML whose outcome later queries aggregate — and the memo
  * makes re-invocation (Bench reps, Verify + spec in one session)
  * idempotent. Entries of stopped sessions are swept on lookup, so a
  * long-lived JVM running many sessions doesn't pin them.
  * `computeIfAbsent` guarantees the build runs once even under
  * concurrent first callers on the same key. */
private[graft] final class FixtureMemo(
    build: (SparkSession, String) => String) {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]

  def apply(s: SparkSession, d: String): String = {
    cache.keySet.removeIf(_._1.sparkContext.isStopped)
    cache.computeIfAbsent((s, d), { case (s0, d0) => build(s0, d0) })
  }
}
