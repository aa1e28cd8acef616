package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of a persisted derived frame, keyed by
  * (session, dir) — the sharing pattern the t4 pair stage introduced,
  * generalized so any shared stage (tokenized corpus, shingle sets,
  * the q15 revenue view) computes and caches ONCE per session+corpus
  * instead of stacking a fresh persist per invocation.
  *
  * Staleness/lifetime: entries carry a fingerprint of the `table`
  * parquet file listing under `dir` (name, length, mtime — driver-side
  * FS metadata only, no data read). If the data under `dir` changes
  * within a session the fingerprint differs, the stale entry is
  * unpersisted and the frame recomputed — no immutable-dir assumption.
  * Entries whose session has stopped are swept on the next lookup AND
  * by an application-end listener (registered the first time a session
  * touches the memo), so an idle memo can't pin a stopped session's
  * entries for the JVM lifetime.
  * Per-(session, dir) lock objects so two sessions (or two dirs) never
  * serialize each other's build — only concurrent callers on the SAME
  * entry coordinate. A stale entry is unpersisted while a racing
  * reader may still hold its DataFrame; Spark recomputes evicted
  * blocks, so that reader stays correct (slower), never wrong. */
private[ops] final class FrameMemo(table: String)(
    build: (SparkSession, String) => DataFrame) {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (String, DataFrame)]
  // lock entries are NEVER removed: sweeping them could strand a builder
  // that currently holds one while a later caller on the same key mints a
  // fresh lock and runs concurrently. The map is bounded by the number of
  // distinct (session, dir) pairs the JVM ever sees — a handful of bare
  // Objects — so leaving them to die with the map is the correct trade.
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Object]
  // sessions whose application-end listener is already registered; the
  // listener drops this memo's strong refs to the stopped session's
  // entries (their cached blocks died with the executors), so an idle
  // memo doesn't pin a stopped SparkSession for the JVM lifetime
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.SparkContext]

  /** Digest of the `table` listing under `d` — cheap driver-side FS
    * metadata only, no data read. */
  private def dirFingerprint(s: SparkSession, d: String): String = {
    val p = new org.apache.hadoop.fs.Path(d, table)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else fs.listStatus(p).sortBy(_.getPath.getName)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .mkString("|")
  }

  def apply(s: SparkSession, d: String): DataFrame = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    if (registered.add(s.sparkContext))
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
          // drop the registration set's own strong ref too — without
          // this the keySet pins every stopped SparkContext's object
          // graph for the JVM lifetime (ADVICE r8)
          registered.removeIf(_.isStopped)
        }
      })
    val key = (s, d)
    locks.computeIfAbsent(key, _ => new Object).synchronized {
      val fp = dirFingerprint(s, d)
      val cur = cache.get(key)
      if (cur != null && cur._1 == fp) cur._2
      else {
        if (cur != null) cur._2.unpersist(blocking = false)
        val fresh = build(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cache.put(key, (fp, fresh))
        fresh
      }
    }
  }

  /** Test hook: drop + unpersist the memoized entry for (s, d) so a
    * test can assert the rebuild path regardless of what ran before.
    * Needed because Spark's CacheManager dedups by logical plan — any
    * plan-identical DataFrame's unpersist() also deregisters the
    * shared entry's cached blocks. Takes the same per-key lock as the
    * builder — an unlocked remove() could interleave between a
    * concurrent builder's get() and put(). */
  def reset(s: SparkSession, d: String): Unit = {
    val key = (s, d)
    locks.computeIfAbsent(key, _ => new Object).synchronized {
      val cur = cache.remove(key)
      if (cur != null) cur._2.unpersist(blocking = false)
    }
  }
}
