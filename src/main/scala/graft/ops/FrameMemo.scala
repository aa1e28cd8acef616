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
  * Entries whose session has stopped are swept on the next lookup so
  * cached blocks aren't pinned past the owning session's lifetime.
  * Per-(session, dir) lock objects so two sessions (or two dirs) never
  * serialize each other's build — only concurrent callers on the SAME
  * entry coordinate. A stale entry is unpersisted while a racing
  * reader may still hold its DataFrame; Spark recomputes evicted
  * blocks, so that reader stays correct (slower), never wrong. */
private[ops] final class FrameMemo(table: String)(
    build: (SparkSession, String) => DataFrame) {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (String, DataFrame)]
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Object]

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
    locks.keySet.removeIf(k => k._1.sparkContext.isStopped)
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
