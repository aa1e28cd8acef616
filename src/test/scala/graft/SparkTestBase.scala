package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One lazy SparkSession per suite; mirrors the Verify/Bench session
  * config (UTC, small shuffle partitions, AQE default-on). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
      // S38 engine default: bucketed scans report KeyGroupedPartitioning,
      // so co-bucketed joins plan storage-partitioned (order-independent
      // of which query runs first — this is a session-wide stance)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"

  /** Backdate a directory tree's mtimes (dir + every descendant) so a
    * planted orphan ages past the manifest GC's grace window — the GC
    * clocks orphan age from the NEWEST mtime in the tree, so aging only
    * the top dir leaves it looking in-flight. */
  def ageTree(fs: org.apache.hadoop.fs.FileSystem,
              path: org.apache.hadoop.fs.Path, ageMs: Long): Unit = {
    val old = System.currentTimeMillis() - ageMs
    def walk(p: org.apache.hadoop.fs.Path): Unit = {
      fs.listStatus(p).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        fs.setTimes(st.getPath, old, -1)
      }
      fs.setTimes(p, old, -1)
    }
    walk(path)
  }
}
