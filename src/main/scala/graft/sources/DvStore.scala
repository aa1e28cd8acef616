package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** S41 — deletion-vector position loading for the V2 scan.
  *
  * The DataFrame read surfaces apply masks as a distributed anti-join
  * (ManifestTable.readMasked); the V2 scan instead filters row
  * positions INSIDE its partition readers, which needs the positions
  * on the driver at plan time — the same move Delta makes (DV
  * descriptors load driver-side and ship with the scan). The dv files
  * are small by the feature's contract (deletion vectors serve
  * SELECTIVE deletes; bulk deletes take the copy-on-write path and
  * compaction materializes accumulated masks away), and the loader
  * enforces that contract with a hard cap rather than silently letting
  * a driver OOM happen at 100 TB.
  *
  * Read with parquet-hadoop's Group reader directly — plan-time code
  * must not launch a Spark job (nested execution inside planning). */
private[sources] object DvStore {

  /** Positions per data-file key, loaded from `dvDirs` (each a
    * `_dv/<name>/d=<i>` parquet dataset of (path, pos)). Keys and the
    * probe side are both normalized through `Path.toString`, so the
    * `file:///x` vs `file:/x` rendering difference between
    * `_metadata.file_path` and a listed `FileStatus` path can never
    * miss. Arrays come back SORTED for the readers' pointer walk. */
  def readPositions(conf: Configuration, dvDirs: Seq[Path],
                    cap: Long = graft.ScaleKnobs.DvDriverPositionCap)
      : Map[String, Array[Long]] = {
    val acc = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
    var total = 0L
    dvDirs.foreach { dir =>
      val fs = dir.getFileSystem(conf)
      val files = fs.listStatus(dir).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      files.foreach { st =>
        val reader = org.apache.parquet.hadoop.ParquetReader
          .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
            st.getPath)
          .withConf(conf).build()
        try {
          var g = reader.read()
          while (g != null) {
            total += 1
            if (total > cap)
              throw new IllegalStateException(
                s"deletion vectors exceed $cap positions for one scan — " +
                  "run CALL system.compact (or compactAppend) to " +
                  "materialize them into the data before reading this way")
            val key = new Path(g.getString("path", 0)).toString
            acc.getOrElseUpdate(key,
              scala.collection.mutable.ArrayBuffer.empty[Long]) +=
              g.getLong("pos", 0)
            g = reader.read()
          }
        } finally reader.close()
      }
    }
    acc.view.mapValues(_.toArray.sorted).toMap
  }

  /** Canonical match key for a planned file. */
  def keyOf(p: Path): String = p.toString
}
