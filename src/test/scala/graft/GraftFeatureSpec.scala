package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.sources.ManifestTable

/** Table protocol features (`require:reader` / `require:writer` —
  * the Delta table-features idea): the manifest declares which format
  * lanes an engine MUST understand to read / write a version without
  * corrupting it, derived from the version's own content at commit
  * time. FORWARD safety is the point: a manifest written by a
  * hypothetical future engine (forged here byte-for-byte) makes THIS
  * binary fail loudly at the parse choke point — for reads when the
  * reader set is unknown, for commits when only the writer set is —
  * instead of silently mangling a lane it cannot see. */
class GraftFeatureSpec extends SparkTestBase {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-feat").toString
    spark.conf.set("spark.sql.catalog.gfeat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gfeat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gfeat.lake")
    dir
  }
  private def fs = new Path(wh).getFileSystem(spark.sessionState.newHadoopConf())

  private def props(t: String): Map[String, String] =
    spark.sql(s"SELECT * FROM gfeat.lake.`$t$$properties`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("require: keys track the version's content exactly") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gfeat.lake.t")
    spark.sql("CREATE TABLE gfeat.lake.t (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k', 'retainGenerations'='50', " +
      "'dml.mode'='merge-on-read')")
    spark.sql("INSERT INTO gfeat.lake.t VALUES (1,'a'),(2,'b'),(3,'c')")
    // stats carry a #nulls lane -> writer-only feature; no masks, no
    // column mapping yet -> no reader requirements at all
    val p0 = props("t")
    assert(!p0.contains("require:reader"), p0.get("require:reader"))
    assert(p0.get("require:writer").contains("stats-nulls"), p0)
    // a mask raises `dv` (reader AND writer); a rename raises `colmap`
    spark.sql("DELETE FROM gfeat.lake.t WHERE k = 2")
    spark.sql("ALTER TABLE gfeat.lake.t RENAME COLUMN v TO w")
    val p1 = props("t")
    assert(p1.get("require:reader").contains("colmap,dv"), p1)
    assert(p1.get("require:writer").contains("colmap,dv,stats-nulls"), p1)
    // full compaction materializes the masks away -> `dv` drops in the
    // same commit; the mapping (and the nulls lane) remain
    val dir = s"$wh/lake/t"
    ManifestTable.compactAppend(spark, dir, Seq("k"), k = 1,
      retainGenerations = 50)
    val p2 = props("t")
    assert(p2.get("require:reader").contains("colmap"), p2)
    assert(p2.get("require:writer").contains("colmap,stats-nulls"), p2)
    assert(spark.table("gfeat.lake.t").count() == 2L)
  }

  /** Forge version base+1 the way a future engine would write it:
    * the head's body verbatim (schema, stats, paths), require tokens
    * swapped for ones this binary cannot know. */
  private def forge(dir: String, readerToks: String, writerToks: String): Unit = {
    val head = ManifestTable.headVersion(spark, dir).get
    val src = new Path(s"$dir/_manifests", f"m-$head%012d")
    val len = fs.getFileStatus(src).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(src)
    try in.readFully(buf) finally in.close()
    def metaLine(k: String, v: String) = Seq(
      "#meta\t" + java.net.URLEncoder.encode(k, "UTF-8") + "\t" +
        java.net.URLEncoder.encode(v, "UTF-8"))
    val kept = new String(buf, "UTF-8").split("\n").toSeq
      .filter(_.nonEmpty).filterNot(_.startsWith("#meta\trequire%3A"))
      .filterNot(_.startsWith("#crc\t")) // crc-less manifests are legal
    val body = ((if (readerToks.nonEmpty)
        metaLine("require:reader", readerToks) else Seq.empty) ++
      (if (writerToks.nonEmpty)
        metaLine("require:writer", writerToks) else Seq.empty) ++
      kept).mkString("", "\n", "\n")
    val out = fs.create(new Path(s"$dir/_manifests", f"m-${head + 1}%012d"))
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  test("an unknown reader feature refuses every read, loudly and by name") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gfeat.lake.r")
    spark.sql("CREATE TABLE gfeat.lake.r (k INT, v STRING)")
    spark.sql("INSERT INTO gfeat.lake.r VALUES (1,'a')")
    val dir = s"$wh/lake/r"
    forge(dir, readerToks = "time-crystal", writerToks = "time-crystal")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gfeat.lake.r").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("time-crystal") && msgs.contains("reader"), msgs)
    // and a commit over it refuses too (its base read fails first)
    intercept[Exception] {
      spark.sql("INSERT INTO gfeat.lake.r VALUES (2,'b')")
    }
  }

  test("a bit-rotted manifest refuses to serve, loudly naming the file") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gfeat.lake.c")
    spark.sql("CREATE TABLE gfeat.lake.c (k INT, v STRING)")
    spark.sql("INSERT INTO gfeat.lake.c VALUES (1,'a'),(2,'b')")
    val dir = s"$wh/lake/c"
    val head = ManifestTable.headVersion(spark, dir).get
    val mf = new Path(s"$dir/_manifests", f"m-$head%012d")
    val len = fs.getFileStatus(mf).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(mf); try in.readFully(buf) finally in.close()
    val text = new String(buf, "UTF-8")
    assert(text.startsWith("#crc\t"), "every commit records its crc")
    // flip one character inside the PATH line (the last content line)
    val pathLine = text.split("\n").filter(_.nonEmpty).last
    val flipped = pathLine.updated(pathLine.length / 2,
      if (pathLine(pathLine.length / 2) == 'x') 'y' else 'x')
    val out = fs.create(mf, true)
    try out.write(text.replace(pathLine, flipped).getBytes("UTF-8"))
    finally out.close()
    ManifestTable.invalidateSnapshots(dir) // same length can share an mtime granule
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gfeat.lake.c").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("corrupt") && msgs.contains(f"m-$head%012d"), msgs)
    // restoring the original bytes restores service
    val out2 = fs.create(mf, true)
    try out2.write(buf) finally out2.close()
    ManifestTable.invalidateSnapshots(dir)
    assert(spark.table("gfeat.lake.c").count() == 2L)
  }

  test("property: ANY single-byte manifest corruption refuses — never a silently-wrong read") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gfeat.lake.z")
    spark.sql("CREATE TABLE gfeat.lake.z (k INT, v STRING) " +
      "TBLPROPERTIES ('statsCols'='k')")
    spark.sql("INSERT INTO gfeat.lake.z VALUES (1,'a'),(2,'b'),(3,'c')")
    val dir = s"$wh/lake/z"
    val head = ManifestTable.headVersion(spark, dir).get
    val mf = new Path(s"$dir/_manifests", f"m-$head%012d")
    val len = fs.getFileStatus(mf).getLen.toInt
    val orig = new Array[Byte](len)
    val in = fs.open(mf); try in.readFully(orig) finally in.close()
    val rnd = new scala.util.Random(20260815L)
    (1 to 25).foreach { i =>
      val pos = rnd.nextInt(len)
      val mutated = orig.clone()
      var b = 0
      do b = rnd.nextInt(127 - 32) + 32 while (b.toByte == orig(pos))
      mutated(pos) = b.toByte
      val out = fs.create(mf, true)
      try out.write(mutated) finally out.close()
      ManifestTable.invalidateSnapshots(dir)
      // the crc covers every normalized line, so ANY content-bearing
      // flip refuses; a flip that only perturbs line whitespace still
      // changes the normalized sequence (manifests carry none to
      // begin with). The one unacceptable outcome is a clean read
      // with wrong content.
      val r = try Left(spark.table("gfeat.lake.z").collect()
          .map(x => (x.getInt(0), x.getString(1))).sortBy(_._1).toSeq)
        catch { case e: Exception => Right(e) }
      r match {
        case Left(rows) => assert(
          rows == Seq((1, "a"), (2, "b"), (3, "c")),
          s"trial $i pos $pos: corruption served WRONG rows: $rows")
        case Right(_) => () // refusal is the designed outcome
      }
    }
    val out = fs.create(mf, true)
    try out.write(orig) finally out.close()
    ManifestTable.invalidateSnapshots(dir)
    assert(spark.table("gfeat.lake.z").count() == 3L)
  }

  test("a corrupt RETAINED non-head manifest never bricks commits or gc") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gfeat.lake.g")
    spark.sql("CREATE TABLE gfeat.lake.g (k INT, v STRING) " +
      "TBLPROPERTIES ('retainGenerations'='10')")
    spark.sql("INSERT INTO gfeat.lake.g VALUES (1,'a')")
    spark.sql("INSERT INTO gfeat.lake.g VALUES (2,'b')")
    val dir = s"$wh/lake/g"
    val victim = ManifestTable.headVersion(spark, dir).get - 1
    val mf = new Path(s"$dir/_manifests", f"m-$victim%012d")
    val len = fs.getFileStatus(mf).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(mf); try in.readFully(buf) finally in.close()
    val text = new String(buf, "UTF-8")
    val line = text.split("\n").filter(_.nonEmpty).last
    val out = fs.create(mf, true)
    try out.write(text.replace(line,
      line.updated(line.length / 2,
        if (line(line.length / 2) == 'x') 'y' else 'x')).getBytes("UTF-8"))
    finally out.close()
    ManifestTable.invalidateSnapshots(dir)
    // the head still reads; time travel to the rotted version refuses
    assert(spark.table("gfeat.lake.g").count() == 2L)
    intercept[Exception] {
      ManifestTable.readVersion(spark, dir, victim).collect()
    }
    // commits and maintenance proceed — the refusal is treated like a
    // transient read failure by every conservative sweep guard: data
    // the rotted version references is HELD, never swept as
    // "references nothing", and the write path never throws AFTER its
    // publish landed
    spark.sql("INSERT INTO gfeat.lake.g VALUES (3,'c')")
    assert(spark.table("gfeat.lake.g").count() == 3L)
    ManifestTable.vacuum(spark, dir, retainGenerations = 10): Unit
    assert(spark.table("gfeat.lake.g").count() == 3L,
      "vacuum with a corrupt retained manifest must not sweep live data")
    // the dry run mirrors the hold: nothing reports would_sweep
    assert(ManifestTable.orphanReport(spark, dir, 10).forall(!_._4),
      ManifestTable.orphanReport(spark, dir, 10).toString)
  }

  test("an unknown writer-only feature keeps reads serving but refuses commits") {
    wh: Unit
    spark.sql("DROP TABLE IF EXISTS gfeat.lake.w")
    spark.sql("CREATE TABLE gfeat.lake.w (k INT, v STRING)")
    spark.sql("INSERT INTO gfeat.lake.w VALUES (1,'a'),(2,'b')")
    val dir = s"$wh/lake/w"
    forge(dir, readerToks = "", writerToks = "quantum-stats")
    // reads fine: the forged version's data is this binary's own dirs
    assert(spark.table("gfeat.lake.w").count() == 2L)
    // but every commit surface refuses to publish over it
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gfeat.lake.w VALUES (3,'c')")
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("quantum-stats") && msgs.contains("writer"), msgs)
    intercept[Exception] {
      ManifestTable.compactAppend(spark, dir, Seq("k"), k = 1)
    }
    // the refusal preserved the table: same rows, same head
    assert(spark.table("gfeat.lake.w").count() == 2L)
  }
}
