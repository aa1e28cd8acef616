package graft
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Benchmark harness. Runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE compact JSON line as the final
  * stdout line (totals + failure list only). Per-query timings, repeat
  * variance, and warmup attribution go to a sidecar file
  * (bench_detail.json) so the stdout line stays short enough for tail
  * capture — rounds 1-3 proved a 105-key inline map gets truncated.
  */
object Bench {
  /** 1/5/15-min load averages as a JSON array, or [] if /proc is absent.
    * Recorded before/after warmup and after the timed run so a
    * contaminated bench (host CPU contention — the r8 artifact read
    * 272s while the same HEAD benched 55s exclusive) carries its own
    * evidence instead of silently reading as a code regression.
    */
  private def loadavg(): String =
    try {
      val parts = new String(Files.readAllBytes(Paths.get("/proc/loadavg")),
        StandardCharsets.UTF_8).trim.split("\\s+")
      parts.take(3).mkString("[", ",", "]")
    } catch { case _: Throwable => "[]" }

  /** (steal, total) CPU jiffies from /proc/stat's aggregate line, or
    * (-1, -1). Hypervisor STEAL is the contention channel loadavg is
    * blind to on a virtualized host: the r22 mid-round artifact read
    * 71.4s at loadavg 1.2 (gate 1.6, admitted) while the same HEAD
    * benched 52.9s clean — the inflation never appeared in any ld lane.
    * Sampled per rep so a steal-contended run self-diagnoses from the
    * artifact, exactly like the ld lanes do for run-queue contention. */
  private def cpuJiffies(): (Long, Long) =
    try {
      val cols = new String(Files.readAllBytes(Paths.get("/proc/stat")),
        StandardCharsets.UTF_8).linesIterator.next().trim
        .split("\\s+").drop(1).map(_.toLong)
      (cols(7), cols.take(8).sum)
    } catch { case _: Throwable => (-1L, -1L) }

  /** Count of live PIDs on the host (numeric /proc entries), or -1. A
    * jump between before/after flags concurrent processes during the run. */
  private def procCount(): Int =
    try {
      val fs = new java.io.File("/proc").listFiles()
      if (fs == null) -1 else fs.count(f => f.isDirectory && f.getName.forall(_.isDigit))
    } catch { case _: Throwable => -1 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_detail.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // session-TZ + nanos conf mirror Verify's builder: the bench must
      // read every corpus encoding the correctness gate reads
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // S38 engine default: bucketed scans report KeyGroupedPartitioning,
      // so co-bucketed joins plan storage-partitioned (order-independent
      // of which query runs first — this is a session-wide stance)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The only WindowExec warnings this board emits come from
    // INTENTIONAL bounded-frame global windows (t35 ranks its own
    // 20-row limit, t39 ranks the vocabulary, a14 partitions on
    // lit(1) over ~22 buckets — each justified at the call site).
    // Squelch that one logger so the driver's tail capture shows
    // query output, not repeated known-benign warnings.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    // Pre-run LOAD GATE (r11: the driver artifact read 74.6s at
    // loadavg 2.8 while the same HEAD benched 46.6s exclusive — 15×
    // noise on single queries): wait, bounded, for the 1-min loadavg
    // to drop below the gate before anything is timed, and record the
    // wait + the load actually obtained, so a still-contended run
    // carries its own evidence instead of reading as a code regression.
    // default gate SCALES with the host (r20 verdict item 6): the flat
    // 2.5 was sized for a small box and admitted a 32-cpu run whose
    // ambient load inflated the official number ~24% vs the clean-host
    // rerun at the same HEAD. 0.05/cpu (1.6 on 32 cpus, min 1.25 so a
    // 4-cpu host keeps a usable gate) holds the start of the timed run
    // to ≤5% ambient CPU; the bounded wait + per-rep ld lanes + the
    // adaptive re-rep (best-rep-started-above-gate) stay as before.
    val gate = sys.env.get("SPARK_GRAFT_LOAD_GATE").map(_.toDouble)
      .getOrElse(math.max(1.25, 0.05 * cpus.toInt))
    val gateWaitMax =
      sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE_WAIT_SEC", "240").toInt
    def load1: Double =
      try loadavg().stripPrefix("[").split(",")(0).toDouble
      catch { case _: Throwable => -1.0 }
    var gateWaited = 0
    while (load1 > gate && gateWaited < gateWaitMax) {
      Thread.sleep(5000); gateWaited += 5
    }
    // untimed warmup: JVM/codegen/shuffle machinery + parquet footers, so
    // the first timed query measures steady-state, not session startup.
    // Attributed in the detail file so warm-up drift is separable from
    // per-query regressions.
    val loadBefore = loadavg()
    val procsBefore = procCount()
    val (steal0, jiff0) = cpuJiffies()
    val bench0 = System.nanoTime()
    val warm0 = System.nanoTime()
    Watchdog.run(spark, "warmup", Watchdog.defaultTimeoutSec * 2) {
      graft.Tables.all.foreach(t => graft.Tables.load(spark, sfDir, t).count())
      spark.range(100000).selectExpr("id % 7 AS k", "id AS v")
        .groupBy("k").count().count()
    }: Unit
    val warmupSec = (System.nanoTime() - warm0) / 1e9
    // each query timed `reps` times; min is reported (the run least
    // polluted by disk/page-cache noise — r3 showed unchanged queries
    // drifting 2-4x on a single-shot bench). A failed query reports -1
    // (never its time-to-crash, which would read as a speedup) and is
    // excluded from the total + listed in "failed" so regressions are loud.
    val loadAfterWarm = loadavg()
    // each rep also records its wall-clock offset from bench start ("at"),
    // so rep-inconsistent inflation (the contention signature: q2 reps
    // [10.2, 26.3] in the r8 driver run) can be correlated with WHEN the
    // rep ran, not just that the two reps disagree.
    // A failed rep records the exception's first line alongside the -1:
    // the r9 driver artifact carried a bare -1 for x4 (corpus ts-encoding
    // drift, AnalysisException at analysis time) and diagnosing it needed
    // a full local re-run. The message makes the artifact self-explaining.
    // Per-rep LOAD SAMPLE ("ld" = 1-min loadavg at rep start): the r14
    // driver artifact lost 25% to a mid-run contention window that the
    // three-point before/warm/after capture could not localize (q12-q22
    // inflated, at≈50-140s). With load recorded per rep, a contaminated
    // window self-diagnoses from the artifact alone: inflated reps
    // whose ld spiked are host noise; inflated reps at idle load are a
    // real regression.
    val errs = scala.collection.mutable.Map.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // each rep runs under the per-query watchdog (r19: one wedged
      // query timed out the WHOLE bench at rc=124 with no JSON line;
      // now it costs one -1 row with err:"timeout ..." and moves on).
      // The 4th element is the rep's OWN deadline-kill flag — sniffing
      // the errs map would miss a timeout preceded by an ordinary
      // error (getOrElseUpdate keeps the first message only).
      // per-rep STEAL SAMPLE ("st" = fraction of host CPU stolen by the
      // hypervisor during the rep, 4dp, -1 if /proc/stat is absent):
      // the channel the ld lanes cannot see — see cpuJiffies.
      def rep(): (Double, Double, Double, Double, Boolean) = {
        val t0 = System.nanoTime()
        val at = (t0 - bench0) / 1e9
        val ld = load1
        val (st0, tot0) = cpuJiffies()
        val (sec, to) =
          Watchdog.run(spark, name, Watchdog.defaultTimeoutSec) {
            fn(spark, sfDir).count()
          } match {
            case Right(_) => ((System.nanoTime() - t0) / 1e9, false)
            case Left(msg) =>
              errs.getOrElseUpdate(name,
                msg.replaceAll("[\\\\\"\\p{Cntrl}]", " ").take(240))
              (-1.0, msg.startsWith("timeout"))
          }
        val (st1, tot1) = cpuJiffies()
        val st =
          if (st0 < 0 || st1 < 0 || tot1 <= tot0) -1.0
          else (st1 - st0).toDouble / (tot1 - tot0)
        (sec, at, ld, st, to)
      }
      // a TIMED-OUT query never re-reps: each retry would cost the
      // full watchdog bound again (and leave another abandoned daemon
      // thread if the spin is driver-side) for a number that can only
      // be -1 anyway. Ordinary exceptions still rep normally — they
      // fail fast and a flaky one deserves its second chance.
      val base = scala.collection.mutable.ArrayBuffer
        .empty[(Double, Double, Double, Double, Boolean)]
      var timedOut = false
      (1 to reps).foreach { _ =>
        if (!timedOut) {
          val r = rep()
          base += r
          if (r._5) timedOut = true
        }
      }
      // adaptive extra rep: when even the BEST rep started under load
      // above the gate — OR ran with >5% of host CPU stolen by the
      // hypervisor (r22: steal inflated a run 35% at loadavg 1.2,
      // invisible to every ld lane) — its number is contention-suspect:
      // one re-run keeps the artifact's reported minimum clean instead
      // of merely explained by the ld/st fields (all reps land in the
      // detail sidecar regardless). Never for a timed-out query — the
      // no-re-rep invariant above outranks the contention heuristic.
      val ok = base.filter(_._1 >= 0)
      val bestSuspect = ok.nonEmpty && {
        val b = ok.minBy(_._1); b._3 > gate || b._4 > 0.05
      }
      val times: Seq[(Double, Double, Double, Double, Boolean)] =
        if (!timedOut && bestSuspect) (base :+ rep()).toSeq
        else base.toSeq
      (name, times)
    }
    val loadAfter = loadavg()
    val procsAfter = procCount()
    def j(d: Double): String = if (d < 0) "-1" else f"$d%.4f"
    val detail = results.map { case (k, ts) =>
      val secs = ts.map(_._1)
      val best = if (secs.exists(_ >= 0)) secs.filter(_ >= 0).min else -1.0
      val err = errs.get(k).map(m => s""","err":"$m"""").getOrElse("")
      s"""    "$k": {"sec":${j(best)},"reps":[${secs.map(j).mkString(",")}],"at":[${ts.map(t => j(t._2)).mkString(",")}],"ld":[${ts.map(t => j(t._3)).mkString(",")}],"st":[${ts.map(t => j(t._4)).mkString(",")}]$err}"""
    }.mkString(",\n")
    val best = results.map { case (k, ts) =>
      val secs = ts.map(_._1)
      (k, if (secs.exists(_ >= 0)) secs.filter(_ >= 0).min else -1.0)
    }
    val failed = best.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = best.map(_._2).filter(_ >= 0).sum
    // whole-run hypervisor-steal fraction (see cpuJiffies) — the
    // contention channel the loadavg triple cannot see
    val (steal1, jiff1) = cpuJiffies()
    val stealRun =
      if (steal0 < 0 || steal1 < 0 || jiff1 <= jiff0) -1.0
      else (steal1 - steal0).toDouble / (jiff1 - jiff0)
    val env =
      s"""{"cpus":$cpus,"load_gate":$gate,"load_gate_waited_sec":$gateWaited,"loadavg_before":$loadBefore,"loadavg_after_warmup":$loadAfterWarm,"loadavg_after":$loadAfter,"steal_frac":${j(stealRun)},"procs_before":$procsBefore,"procs_after":$procsAfter}"""
    val detailJson =
      s"""{
         |  "sf": "$sfDir",
         |  "reps": $reps,
         |  "env": $env,
         |  "warmup_sec": ${j(warmupSec)},
         |  "total_sec": ${j(total)},
         |  "queries": {
         |$detail
         |  }
         |}
         |""".stripMargin
    try Files.write(Paths.get(detailPath), detailJson.getBytes(StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
    // final stdout line: compact on purpose — the driver's tail capture
    // must see the whole JSON. Per-query map lives in `detail`.
    // failure messages ride along (truncated) so the one tail-captured
    // line explains a -1 without the sidecar file; shape of "failed"
    // itself is unchanged for the driver's parser.
    val failedErrs =
      if (errs.isEmpty) ""
      else errs.toSeq.sortBy(_._1)
        .map { case (k, m) => s""""$k":"${m.take(120)}"""" }
        .mkString(""","failed_errs":{""", ",", "}")
    println(s"""{"metric":"total","value":${j(total)},"unit":"sec","n":${best.size},"failed":$failed$failedErrs,"warmup_sec":${j(warmupSec)},"reps":$reps,"env":$env,"detail":"$detailPath","sf":"$sfDir"}""")
  }
}
