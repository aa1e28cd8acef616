package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** S20 — the manifest table family exposed through Spark's standard
  * data-source surface, so a user reaches it with the SAME API as any
  * parquet/Delta path and from pure SQL:
  *
  *   spark.read.format("graft-manifest").load(dir)
  *   spark.read.format("graft-manifest").option("versionAsOf", 3).load(dir)
  *   df.write.format("graft-manifest").mode("append")
  *     .option("statsCols", "o_orderdate").save(dir)
  *   CREATE TABLE t USING `graft-manifest` OPTIONS (path '...');
  *   SELECT * FROM t WHERE o_orderdate BETWEEN ...
  *   spark.read.format("graft-manifest").option("readChangeFeed", true)
  *     .option("startingVersion", v).load(dir)   // row-level CDC feed
  *
  * Built on the stable V1 `sources` API (RelationProvider +
  * PrunedFilteredScan): Spark hands the relation the query's pushed
  * (requiredColumns, filters); supported comparison filters are folded
  * into per-column bounds and routed through [[ManifestTable.rangeScan]]
  * — so manifest-stats DIR pruning happens before any parquet footer is
  * opened, and the surviving dirs are read by the normal vectorized
  * parquet scan with the residual filter + column pruning pushed into
  * it. ALL filters are declared unhandled, so Spark re-applies the
  * exact predicates above the scan: stats pruning stays a pure I/O
  * optimization, never a correctness dependency (rangeScan's contract;
  * strict `>` pruned as `>=` is therefore safe, as is folding `IN` to
  * its [min,max] envelope).
  *
  * Snapshot isolation: the relation resolves the head version ONCE at
  * creation, so one query — or a long-lived SQL table registration —
  * reads one consistent version throughout, Delta-style (option
  * `versionAsOf` = explicit time travel through the same seam).
  *
  * Scale note (the honest V1 trade): rows cross a Row boundary at the
  * relation edge (RowDataSourceScanExec), costing one conversion vs a
  * native FileSourceScanExec — the price of the stable public API. The
  * native path ([[ManifestTable.read]]/[[ManifestTable.rangeScan]])
  * remains the hot path; this source is the INTEROP surface (BI tools,
  * SQL-only users, catalogs). A DSv2 TableProvider with its own
  * PartitionReaderFactory could close the gap at ~5x the code against
  * semi-internal parquet reader APIs.
  */
class GraftManifestSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with StreamSourceProvider {

  override def shortName(): String = "graft-manifest"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-manifest needs a path: .load(dir) or OPTIONS (path '...')"))

  /** X14 — `spark.readStream.format("graft-manifest")
    * .option("readChangeFeed", true).load(dir)`: the row-level CDC
    * feed as a STREAM. Served through Spark's V1 `Source` API
    * deliberately — each micro-batch is a signed-aggregation DIFF (a
    * plan with a shuffle), which the V2 `MicroBatchStream` partition
    * contract cannot express; Delta's streaming source rides the same
    * seam for the same reason. Append tailing (dirs only, columnar)
    * stays on the V2 X13 source (`format("graft")`). */
  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    require(parameters.get("readChangeFeed").exists(_.toBoolean),
      "graft-manifest streams the CHANGE FEED (option readChangeFeed=" +
        "true); to tail appends columnar use spark.readStream" +
        ".format(\"graft\") — the X13 source")
    (shortName(),
      GraftMetaTables.changesSchemaOf(ctx.sparkSession, pathOf(parameters)))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    require(parameters.get("readChangeFeed").exists(_.toBoolean),
      "graft-manifest streams the CHANGE FEED (option readChangeFeed=true)")
    val dir = pathOf(parameters)
    val spark = ctx.sparkSession
    // default floor = the head at stream START: only NEW commits
    // stream (Delta CDF streaming's default); startingVersion=v makes
    // the first batch INCLUDE v's changes
    val floor = parameters.get("startingVersion").map { s =>
      val v = s.toLong
      // validated HERE, not at the first batch: an invalid option
      // used to start the stream and then die with a misleading
      // "version -1 no longer retained ... size retention" error
      // pointing the user at the wrong knob (r20 review find)
      require(v >= 1,
        s"startingVersion must be >= 1 (versions number from 1), got $v")
      v - 1
    }
      .orElse(ManifestTable.headVersion(spark, dir))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed manifest at $dir"))
    new GraftCdcSource(spark, dir, floor,
      parameters.get("maxVersionsPerTrigger").map(_.toLong))
  }

  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val dir = pathOf(parameters)
    def head: Option[Long] = ManifestTable.headVersion(ctx.sparkSession, dir)
    if (parameters.get("readChangeFeed").exists(_.toBoolean)) {
      // Delta-CDF-shaped option set: row-level changes between two
      // retained versions, change_type ∈ insert/delete
      val from = parameters.getOrElse("startingVersion",
        throw new IllegalArgumentException(
          "readChangeFeed needs startingVersion")).toLong
      val to = parameters.get("endingVersion").map(_.toLong).orElse(head)
        .getOrElse(throw new IllegalArgumentException(
          s"no committed manifest at $dir"))
      GraftChangesRelation(ctx, dir, from, to)
    } else {
      val v = parameters.get("versionAsOf")
        .map(ManifestTable.resolveVersionArg(ctx.sparkSession, dir, _))
        .orElse(head)
        .getOrElse(throw new IllegalArgumentException(
          s"no committed manifest at $dir"))
      // table-level write options (CREATE TABLE ... OPTIONS) ride on
      // the relation so SQL INSERT INTO honors them
      val statsCols = parameters.get("statsCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
      val retain = parameters.get("retainGenerations").map(_.toInt).getOrElse(2)
      GraftManifestRelation(ctx, dir, v, statsCols, retain)
    }
  }

  /** Write side: append lands through [[ManifestTable.append]] (one
    * immutable commit dir + optional `statsCols` skipping stats observed
    * in the write job); Overwrite commits a manifest listing ONLY the
    * new dir — prior dirs stay on disk for time travel until GC'd, the
    * Delta overwrite semantic. ErrorIfExists/Ignore key off whether the
    * table has any committed version. */
  override def createRelation(ctx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data0: DataFrame): BaseRelation = {
    val dir = pathOf(parameters)
    val statsCols = parameters.get("statsCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    // a CDF consumer needs the versions it will diff to SURVIVE GC —
    // retention is a write-side option, like Delta's retention knobs
    val retain = parameters.get("retainGenerations").map(_.toInt).getOrElse(2)
    val exists = ManifestTable.headVersion(ctx.sparkSession, dir).isDefined
    // S47 — idempotent batch writes on the V1 alias too: same option
    // pair, same check-then-write replay gate as the V2 builder
    val txn = GraftManifestSource.txnOf(parameters.get)
    val txnMeta = GraftManifestSource.txnMetaOf(txn)
    if (GraftManifestSource.txnApplied(ctx.sparkSession, dir, txn))
      return createRelation(ctx, parameters)
    // declared data contracts bind inside the routed write (S30) —
    // each route binds exactly once and guards its own commit
    val data = data0
    mode match {
      case SaveMode.Append =>
        GraftManifestSource.appendRespectingSpec(data, dir, statsCols, retain,
          extraMeta = txnMeta)
      case SaveMode.Overwrite =>
        GraftManifestSource.overwrite(data, dir, statsCols, retain,
          extraMeta = txnMeta)
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graft-manifest table already committed at $dir (mode=ErrorIfExists)")
      case SaveMode.ErrorIfExists =>
        ManifestTable.append(data, dir, statsCols, retain, meta = txnMeta): Unit
      case SaveMode.Ignore =>
        if (!exists) ManifestTable.append(data, dir, statsCols, retain,
          meta = txnMeta): Unit
    }
    // a catalog table over this path must not keep serving the
    // pre-write pinned snapshot (see GraftManifestRelation.insert)
    ctx.sparkSession.sessionState.catalog.invalidateAllCachedTables()
    createRelation(ctx, parameters)
  }
}

object GraftManifestSource {

  /** CHECK constraints (S30, SQL semantics: NULL passes, only a FALSE
    * evaluation violates) enforced IN the write job — a per-row
    * `raise_error` guard inside a filter, so the batch fails before
    * any manifest commit with the constraint's name and the offending
    * row, and no second validation pass over the data is ever run
    * (Delta's invariant-check shape). */
  private[graft] def applyChecks(data0: DataFrame,
                                   checks: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, concat, expr, lit, not, raise_error, struct, to_json, when}
    checks.foldLeft(data0) { case (df, (name, sql)) =>
      df.filter(
        when(not(coalesce(expr(sql), lit(true))),
          raise_error(concat(
            lit(s"CHECK constraint '$name' violated ($sql) by row: "),
            to_json(struct(df.columns.toIndexedSeq.map(col): _*)))))
          .otherwise(lit(true)))
    }
  }

  /** Append honoring the table's DECLARED cluster spec (S27): when one
    * is set, the batch lands clustered on arrival whatever API carried
    * it — a V1-alias writer must not quietly degrade the layout a
    * catalog table declared. No spec = the plain single-dir append. */
  /** S47 — parse the per-write idempotence options (Delta's
    * txnAppId/txnVersion pair): both-or-neither, numeric version,
    * appId manifest-line-safe. Shared by the V2 write builder and the
    * V1 alias so both surfaces validate identically. */
  private[graft] def txnOf(opt: String => Option[String])
      : Option[(String, Long)] = {
    val app = opt("txnAppId").map(_.trim).filter(_.nonEmpty)
    val ver = opt("txnVersion")
    require(app.isDefined == ver.isDefined,
      "txnAppId and txnVersion come as a pair: both identify one " +
        "idempotent write (Delta's foreachBatch contract) — got " +
        s"txnAppId=${app.orNull}, txnVersion=${ver.orNull}")
    for (a <- app; v <- ver) yield {
      require(!a.exists(c => c == '\t' || c == '\n' || c == '\r'),
        s"txnAppId must not contain tab/newline characters: '$a'")
      (a, v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"txnVersion must be an integer watermark, got '$v'")))
    }
  }

  /** The recorded `txn:<appId>` watermark at the current head is
    * at-or-past this write's version — the batch already committed
    * (crash between commit and the caller's ack). Check-then-write,
    * same single-writer-per-appId contract [[graft.streaming.Streams
    * .appendBatch]] documents: batches of one appId never run
    * concurrently, so the only re-entry is the crashed writer's own
    * replay, which this check absorbs without extra atomicity. */
  private[graft] def txnApplied(spark: org.apache.spark.sql.SparkSession,
                                dir: String,
                                txn: Option[(String, Long)]): Boolean =
    txn.exists { case (appId, ver) =>
      ManifestTable.headVersion(spark, dir).exists { h =>
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        ManifestTable.metaOf(fs, dir, h).get(s"txn:$appId")
          .flatMap(_.toLongOption).exists(_ >= ver)
      }
    }

  private[graft] def txnMetaOf(txn: Option[(String, Long)])
      : Map[String, String] =
    txn.map { case (a, v) => s"txn:$a" -> v.toString }.toMap

  private[graft] def appendRespectingSpec(data0: DataFrame, dir: String,
                                            statsCols: Seq[String],
                                            retain: Int,
                                            extraMeta: Map[String, String] =
                                              Map.empty): Unit = {
    val spark = data0.sparkSession
    // a bucketed (S31) table's append IS an upsert by key — the V1
    // alias must not degrade the layout any more than it may degrade a
    // declared cluster spec. Declared CHECKs bind HERE only on the
    // kernel route (append/appendClustered bind internally — binding
    // twice would judge every row twice); the bound keys feed the
    // kernel's per-attempt ALTER-vs-write guard.
    if (MergeInto.bucketedGeometry(spark, dir).isDefined) {
      require(extraMeta.isEmpty,
        s"txnAppId/txnVersion are not supported on bucketed merge tables ($dir)")
      val (data, boundChecks) = bindDeclaredChecks(data0, dir)
      val fsg = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      MergeInto.merge(data, dir, validateHead = m =>
        ManifestTable.checkConflictGuard(fsg, dir, m, boundChecks,
          Seq.empty)): Unit
      return
    }
    val data = data0
    val spec = ManifestTable.headVersion(spark, dir).flatMap { v =>
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      ManifestTable.clusterSpecOf(fs, dir, v)
    }
    spec match {
      case Some(cols) => ManifestTable.appendClustered(data, dir,
        (statsCols ++ cols).distinct, retainGenerations = retain,
        meta = extraMeta): Unit
      case None =>
        ManifestTable.append(data, dir, statsCols, retain,
          meta = extraMeta): Unit
    }
  }

  /** The table's PERSISTED constraints (`prop:check.<name>` in `#meta`,
    * the catalog's declared data contracts) applied to `data` — the V1
    * write paths run this so an older-API writer cannot sidestep a
    * contract the catalog declared. */
  private[graft] def withDeclaredChecks(data: DataFrame,
                                          dir: String): DataFrame =
    bindDeclaredChecks(data, dir)._1

  /** [[withDeclaredChecks]] plus the full PROP KEYS it bound, read at
    * THIS moment — [[ManifestTable]]'s commit loops compare the head's
    * declared keys against this set at publish time and refuse when a
    * constraint appeared after the write job was built (the
    * ALTER-vs-write metadata race; Delta fails the same interleave
    * with MetadataChangedException). */
  /** `exemptWhen`: rows matching this predicate are NOT judged by the
    * declared constraints — the delta-changeset path uses it for
    * delete records, whose null-filled data columns would otherwise
    * spuriously fail a non-null-propagating check (`v IS NOT NULL`)
    * on every DELETE. */
  private[graft] def bindDeclaredChecks(data: DataFrame, dir: String,
                                        exemptWhen: Option[String] = None,
                                        recomputeGenerated: Boolean = false,
                                        headHint: Option[Long] = None)
      : (DataFrame, Set[String]) = {
    val spark = data.sparkSession
    // headHint threads the caller's one planning-path head resolution
    // (r20) — absent, resolve here
    headHint.orElse(ManifestTable.headVersion(spark, dir)) match {
      case None => (data, Set.empty)
      case Some(v) =>
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val prefix = GraftCatalog.PropPrefix + "check."
        val meta = ManifestTable.metaOf(fs, dir, v)
        val bound = meta.collect {
          case (k, sql) if k.startsWith(prefix) => k -> sql
        }
        val checks = bound.toSeq.sortBy(_._1)
          .map { case (k, sql) => k.stripPrefix(prefix) ->
            exemptWhen.map(e => s"($e) OR ($sql)").getOrElse(sql) }
        (applyChecks(refuseNullIdentity(
          applyGenerated(data, dir, v, meta, exemptWhen, recomputeGenerated),
          dir, v, meta, exemptWhen, dmlPath = recomputeGenerated),
          checks), bound.keySet)
    }
  }

  /** S51 — DML write-backs do not MINT identity values (only the
    * append surfaces hold a watermark claim the commit can verify), so
    * a NULL arriving in an identity column there is a MERGE-inserted
    * row that would land id-less: refuse loudly with the route named.
    * Non-DML callers pass through — the append path mints before this
    * point never fires. Delete records (exemptWhen) are not data. */
  private[graft] def refuseNullIdentity(data: DataFrame, dir: String, v: Long,
                                        meta: Map[String, String],
                                        exemptWhen: Option[String],
                                        dmlPath: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit, raise_error, when}
    if (!dmlPath) return data
    val specs = ManifestTable.identitySpecs(meta)
    if (specs.isEmpty) return data
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(data.sparkSession.sessionState.newHadoopConf())
    val physToLogical = ManifestTable.colMapOf(fs, dir, v).map(_.swap)
    specs.keys.toSeq.sorted.foldLeft(data) { (df, phys) =>
      val logical = physToLogical.getOrElse(phys, phys)
      if (!df.columns.contains(logical)) df
      else {
        val exempt = exemptWhen.map(expr).getOrElse(lit(false))
        df.filter(when(!exempt && col(logical).isNull,
          raise_error(lit(
            s"identity column '$logical' arrived NULL on a DML " +
              "write-back — MERGE-inserted rows into identity tables " +
              "get no minted ids on this path; route inserts through " +
              "INSERT/append (which mints against the watermark)")))
          .otherwise(lit(true)))
      }
    }
  }

  /** S50 — GENERATED ALWAYS AS enforcement at the same choke point the
    * CHECK constraints bind (every write API passes here): a NULL in a
    * generated column FILLS with the expression (the by-name INSERT
    * that omitted it arrives null-filled from Spark's resolution — the
    * fill is the feature), a provided non-null value must null-safe-
    * equal it (a mismatch raises with the row, Delta's contract).
    * `exemptWhen` rows (delta delete records) pass through untouched —
    * their null-filled data columns are not data. */
  private[graft] def applyGenerated(data: DataFrame, dir: String, v: Long,
                                    meta: Map[String, String],
                                    exemptWhen: Option[String],
                                    recompute: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, expr, lit, not, raise_error, struct, to_json, when}
    val gens = meta.collect {
      case (k, sql) if k.startsWith(ManifestTable.GenColPrefix) =>
        k.stripPrefix(ManifestTable.GenColPrefix) -> sql
    }
    if (gens.isEmpty) return data
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(data.sparkSession.sessionState.newHadoopConf())
    val cmap = ManifestTable.colMapOf(fs, dir, v)
    val physToLogical = cmap.map(_.swap)
    val declared = ManifestTable.declaredSchemaOf(data.sparkSession, dir, v)
    gens.toSeq.sortBy(_._1).foldLeft(data) { case (df, (phys, sql)) =>
      val logical = physToLogical.getOrElse(phys, phys)
      if (!df.columns.contains(logical)) df // delta changesets carry ids only
      else {
        val dt = declared.flatMap(_.fields.find(_.name == logical))
          .map(_.dataType)
        val computed = dt.map(expr(sql).cast(_)).getOrElse(expr(sql))
        val exempt = exemptWhen.map(expr).getOrElse(lit(false))
        if (recompute)
          // DML write-backs: an UPDATE of a SOURCE column refreshes
          // the generated value (Delta's semantics); an assignment to
          // the generated column itself is overridden by the
          // recomputation — the invariant wins, never the assignment
          df.withColumn(logical,
            when(exempt, col(logical)).otherwise(computed))
        else {
          val gated = df.filter(
            when(not(exempt) && col(logical).isNotNull &&
                not(col(logical) <=> computed),
              raise_error(concat(
                lit(s"generated column '$logical' = ($sql) violated by row: "),
                to_json(struct(df.columns.toIndexedSeq.map(col): _*)))))
              .otherwise(lit(true)))
          gated.withColumn(logical,
            when(exempt || col(logical).isNotNull, col(logical))
              .otherwise(computed))
        }
      }
    }
  }

  /** Overwrite = append the batch as a fresh commit dir, then commit a
    * manifest listing ONLY that dir (its stats carried over). Built
    * from the same primitives as restore: history moves forward, old
    * dirs remain referenced by retained versions for time travel.
    * Concurrency is LAST-WRITER-WINS by design: an append racing the
    * second commit is superseded (its rows are not in the overwritten
    * table) — the semantics of replacing the whole table; Delta makes
    * the same call by failing the concurrent writer instead. */
  private[graft] def overwrite(data0: DataFrame, dir: String,
                               statsCols: Seq[String],
                               retainGenerations: Int = 2,
                               extraMeta: Map[String, String] = Map.empty,
                               specOverride: Option[Seq[String]] = None)
      : Unit = {
    val spark = data0.sparkSession
    // bucketed (S31) table: overwrite = ONE atomic swap commit keeping
    // the b=N layout invariant every later merge's bucket parse relies
    // on — never a truncate a reader could observe mid-overwrite.
    // Declared CHECKs bind here only on this kernel route (the
    // append-shaped path below binds internally).
    if (MergeInto.bucketedGeometry(spark, dir).isDefined) {
      require(extraMeta.isEmpty,
        s"txnAppId/txnVersion are not supported on bucketed merge tables ($dir)")
      val (data, boundChecks) = bindDeclaredChecks(data0, dir)
      val fsg = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      MergeInto.overwriteBucketed(data, dir, validateHead = m =>
        ManifestTable.checkConflictGuard(fsg, dir, m, boundChecks,
          Seq.empty)): Unit
      return
    }
    val data = data0
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // append tells us exactly which commit dirs it created — the second
    // commit lists precisely those. (Deriving "fresh" by diffing head
    // against the largest retained version below v is wrong under
    // retainGenerations=1: the append's GC deletes that version first,
    // the diff returns ALL head paths, and overwrite silently degrades
    // to append — keeping rows it must replace.) A table with a
    // DECLARED cluster spec overwrites CLUSTERED (≤k range/Morton dirs
    // with per-dir stats, the append paths' contract) — a single-dir
    // overwrite would silently discard the clustered-on-arrival layout
    // until the next compaction (r19 review find).
    // an explicit clusterBy write OPTION governs THIS overwrite's
    // layout too, not just the spec it declares afterwards — data
    // landing by the old (or no) spec under a freshly-declared one
    // left the table claiming a layout its own overwrite did not
    // apply (r20 review find)
    val spec = specOverride.orElse(ManifestTable.headVersion(spark, dir)
      .flatMap(v => ManifestTable.clusterSpecOf(fs, dir, v)))
    val (v, cids) = spec match {
      case Some(cols) => // clusterSpecOf never yields an empty spec
        ManifestTable.appendClusteredWithCids(data, dir,
          (statsCols ++ cols).distinct, retainGenerations = retainGenerations,
          specOverride = Some(cols))
      case _ =>
        val (v0, cid) = ManifestTable.appendWithCid(data, dir, statsCols,
          retainGenerations)
        (v0, Seq(cid))
    }
    val stats = ManifestTable.statsOf(fs, dir, v)
    val cidSet = cids.toSet
    ManifestTable.commit(spark, dir, cids, retainGenerations,
      schemaDdl = Some(ManifestTable.cleanDdl(data.schema)),
      stats = stats.view.filterKeys(cidSet).toMap,
      // replacing the data does not reset writer txn watermarks; an
      // S47 idempotent overwrite records ITS watermark here — on the
      // FINAL commit only, so a crash between the two commits replays
      // the whole overwrite (same end state) instead of being skipped
      // with only the intermediate append visible
      meta = ManifestTable.metaOf(fs, dir, v) ++ extraMeta): Unit
  }

  /** Fold Spark's pushed filters into per-column [lo, hi] bounds in
    * [[ManifestTable.rangeScan]]'s string encoding (Spark cast-to-string
    * rendering: dates `yyyy-MM-dd`, timestamps with the fractional part
    * trimmed — NOT java.sql.Timestamp.toString, whose mandatory ".0"
    * sorts AFTER the stats' trimmed rendering and would mis-prune an
    * exact-boundary match). Conservative by construction: strict
    * bounds widen to inclusive, IN folds to its envelope, OR and
    * unsupported filters contribute nothing.
    *
    * `zone` must be the SESSION's `spark.sql.session.timeZone`: the
    * manifest stats were rendered by cast-to-string in the writing
    * session's zone, so pushed timestamp literals must render in the
    * same zone or an exact-boundary dir mis-prunes. (The relation
    * passes its session's zone; pinning UTC here would only agree
    * with the stats because build.sbt pins the session to UTC — a
    * user overriding the session TZ would silently drop rows.) */
  private[graft] def boundsOf(filters: Seq[Filter],
                              zone: java.time.ZoneId): Map[String, (String, String)] = {
    val lo = scala.collection.mutable.Map.empty[String, String]
    val hi = scala.collection.mutable.Map.empty[String, String]
    def tighten(m: scala.collection.mutable.Map[String, String], c: String,
                v: String, keepGreater: Boolean): Unit = {
      val cur = m.get(c)
      val next = cur match {
        case Some(x) => if ((v > x) == keepGreater) v else x
        case None => v
      }
      m(c) = next
    }
    def num(v: Any): Boolean = v.isInstanceOf[java.lang.Number]
    def safeBD(s: String): Option[BigDecimal] =
      try Some(BigDecimal(s)) catch { case _: NumberFormatException => None }
    // numeric bound-tightening must compare numerically; everything else
    // in the supported set (string/date/timestamp renderings) orders
    // lexicographically in its domain. NaN/Infinity render but don't
    // parse as BigDecimal → contribute no bound (conservative).
    def tightenTyped(m: scala.collection.mutable.Map[String, String], c: String,
                     v: Any, keepGreater: Boolean): Unit = render(v, zone).foreach { r =>
      if (num(v)) {
        (safeBD(r), m.get(c).flatMap(safeBD)) match {
          case (Some(rb), Some(xb)) =>
            if ((rb.compare(xb) > 0) == keepGreater) m(c) = r
          case (Some(_), None) => m(c) = r
          case (None, _) => ()
        }
      } else tighten(m, c, r, keepGreater)
    }
    def walk(f: Filter): Unit = f match {
      case EqualTo(c, v) => tightenTyped(lo, c, v, keepGreater = true)
        tightenTyped(hi, c, v, keepGreater = false)
      case EqualNullSafe(c, v) if v != null =>
        tightenTyped(lo, c, v, keepGreater = true)
        tightenTyped(hi, c, v, keepGreater = false)
      case GreaterThan(c, v) => tightenTyped(lo, c, v, keepGreater = true)
      case GreaterThanOrEqual(c, v) => tightenTyped(lo, c, v, keepGreater = true)
      case LessThan(c, v) => tightenTyped(hi, c, v, keepGreater = false)
      case LessThanOrEqual(c, v) => tightenTyped(hi, c, v, keepGreater = false)
      case In(c, vs) if vs.nonEmpty && vs.forall(_ != null) =>
        // envelope: the dir must overlap [min(vs), max(vs)]. Numeric
        // members must ALL parse (NaN/Infinity render but don't) —
        // a lexicographic fallback there would sort '-Infinity' below
        // digits and pick a too-small max, mis-pruning dirs; skip the
        // envelope instead (conservative: no bound, no pruning).
        val rendered = vs.toSeq.map(v => (v, render(v, zone)))
        if (rendered.forall(_._2.isDefined)) {
          val rs = rendered.map { case (v, r) => (v, r.get) }
          val allNum = vs.forall(num)
          val parseable = rs.forall(p => safeBD(p._2).isDefined)
          if (allNum && parseable) {
            val ordered = rs.sortBy(p => BigDecimal(p._2))
            tightenTyped(lo, c, ordered.head._1, keepGreater = true)
            tightenTyped(hi, c, ordered.last._1, keepGreater = false)
          } else if (!allNum) {
            val ordered = rs.sortBy(_._2)
            tightenTyped(lo, c, ordered.head._1, keepGreater = true)
            tightenTyped(hi, c, ordered.last._1, keepGreater = false)
          }
        }
      case And(a, b) => walk(a); walk(b)
      case _ => () // Or / IsNull / StringContains / ... : no bound
    }
    filters.foreach(walk)
    // a column contributes only when BOTH ends are bounded: rangeScan's
    // residual predicate is a closed interval
    lo.keySet.intersect(hi.keySet).map(c => c -> (lo(c), hi(c))).toMap
  }

  /** Render a pushed literal in the manifest-stats string encoding.
    * None = unsupported type → the filter contributes no bound.
    * Timestamp instants render at `zone` — the zone the stats writer's
    * cast-to-string used ([[ManifestTable.statsZoneOf]]: the pinned
    * writer zone, falling back to the session's — NOT the JVM default,
    * and not hardcoded UTC: either mismatch silently mis-prunes dirs).
    * Instants render ONLY under a fixed-offset zone: in a DST zone the
    * local-string order diverges from instant order inside fall-back
    * overlaps, so lexicographic pruning against the stats strings would
    * be unsound — those bounds are declined (conservative: no pruning
    * on that column, full correctness via the re-applied filter). */
  private[graft] def render(v: Any, zone: java.time.ZoneId): Option[String] = {
    def fixed = zone.getRules.isFixedOffset
    v match {
      case null => None
      case d: java.sql.Date => Some(d.toString)
      case d: java.time.LocalDate => Some(d.toString)
      case t: java.sql.Timestamp if fixed => Some(renderTs(
        java.time.LocalDateTime.ofInstant(t.toInstant, zone)))
      case i: java.time.Instant if fixed => Some(renderTs(
        java.time.LocalDateTime.ofInstant(i, zone)))
      case l: java.time.LocalDateTime => Some(renderTs(l)) // TIMESTAMP_NTZ literal
      case n: java.lang.Number => Some(n.toString)
      case s: String => Some(s)
      case _ => None
    }
  }

  /** Spark cast-style timestamp rendering: seconds, then the micro
    * fraction with trailing zeros trimmed, absent when zero. */
  private def renderTs(ldt: java.time.LocalDateTime): String = {
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
      f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    val micros = ldt.getNano / 1000
    if (micros == 0) base
    else base + "." + f"$micros%06d".reverse.dropWhile(_ == '0').reverse
  }
}

/** The row-level change feed between two retained versions, behind the
  * same source (`option("readChangeFeed", true)
  * .option("startingVersion", v)[.option("endingVersion", w)]`) — the
  * Delta CDF consumption shape. A plain TableScan: CDC feeds are
  * consumed whole by replication/audit consumers, so there is nothing
  * for filter pushdown to win here; the diff itself already reads ONLY
  * the commit dirs that differ between the versions
  * ([[ManifestTable.changes]], inputFiles-asserted in MergeIntoSpec). */
case class GraftChangesRelation(ctx: SQLContext, tableDir: String,
                                fromV: Long, toV: Long)
    extends BaseRelation with TableScan {
  private lazy val feed: DataFrame =
    ManifestTable.changes(ctx.sparkSession, tableDir, fromV, toV)
  override def sqlContext: SQLContext = ctx
  override def schema: StructType = feed.schema
  override def buildScan(): RDD[Row] = feed.rdd
}

/** One pinned version of a manifest table behind the V1 relation API. */
case class GraftManifestRelation(ctx: SQLContext, tableDir: String,
                                 version: Long,
                                 statsCols: Seq[String] = Seq.empty,
                                 retainGenerations: Int = 2)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  /** SQL INSERT INTO / INSERT OVERWRITE on a `CREATE TABLE USING
    * graft-manifest` table. The table's declared OPTIONS (statsCols,
    * retainGenerations) apply to every INSERT — the DDL, not each
    * statement, owns the table's stats policy, same as Delta table
    * properties. The pinned `version` is a READ snapshot only; writes
    * always land on the current head (append rebases via commitIf). */
  override def insert(data0: DataFrame, overwrite: Boolean): Unit = {
    // declared data contracts bind inside the routed write (S30) —
    // each route binds exactly once and guards its own commit
    if (overwrite)
      GraftManifestSource.overwrite(data0, tableDir, statsCols,
        retainGenerations)
    else
      GraftManifestSource.appendRespectingSpec(data0, tableDir, statsCols,
        retainGenerations)
    // Spark's FindDataSourceTable caches the resolved relation per
    // catalog table; THIS relation pins a version, so without
    // invalidation the next SELECT would keep serving the pre-insert
    // snapshot. (External writers from another session still need
    // REFRESH TABLE, same as parquet tables.)
    ctx.sparkSession.sessionState.catalog.invalidateAllCachedTables()
  }

  private def spark: SparkSession = ctx.sparkSession

  override def sqlContext: SQLContext = ctx

  // metadata-only when the manifest declares a schema — relation
  // creation (and SQL planning against it) must not open data files
  override val schema: StructType =
    ManifestTable.declaredSchemaOf(spark, tableDir, version).getOrElse(
      ManifestTable.readVersion(spark, tableDir, version).schema)

  /** Actual on-disk size of the pinned version's commit dirs. Without
    * this a V1 relation reports spark.sql.defaultSizeInBytes (Long.Max
    * scale), so a small manifest dim joined through the SQL surface
    * would NEVER be auto-broadcast — the one optimizer decision that
    * matters most for star joins. One file-listing pass at first use
    * (lazy), no data I/O; a missing dir contributes 0 (it may be
    * legitimately pruned at scan time). */
  override lazy val sizeInBytes: Long = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    ManifestTable.pathsOf(fs, tableDir, version).map { p =>
      try fs.getContentSummary(
        new org.apache.hadoop.fs.Path(tableDir, p)).getLength
      catch { case _: java.io.IOException => 0L }
    }.sum
  }

  /** Everything is re-applied by Spark above the scan — pruning below
    * is I/O-only (see class doc). */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    // render pushed literals in the zone the stats were WRITTEN in
    // (pinned by the first ts-stats writer), not this session's
    val zone = ManifestTable.statsZoneOf(spark,
      new org.apache.hadoop.fs.Path(tableDir)
        .getFileSystem(spark.sessionState.newHadoopConf()),
      tableDir, version)
    val bounds = GraftManifestSource.boundsOf(filters.toSeq, zone)
      .filter { case (c, _) => schema.fieldNames.contains(c) }
    val base =
      if (bounds.isEmpty) ManifestTable.readVersion(spark, tableDir, version)
      else ManifestTable.rangeScan(spark, tableDir, bounds, Some(version))
    val projected =
      if (requiredColumns.isEmpty) base.select()
      else base.select(requiredColumns.toIndexedSeq.map(
        org.apache.spark.sql.functions.col): _*)
    projected.rdd
  }
}

/** X14 — the manifest table's CDC feed as a Structured Streaming
  * SOURCE. Offsets are manifest VERSIONS (the same log positions X13
  * uses); each micro-batch is the union of per-adjacent-version diff
  * feeds in `(start, end]`, tagged `_commit_version` — an update
  * arrives as delete(old image) + insert(new image), and a pure
  * compaction contributes an EMPTY diff (old and new dirs cancel in
  * the multiset), so maintenance never floods the consumer the way
  * X13's `ignoreChanges` re-emission does.
  *
  * Exactly-once: versions in the checkpoint; re-planned batches diff
  * the same immutable manifests. A restart whose checkpointed version
  * is no longer RETAINED fails loudly naming the retention knobs — the
  * diff needs the old manifest as its base (size `retainGenerations` /
  * `minRetainMs` to the longest restart gap, the X13 rule).
  *
  * Scale: each batch costs only the dirs that CHANGED in its version
  * steps; the steady-state tail is O(changes), never O(table). */
private[sources] class GraftCdcSource(spark: SparkSession, dir: String,
                                      floor: Long,
                                      maxVersions: Option[Long] = None)
    extends org.apache.spark.sql.execution.streaming.Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}
  import org.apache.spark.sql.execution.streaming.Offset
  import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}

  private def fs = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  override val schema: StructType =
    GraftMetaTables.changesSchemaOf(spark, dir)

  private def versionOf(o: org.apache.spark.sql.connector.read.streaming.Offset)
      : Long = o match {
    case LongOffset(v) => v
    case so: SerializedOffset => so.json.toLong
    case other => other.json.toLong // every offset here is a version
  }

  // ---- admission control (X14): `maxVersionsPerTrigger` caps each
  // micro-batch to n version-diff steps, so a long-stopped consumer
  // drains its backlog in bounded batches instead of one giant union
  // of every missed diff. Implemented on the engine's own
  // SupportsAdmissionControl seam (the FileStreamSource shape): the
  // engine hands this source its true position as `startOffset`, so
  // pacing needs no side state and survives restarts by construction.
  // ReadMaxRows carries the cap (the unit is version STEPS — the
  // feed's atomic batch unit — not rows; the engine treats the limit
  // as opaque and hands it back).

  override def getDefaultReadLimit: ReadLimit =
    maxVersions.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** Trigger.AvailableNow (SupportsTriggerAvailableNow): pin the head
    * at query start; the engine then loops bounded batches up to it. */
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = ManifestTable.headVersion(spark, dir)

  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: ReadLimit): org.apache.spark.sql.connector.read.streaming.Offset = {
    val s = Option(startOffset).map(versionOf).getOrElse(floor)
    val head0 = ManifestTable.headVersion(spark, dir).getOrElse(s)
    val head = availableNowCap.fold(head0)(math.min(head0, _))
    val capped = limit match {
      case r: ReadMaxRows => math.min(head, s + r.maxRows())
      case _ => head
    }
    LongOffset(math.max(s, capped))
  }

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    ManifestTable.headVersion(spark, dir).map(LongOffset(_)).orNull

  // legacy (non-admission) path — the head, unconditionally: `floor`
  // must only bound a FRESH stream's first batch (getBatch's
  // start=None case) — a source is RE-created on restart with a new
  // floor, and filtering here would suppress batches the checkpointed
  // offset is entitled to
  override def getOffset: Option[Offset] =
    ManifestTable.headVersion(spark, dir).map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lo = start.map(versionOf).getOrElse(floor)
    val hi = versionOf(end)
    // the diff for version lo+1 needs version lo's manifest as its
    // base. The only legitimate base OUTSIDE the retained set is the
    // EMPTY pre-table (lo=0) — and only while version 1 itself is
    // still retained (version numbers are dense, so a retained head
    // above 1 means real history was GC'd and its changes are
    // unrecoverable, not empty).
    val vs = ManifestTable.versions(fs, dir)
    require(lo >= hi || vs.contains(lo) || (lo == 0L && vs.headOption.contains(1L)),
      s"stream offset version $lo is no longer retained at $dir — size " +
        "retainGenerations/minRetainMs to cover the longest restart gap, " +
        "or restart from a fresh checkpoint")
    val feed = GraftMetaTables.changesFeedRange(spark, dir, lo, hi)
    // the engine asserts isStreaming on the returned plan; the diff
    // stays LAZY — toRdd builds the DAG, rows compute when the
    // micro-batch runs (see StreamingShim for the seam rationale)
    org.apache.spark.sql.graft.StreamingShim.streamingDataFrame(
      spark, feed.queryExecution.toRdd, feed.schema)
  }

  override def stop(): Unit = ()
}
