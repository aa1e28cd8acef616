package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo => CEqualTo, Expression, GreaterThan => CGreaterThan, GreaterThanOrEqual => CGreaterThanOrEqual, In => CIn, LessThan => CLessThan, LessThanOrEqual => CLessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, In, LessThanOrEqual}
import org.apache.spark.sql.types.StructField

import graft.sources.{GraftManifestSource, GraftTable, ManifestTable, MergeInto}

/** S25 — SQL `UPDATE` on manifest tables, registered through
  * [[graft.GraftExtensions]] (`spark.sql.extensions=graft.GraftExtensions`,
  * the public plugin seam Delta/Iceberg register their DML through): a
  * post-hoc resolution rule rewrites a resolved
  * `UPDATE <graft table> SET ... [WHERE ...]` — a statement the V2
  * API alone cannot serve without the full row-level-operation write
  * protocol — into an eagerly-executed command over
  * [[ManifestTable.updateWhere]]'s dir-granular copy-on-write kernel.
  * Non-graft tables pass through untouched, so the rule composes with
  * any other catalog in the session.
  *
  * Resolved `UpdateTable` over a [[GraftTable]] → [[GraftUpdateCommand]].
  * Assignment targets must be top-level columns; values and the
  * condition are carried as SQL text (`Expression.sql`) and re-resolved
  * BY NAME against the freshly-read table inside the kernel — resolved
  * `exprId`s from the statement's own relation instance cannot bind to
  * a re-read DataFrame, so a name round-trip is the correct transport,
  * not a shortcut. */
object GraftUpdateRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(table, assignments, condition) if u.resolved =>
      table.collectFirst {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
          r.table.asInstanceOf[GraftTable]
      } match {
        case Some(t) =>
          // resolved attributes render with their catalog qualifier
          // (`cat`.`ns`.`t`.`c`), which cannot resolve against the
          // re-read table — strip qualifiers before rendering
          def unqualifiedSql(e: Expression): String = e.transform {
            case a: AttributeReference => a.withQualifier(Seq.empty)
          }.sql
          val assigns = assignments.map {
            case Assignment(a: AttributeReference, v) =>
              a.name -> unqualifiedSql(v)
            case Assignment(k, _) => throw new UnsupportedOperationException(
              s"graft UPDATE assigns top-level columns only, got ${k.sql}")
          }
          GraftUpdateCommand(t, assigns, condition.map(unqualifiedSql),
            condition.map(GraftUpdateRule.boundsFiltersOf).getOrElse(Seq.empty))
        case None => u
      }
    case p => p
  }

  /** Conservative catalyst→V1-`Filter` translation FOR DIR PRUNING ONLY
    * (the exact predicate travels as SQL): comparisons between a plain
    * column and a literal, `IN` literal lists, and conjunctions.
    * Anything else contributes no filter — no bound, no pruning, full
    * correctness through the re-applied condition. */
  private[plans] def boundsFiltersOf(e: Expression): Seq[Filter] = {
    def scala(l: Literal): Any =
      CatalystTypeConverters.convertToScala(l.value, l.dataType)
    e match {
      case CAnd(l, r) => boundsFiltersOf(l) ++ boundsFiltersOf(r)
      case CEqualTo(a: AttributeReference, l: Literal) =>
        Seq(EqualTo(a.name, scala(l)))
      case CEqualTo(l: Literal, a: AttributeReference) =>
        Seq(EqualTo(a.name, scala(l)))
      case CGreaterThan(a: AttributeReference, l: Literal) =>
        Seq(GreaterThanOrEqual(a.name, scala(l))) // widen: envelope only
      case CGreaterThan(l: Literal, a: AttributeReference) =>
        Seq(LessThanOrEqual(a.name, scala(l)))
      case CGreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        Seq(GreaterThanOrEqual(a.name, scala(l)))
      case CGreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        Seq(LessThanOrEqual(a.name, scala(l)))
      case CLessThan(a: AttributeReference, l: Literal) =>
        Seq(LessThanOrEqual(a.name, scala(l)))
      case CLessThan(l: Literal, a: AttributeReference) =>
        Seq(GreaterThanOrEqual(a.name, scala(l)))
      case CLessThanOrEqual(a: AttributeReference, l: Literal) =>
        Seq(LessThanOrEqual(a.name, scala(l)))
      case CLessThanOrEqual(l: Literal, a: AttributeReference) =>
        Seq(GreaterThanOrEqual(a.name, scala(l)))
      case CIn(a: AttributeReference, vs) if vs.nonEmpty &&
          vs.forall(_.isInstanceOf[Literal]) =>
        Seq(In(a.name, vs.map(v => scala(v.asInstanceOf[Literal])).toArray))
      case _ => Seq.empty
    }
  }
}

/** Eagerly-executed SQL UPDATE on a manifest table. `assignments` are
  * `(column, value-SQL)`; `condSql` None = update every row. The
  * pruning bounds render in the table's PINNED stats zone like every
  * other pruning surface. Runs against the CURRENT head under
  * optimistic concurrency — an UPDATE is a write, and writes rebase. */
case class GraftUpdateCommand(table: GraftTable,
                              assignments: Seq[(String, String)],
                              condSql: Option[String],
                              condFilters: Seq[Filter])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = table.tableDir
    val retain = table.tableProps.get("retainGenerations")
      .flatMap(_.toIntOption).getOrElse(2)
    val cond = condSql.map(expr).getOrElse(lit(true))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // an uncommitted table dir is an ERROR, like the MERGE path — a
    // silent no-op would hide a mistyped path/table (r11 ADVICE)
    val head = ManifestTable.headVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed graft table at $dir"))
    MergeInto.bucketedGeometry(spark, dir) match {
      case Some((key, _)) =>
        // S31 bucketed layout: a CoW rewrite dir would break the b=N
        // invariant — the updated rows become a merge source instead
        // (replace-by-key; one pushed-filter scan, O(touched buckets)
        // rewrite). Assigning the key itself would CHANGE a row's
        // identity under replace semantics (old row would survive), so
        // it is refused.
        import org.apache.spark.sql.functions.col
        require(!assignments.exists(_._1 == key),
          s"UPDATE on a bucketed table cannot assign the bucket key " +
            s"'$key' — changing a row's identity is a MERGE (or DELETE " +
            "+ INSERT)")
        val byCol = assignments.toMap
        val t = ManifestTable.read(spark, dir)
        val updated = t.filter(cond).select(
          t.schema.fields.toIndexedSeq.map { f =>
            byCol.get(f.name).map(v => expr(v).cast(f.dataType).as(f.name))
              .getOrElse(col(f.name))
          }: _*)
        MergeInto.merge(
          GraftManifestSource.withDeclaredChecks(updated, dir), dir): Unit
      case None =>
        val zone = ManifestTable.statsZoneOf(spark, fs, dir, head)
        ManifestTable.updateWhere(spark, dir, cond,
          assignments.map { case (c, v) => c -> expr(v) },
          GraftManifestSource.boundsOf(condFilters, zone), retain): Unit
    }
    Seq.empty
  }
}

/** SQL `DELETE` through the extension seam — the third member of the
  * DML trio, now serving ANY deterministic row-level condition, not
  * just the V1-Filter-translatable shapes `SupportsDelete` can carry
  * (`length(v) > 10`, arithmetic, UDF calls — all previously refused).
  * A resolved `DeleteFromTable` over a [[GraftTable]] becomes an eager
  * command on the same kernels the V2 path uses: truncate for
  * unconditional deletes, the merge kernel for bucketed (S31) tables,
  * and the dir-granular CoW rewrite otherwise — with pruning bounds
  * extracted from whatever translatable conjuncts the condition has
  * ([[GraftUpdateRule.boundsFiltersOf]]), so a mixed condition still
  * skips provably-unaffected dirs.
  *
  * Why not Spark's native `SupportsRowLevelOperations`: in Spark 4.1
  * the `RewriteDeleteFromTable`/`RewriteUpdateTable`/
  * `RewriteMergeIntoTable` rules live in the analyzer's MAIN
  * resolution batch (catalyst.analysis), ahead of every injectable
  * rule seam — a table that implements the interface gets ALL THREE
  * statements rewritten to group-based `ReplaceData` plans before any
  * extension rule can route them, which would (a) replace the
  * dir-pruned CoW kernels with full-table rewrites (no runtime group
  * filtering without a `_file`-style metadata column), and (b) commit
  * non-bucket dirs into S31 bucketed tables, corrupting the layout.
  * Adopting it faithfully means reimplementing dir pruning as runtime
  * group filtering plus a delta-based write for bucketed layouts —
  * tracked as future work; the extension seam keeps the layered
  * kernels in charge today.
  *
  * Subquery conditions are refused loudly (their SQL cannot re-resolve
  * through the by-name transport); everything else re-resolves against
  * the freshly-read table like UPDATE's transport does. */
object GraftDeleteRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
  import org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(table, condition) if d.resolved =>
      table.collectFirst {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
          r.table.asInstanceOf[GraftTable]
      } match {
        case Some(t) =>
          if (SubqueryExpression.hasSubquery(condition))
            throw new UnsupportedOperationException(
              "graft DELETE does not support subqueries in WHERE — " +
                "materialize the keys and use MERGE ... WHEN MATCHED THEN DELETE")
          def unqualifiedSql(e: Expression): String = e.transform {
            case a: AttributeReference => a.withQualifier(Seq.empty)
          }.sql
          val isTrue = condition == org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral
          GraftDeleteCommand(t,
            if (isTrue) None else Some(unqualifiedSql(condition)),
            GraftUpdateRule.boundsFiltersOf(condition))
        case None => d
      }
    case p => p
  }
}

/** Eagerly-executed SQL DELETE on a manifest table; `condSql` None =
  * delete everything (truncate — metadata only). */
case class GraftDeleteCommand(table: GraftTable,
                              condSql: Option[String],
                              condFilters: Seq[Filter])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.lit
    val dir = table.tableDir
    val retain = table.tableProps.get("retainGenerations")
      .flatMap(_.toIntOption).getOrElse(2)
    val head = ManifestTable.headVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed graft table at $dir"))
    condSql match {
      case None =>
        ManifestTable.truncateLive(spark, dir, retain): Unit
      case Some(sql) =>
        val cond = expr(sql)
        if (MergeInto.bucketedGeometry(spark, dir).isDefined)
          // bucketed (S31): matching rows become a delete-flagged merge
          // source — the layout invariant survives, cost O(touched)
          MergeInto.merge(ManifestTable.read(spark, dir).filter(cond),
            dir, deleteWhen = lit(true)): Unit
        else {
          val fs = new org.apache.hadoop.fs.Path(dir)
            .getFileSystem(spark.sessionState.newHadoopConf())
          val zone = ManifestTable.statsZoneOf(spark, fs, dir, head)
          ManifestTable.deleteWhere(spark, dir, cond,
            GraftManifestSource.boundsOf(condFilters, zone), retain): Unit
        }
    }
    Seq.empty
  }
}

/** Shared DML helpers. */
private[plans] object GraftDml {
  /** The aliases every rendered MERGE expression is qualified with —
    * chosen to be collision-proof against user column names. */
  val TargetAlias = "__graft_t"
  val SourceAlias = "__graft_s"
  val TIdCol = "__graft_t_id"
  val SMarkCol = "__graft_s_m"

  /** A captured analyzed `LogicalPlan` as a DataFrame through PUBLIC
    * surfaces only: execute the plan and convert `InternalRow`s at the
    * partition level (the converter is built inside the closure so only
    * the schema ships). One extra internal→external→internal row trip
    * for the MERGE source — the side that is small by design; the
    * target never pays it. */
  def dataFrameOf(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    val qe = spark.sessionState.executePlan(plan)
    val schema = qe.analyzed.schema
    val rows = qe.toRdd.mapPartitions { it =>
      val conv = CatalystTypeConverters.createToScalaConverter(schema)
      it.map(ir => conv(ir).asInstanceOf[Row])
    }
    spark.createDataFrame(rows, schema)
  }
}

/** S26 — SQL `MERGE INTO` on manifest tables, through the same
  * extension seam as S25: a resolved `MergeIntoTable` whose target is a
  * [[GraftTable]] becomes an eager command on the shared copy-on-write
  * kernel. Semantics follow the SQL standard: first-match-wins across
  * WHEN clauses, matched rows may UPDATE or DELETE, `NOT MATCHED`
  * source rows may INSERT, `NOT MATCHED BY SOURCE` target rows may
  * UPDATE or DELETE, and a target row matched by more than one source
  * row fails loudly (the Delta/SQL cardinality rule).
  *
  * Scale shape: the target's touched dirs are pruned by the SOURCE's
  * key envelope — one small agg over the source computes min/max of
  * every equi-join column, and any target dir whose stats lie outside
  * carries over untouched (Delta's touched-file pruning, at commit-dir
  * granularity). The pruning disables itself when a `NOT MATCHED BY
  * SOURCE` clause exists (every target row must then be judged). The
  * rewrite itself is ONE full-outer join evaluated in a single pass —
  * per-row action dispatch compiles to nested CASE WHEN columns, so no
  * per-clause scan of the join output. */
object GraftMergeRule extends Rule[LogicalPlan] {
  import GraftDml.{SourceAlias, TargetAlias}

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.resolved =>
      m.targetTable.collectFirst {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
          r.table.asInstanceOf[GraftTable]
      } match {
        case Some(t) => command(m, t)
        case None => m
      }
    case p => p
  }

  private def command(m: MergeIntoTable, t: GraftTable): GraftMergeCommand = {
    if (m.withSchemaEvolution) throw new UnsupportedOperationException(
      "graft MERGE does not support WITH SCHEMA EVOLUTION — " +
        "MergeInto.applyBatch carries the schema-evolution path")
    val tAttrs = m.targetTable.outputSet
    val sAttrs = m.sourceTable.outputSet
    // side-aware rendering: every attribute re-qualifies to the alias
    // its side will carry in the rewrite join, so names that exist on
    // BOTH sides (the common case — same key column) stay unambiguous
    def render(e: Expression): String = e.transform {
      case a: AttributeReference if tAttrs.contains(a) =>
        a.withQualifier(Seq(TargetAlias))
      case a: AttributeReference if sAttrs.contains(a) =>
        a.withQualifier(Seq(SourceAlias))
    }.sql
    def renderAssigns(assigns: Seq[Assignment]): Seq[(String, String)] =
      assigns.map {
        case Assignment(a: AttributeReference, v) => a.name -> render(v)
        case Assignment(k, _) => throw new UnsupportedOperationException(
          s"graft MERGE assigns top-level columns only, got ${k.sql}")
      }
    def updateOrDelete(actions: Seq[MergeAction], where: String)
        : Seq[(Option[String], Option[Seq[(String, String)]])] =
      actions.map {
        case UpdateAction(c, as, _) => (c.map(render), Some(renderAssigns(as)))
        case DeleteAction(c) => (c.map(render), None)
        case a => throw new UnsupportedOperationException(
          s"graft MERGE: ${a.getClass.getSimpleName} is not supported $where")
      }
    val inserts = m.notMatchedActions.map {
      case InsertAction(c, as) => (c.map(render), renderAssigns(as))
      case a => throw new UnsupportedOperationException(
        s"graft MERGE: ${a.getClass.getSimpleName} is not supported " +
          "in WHEN NOT MATCHED")
    }
    // target-col -> source-col equi pairs of the ON condition, looking
    // THROUGH implicit casts (a VALUES source's INT key renders as
    // `t.k = CAST(s.k AS BIGINT)`): the source's min/max on these
    // drive target-dir pruning — safe through a cast, the envelope
    // only widens
    def stripCast(e: Expression): Expression = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast => stripCast(c.child)
      case o => o
    }
    def equiPairs(e: Expression): Seq[(String, String)] = e match {
      case CAnd(l, r) => equiPairs(l) ++ equiPairs(r)
      case CEqualTo(l, r) => (stripCast(l), stripCast(r)) match {
        case (a: AttributeReference, b: AttributeReference)
            if tAttrs.contains(a) && sAttrs.contains(b) => Seq(a.name -> b.name)
        case (a: AttributeReference, b: AttributeReference)
            if sAttrs.contains(a) && tAttrs.contains(b) => Seq(b.name -> a.name)
        case _ => Seq.empty
      }
      case _ => Seq.empty
    }
    // whether ON is EXACTLY one column equality (no extra conjuncts):
    // the shape the bucketed routing requires — an extra conjunct
    // changes which pairs count as "matched" and would let an insert
    // clause fire for a key the table already holds. A cast is allowed
    // on the SOURCE side only (a widening VALUES-literal cast is
    // injective); a cast on the TARGET side means the source key type
    // is WIDER than the table key, and the insert path would narrow —
    // not routable.
    val pureEquality = m.mergeCondition match {
      case CEqualTo(l, r) =>
        ((l, stripCast(r)), (stripCast(l), r)) match {
          case ((a: AttributeReference, b: AttributeReference), _)
              if tAttrs.contains(a) && sAttrs.contains(b) => true
          case (_, (b: AttributeReference, a: AttributeReference))
              if sAttrs.contains(b) && tAttrs.contains(a) => true
          case _ => false
        }
      case _ => false
    }
    GraftMergeCommand(t, m.sourceTable, render(m.mergeCondition),
      updateOrDelete(m.matchedActions, "in WHEN MATCHED"), inserts,
      updateOrDelete(m.notMatchedBySourceActions,
        "in WHEN NOT MATCHED BY SOURCE"),
      equiPairs(m.mergeCondition), pureEquality)
  }
}

/** Eagerly-executed SQL MERGE. Clause lists carry `(condition-SQL,
  * assignments)` with `None` assignments meaning DELETE; everything
  * re-resolves by name under the `__graft_t`/`__graft_s` aliases. */
case class GraftMergeCommand(
    table: GraftTable,
    @transient sourcePlan: LogicalPlan,
    condSql: String,
    matched: Seq[(Option[String], Option[Seq[(String, String)]])],
    inserts: Seq[(Option[String], Seq[(String, String)])],
    bySource: Seq[(Option[String], Option[Seq[(String, String)]])],
    equiPairs: Seq[(String, String)],
    onPureKeyEquality: Boolean = false)
    extends LeafRunnableCommand {
  import GraftDml.{SMarkCol, SourceAlias, TIdCol, TargetAlias}

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, max, min}
    val dir = table.tableDir
    val retain = table.tableProps.get("retainGenerations")
      .flatMap(_.toIntOption).getOrElse(2)
    // Materialize the captured source ONCE before anything reads it:
    // the pruning-bounds aggregate, the cardinality/rewrite join(s) and
    // the semi/anti branch would each re-execute the plan otherwise,
    // and a non-deterministic source (rand(), uuid(), a view over
    // concurrently-changing data) could produce a key envelope or
    // match verdict inconsistent with the rows the rewrite actually
    // joins — silently mispruning a target dir that holds a matching
    // row. localCheckpoint truncates lineage and pins the computed
    // rows (Delta materializes merge sources the same way); the source
    // is the small side by design, so this is O(changeset).
    val sdf = GraftDml.dataFrameOf(spark, sourcePlan).localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head = ManifestTable.headVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed graft table at $dir"))
    MergeInto.bucketedGeometry(spark, dir) match {
      case Some((key, n)) =>
        // S31: the CoW rewrite below would publish a non-bucket dir and
        // break the layout every later merge's bucket parse relies on —
        // a bucketed table's MERGE must route through the kernel, and
        // shapes the kernel cannot express are refused loudly rather
        // than silently served the slow-and-corrupting way.
        require(bySource.isEmpty,
          "MERGE on a bucketed table does not support WHEN NOT MATCHED " +
            "BY SOURCE — it must judge every target row; use an " +
            "append-layout table for full-scan merges")
        require(onPureKeyEquality && equiPairs.map(_._1) == Seq(key),
          s"MERGE on a bucketed table requires ON to be exactly " +
            s"t.$key = s.<col> (the declared bucket key); got '$condSql'")
        runBucketed(spark, dir, key, equiPairs.head._2, n, sdf)
        return Seq.empty
      case None => ()
    }
    // source key envelope → target-dir pruning bounds. Unsound when a
    // NOT MATCHED BY SOURCE clause must judge every target row — the
    // pruning disables itself there.
    val bounds: Map[String, (String, String)] =
      if (bySource.nonEmpty || equiPairs.isEmpty) Map.empty
      else {
        val zone = ManifestTable.statsZoneOf(spark, fs, dir, head)
        val aggs = equiPairs.zipWithIndex.flatMap { case ((_, s), i) =>
          Seq(min(col(s)).as(s"mn$i"), max(col(s)).as(s"mx$i")) }
        val r = sdf.agg(aggs.head, aggs.tail: _*).head()
        equiPairs.zipWithIndex.flatMap { case ((tc, _), i) =>
          for {
            mn <- Option(r.get(r.fieldIndex(s"mn$i")))
            mx <- Option(r.get(r.fieldIndex(s"mx$i")))
            rmn <- GraftManifestSource.render(mn, zone)
            rmx <- GraftManifestSource.render(mx, zone)
          } yield tc -> (rmn, rmx)
        }.toMap
      }
    // declared CHECK constraints bind merged/inserted values through
    // rewriteWhere's own S30 seam
    ManifestTable.rewriteWhere(spark, dir, bounds, retain, "m-",
      alwaysRewrite = inserts.nonEmpty)(tdf => mergeOf(tdf, sdf)): Unit
    Seq.empty
  }

  /** ONE full-outer join with per-row clause dispatch as nested CASE
    * WHEN (first-match-wins by construction of the `when` chains) —
    * except when no WHEN MATCHED clause exists, where semi/anti joins
    * replace the full-outer so legally-multi-matched target rows are
    * not duplicated. */
  private def mergeOf(tdf: DataFrame, sdf: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, monotonically_increasing_id, raise_error, when}
    val schema = tdf.schema
    require(!schema.fieldNames.exists(_.startsWith("__graft_")),
      "graft MERGE reserves the __graft_ column-name prefix")
    val t = tdf.withColumn(TIdCol, monotonically_increasing_id())
      .alias(TargetAlias)
    val s = sdf.withColumn(SMarkCol, lit(1)).alias(SourceAlias)
    val j0 = t.join(s, expr(condSql), "full_outer")
    val isMatched = col(TIdCol).isNotNull && col(SMarkCol).isNotNull
    val isTOnly = col(TIdCol).isNotNull && col(SMarkCol).isNull
    // SQL cardinality rule, SINGLE-PASS (r11 ran the full-outer join a
    // second time just to count duplicate matches — 2× merge cost at
    // scale): each target row's match count rides a window over the
    // SAME join output, and a second match trips a raise_error inside
    // the rewrite job — the write dies pre-commit, table unchanged.
    // Source-only rows carry a NULL target id; they get a unique
    // synthetic window key (negative, so disjoint from real ids) to
    // keep them out of one degenerate all-NULL window partition.
    val wkey = "__graft_wk"
    val ncol = "__graft_n"
    val j =
      if (matched.isEmpty) j0
      else j0
        .withColumn(wkey,
          coalesce(col(TIdCol), -monotonically_increasing_id() - 1))
        .withColumn(ncol, count(when(isMatched, lit(1))).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col(wkey))))
    val cardinalityGuard: Column => Column =
      if (matched.isEmpty) identity
      else keep => when(isMatched && col(ncol) > 1,
        raise_error(lit("MERGE: a target row matched multiple source " +
          "rows — deduplicate the source on the join keys"))
          .cast("boolean")).otherwise(keep)
    if (matched.isEmpty) {
      // No WHEN MATCHED clause: a target row matched by SEVERAL source
      // rows is LEGAL here (the cardinality rule governs only
      // update/delete), and the full-outer join would duplicate it —
      // use semi/anti joins instead, which keep each target row
      // exactly once by construction.
      val cond = expr(condSql)
      val matchedT = t.join(s, cond, "left_semi")
      val unmatchedT = t.join(s, cond, "left_anti")
      val outCols = schema.fields.toIndexedSeq
      val passthrough = matchedT.select(outCols.map(f =>
        col(s"$TargetAlias.${f.name}").as(f.name)): _*)
      val tOnlyOut = unmatchedT.filter(keepChain(bySource))
        .select(outCols.map(f =>
          valueChain(bySource, f).cast(f.dataType).as(f.name)): _*)
      val sOnly = s.join(t, cond, "left_anti")
      val insOut = sOnly.filter(insKeep)
        .select(outCols.map(f => insValue(f).cast(f.dataType).as(f.name)): _*)
      return passthrough.union(tOnlyOut).union(insOut)
    }
    val keep = cardinalityGuard(
      when(isMatched, keepChain(matched))
        .when(isTOnly, keepChain(bySource))
        .otherwise(insKeep))
    val cols = schema.fields.toIndexedSeq.map { f =>
      when(isMatched, valueChain(matched, f))
        .when(isTOnly, valueChain(bySource, f))
        .otherwise(insValue(f))
        .cast(f.dataType).as(f.name)
    }
    j.filter(keep).select(cols: _*)
  }

  // ---- clause-chain builders, shared by the CoW rewrite and the
  // ---- bucketed (S31) routing. All evaluate under the
  // ---- __graft_t/__graft_s aliases the rendered SQL carries.

  /** keep=true → the row survives (UPDATE values or untouched);
    * false → DELETE. First-match-wins by foldRight construction. */
  private def keepChain(
      actions: Seq[(Option[String], Option[Seq[(String, String)]])]): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    actions.foldRight(lit(true): Column) { case ((c, as), els) =>
      when(c.map(expr).getOrElse(lit(true)), lit(as.isDefined)).otherwise(els)
    }
  }

  /** The value of column `f` after the first matching clause applies;
    * fallthrough = the target's own value (untouched). */
  private def valueChain(
      actions: Seq[(Option[String], Option[Seq[(String, String)]])],
      f: StructField): Column = {
    import org.apache.spark.sql.functions.{col, when}
    val tc = col(s"$TargetAlias.${f.name}")
    actions.foldRight(tc) { case ((c, as), els) =>
      val v = as.flatMap(_.toMap.get(f.name)).map(expr).getOrElse(tc)
      when(c.map(expr).getOrElse(lit(true)), v).otherwise(els)
    }
  }

  /** True when any NOT MATCHED clause admits the source row. */
  private def insKeep: Column = {
    import org.apache.spark.sql.functions.{lit, when}
    inserts.foldRight(lit(false): Column) { case ((c, _), els) =>
      when(c.map(expr).getOrElse(lit(true)), lit(true)).otherwise(els)
    }
  }

  /** Column `f` of an inserted row (unassigned columns null-fill). */
  private def insValue(f: StructField): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    inserts.foldRight(lit(null).cast(f.dataType): Column) {
      case ((c, as), els) =>
        when(c.map(expr).getOrElse(lit(true)),
          as.toMap.get(f.name).map(expr)
            .getOrElse(lit(null).cast(f.dataType))).otherwise(els)
    }
  }

  /** S31 — MERGE routed through the hash-bucketed upsert kernel when
    * the target declares `layout=bucketed:<key>`: the clauses evaluate
    * against ONLY the touched buckets' standing rows
    * ([[MergeInto.standingForKeys]]), producing a per-key outcome frame
    * that [[MergeInto.applyBatch]] applies as an O(changeset) bucket
    * rewrite — never a CoW dir, which would break the b=N layout
    * invariant. Duplicate source keys fail loudly whether matched or
    * not — stricter than SQL's matched-only cardinality rule, because
    * a keyed table holds one row per key and a duplicate "insert"
    * would silently collapse. */
  private def runBucketed(spark: SparkSession, dir: String, key: String,
                          srcKey: String, nBuckets: Int,
                          sdf0: DataFrame): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit, raise_error, when}
    val ncol = "__graft_n"
    val sdf = sdf0
      .withColumn(ncol, count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(srcKey))))
      .filter(when(col(ncol) > 1, raise_error(lit(
          "MERGE: a target row matched multiple source rows — the " +
            "bucketed layout holds one row per key; deduplicate the " +
            "source on the join keys")).cast("boolean"))
        .otherwise(lit(true)))
      .drop(ncol)
    val standing = MergeInto.standingForKeys(spark, dir,
      sdf0.select(col(srcKey).as(key)))
    val schema = standing.schema
    require(!schema.fieldNames.exists(_.startsWith("__graft_")),
      "graft MERGE reserves the __graft_ column-name prefix")
    val t = standing.alias(TargetAlias)
    val s = sdf.alias(SourceAlias)
    val cond = expr(condSql)
    val delCol = "__graft_del"
    // matched pairs: first-match-wins values + a delete flag; keys the
    // target lacks: the insert chains (or nothing). Union feeds the
    // kernel as a one-row-per-key outcome frame.
    val matchedRows = t.join(s, cond, "inner").select(
      schema.fields.toIndexedSeq.map(f =>
        valueChain(matched, f).cast(f.dataType).as(f.name)) :+
        (!keepChain(matched)).as(delCol): _*)
    val insertRows = s.join(t, cond, "left_anti").filter(insKeep).select(
      schema.fields.toIndexedSeq.map(f =>
        insValue(f).cast(f.dataType).as(f.name)) :+
        lit(false).as(delCol): _*)
    val source = GraftManifestSource.withDeclaredChecks(
      matchedRows.unionByName(insertRows), dir)
    MergeInto.applyBatch(source, dir, key,
      MergeInto.defaultTies(source, key), col(delCol), nBuckets,
      dropCols = Seq(delCol)): Unit
  }
}
