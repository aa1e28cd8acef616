package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo => CEqualTo, Expression, GreaterThan => CGreaterThan, GreaterThanOrEqual => CGreaterThanOrEqual, In => CIn, LessThan => CLessThan, LessThanOrEqual => CLessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, In, LessThanOrEqual}

import graft.sources.{GraftManifestSource, GraftTable, ManifestTable}

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
    ManifestTable.headVersion(spark, dir).foreach { head =>
      val zone = ManifestTable.statsZoneOf(spark, fs, dir, head)
      ManifestTable.updateWhere(spark, dir, cond,
        assignments.map { case (c, v) => c -> expr(v) },
        GraftManifestSource.boundsOf(condFilters, zone), retain): Unit
    }
    Seq.empty
  }
}
