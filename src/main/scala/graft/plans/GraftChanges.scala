package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{GraftChangesStub, GraftMetaTables}

/** S32 — `SELECT ... FROM cat.ns.`t$$changes``: the row-level CDC feed
  * as a SQL-addressable metadata table. The catalog hands the analyzer
  * a [[GraftChangesStub]] relation (the V2 Table API can only serve
  * scans, and the diff feed is a signed aggregation — it needs a real
  * plan with a shuffle); this rule swaps the stub for the computed
  * feed plan ([[GraftMetaTables.changesFeed]]), rebinding the stub's
  * attribute ids BY NAME so everything above the relation resolves
  * unchanged — the relation-substitution seam Delta's CDF rides.
  *
  * Scale: the feed unions one diff per adjacent RETAINED version pair,
  * each costing only the dirs that changed in that step; the pair
  * count is bounded by the retention window. */
object GraftChangesRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftChangesStub] =>
      val stub = r.table.asInstanceOf[GraftChangesStub]
      val analyzed = GraftMetaTables.changesFeed(SparkSession.active, stub.dir)
        .queryExecution.analyzed
      val byName = analyzed.output.map(a => a.name -> a).toMap
      // by NAME, never positional: the stub's schema was captured at
      // loadTable time and a concurrent evolution must fail loudly,
      // not silently mis-bind columns
      Project(r.output.map { old =>
        val bound = byName.getOrElse(old.name, throw new IllegalStateException(
          s"t$$changes column '${old.name}' vanished between table " +
            s"resolution and planning at ${stub.dir} — re-run the query"))
        Alias(bound, old.name)(exprId = old.exprId)
      }, analyzed)
  }
}
