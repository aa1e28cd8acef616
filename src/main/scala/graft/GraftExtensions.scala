package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSim, DotProduct, SquaredL2}

/** SparkSessionExtensions entry point — production sessions opt in with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) to get graft's custom
  * expressions in SQL. Harness sessions instead call
  * `VectorFunctions.register` at runtime (extensions only apply to
  * newly-built sessions).
  *
  * SQL DELETE/UPDATE/MERGE need NO rule here: [[graft.sources.GraftTable]]
  * implements `SupportsRowLevelOperations`, so Spark's own analyzer
  * rewrites plan them onto [[graft.sources.GraftGroupOperation]] /
  * [[graft.sources.GraftDeltaOperation]] (GraftRowLevelOps). The one
  * DML rule below is a correctness patch over an upstream edge of that
  * rewrite, not a bypass. Everything else still compiles to
  * built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // S26 correctness patch on the NATIVE merge rewrite: a no-WHEN-
    // MATCHED merge must not duplicate multi-matched target rows
    e.injectPostHocResolutionRule(_ => graft.plans.GraftMergeCarryoverDedup)
    // S51 contract closure: UPDATE/MERGE cannot assign a GENERATED
    // ALWAYS identity column (judged on the rewritten row-level write —
    // the rewrites run inside the Resolution fixpoint, before any
    // injected rule can observe the original assignments)
    e.injectPostHocResolutionRule(_ => graft.plans.GraftIdentityUpdateGuard)
    // S32: swaps the catalog's `t$changes` stub relation for the
    // computed CDC-feed plan (a diff needs a shuffle — not a scan)
    e.injectPostHocResolutionRule(_ => graft.plans.GraftChangesRule)
    // S35: view DDL rides the PARSER seam (Spark 4.1 ships the
    // ViewCatalog interface without SQL wiring, and the analyzer
    // rejects non-session view DDL before any rule seam — see
    // GraftViewDdl); reads substitute in the resolution fixpoint
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
    e.injectResolutionRule(_ => graft.plans.GraftViewReadRule)
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      graft.functions.VectorFunctions.build))
    e.injectFunction((
      new FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[SquaredL2].getName, "graft_l2sq"),
      graft.functions.VectorFunctions.buildL2))
    e.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      graft.functions.VectorFunctions.buildCosine))
  }
}
