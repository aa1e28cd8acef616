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
  * Only the function injection is needed today: SURVEY §4.3's verdict —
  * every operator compiles to built-ins + a handful of UDF/UDAF objects —
  * means no custom Rule[LogicalPlan] or SparkStrategy is warranted. This
  * class is where they would be injected if that changes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
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
