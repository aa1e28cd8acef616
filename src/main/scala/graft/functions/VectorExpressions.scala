package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two ARRAY<DOUBLE> columns (SURVEY.md §4.3's
  * optional perf pass for T5/T6): a tight primitive double loop in
  * generated code instead of a chain of higher-order-function lambdas
  * (zip_with → aggregate) that allocates an intermediate array per row.
  * Left-to-right accumulation order matches the HOF fold exactly, so
  * results are bit-identical and the DuckDB oracles keep hash-matching.
  *
  * Returns null for null/length-mismatched inputs (same as zip_with's
  * null propagation).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // Length mismatch OR a null element => null, matching the HOF fold
  // exactly: zip_with's null padding / null lane makes x*null=null which
  // poisons the whole aggregate. A truncated or corrupt embedding must
  // surface as null, never as a plausible partial sum.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $s += $a.getDouble($i) * $b.getDouble($i);
          }
          if (!${ev.isNull}) { ${ev.value} = $s; }
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Codegen'd squared-L2 distance over two ARRAY<DOUBLE> columns — the
  * k-means / semantic-dedup assignment kernel (T25/T26). Same contract
  * as [[DotProduct]]: left-to-right accumulation matches the
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0d, +)` fold
  * bit-for-bit, so swapping it into a query cannot move a DuckDB oracle
  * hash; null or length-mismatched inputs yield null.
  */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2sq"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq requires two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // Same null contract as DotProduct: length mismatch or any null lane
  // yields null, exactly like the zip_with/aggregate fold.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $d = $a.getDouble($i) - $b.getDouble($i);
            $s += $d * $d;
          }
          if (!${ev.isNull}) { ${ev.value} = $s; }
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Codegen'd cosine similarity over two ARRAY<DOUBLE> columns — fuses
  * the three 64-lane passes (dot + both self-norms) that
  * `dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b)))` costs into ONE loop with
  * three accumulators. Each accumulator adds in the same left-to-right
  * order as its standalone loop, so every sum — and therefore the final
  * quotient — is bit-identical to the unfused form and to the HOF fold;
  * swapping it into a query cannot move a DuckDB oracle hash. Null
  * contract matches [[DotProduct]]: length mismatch or any null lane
  * yields null. A zero-norm side yields NaN, same as the unfused
  * division.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dp = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dp += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dp = ctx.freshName("dp")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $dp = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $xv = $a.getDouble($i);
            double $yv = $b.getDouble($i);
            $dp += $xv * $yv;
            $na += $xv * $xv;
            $nb += $yv * $yv;
          }
          if (!${ev.isNull}) {
            ${ev.value} = $dp / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
          }
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  import org.apache.spark.sql.Column

  /** Column form: dot_product(a, b) over ARRAY<DOUBLE> columns. */
  def dot_product(a: Column, b: Column): Column = {
    val u = org.apache.spark.sql.GraftShims
    u.column(DotProduct(u.expression(a), u.expression(b)))
  }

  /** Column form: squared L2 distance over ARRAY<DOUBLE> columns. */
  def l2_squared(a: Column, b: Column): Column = {
    val u = org.apache.spark.sql.GraftShims
    u.column(SquaredL2(u.expression(a), u.expression(b)))
  }

  private[graft] def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_dot expects exactly 2 arguments, got ${exprs.length}")
    DotProduct(exprs(0), exprs(1))
  }

  /** Column form: cosine similarity over ARRAY<DOUBLE> columns. */
  def cosine_sim(a: Column, b: Column): Column = {
    val u = org.apache.spark.sql.GraftShims
    u.column(CosineSim(u.expression(a), u.expression(b)))
  }

  private[graft] def buildL2(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_l2sq expects exactly 2 arguments, got ${exprs.length}")
    SquaredL2(exprs(0), exprs(1))
  }

  private[graft] def buildCosine(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_cosine expects exactly 2 arguments, got ${exprs.length}")
    CosineSim(exprs(0), exprs(1))
  }

  /** Idempotently register the vector functions in the session's function
    * registry so SQL-text queries can also call them. */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", build, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2sq", buildL2, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", buildCosine, "built-in")
  }
}
