package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst vector expressions with whole-stage codegen.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a,b,_*_), 0.0, _+_)`) evaluates its lambda
  * interpreted, row by row, with boxing — measured ~20× slower than this
  * codegen'd tight loop on the sf0.1 all-pairs cosine (SURVEY §4 names
  * this exact expression as the planned custom-Expression point). Both
  * produce the identical sequential left-to-right double fold, so results
  * (and the DuckDB oracle parity) are unchanged.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"vec_dot needs array<double> args, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** L2 norm — codegen'd single pass. */
case class L2Norm(child: Expression)
  extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"vec_norm needs array<double>, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) { s += x.getDouble(i) * x.getDouble(i); i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => {
      val f = VectorExprs.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$f.l2norm($a)"
    })

  override protected def withNewChildInternal(c: Expression): L2Norm = copy(child = c)
}

object VectorExprs {
  /** Runtime helper kept callable from generated code. */
  def l2norm(x: ArrayData): Double = {
    var s = 0.0
    var i = 0
    while (i < x.numElements()) { s += x.getDouble(i) * x.getDouble(i); i += 1 }
    math.sqrt(s)
  }

  def vecDot(a: Column, b: Column): Column =
    SqlShim.column(DotProduct(SqlShim.expression(a), SqlShim.expression(b)))

  def vecNorm(a: Column): Column =
    SqlShim.column(L2Norm(SqlShim.expression(a)))

  /** Null-safe cosine denominator: a zero norm product becomes NULL, not
    * a 0/0 = NaN. Spark's sort order treats NaN as GREATER than every
    * number and NaN >= t is TRUE for any threshold, so one corrupt
    * (all-zero) embedding in a 100 TB corpus would otherwise rank top of
    * every descending similarity search AND count as a near-duplicate of
    * every same-bucket zero vector, fabricating dedup drops. NULL sorts
    * last under DESC and fails >= thresholds — corrupt vectors fall out
    * instead of dominating. Mirror SQL: nullif(denom, 0). */
  def nonzeroDenom(c: Column): Column =
    org.apache.spark.sql.functions.nullif(c, org.apache.spark.sql.functions.lit(0.0))
}
