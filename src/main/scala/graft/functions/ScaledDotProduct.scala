package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the integer dot product of two
  * ArrayType(LongType) vectors — the inner loop of every similarity
  * operator in [[graft.extensions.Similarity]].
  *
  * Why an Expression and not `aggregate(zip_with(...))`: Catalyst's
  * higher-order functions evaluate their lambda per element through the
  * interpreter (two lambda frames per component here), which made the
  * bucketed near-dup join spend ~all its time in the dot product. This
  * expression participates in whole-stage codegen — the generated Java is
  * the same tight `for` loop a hand-written kernel would be — and stays
  * null-safe (null input → null, per SQL semantics).
  *
  * Integer (scaled) vectors keep the sum associative and bit-identical
  * across engines — see Similarity's determinism contract.
  */
case class ScaledDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  // Input contract: both children are ArrayType(LongType). The usual
  // ExpectsInputTypes declaration is off-limits in Spark 4 (its
  // AbstractDataType became private[sql]), so the contract is enforced
  // here instead of by the analyzer's implicit-cast machinery.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "scaled_dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += x.getLong(i) * y.getLong(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScaledDotProduct =
    copy(left = newLeft, right = newRight)
}

object ScaledDotProduct {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      ScaledDotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
