package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression:
  * [[graft.extensions.Signatures.tokenWindowHashes]] as a Column — the
  * [[PolyHash]] of every k-token window of the input (tokens split on a
  * single space, windows re-joined with one space before hashing; fewer
  * than k tokens yield the single whole-string window). The word-gram
  * counterpart of [[PolyNgramHashes]], and the codegen'd replacement for
  * `transform(sequence(1, n-k+1), i -> poly_hash(concat_ws(" ",
  * slice(tokens, i, k))))`, which runs per window on Spark's INTERPRETED
  * higher-order-function path and allocates the window string each time.
  */
case class TokenWindowHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "window length must be >= 1")

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "token_window_hashes"

  override protected def nullSafeEval(s: Any): Any =
    new GenericArrayData(graft.extensions.Signatures
      .tokenWindowHashes(s.asInstanceOf[UTF8String].toString, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.extensions.Signatures.tokenWindowHashes($c.toString(), $k))")

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)
}

object TokenWindowHashes {
  /** Column-API entry point. */
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(TokenWindowHashes(GraftBridge.expression(c), k))
}
