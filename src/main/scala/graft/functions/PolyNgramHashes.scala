package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: [[graft.extensions.Signatures.polyNgramHashes]]
  * as a Column function — the [[PolyHash]] of every `n`-char window of the
  * input in one pass (entry i = poly_hash of substring(i+1, n); a string
  * shorter than n yields its single whole-string hash).
  *
  * Exists because the declarative equivalent,
  * `transform(sequence(0, len-n), i -> poly_hash(substring(s, i+1, n)))`,
  * evaluates on Spark's INTERPRETED higher-order-function path — one
  * lambda frame and one substring allocation per character position —
  * which dominated the char-ngram profiling queries' runtime. Codegen
  * delegates to the shared JVM kernel so this and the SQL-replay
  * semantics (per-window list_reduce in DuckDB) can never drift.
  */
case class PolyNgramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "window length must be >= 1")

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

  override def prettyName: String = "poly_ngram_hashes"

  override protected def nullSafeEval(s: Any): Any =
    new GenericArrayData(graft.extensions.Signatures
      .polyNgramHashes(s.asInstanceOf[UTF8String].toString, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.extensions.Signatures.polyNgramHashes($c.toString(), $n))")

  override protected def withNewChildInternal(newChild: Expression): PolyNgramHashes =
    copy(child = newChild)
}

object PolyNgramHashes {
  /** Column-API entry point. */
  def apply(c: Column, n: Int): Column =
    GraftBridge.column(PolyNgramHashes(GraftBridge.expression(c), n))
}
