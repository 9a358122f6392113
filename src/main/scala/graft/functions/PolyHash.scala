package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: [[graft.extensions.Signatures.polyHash]] as
  * a SQL/Column function — the base hash of the char-ngram dedup pipeline
  * exposed on the query surface (h = fold (a·131 + c) mod P over char
  * codes; replayable in DuckDB with list_reduce, see Dedup.polyHashSql).
  *
  * Codegen delegates to the shared JVM kernel so the expression and the
  * Dataset-map path can never drift; the call participates in whole-stage
  * codegen (no interpreter round-trip per row).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(s: Any): Any =
    graft.extensions.Signatures.polyHash(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.extensions.Signatures.polyHash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Column-API entry point. */
  def apply(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c)))
}
