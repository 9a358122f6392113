package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's native expressions on the SQL surface.
  *
  * Two entry points for the same registration:
  *  - config `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (applied at session build — the standard extension mechanism)
  *  - [[GraftFunctions.register]] on a live session (for
  *    notebooks/tests that already hold a session)
  *
  * After either, `SELECT scaled_dot_product(a, b)` works in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.scaledDotProduct)
    ext.injectFunction(GraftFunctions.polyHash)
  }
}

object GraftFunctions {

  val scaledDotProduct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("scaled_dot_product"),
    new ExpressionInfo(classOf[ScaledDotProduct].getName, "scaled_dot_product"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"scaled_dot_product takes 2 arguments, got ${children.length}")
      ScaledDotProduct(children.head, children(1))
    })

  val polyHash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("poly_hash"),
    new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"poly_hash takes 1 argument, got ${children.length}")
      PolyHash(children.head)
    })

  /** Register on an existing session. */
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.GraftBridge.registerFunction(spark, scaledDotProduct)
    org.apache.spark.sql.GraftBridge.registerFunction(spark, polyHash)
  }
}
