package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ScaledDotProductSpec extends SparkTestBase {

  test("matches the declarative aggregate/zip_with formulation") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 0L, 2L), Seq(3L, 9L, -1L)),
      (Seq.empty[Long], Seq.empty[Long]),
    ).toDF("a", "b")
    val both = df.select(
      ScaledDotProduct(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("declarative"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(both(0).getLong(0) === 32L)
    assert(both(2).getLong(0) === 0L)
  }

  test("registered on the SQL surface via GraftFunctions/extensions") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
      .createOrReplaceTempView("sdp_test_vw")
    val out = spark.sql("SELECT scaled_dot_product(a, b) AS d FROM sdp_test_vw")
      .as[Long].head()
    assert(out === 32L)
    // type contract rejects wrong argument types at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT scaled_dot_product('x', 'y')").collect()
    }
  }

  test("null inputs yield null (SQL semantics)") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(df.select(ScaledDotProduct(col("a"), col("b"))).head().isNullAt(0))
  }

  test("participates in whole-stage codegen over a real scan") {
    // literals constant-fold at plan time, so drive it from a parquet
    // scan: the projection must sit inside a WholeStageCodegen span
    // ("*(n)" prefix), not fall back to interpreted eval
    val v = graft.extensions.Similarity.scaledVec(spark, sf0001)
      .select(col("vec_id"), ScaledDotProduct(col("v"), col("v")).as("nrm2"))
    val plan = v.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(2000))
    assert(plan.contains("scaled_dot_product"), plan.take(2000))
    // and the values are the same squared norms scaledVec computes
    val viaExpr = v.orderBy("vec_id").limit(5).collect().map(_.getLong(1))
    val direct = graft.extensions.Similarity.scaledVec(spark, sf0001)
      .orderBy("vec_id").limit(5).select("nrm").collect().map(_.getLong(0))
    assert(viaExpr.toSeq === direct.toSeq)
  }
}
