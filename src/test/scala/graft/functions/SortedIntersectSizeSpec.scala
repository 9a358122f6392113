package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SortedIntersectSizeSpec extends SparkTestBase {

  test("matches the builtin array_intersect size on sorted-distinct sets") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(7L), Seq(7L)),
    ).toDF("a", "b")
    val rows = df.select(
      SortedIntersectSize(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    assert(rows.map(_.getInt(0)).toSeq === Seq(2, 0, 0, 1))
  }

  test("rejects nullable-element arrays at analysis, not at runtime") {
    import spark.implicits._
    // Option[Long] elements → ArrayType(LongType, containsNull = true);
    // the merge kernel calls getLong unconditionally, so a nullable input
    // must fail analysis instead of silently corrupting the count
    val nullable = Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L))))
      .toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      nullable.select(SortedIntersectSize(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("non-nullable"))
  }

  test("null ARGUMENTS (not elements) still yield null per SQL semantics") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]]))
      .toDF("a", "b")
    val out = df.select(SortedIntersectSize(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }
}
