package graft.ingest

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Physical schema evolution on the lake: files written before a column
  * existed must remain readable after add-only evolution (ref
  * internal/iceberg/schema/schema.go:149-174 — new fields appended, old
  * data files never rewritten). Spark's mergeSchema read is the physical
  * counterpart of SchemaBuilder's logical add-only merge.
  */
class SchemaDriftSpec extends SparkTestBase {

  test("files from before a column addition read back with nulls, not errors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    // epoch 1: two columns
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    // epoch 2: a third column appears (add-only evolution)
    Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "score", "v"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), r.isNullAt(r.fieldIndex("score"))))
    // old-epoch rows surface the new column as null
    assert(rows.toSeq === Seq((1L, true), (2L, true), (3L, false), (4L, false)))
    // and aggregation over the evolved column skips the nulls
    val avg = merged.agg(round(org.apache.spark.sql.functions.avg("score"), 2))
      .collect()(0).getDouble(0)
    assert(avg === 0.6)
  }
}
