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

  test("EvolvingDecoder absorbs a mid-stream column: add-only merge, version bump") {
    import spark.implicits._
    val seed = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("v", "double")
    val dec = new EvolvingDecoder(seed)
    def line(json: String) = Seq(json).toDF("value")

    // batch 0: the seeded 2-column payload
    val b0 = dec.decode(line(
      """{"after":{"id":1,"v":1.5},"op":"c","ts_ms":1000,
        |"source":{"schema":"public","table":"t","lsn":1,"txId":1}}"""
        .stripMargin.replace("\n", "")), "value")
    assert(dec.version === 1)
    assert(b0.select("after.*").columns.toSeq === Seq("id", "v"))

    // batch 1: `score` appears — schema evolves add-only, version bumps,
    // and the new column decodes from this batch on
    val b1 = dec.decode(line(
      """{"after":{"id":2,"v":2.5,"score":7},"op":"u","ts_ms":2000,
        |"source":{"schema":"public","table":"t","lsn":2,"txId":2}}"""
        .stripMargin.replace("\n", "")), "value")
    assert(dec.version === 2)
    assert(dec.payloadSchema.fieldNames.toSeq === Seq("id", "v", "score"))
    assert(b1.select("after.score").as[Long].head() === 7L)
    // existing field TYPES survive evolution even when a batch's values
    // look narrower (v=2.5 could infer double anyway; id stays long)
    assert(dec.payloadSchema("v").dataType ===
      org.apache.spark.sql.types.DoubleType)

    // batch 2: an old-shape batch does NOT un-evolve; the missing column
    // decodes as null
    val b2 = dec.decode(line(
      """{"before":{"id":1,"v":1.5},"op":"d","ts_ms":3000,
        |"source":{"schema":"public","table":"t","lsn":3,"txId":3}}"""
        .stripMargin.replace("\n", "")), "value")
    assert(dec.version === 2)
    assert(b2.select("before.score").as[java.lang.Long].head() === null)

    // batch 3: `score` turns fractional — the inferred-long type PROMOTES
    // to double (version bump) instead of decoding 7.5 to a silent null
    val b3 = dec.decode(line(
      """{"after":{"id":3,"v":3.5,"score":7.5},"op":"u","ts_ms":4000,
        |"source":{"schema":"public","table":"t","lsn":4,"txId":4}}"""
        .stripMargin.replace("\n", "")), "value")
    assert(dec.version === 3)
    assert(dec.payloadSchema("score").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(b3.select("after.score").as[Double].head() === 7.5)
  }

  test("inference is sample-bounded and tail-anchored: tail drift caught with a tiny sample") {
    import spark.implicits._
    val seed = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("v", "double")
    // 4-line sample against a 505-line batch: inference must parse only
    // the max-LSN tail, not the batch — and because WAL drift is
    // monotone, that tail witnesses the drifted column
    val dec = new EvolvingDecoder(seed, sampleLines = 4)
    def l(i: Int, drifted: Boolean) = {
      val score = if (drifted) ""","score":7""" else ""
      s"""{"after":{"id":$i,"v":1.5$score},"op":"c","ts_ms":1000,""" +
        s""""source":{"schema":"public","table":"t","lsn":$i,"txId":$i}}"""
    }
    val lines = (1 to 500).map(l(_, drifted = false)) ++
      (501 to 505).map(l(_, drifted = true))
    // drifted lines sit physically LAST in a single partition: a naive
    // head-of-batch limit(4) would deterministically sample only
    // pre-drift lines and miss the column — the max-LSN sort is what
    // anchors the sample to where monotone drift must be visible
    val batch = spark.createDataset(lines).toDF("value")
    val out = dec.decode(batch, "value")
    assert(dec.version === 2)
    assert(dec.payloadSchema.fieldNames.contains("score"))
    // the whole batch decodes under the evolved schema: drifted rows
    // carry values, pre-drift rows surface null
    assert(out.filter(col("after.score").isNotNull).count() === 5)
    assert(out.filter(col("after.score").isNull).count() === 500)
  }

  test("a column null-omitted at the tail still evolves: presence scan forces full inference") {
    import spark.implicits._
    val seed = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("v", "double")
    val dec = new EvolvingDecoder(seed, sampleLines = 4)
    def l(i: Int, scored: Boolean) = {
      // null-omitting encoder (to_json's default): a null score is
      // ABSENT from the line, not "score":null
      val score = if (scored) ""","score":7""" else ""
      s"""{"after":{"id":$i,"v":1.5$score},"op":"c","ts_ms":1000,""" +
        s""""source":{"schema":"public","table":"t","lsn":$i,"txId":$i}}"""
    }
    // score is live mid-batch (200..300) but null for every line the
    // max-LSN tail sample can see — monotone PRESENCE is violated by
    // the encoder, so the tail alone would drop 101 real values
    val lines = (1 to 199).map(l(_, scored = false)) ++
      (200 to 300).map(l(_, scored = true)) ++
      (301 to 505).map(l(_, scored = false))
    val out = dec.decode(spark.createDataset(lines).toDF("value"), "value")
    assert(dec.version === 2)
    assert(dec.payloadSchema.fieldNames.contains("score"))
    assert(out.filter(col("after.score").isNotNull).count() === 101)
    assert(out.filter(col("after.score").isNull).count() === 404)
  }
}
