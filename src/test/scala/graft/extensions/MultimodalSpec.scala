package graft.extensions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary column schema, deterministic decode stub,
  * partition-parallel decode shape. */
class MultimodalSpec extends SparkTestBase {

  test("assets table has the binary + typed-metadata schema") {
    val a = Multimodal.assets(spark, sf0001)
    val f = a.schema.fields.map(x => x.name -> x.dataType.typeName).toMap
    assert(f("blob") === "binary")
    assert(f("meta") === "struct")
    val meta = a.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("mime", "origin"))
  }

  test("decode stub is deterministic and length-derived") {
    val b = "hello world".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b) === Multimodal.decodeStub(b))
    val (w, h, fr) = Multimodal.decodeStub(b)
    assert(w >= 16 && h >= 16 && fr >= 1)
    // different payloads map to different dimensions (mod arithmetic)
    assert(Multimodal.decodeStub("x".getBytes("UTF-8")) !==
      Multimodal.decodeStub("a much longer payload here".getBytes("UTF-8")))
  }

  test("mime assignment covers all three modalities on real data") {
    val mimes = Multimodal.assets(spark, sf0001)
      .select(col("meta.mime")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(mimes === Set("image/png", "audio/wav", "video/mp4"))
  }
}
