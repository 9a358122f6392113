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

  test("PNG header round-trips and corrupt headers are rejected") {
    for ((w, h) <- Seq((16, 16), (639, 479), (1, 1), (65535, 1))) {
      val hdr = Png.header(w, h)
      assert(hdr.length === Png.HeaderLen)
      assert(Png.parseIhdr(hdr ++ "payload".getBytes("UTF-8")) === Some((w, h)))
    }
    val good = Png.header(100, 50)
    assert(Png.parseIhdr("not a png at all".getBytes("UTF-8")) === None)
    assert(Png.parseIhdr(good.take(20)) === None) // truncated
    val flipped = good.clone(); flipped(17) = (flipped(17) ^ 1).toByte
    assert(Png.parseIhdr(flipped) === None) // CRC catches a bit flip
  }

  test("every png asset carries a valid header and decode reads real dims") {
    import spark.implicits._
    val pngs = Multimodal.assets(spark, sf0001)
      .filter(col("meta.mime") === "image/png")
      .select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .collect()
    assert(pngs.nonEmpty)
    pngs.foreach { case (id, blob) =>
      val parsed = Png.parseIhdr(blob)
      assert(parsed.isDefined, s"doc $id: invalid PNG header")
      val (w, h) = parsed.get
      // dims were derived from the payload length at synthesis
      assert((w, h) === Multimodal.pngDims(blob.length - Png.HeaderLen))
    }
  }
}
