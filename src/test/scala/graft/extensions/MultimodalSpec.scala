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

  test("WAV header round-trips and malformed input is rejected") {
    for ((ch, sr, n) <- Seq((1, 8000, 0), (2, 44100, 12345), (1, 48000, 7))) {
      val hdr = Wav.header(ch, sr, n)
      assert(hdr.length === Wav.HeaderLen)
      val fmt = Wav.parseFmt(hdr ++ Array.fill[Byte](math.min(n, 64))(0))
      assert(fmt === Some(Wav.Fmt(ch, sr, Wav.BitsPerSample, n)))
    }
    assert(Wav.parseFmt("RIFF????WAVEnot a real chunk layout in here, sorry".getBytes("UTF-8")) === None)
    assert(Wav.parseFmt("clearly not RIFF at all, wrong magic padding pad".getBytes("UTF-8")) === None)
    assert(Wav.parseFmt(Wav.header(2, 44100, 10).take(30)) === None) // truncated
    // duration floors: 44100 Hz stereo = 176400 B/s
    assert(Wav.Fmt(2, 44100, 16, 176400).durationMs === 1000L)
    assert(Wav.Fmt(2, 44100, 16, 176399).durationMs === 999L)
  }

  test("WAV parser walks chunks — fmt need not be adjacent to data") {
    // splice an unknown 6-byte chunk (padded to 8) between fmt and data
    val hdr = Wav.header(1, 16000, 99)
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "hello".getBytes("US-ASCII") :+ 0.toByte // NUL pad, kept out of the source literal
    val spliced = hdr.take(36) ++ extra ++ hdr.drop(36)
    assert(Wav.parseFmt(spliced) === Some(Wav.Fmt(1, 16000, 16, 99)))
  }

  test("MP4 header round-trips and malformed input is rejected") {
    for ((ts, dur) <- Seq((600, 0), (1000, 123456), (90000, 1))) {
      val hdr = Mp4.header(ts, dur)
      assert(hdr.length === Mp4.HeaderLen)
      assert(Mp4.parseMvhd(hdr ++ "payload".getBytes("UTF-8")) ===
        Some(Mp4.Mvhd(ts.toLong, dur.toLong)))
    }
    assert(Mp4.parseMvhd("definitely not an mp4 file".getBytes("UTF-8")) === None)
    assert(Mp4.parseMvhd(Mp4.header(600, 600).take(40)) === None) // truncated moov
    assert(Mp4.Mvhd(600, 1500).durationMs === 2500L)
    assert(Mp4.Mvhd(600, 599).durationMs === 998L) // floors
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

  test("PNG encode/decode round-trips pixels and matches ImageIO's decoder") {
    // ImageIO's PNG reader is an INDEPENDENT implementation shipped with
    // the JDK — agreeing with it rules out a compensating encoder/decoder
    // bug pair that the formula-replaying oracle alone couldn't catch.
    System.setProperty("java.awt.headless", "true")
    // h >= 5 so all five filter types (y % 5) appear; w not a multiple of
    // 256/5 so Sub deltas vary; both dims prime-ish to avoid period luck
    val (w, h, seed) = (23, 11, 77)
    def v(x: Int, y: Int, c: Int) = Multimodal.pixelValue(x, y, c, seed)
    val png = Png.encodeRgb(w, h, v)

    val dec = Png.decodeRgb(png).get
    assert((dec.width, dec.height) === (w, h))
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert((dec.pixels(y * w * 3 + x * 3 + c) & 0xff) === v(x, y, c),
        s"own decoder mismatch at ($x,$y,$c)")

    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img !== null, "ImageIO could not parse the encoded PNG")
    assert((img.getWidth, img.getHeight) === (w, h))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) === v(x, y, 0), s"ImageIO R at ($x,$y)")
      assert(((rgb >> 8) & 0xff) === v(x, y, 1), s"ImageIO G at ($x,$y)")
      assert((rgb & 0xff) === v(x, y, 2), s"ImageIO B at ($x,$y)")
    }
  }

  test("PNG decode rejects corruption instead of returning wrong pixels") {
    val png = Png.encodeRgb(16, 9, (x, y, c) => (x + y + c) % 256)
    assert(Png.decodeRgb(png).isDefined)
    // flip one byte inside the IDAT payload → chunk CRC must catch it
    val corrupt = png.clone()
    corrupt(Png.HeaderLen + 12) = (corrupt(Png.HeaderLen + 12) ^ 0x40).toByte
    assert(Png.decodeRgb(corrupt) === None)
    // truncation → None, not an exception or short pixel array
    assert(Png.decodeRgb(png.take(png.length - 20)) === None)
    // header-only fixtures (no IDAT/IEND) are not decodable as full PNGs
    assert(Png.decodeRgb(Png.header(8, 8)) === None)
  }

  test("WAV PCM decode matches the JDK's independent javax.sound reader") {
    // crafted samples cover both signs, extremes, and byte-order traps
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345, 256, -257, 255)
    val data = new Array[Byte](samples.length * 2)
    for ((v, i) <- samples.zipWithIndex) {
      data(2 * i) = v.toByte; data(2 * i + 1) = (v >> 8).toByte
    }
    val blob = Wav.header(1, 16000, data.length) ++ data
    assert(Wav.decodeSamples(blob).get.toSeq === samples.toSeq)
    // the JDK's own WAV reader must agree on format AND payload bytes —
    // it independently walks the RIFF layout our writer produced
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(blob))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate === 16000f)
    assert(fmt.getChannels === 1)
    assert(fmt.getSampleSizeInBits === 16)
    assert(!fmt.isBigEndian)
    val raw = ais.readAllBytes()
    assert(raw.toSeq === data.toSeq)
  }

  test("PCM decode handles odd data lengths and truncation honestly") {
    // odd payload: the trailing half-sample is ignored, not misread
    val blob = Wav.header(1, 8000, 5) ++ Array[Byte](10, 0, 20, 0, 99)
    assert(Wav.decodeSamples(blob).get.toSeq === Seq(10, 20))
    // declared data longer than the blob → reject, don't overrun
    val lying = Wav.header(1, 8000, 100) ++ Array[Byte](1, 2)
    assert(Wav.parsePcm(lying) === None)
  }

  test("every wav and mp4 asset carries a valid parseable container header") {
    import spark.implicits._
    val av = Multimodal.assets(spark, sf0001)
      .filter(col("meta.mime") =!= "image/png")
      .select(col("doc_id"), col("meta.mime"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .collect()
    assert(av.nonEmpty)
    av.foreach {
      case (id, "audio/wav", blob) =>
        val n = blob.length - Wav.HeaderLen
        val (ch, sr) = Multimodal.wavParams(n)
        assert(Wav.parseFmt(blob) === Some(Wav.Fmt(ch, sr, Wav.BitsPerSample, n)),
          s"doc $id: wav header mismatch")
      case (id, "video/mp4", blob) =>
        val n = blob.length - Mp4.HeaderLen
        assert(Mp4.parseMvhd(blob) ===
          Some(Mp4.Mvhd(Multimodal.Mp4Timescale.toLong, Multimodal.mp4Duration(n).toLong)),
          s"doc $id: mp4 header mismatch")
      case (id, m, _) => fail(s"doc $id: unexpected mime $m")
    }
  }

  // ---------------------------------------------- perceptual-hash near-dup

  /** Engine-independent reference hash for a doc of n text bytes: the
    * pixel synthesis formula evaluated straight into [[Multimodal.phash56]]
    * without any PNG bytes in between. */
  private def formulaHash(n: Int): Long = {
    val (w, h) = Multimodal.pixelDims(n)
    val s = Multimodal.pixelSeed(n)
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px((y * w + x) * 3 + c) = Multimodal.pixelValue(x, y, c, s).toByte
    Multimodal.phash56(w, h, px)
  }

  test("phash is invariant under a uniform brightness shift") {
    // smooth ramp bounded so +24 never wraps a channel
    val ramp = (x: Int, y: Int, c: Int) => (2 * x + y + 10 * c).min(220)
    val bright = (x: Int, y: Int, c: Int) => ramp(x, y, c) + 24
    def hash(f: (Int, Int, Int) => Int): Long = {
      val dec = Png.decodeRgb(Png.encodeRgb(48, 40, f)).get
      Multimodal.phash56(dec.width, dec.height, dec.pixels)
    }
    assert(hash(ramp) === hash(bright)) // same gradient signs, same hash
    // a reversed ramp has opposite gradient signs almost everywhere
    val rev = (x: Int, y: Int, c: Int) => (220 - 2 * x - y + 10 * c).max(0)
    assert(java.lang.Long.bitCount(hash(ramp) ^ hash(rev)) > 28)
  }

  test("banded join finds EVERY pair within the Hamming threshold") {
    import spark.implicits._
    // byte length (not char count) is what the engine keys synthesis on
    val lens = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => (id, t.getBytes("UTF-8").length) }
    assert(lens.nonEmpty)
    val hs = lens.map { case (id, n) => (id, formulaHash(n)) }
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a > b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSeq
    // star-shaped decision list from the brute-force truth
    val expect = brute.groupBy(_._1).map { case (id, ns) =>
      val m = ns.minBy(_._2)
      (id, m._2, m._3)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("dedup_phash_dups")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // and the histogram accounts for the full verified pair mass
    val gotHist = graft.SparkEntry.queries("dedup_phash_hist")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    val expectHist = brute.groupBy(_._3).map { case (d, ps) => (d, ps.size.toLong) }
    assert(gotHist === expectHist)
    // incremental (new batch = %15 slice vs corpus): same brute truth,
    // direction-free this time
    val incBrute = (for {
      (a, ha) <- hs if a % 15 == 0
      (b, hb) <- hs if b % 15 != 0
      dist = java.lang.Long.bitCount(ha ^ hb) if dist <= 3
    } yield (a, b, dist.toLong)).toSeq
    val incExpect = incBrute.groupBy(_._1).map { case (id, ms) =>
      (id, ms.size.toLong, ms.map(_._3).min)
    }.toSeq.sortBy(_._1)
    val incGot = graft.SparkEntry.queries("dedup_phash_incremental")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(incGot === incExpect)
  }

  test("audio hash is invariant under uniform gain; banded join is complete") {
    // gain invariance: scaling every sample preserves every
    // energy-difference sign, the audio analogue of brightness shift
    val rng = new scala.util.Random(7)
    val clip = Array.fill(400)(rng.nextInt(8000) - 4000)
    val louder = clip.map(_ * 3)
    assert(Multimodal.audioHash56(clip) === Multimodal.audioHash56(louder))
    // a genuinely different clip lands far away
    val other = Array.fill(400)(rng.nextInt(8000) - 4000)
    assert(java.lang.Long.bitCount(
      Multimodal.audioHash56(clip) ^ Multimodal.audioHash56(other)) > 10)
    // short clips (fewer samples than frames) hash without error
    assert(Multimodal.audioHash56(Array(5, -3)) ===
      Multimodal.audioHash56(Array(50, -30)))

    // completeness: brute-force all-pairs truth over engine-independent
    // hashes (samples straight from payload bytes, no WAV in between)
    import spark.implicits._
    val hs = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) =>
        val b = t.getBytes("UTF-8")
        val samples = (0 until b.length / 2).map(i =>
          ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort.toInt)
        (id, Multimodal.audioHash56(samples.toArray))
      }
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a > b
      dist = java.lang.Long.bitCount(ha ^ hb) if dist <= 3
    } yield (a, b, dist.toLong)).toSeq
    val expect = brute.groupBy(_._1).map { case (id, ns) =>
      val m = ns.minBy(_._2); (id, m._2, m._3)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("dedup_audio_dups")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === expect)
    val gotHist = graft.SparkEntry.queries("dedup_audio_hist")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(gotHist === brute.groupBy(_._3).map { case (d2, ps) => (d2, ps.size.toLong) })
    // incremental: the % 15 == 1 slice screens against the rest
    val incBrute = (for {
      (a, ha) <- hs if a % 15 == 1
      (b, hb) <- hs if b % 15 != 1
      dist = java.lang.Long.bitCount(ha ^ hb) if dist <= 3
    } yield (a, b, dist.toLong)).toSeq
    val incExpect = incBrute.groupBy(_._1).map { case (id, ms) =>
      (id, ms.size.toLong, ms.map(_._3).min)
    }.toSeq.sortBy(_._1)
    val incGot = graft.SparkEntry.queries("dedup_audio_incremental")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(incGot === incExpect)
  }

  test("banded joins plan as hash/merge equi-joins — no cartesian, no nested loop") {
    for (q <- Seq("dedup_phash_dups", "dedup_audio_dups", "dedup_video_dups",
        "dedup_phash_incremental", "dedup_audio_incremental",
        "dedup_video_incremental")) {
      val df = graft.SparkEntry.queries(q)(spark, sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      assert(!plan.contains("BroadcastNestedLoop"), s"$q:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"), s"$q joins oddly:\n$plan")
    }
  }

  test("band buckets stay bounded — the candidate join is never all-pairs") {
    import spark.implicits._
    val lens = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 3 === 0)
      .select(col("text")).as[String].collect()
      .map(_.getBytes("UTF-8").length)
    val hs = lens.map(formulaHash)
    val n = hs.length.toLong
    val buckets = hs.flatMap(h => (0 until 4).map(j => (j, (h >> (14 * j)) & 0x3FFF)))
      .groupBy(identity).map(_._2.length.toLong)
    val candidateMass = buckets.map(c => c * (c - 1) / 2).sum
    val allPairs = n * (n - 1) / 2
    // banding must prune the quadratic mass, not re-create it
    assert(candidateMass < allPairs / 4,
      s"candidate mass $candidateMass vs all-pairs $allPairs")
    assert(buckets.max < n / 2, s"hot bucket ${buckets.max} of $n")
  }

  /** Independent formula replay of [[Multimodal.videoHash56]]: per-frame
    * pixels from the synthesis formula, dHash, per-bit majority. */
  private def videoFormulaHash(n: Int): Long = {
    val (w, h) = Multimodal.videoDims(n)
    val nf = Multimodal.videoFrames(n)
    val s = Multimodal.pixelSeed(n)
    val hs = Multimodal.sampleIdx(nf).map { f =>
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        px((y * w + x) * 3 + c) = Multimodal.videoPixel(f, x, y, c, s).toByte
      Multimodal.phash56(w, h, px)
    }
    Multimodal.majority3(hs(0), hs(1), hs(2))
  }

  test("full MP4 fixture: tkhd dims and mdat frames round-trip; hash replays the formula") {
    val enc = Mp4.encodeVideo(600, 5 * 25, 16, 12, 5,
      (f, x, y, c) => Multimodal.videoPixel(f, x, y, c, 7))
    assert(Mp4.parseMvhd(enc) === Some(Mp4.Mvhd(600L, 125L)))
    assert(Mp4.parseTkhd(enc) === Some((16, 12)))
    val (from, to) = Mp4.parseMdat(enc).get
    assert(to - from === 5 * 16 * 12 * 3)
    assert(to === enc.length) // mdat is the tail box
    // engine decode == arithmetic replay (frames 0, 2, 4 of 5)
    val direct = {
      val hs = Seq(0, 2, 4).map { f =>
        val px = new Array[Byte](16 * 12 * 3)
        for (y <- 0 until 12; x <- 0 until 16; c <- 0 until 3)
          px((y * 16 + x) * 3 + c) = Multimodal.videoPixel(f, x, y, c, 7).toByte
        Multimodal.phash56(16, 12, px)
      }
      Multimodal.majority3(hs(0), hs(1), hs(2))
    }
    assert(Multimodal.videoHash56(enc) === Some(direct))
    // malformed containers are None, not garbage
    assert(Multimodal.videoHash56("not an mp4".getBytes("UTF-8")) === None)
    assert(Multimodal.videoHash56(enc.take(60)) === None)
    assert(Multimodal.videoHash56(Mp4.header(600, 125) ++
      "payload".getBytes("UTF-8")) === None) // no trak/mdat
    // a 2-frame clip can't fill the 3 samples: rejected, not mis-hashed
    val short = Mp4.encodeVideo(600, 2 * 25, 8, 8, 2, (_, _, _, _) => 0)
    assert(Multimodal.videoHash56(short) === None)
    // majority3 is the per-bit median: any two agreeing inputs win
    assert(Multimodal.majority3(5L, 5L, 9L) === 5L)
    assert(Multimodal.majority3(0L, -1L, 0x55AAL) === 0x55AAL)
  }

  test("video banded join finds EVERY pair within the Hamming threshold") {
    import spark.implicits._
    val lens = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => (id, t.getBytes("UTF-8").length) }
    assert(lens.nonEmpty)
    val hs = lens.map { case (id, n) => (id, videoFormulaHash(n)) }
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a > b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSeq
    assert(brute.nonEmpty, "fixture must contain video near-dups")
    val expect = brute.groupBy(_._1).map { case (id, ns) =>
      val m = ns.minBy(_._2)
      (id, m._2, m._3)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("dedup_video_dups")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === expect)
    val gotHist = graft.SparkEntry.queries("dedup_video_hist")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    val expectHist = brute.groupBy(_._3).map { case (d, ps) => (d, ps.size.toLong) }
    assert(gotHist === expectHist)
    // incremental: the % 15 == 2 slice screens against the rest
    val incBrute = (for {
      (a, ha) <- hs if a % 15 == 2
      (b, hb) <- hs if b % 15 != 2
      dist = java.lang.Long.bitCount(ha ^ hb) if dist <= 3
    } yield (a, b, dist.toLong)).toSeq
    val incExpect = incBrute.groupBy(_._1).map { case (id, ms) =>
      (id, ms.size.toLong, ms.map(_._3).min)
    }.toSeq.sortBy(_._1)
    val incGot = graft.SparkEntry.queries("dedup_video_incremental")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(incGot === incExpect)
  }

  test("undecodable blobs route to the reject frame; strict mode throws") {
    import spark.implicits._
    // 3 valid full-pixel PNGs + 1 corrupt blob, through the exact
    // dedup pipeline stages (hash frame -> banded join -> star list)
    val valid = (0 until 3).map { i =>
      (100L + i, Png.encodeRgb(9, 9, (x, y, c) =>
        Multimodal.pixelValue(x, y, c, i)))
    }
    val blobs = (valid :+ ((999L, "corrupt bytes, no PNG".getBytes("UTF-8"))))
      .toDF("doc_id", "blob")
    val hf = Multimodal.hashFrame(spark, blobs, "image",
      Multimodal.hashKernel("image")).persist()
    val rejects = hf.filter(col("ph").isNull).select("doc_id")
      .as[Long].collect().toSeq
    assert(rejects === Seq(999L), "exactly the corrupt blob is rejected")
    val dups = Multimodal.starDups(
      Multimodal.hammingNeighborsBounded(hf, Long.MaxValue))
      .as[(Long, Long, Long)].collect()
    // the valid rows still dedup (seeds 0..2 differ by small gradients
    // only if within threshold — just assert the pipeline ran over
    // exactly the 3 decodable rows, none dropped, none crashed)
    assert(hf.filter(col("ph").isNotNull).count() === 3)
    assert(dups.forall(r => r._1 != 999L && r._2 != 999L))
    hf.unpersist()
    // strict posture: the same corrupt blob fails loudly
    spark.conf.set(Multimodal.StrictDecodeConf, "true")
    try {
      val e = intercept[org.apache.spark.SparkException] {
        Multimodal.hashFrame(spark, blobs, "image",
          Multimodal.hashKernel("image")).collect()
      }
      assert(e.getMessage.contains("undecodable") ||
        Option(e.getCause).exists(_.getMessage.contains("undecodable")))
    } finally spark.conf.unset(Multimodal.StrictDecodeConf)
    // the fixture corpus has no rejects in any modality
    for (kind <- Seq("image", "audio", "video"))
      assert(Multimodal.decodeRejects(spark, sf0001, kind).count() === 0L)
  }

  test("bucket-overflow guard: a forced tiny bound keeps perfect recall") {
    import spark.implicits._
    val lens = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => (id, t.getBytes("UTF-8").length) }
    val hs = lens.map { case (id, n) => (id, formulaHash(n)) }
    // buckets above the forced bound exist, so the sub-band path runs
    val bucketSizes = hs.flatMap { case (_, h) =>
      (0 until 4).map(j => (j, (h >> (14 * j)) & 0x3FFF))
    }.groupBy(identity).map(_._2.length)
    assert(bucketSizes.max > 4, s"fixture too uniform: max ${bucketSizes.max}")
    val ph = hs.toSeq.toDF("doc_id", "ph")
    def pairs(bound: Long) =
      Multimodal.hammingNeighborsBounded(ph, bound)
        .as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a > b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(pairs(Long.MaxValue) === brute)
    assert(pairs(4L) === brute,
      "sub-band split of oversized buckets must not lose pairs")
    assert(pairs(1L) === brute, "even an all-hot split stays complete")
    // fast-path pin: with no overflowing bucket the defense must cost
    // nothing in the plan — exactly the one banded self-join, no
    // sub-band explode, no semi-joins (the probe is a driver-side
    // action on the intrinsically bounded sizes aggregate)
    val fast = Multimodal.hammingNeighborsBounded(ph, Long.MaxValue)
    val joins = fast.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size === 1,
      s"no-overflow plan must be the plain banded join, got ${joins.size} joins")
    // the incremental join rides the SAME defense: forced-overflow
    // results equal the unbounded ones (which the oracle gate verifies)
    def inc(bound: Long) =
      Multimodal.bandedIncrementalBounded(ph, 0, bound)
        .as[(Long, Long, Long)].collect().toSet
    val incPlain = inc(Long.MaxValue)
    assert(incPlain.nonEmpty, "fixture has incremental matches")
    assert(inc(4L) === incPlain,
      "sub-band split must not change incremental results")
    assert(inc(1L) === incPlain)
  }

  test("modality clusters equal brute-force connected components") {
    import spark.implicits._
    def bruteClusters(hs: Array[(Long, Long)]): Map[Long, Long] = {
      // tiny union-find over the <= ham-3 pair graph
      val parent = scala.collection.mutable.Map(hs.map(x => x._1 -> x._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      for { (a, ha) <- hs; (b, hb) <- hs if a < b
            if java.lang.Long.bitCount(ha ^ hb) <= 3 } {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      hs.map(x => x._1 -> find(x._1)).toMap
    }
    def docs(mod: Int) = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 3 === mod)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def audioHashOf(t: String): Long = {
      val b = t.getBytes("UTF-8")
      Multimodal.audioHash56((0 until b.length / 2).map(i =>
        ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort.toInt).toArray)
    }
    val modalities: Seq[(String, Int, String => Long)] = Seq(
      ("dedup_phash_clusters", 0, t => formulaHash(t.getBytes("UTF-8").length)),
      ("dedup_audio_clusters", 1, audioHashOf _),
      ("dedup_video_clusters", 2,
        t => videoFormulaHash(t.getBytes("UTF-8").length)))
    for ((q, mod, fh) <- modalities) {
      val hs = docs(mod).map { case (id, t) => (id, fh(t)) }
      val expect = bruteClusters(hs)
      assert(expect.values.toSet.size < hs.length, s"$q: no clusters formed")
      val got = graft.SparkEntry.queries(q)(spark, sf0001)
        .as[(Long, Long)].collect().toMap
      assert(got === expect, s"$q diverges from brute-force components")
    }
  }

  test("decode posture is part of the hash-frame cache key") {
    // a frame cached lenient must not satisfy a later strict session
    // posture (and vice versa): flipping the conf takes effect
    import spark.implicits._
    spark.conf.unset(Multimodal.StrictDecodeConf)
    assert(Multimodal.decodeRejects(spark, sf0001, "image").count() === 0L)
    spark.conf.set(Multimodal.StrictDecodeConf, "true")
    try {
      // same (session, dir, kind): the strict frame is a DIFFERENT
      // cache entry — on the clean fixture both hash identically, so
      // equality here proves the strict path ran without throwing
      assert(Multimodal.decodeRejects(spark, sf0001, "image").count() === 0L)
    } finally spark.conf.unset(Multimodal.StrictDecodeConf)
    intercept[IllegalArgumentException] {
      Multimodal.decodeRejects(spark, sf0001, "pdf")
    }
    intercept[IllegalArgumentException] { Multimodal.hashKernel("imgae") }
  }
}
