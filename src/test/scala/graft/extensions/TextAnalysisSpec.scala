package graft.extensions

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Text-analysis column semantics (pure expressions, no UDFs). */
class TextAnalysisSpec extends SparkTestBase {

  private def one(expr: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(expr).collect()(0).get(0)
  }

  // windows must be counted THROUGH persisted frames and AQE wrappers,
  // via the SAME collector the global gate uses (graft.PlanWalk) — a
  // private re-implementation here could drift and go blind to a
  // wrapper the shared walk learns about later
  private def allWindows(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    graft.PlanWalk.windowKeySets(p)

  test("bigram-frequency plan: NO bg-keyed window, corpus count by skew-splittable join-back over the cached pair frame") {
    // A stopword bigram appears in essentially every document, so a
    // bg-keyed window gathers ≈N_docs rows into ONE task WindowExec
    // buffers whole and AQE cannot split. The corpus frequency must be
    // groupBy(bg) + join-back over the PERSISTED pair frame: both
    // consumers read cached columnar batches (the tokenize+explode
    // lineage runs ONCE, at cache materialization), the groupBy
    // partial-aggregates map-side, and the join is skew-splittable.
    graft.EngineCaches.invalidateAll()
    val df = SparkEntry.queries("text_bigram_freq")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.optimizedPlan
    assert(allWindows(plan).isEmpty,
      s"corpus count must not window (incl. inside caches):\n$plan")
    // the explode lives inside the cached pair frame — both consumers
    // read the cache and never re-run the scan
    val gens = plan.collectWithSubqueries {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.isEmpty, s"explode re-ran outside the pair cache:\n$plan")
    val cacheReads = plan.collectWithSubqueries {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(cacheReads.size == 2, s"expected 2 pair-cache reads:\n$plan")
  }

  test("lm-perplexity plan: NO bg/w1-keyed windows, corpus+history counts by join-back over the cached pair frame") {
    // C(w1 w2) and C(w1 ·) are groupBy + join-back over the persisted
    // (doc, bg, w1, k) frame — a w1-keyed window would buffer a
    // stopword history's whole partition in one unsplittable task
    graft.EngineCaches.invalidateAll()
    val df = SparkEntry.queries("text_lm_perplexity")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.optimizedPlan
    assert(allWindows(plan).isEmpty,
      s"corpus counts must not window (incl. inside caches):\n$plan")
    // the result frame itself is persisted (the shared-score contract):
    // the consumer plan is a read of that cache, and the pair cache is
    // consumed three times INSIDE it (two count branches + scoring)
    val resultCache = plan.collectWithSubqueries {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(resultCache.nonEmpty, s"lm score frame not persisted:\n$plan")
    val nested = resultCache.map(r => graft.PlanWalk.deepCollect(r.cachedPlan) {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
    }.size).sum
    assert(nested == 3, s"expected 3 pair-cache reads inside the score cache, got $nested:\n$plan")
  }

  test("bloom decontamination: sketch invisible in results, might_contain runs scan-side") {
    val exact = SparkEntry.queries("text_contamination")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    val df = SparkEntry.queries("text_contamination_bloom")(spark, "/root/testdata/sf0.001")
    val viaBloom = df.collect().map(_.toSeq).toSeq
    // no-FN contract: the sketch may only ADD candidates (killed by the
    // exact verify), never drop one — results must be identical
    assert(viaBloom === exact)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("might_contain"), s"sketch not in the plan:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("lm score frame is persisted and SHARED: ppl_buckets reads the cache, not the corpus") {
    // text_lm_perplexity, ppl_buckets' cutoffs pass, and ppl_buckets'
    // assignment pass all consume lmDocScores; after the first
    // materialization the other consumers must read the persisted
    // one-row-per-doc frame instead of re-running tokenize+explode
    SparkEntry.queries("text_lm_perplexity")(spark, "/root/testdata/sf0.001").collect()
    val df = SparkEntry.queries("text_ppl_buckets")(spark, "/root/testdata/sf0.001")
    df.collect()
    // pin at the logical level (the physical broadcast stage hides its
    // subtree in the toString): after cache substitution, the cutoffs
    // branch AND the assignment branch are both InMemoryRelations, and
    // NO scan of the documents table survives outside them
    val cached = df.queryExecution.withCachedData
    val inMem = cached.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(inMem.size >= 2,
      s"cutoffs + assignment must both hit the cache:\n$cached")
    val liveScans = cached.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(liveScans.isEmpty,
      s"corpus scan re-ran outside the cache:\n$cached")
  }

  test("bpe training matches an independent in-JVM reference, merges compose") {
    import spark.implicits._
    // independent reference: classic Sennrich algorithm 1 over the same
    // word-frequency table, with pair fusion as an explicit token-list
    // rewrite (no placeholder strings, no String.replace — a different
    // mechanism that must land on the same merge table)
    val freq = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").count().as[(String, Long)].collect().toMap
    var segs: Map[Vector[String], Long] =
      freq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    def fuse(ts: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < ts.length) {
        if (i + 1 < ts.length && ts(i) == a && ts(i + 1) == b) {
          out += (a + b); i += 2 // leftmost, non-overlapping
        } else { out += ts(i); i += 1 }
      }
      out.result()
    }
    // count ties break on the pair's PLACEHOLDER-space bytes (a merged
    // symbol ranks by the round that minted it), mirroring the engine
    var symChar = Map.empty[String, Char]
    def chrOf(sym: String): Char =
      if (sym.length == 1) sym.head else symChar(sym)
    val refMerges = scala.collection.mutable.ArrayBuffer.empty[((String, String), Long)]
    val expect = (1 to 5).map { k =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((ts, f) <- segs; i <- 0 until ts.length - 1)
        counts((ts(i), ts(i + 1))) = counts.getOrElse((ts(i), ts(i + 1)), 0L) + f
      val ((a, b), n) = counts.minBy { case ((x, y), c) =>
        (-c, s"${chrOf(x)}${chrOf(y)}")
      }
      symChar += ((a + b) -> (0xE000 + k).toChar)
      refMerges += (((a, b), n))
      segs = segs.groupMapReduce(e => fuse(e._1, a, b))(_._2)(_ + _)
      (k.toLong, a + b, n)
    }
    val got = SparkEntry.queries("text_bpe_train")(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === expect)

    // ...and applying those merges: per-doc symbol counts from the SAME
    // independent fuse-based segmenter must match text_bpe_apply
    def segment(w: Vector[String]): Vector[String] = {
      var ts = w
      for (((a, b), _) <- refMerges) ts = fuse(ts, a, b)
      ts
    }
    val applyGot = SparkEntry.queries("text_bpe_apply")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    docs.foreach { case (id, text) =>
      val ws = text.split(" ", -1).toVector
      val nSyms = ws.map(w => segment(w.map(_.toString).toVector).length.toLong).sum
      val nChars = ws.map(_.length.toLong).sum
      val (gw, gc, gs) = applyGot(id)
      assert(gw === ws.length.toLong && gc === nChars && gs === nSyms,
        s"doc $id: got ($gw,$gc,$gs) want (${ws.length},$nChars,$nSyms)")
    }
  }

  test("bpe training runs dry gracefully: empty rounds are a suffix, ranks contiguous") {
    // A corpus so small the merge loop exhausts before BpeRounds: one
    // mergeable word. Round 1 learns "ab"; rounds 2..5 find no pair and
    // must emit NOTHING (the SQL oracle mirrors this with an EXISTS
    // guard + identity-COALESCE replaces — validated against DuckDB on
    // this exact corpus: train [(1,'ab',2)], apply [(1,3,5,3,0.6)]).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-dry").toString
    Seq((1L, "ab ab x", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val train = SparkEntry.queries("text_bpe_train")(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    assert(train === Seq((1L, "ab", 2L)))
    val ap = SparkEntry.queries("text_bpe_apply")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(ap === Seq((1L, 3L, 5L, 3L, 0.6)))
  }

  test("classifier-score plan: one explode, weight table BROADCAST, per-doc agg the only shuffle of pairs") {
    val df = SparkEntry.queries("text_classifier_score")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Generate explode".r.findAllMatchIn(plan).length === 1)
    // the model ships as a dim table: it must broadcast, never shuffle
    // the token stream against it
    assert(plan.contains("BroadcastHashJoin"), s"weights not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"shuffle join in plan:\n$plan")
    // keep decides on exact integers: logit >= 0.05 ⇔ sw*20 >= n*1024,
    // so the boolean must agree with the (rounded) score column
    rows.foreach { r =>
      val score = r.getAs[Double]("score")
      val keep = r.getAs[Boolean]("keep")
      if (score > 0.0501) assert(keep, s"score $score but keep=false")
      if (score < 0.0499) assert(!keep, s"score $score but keep=true")
    }
    assert(rows.length === 500)
    // the split is non-degenerate on the fixture corpus
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length)
  }

  test("poly_ngram_hashes: windows equal polyHash of their substrings, short input yields one hash, expression matches kernel") {
    val s = "abcdef"
    assert(Signatures.polyNgramHashes(s, 3).toSeq ===
      (0 to 3).map(i => Signatures.polyHash(s.substring(i, i + 3))))
    assert(Signatures.polyNgramHashes("ab", 3).toSeq ===
      Seq(Signatures.polyHash("ab")))
    assert(Signatures.polyNgramHashes("", 3).toSeq ===
      Seq(Signatures.polyHash("")))
    val viaExpr = one(graft.functions.PolyNgramHashes(col("text"), 3),
      "hello world").asInstanceOf[scala.collection.Seq[Long]]
    assert(viaExpr.toSeq === Signatures.polyNgramHashes("hello world", 3).toSeq)
  }

  test("langid-profile plan: one explode feeds both profile training and doc ranking; model joins broadcast") {
    val df = SparkEntry.queries("text_langid_profile")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length === 500) // every document scored
    // prediction comes from the trained label set
    val langs = Set("de", "en", "es", "fr", "zh")
    assert(rows.forall(r => langs.contains(r.getAs[String]("predicted"))))
    assert(rows.forall(_.getAs[Long]("oop_dist") >= 0L))
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // language counts roll up from the per-doc counts: the trigram
    // explode must appear ONCE, and the L-row language list + L×N
    // profile table must broadcast (the corpus side never shuffles for
    // the model)
    assert("Generate explode".r.findAllMatchIn(plan).length === 1,
      s"explode duplicated:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("stream-quality drains in multiple micro-batches with state carried across them") {
    val rows = SparkEntry.queries("text_stream_quality")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 5) // one row per language
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 500L)
    // the 3-slice source at one file per trigger must have produced 3
    // offset commits — the aggregate really carried state across
    // micro-batches rather than draining in one
    val ckpt = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_streamtext_" +
        s"${spark.sparkContext.applicationId}_root_testdata_sf0_001/ckpt/offsets")
    val batches = Option(ckpt.list()).map(_.count(!_.contains("."))).getOrElse(-1)
    assert(batches === 3, s"expected 3 offset commits, got $batches")
  }

  test("curation funnel: monotone non-increasing stages, non-degenerate, model/benchmark joins broadcast") {
    val df = SparkEntry.queries("text_curation_funnel")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq === Seq(
      "0_raw", "1_clean", "2_exact_dedup", "3_classifier",
      "4_decontaminated"))
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(docs.head === 500L)
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a },
      s"stages must only shrink: ${docs.toSeq}")
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a })
    // non-degenerate on the fixture: the funnel drops documents, and
    // SOME survive to train on
    assert(docs.last > 0L && docs.last < docs.head)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("ppl buckets: score-monotone terciles, near-even split, cutoffs broadcast to the assignment") {
    val df = SparkEntry.queries("text_ppl_buckets")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length === 500)
    // bucket order follows score order: a cleaner doc never lands in a
    // dirtier bucket
    val byBucket = rows.groupBy(_.getAs[Long]("bucket"))
      .view.mapValues(_.map(_.getAs[Double]("avg_logp"))).toMap
    assert(byBucket.keySet === Set(1L, 2L, 3L))
    assert(byBucket(1L).min >= byBucket(2L).max)
    assert(byBucket(2L).min >= byBucket(3L).max)
    // near-even split (exact n/3 up to score-tie mass at the cutoffs)
    byBucket.values.foreach(b =>
      assert(math.abs(b.length - 500 / 3) <= 5, s"skewed: ${b.length}"))
    assert(rows.forall(r =>
      r.getAs[Boolean]("keep") === (r.getAs[Long]("bucket") <= 2L)))
    // the cutoffs cross back in as a broadcast — the corpus side is
    // never globally sorted for the assignment
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("token count follows split semantics incl. degenerate inputs") {
    assert(one(TextAnalysis.tokenCount(col("text")), "a b c") === 3L)
    assert(one(TextAnalysis.tokenCount(col("text")), "solo") === 1L)
    // empty string still yields one (empty) token — string_split semantics
    assert(one(TextAnalysis.tokenCount(col("text")), "") === 1L)
  }

  test("stopword ratio and quality score are bounded") {
    val q = one(round(TextAnalysis.qualityScore(col("text")), 4),
      "the quick brown fox jumps over a lazy dog").asInstanceOf[Double]
    assert(q >= 0.0 && q <= 1.0)
    val r = one(TextAnalysis.stopwordRatio(col("text")), "the the the")
      .asInstanceOf[Double]
    assert(r === 1.0)
  }

  test("langId flags stopword-bearing text as en") {
    assert(one(TextAnalysis.langId(col("text")),
      "the cat sat on the mat with a hat") === "en")
    assert(one(TextAnalysis.langId(col("text")),
      "lorem ipsum dolor sit amet consectetur") === "unknown")
  }

  test("fingerprint is case-insensitive and content-sensitive") {
    val a = one(TextAnalysis.fingerprint(col("text")), "Hello World")
    val b = one(TextAnalysis.fingerprint(col("text")), "hello world")
    val c = one(TextAnalysis.fingerprint(col("text")), "hello worlds")
    assert(a === b)
    assert(a !== c)
  }

  test("repetition measures separate repetitive docs from diverse ones") {
    val rep = SparkEntry.queries("text_repetition")(spark, sf0001)
      .select("doc_id", "distinct_ratio", "top_token_frac", "keep")
      .collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val dr = r.getDouble(1); val tf = r.getDouble(2)
      assert(dr > 0.0 && dr <= 1.0, s"doc ${r.getLong(0)}: distinct_ratio $dr")
      assert(tf > 0.0 && tf <= 1.0, s"doc ${r.getLong(0)}: top_token_frac $tf")
      // a doc where every token is distinct cannot have a dominant token
      if (dr == 1.0) assert(tf <= 0.5)
    }
  }

  test("sequence packing conserves tokens and numbers bins contiguously") {
    import spark.implicits._
    val packed = SparkEntry.queries("text_pack_sequences")(spark, sf0001)
      .select($"source", $"seq_id", $"n_docs", $"n_tokens_started")
      .as[(String, Long, Long, Long)].collect()
    // conservation: every document's tokens land in exactly one bin row
    val totalTokens = graft.Tables.documents(spark, sf0001)
      .select(TextAnalysis.tokenCount(col("text"))).as[Long].collect().sum
    assert(packed.map(_._4).sum === totalTokens)
    assert(packed.forall(_._3 >= 1))
    // bins are contiguous 0..max within each source (concat-and-chunk
    // cannot skip a sequence: every token position is covered)
    packed.groupBy(_._1).foreach { case (src, rows) =>
      val ids = rows.map(_._2).sorted
      assert(ids.toSeq === (0L until ids.length).toSeq, s"source $src: $ids")
    }
  }

  test("mixture rebalance keeps the smallest source whole and equalizes the rest") {
    import spark.implicits._
    val rows = SparkEntry.queries("text_mix_rebalance")(spark, sf0001)
      .select($"source", $"n_docs", $"n_docs_kept", $"n_tokens", $"n_tokens_kept")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length >= 2, "fixture should have several sources")
    val minTok = rows.map(_._4).min
    // the smallest source's keep threshold is always true — kept whole
    rows.filter(_._4 == minTok).foreach { r =>
      assert(r._3 === r._2); assert(r._5 === r._4)
    }
    rows.foreach { r =>
      assert(r._3 <= r._2 && r._5 <= r._4)
      // every source's kept tokens land near the smallest source's budget
      // (hash-uniform selection: loose statistical envelope)
      assert(r._5 > minTok / 2 && r._5 < minTok * 3 / 2,
        s"${r._1}: kept ${r._5} vs budget $minTok")
    }
  }

  test("filter funnel reasons partition the corpus exactly") {
    val funnel = SparkEntry.queries("text_filter_funnel")(spark, sf0001).collect()
    val total = funnel.map(_.getLong(1)).sum
    assert(total === graft.Tables.documents(spark, sf0001).count())
    val reasons = funnel.map(_.getString(0)).toSet
    assert(reasons.subsetOf(
      Set("keep", "too_short", "too_stoppy", "repetitive", "low_quality")))
  }

  test("overlap chunking tiles every document: stride-spaced starts, full coverage") {
    import org.apache.spark.sql.functions._
    val chunks = SparkEntry.queries("text_chunk_overlap")(spark, sf0001)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("tok_sum"),
        max("n_tokens").as("max_len"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chunks"),
        r.getAs[Long]("tok_sum"), r.getAs[Long]("max_len")))
    val docLens = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.nonEmpty && chunks.length === docLens.size)
    chunks.foreach { case (id, nChunks, tokSum, maxLen) =>
      val n = docLens(id)
      // starts at 0, 30, 60, … while < n → ceil(n / 30) chunks
      assert(nChunks === (n + 29) / 30, s"doc $id: $nChunks chunks for $n tokens")
      assert(maxLen <= 40)
      // full coverage with overlap: all chunks are 40 long except the
      // tail windows, so the sum is exactly Σ min(40, n - 30k)
      val expected = (0L until nChunks).map(k => math.min(40L, n - 30 * k)).sum
      assert(tokSum === expected, s"doc $id")
    }
  }

  test("PII redaction finds every injected email/phone/IP and leaves zero residual") {
    val rows = SparkEntry.queries("text_pii_redact")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val docs = r.getAs[Long]("n_docs")
      // exactly one synthetic email/phone/IP was injected per document —
      // the detectors must find each exactly once, no over- or under-match
      assert(r.getAs[Long]("n_emails") === docs, s"emails in $r")
      assert(r.getAs[Long]("n_phones") === docs, s"phones in $r")
      assert(r.getAs[Long]("n_ips") === docs, s"ips in $r")
      // and the scrubbed corpus must scan clean
      assert(r.getAs[Long]("residual_pii") === 0L, s"residual in $r")
    }
  }

  test("LM perplexity matches a brute-force smoothed bigram model") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // brute force with the module's bigram convention: a 1-token doc
    // contributes its lone token as a degenerate "bigram"
    def bigrams(t: String): Seq[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 2) Seq(toks.mkString(" "))
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    }
    val all = docs.flatMap { case (id, t) => bigrams(t).map(id -> _) }
    val c12 = all.groupBy(_._2).map { case (bg, v) => bg -> v.length.toLong }
    val c1 = c12.groupBy(_._1.split(" ")(0)).map { case (w, v) => w -> v.values.sum }
    val v = docs.flatMap(_._2.split(" ", -1)).distinct.length.toLong
    val expected = all.groupBy(_._1).map { case (id, bgs) =>
      val lps = bgs.map { case (_, bg) =>
        math.log((c12(bg) + 1).toDouble / (c1(bg.split(" ")(0)) + v))
      }
      id -> (bgs.length.toLong, lps.sum / lps.length)
    }
    val got = SparkEntry.queries("text_lm_perplexity")(spark, sf0001)
      .select($"doc_id", $"n_bigrams", $"avg_logp", $"ppl")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length === expected.size)
    for ((id, n, avg, ppl) <- got) {
      val (en, eavg) = expected(id)
      assert(n === en, s"n_bigrams for doc $id")
      // engine value is round(·,4); brute-force sum order may differ by ulps
      assert(math.abs(avg - eavg) <= 5.001e-5, s"avg_logp for doc $id: $avg vs $eavg")
      assert(math.abs(ppl - math.exp(-eavg)) <= 0.006, s"ppl for doc $id")
      // smoothed probabilities are in (0, 1): log is strictly negative
      assert(avg < 0 && ppl > 1, s"doc $id out of range")
    }
  }
}
