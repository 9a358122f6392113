package graft.extensions

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`.
  *
  * All operators are pure column expressions (whole-stage-codegen friendly,
  * no UDFs), so they scale linearly with input partitions: at 100 TB the
  * only cost is the scan plus per-row expression evaluation — no shuffle
  * except the final aggregations.
  */
object TextAnalysis extends QueryModule {

  private val stopwords = Seq("the", "a")

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("bigint")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*))).cast("bigint")

  /** Fraction of stopword tokens — integer/integer division, bit-stable. */
  def stopwordRatio(text: Column): Column =
    stopwordCount(text) * lit(1.0) / tokenCount(text)

  /** Mean token length: total chars minus the (n-1) separators, over n. */
  def avgTokenLen(text: Column): Column =
    (length(text) - tokenCount(text) + lit(1.0)) / tokenCount(text)

  /** Composite quality score in [0,1]: longer docs score higher, capped at
    * 100 tokens; heavily-stopworded docs are discounted. Deterministic
    * arithmetic only — mirrors reference-style quality heuristics. */
  def qualityScore(text: Column): Column =
    least(lit(1.0), tokenCount(text) / lit(100.0)) * (lit(1.0) - stopwordRatio(text))

  /** Stopword-frequency language heuristic (an n-gram/stopword language ID:
    * English function words are strong discriminators). */
  def langId(text: Column): Column =
    when(stopwordRatio(text) > 0.05, "en").otherwise("unknown")

  /** Content fingerprint: md5 of the lower-cased text. Stable across
    * engines, usable as an exact-dedup key. */
  def fingerprint(text: Column): Column = md5(lower(text).cast("binary"))

  // ---- queries ----

  private def tokenCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("bigint").as("n_chars_computed"), col("n_chars"))
      .orderBy(col("doc_id"))

  private val tokenCountsSql =
    """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      | CAST(length(text) AS BIGINT) AS n_chars_computed, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  private def quality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      round(stopwordRatio(col("text")), 4).as("stopword_ratio"),
      round(avgTokenLen(col("text")), 4).as("avg_token_len"),
      round(qualityScore(col("text")), 4).as("quality"))
      .orderBy(col("doc_id"))

  private val qualitySql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop,
      |    length(text) AS n_chars
      |  FROM documents)
      |SELECT doc_id, n_tokens,
      |  round(n_stop * 1.0 / n_tokens, 4) AS stopword_ratio,
      |  round((n_chars - n_tokens + 1.0) / n_tokens, 4) AS avg_token_len,
      |  round(least(1.0, n_tokens / 100.0)
      |        * (1.0 - n_stop * 1.0 / n_tokens), 4) AS quality
      |FROM t ORDER BY doc_id""".stripMargin

  private def langid(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      langId(col("text")).as("predicted_lang"))
      .orderBy(col("doc_id"))

  private val langidSql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) * 1.0
      |      / len(string_split(text, ' ')) AS ratio
      |  FROM documents)
      |SELECT doc_id, lang AS labeled_lang,
      |  CASE WHEN ratio > 0.05 THEN 'en' ELSE 'unknown' END AS predicted_lang
      |FROM t ORDER BY doc_id""".stripMargin

  private def fingerprints(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  private val fingerprintsSql =
    """SELECT doc_id, md5(lower(text)) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- BPE-ish subword counting: letter runs, digit runs, and single
  // punctuation marks each count as one unit — the shape (not the vocab)
  // of a byte-pair tokenizer's pre-tokenization pass.
  private val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  private def bpeTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
        .cast("bigint").as("n_bpe"),
      tokenCount(col("text")).as("n_words"))
      .orderBy(col("doc_id"))

  private val bpeTokensSql =
    s"""SELECT doc_id,
       | CAST(len(regexp_extract_all(text, '$BpePattern')) AS BIGINT) AS n_bpe,
       | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- BPE merge TRAINING (Sennrich, Haddow & Birch 2016, "Neural
  // Machine Translation of Rare Words with Subword Units", ACL — public
  // paper, algorithm 1): iteratively find the most frequent adjacent
  // symbol pair over the corpus and fuse it into one symbol — the loop
  // that LEARNS a tokenizer's merge table, where text_bpe_tokens only
  // applies a pre-tokenization shape. Scale shape: pair statistics are
  // computed over the DISTINCT-WORD table weighted by corpus frequency
  // (the vocabulary, shuffled once into a persisted frame — never the
  // token stream), each round is one scan of that frame plus a top-1
  // aggregate, and the only driver-side data is the single winning pair
  // per round (metadata-sized by construction). Segmentations live as
  // plain strings with merged pairs fused into private-use placeholder
  // chars, so applying merges is String.replace — leftmost
  // non-overlapping on BOTH engines (java.lang.String.replace and SQL
  // replace() share that contract), which IS BPE's greedy application
  // order. Ranking ties break on the raw pair's UTF-8 bytes (binary
  // collation on both engines).
  //
  // Cost envelope and operating range: training is O(BpeRounds ×
  // |vocabulary|) — one scan of the persisted distinct-word frequency
  // table plus one top-1 aggregate PER ROUND, because classic BPE's
  // sequential dependency (round k's stats depend on round k-1's merge)
  // admits no exact batching. 5 rounds here is deliberate demo scale
  // proving the loop; a production 32k-merge tokenizer over this layout
  // would pay 32k vocab scans and instead batches top-K NON-OVERLAPPING
  // pairs per scan (the standard batched-BPE refinement, an
  // approximation of the sequential order) or moves pair-stat deltas to
  // a driver-side heap once the vocabulary fits one node — both change
  // the learned table, so this operator keeps the exact sequential
  // semantics the oracle replays. Corpus precondition: text must not
  // contain private-use code points U+E000..U+E0FF (the placeholder
  // alphabet the merge chain fuses into — a corpus PUA char would be
  // indistinguishable from a placeholder on BOTH engines and
  // mis-segment identically); the fixture corpus is ASCII.
  private val BpeRounds = 5

  /** Learn the merge table: (raw pair in placeholder space, placeholder
    * char, corpus count at merge time) per round — the shared core of
    * text_bpe_train (which reports it) and text_bpe_apply (which
    * segments with it). Driver-sized by construction. */
  private def bpeMerges(s: SparkSession, d: String)
  : Vector[(String, Char, Long)] = {
    import s.implicits._
    val words = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .as[(String, Long)]
      .persist()
    var merges = Vector.empty[(String, Char, Long)]
    for (k <- 1 to BpeRounds) {
      val ms = merges
      words.mapPartitions(_.flatMap { case (w, f) =>
        var sgs = w
        ms.foreach { case (p, ph, _) => sgs = sgs.replace(p, ph.toString) }
        (0 until sgs.length - 1).iterator
          .map(i => (sgs.substring(i, i + 2), f))
      }).toDF("p", "f")
        .groupBy(col("p")).agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("p"))
        .limit(1)
        .as[(String, Long)].collect()
        .foreach { case (pair, n) =>
          merges :+= ((pair, (0xE000 + k).toChar, n))
        }
    }
    words.unpersist()
    merges
  }

  private def bpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val merges = bpeMerges(s, d)
    val out = merges.zipWithIndex.map { case ((pair, _, n), idx) =>
      // full expansion: merge k's pair can only contain placeholders
      // < k, each of whose raw pairs only contains placeholders below
      // IT — one descending pass resolves everything
      var tok = pair
      (idx to 0 by -1).foreach { i =>
        tok = tok.replace(merges(i)._2.toString, merges(i)._1)
      }
      ((idx + 1).toLong, tok, n)
    }
    out.toDF("rank", "token", "n")
  }

  /** The unrolled training CTE prefix shared by both oracles; every
    * bpe_seg$k carries the ORIGINAL word alongside its current
    * segmentation so the apply oracle can join segment lengths back to
    * the token stream. */
  private def bpeTrainCtes: String = {
    val roundCtes = (1 to BpeRounds).map { k =>
      s"""bpe_p$k AS (
         |  SELECT substr(s, CAST(i AS INT), 2) AS p, sum(f) AS n
         |  FROM bpe_seg${k - 1}, unnest(range(1, len(s))) AS t$k(i)
         |  GROUP BY p),
         |bpe_b$k AS (
         |  SELECT p, CAST(n AS BIGINT) AS n FROM bpe_p$k
         |  ORDER BY n DESC, p LIMIT 1),
         |bpe_seg$k AS (
         |  SELECT w, replace(s,
         |    COALESCE((SELECT p FROM bpe_b$k), chr(${0xE000 + k})),
         |    chr(${0xE000 + k})) AS s, f
         |  FROM bpe_seg${k - 1})""".stripMargin
    }.mkString(",\n")
    s"""bpe_seg0 AS (
       |  SELECT w, w AS s, count(*) AS f FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) >= 2 GROUP BY w),
       |$roundCtes""".stripMargin
  }

  private def bpeTrainSql: String = {
    // A round with NO pair (tiny or fully-merged corpus) leaves bpe_b$k
    // empty: its seg CTE COALESCEs to an identity replace, its output
    // row is suppressed by the EXISTS guard (the engine likewise skips
    // the merge), and the expansion chain COALESCEs the missing pair to
    // '' — replacing an absent placeholder with '' is identity. Empty
    // rounds are necessarily a SUFFIX (no pair now ⇒ no pair ever
    // after), so surviving ranks stay contiguous on both engines.
    val rows = (1 to BpeRounds).map { k =>
      val tok = (k - 1 to 1 by -1).foldLeft(s"(SELECT p FROM bpe_b$k)") {
        (acc, j) =>
          s"replace($acc, chr(${0xE000 + j}), " +
            s"COALESCE((SELECT p FROM bpe_b$j), ''))"
      }
      s"SELECT CAST($k AS BIGINT) AS rank, $tok AS token, " +
        s"(SELECT n FROM bpe_b$k) AS n WHERE EXISTS (SELECT 1 FROM bpe_b$k)"
    }.mkString("\nUNION ALL ")
    s"""WITH $bpeTrainCtes
       |$rows
       |ORDER BY rank""".stripMargin
  }

  // ---- applying the learned merge table: per-doc segmentation stats.
  // The measurable EFFECT of bpe_train — how many symbols each document
  // tokenizes into under the learned merges vs its raw character count
  // (the compression a tokenizer buys). Scale shape: the merge table is
  // DRIVER-SIZED (BpeRounds pairs) and rides the same replace chain as
  // training; segmentation lengths are computed once per DISTINCT word
  // and joined back to the token stream on the word (the vocabulary is
  // the small side — at fixture scale it broadcasts, at 100 TB it's a
  // plain equi-join AQE can pick a strategy for).
  private def bpeApply(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the merge table is driver-sized (BpeRounds pairs); training is
    // deterministic, so re-deriving it is the uncached cost of one
    // vocabulary scan per round
    val merges = bpeMerges(s, d)
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val segLen = toks.select(col("w")).distinct().as[String]
      .map { w =>
        var sgs = w
        merges.foreach { case (p, ph, _) => sgs = sgs.replace(p, ph.toString) }
        (w, sgs.length.toLong)
      }
      .toDF("w", "n_syms")
    toks.join(segLen, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("bigint").as("n_chars"),
        sum(col("n_syms")).as("n_syms"))
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_syms"),
        round(col("n_syms") * lit(1.0) / col("n_chars"), 4).as("compression"))
      .orderBy(col("doc_id"))
  }

  private def bpeApplySql: String =
    // bpe_seg$BpeRounds covers words of length >= 2 (1-char words have
    // no pairs and segment as themselves — COALESCE supplies them)
    s"""WITH $bpeTrainCtes,
       |toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |seglen AS (
       |  SELECT t.w, CAST(len(COALESCE(g.s, t.w)) AS BIGINT) AS n_syms
       |  FROM (SELECT DISTINCT w FROM toks) t
       |  LEFT JOIN bpe_seg$BpeRounds g ON g.w = t.w)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(t.w)) AS BIGINT) AS n_chars,
       |  CAST(sum(l.n_syms) AS BIGINT) AS n_syms,
       |  round(sum(l.n_syms) * 1.0 / sum(len(t.w)), 4) AS compression
       |FROM toks t JOIN seglen l ON l.w = t.w
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- whole-document polynomial fingerprint via the native poly_hash
  // Catalyst expression (codegen'd; same kernel as the char-ngram dedup
  // base hash) — an order-sensitive content id that is cheaper than md5
  // and exactly replayable in the oracle.
  private def polyFp(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      graft.functions.PolyHash(col("text")).as("poly_fp"))
      .orderBy(col("doc_id"))

  private val polyFpSql =
    s"""SELECT doc_id,
       | list_reduce(list_transform(range(1, len(text)+1),
       |   j -> CAST(unicode(substr(text, j, 1)) AS BIGINT)),
       |   (a, b) -> (a * ${Signatures.PolyB} + b) % ${Signatures.MinhashP}) AS poly_fp
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- hashed-linear classifier inference (fastText-shaped, Joulin et
  // al. 2016, arXiv:1607.01759 — the model family CCNet/LLaMA-style
  // pipelines use for quality filtering; public papers): every token
  // hashes into one of [[ClsDim]] feature buckets, the document logit is
  // the mean bucket weight, keep = logit ≥ 0.05. The PLAN is the
  // production shape for model inference at corpus scale: one explode,
  // bucket ids by the codegen'd poly_hash, the weight table a
  // BROADCAST dim join (a learned model ships as a file; at 100 TB the
  // 4096-row table broadcasts once, the only shuffle is the per-doc
  // aggregate). The weights here derive from a fixed integer formula so
  // the DuckDB oracle reconstructs the identical model; the keep
  // decision compares exact INTEGERS (sum-of-weight-ints
  // cross-multiplied against the threshold) so no float boundary can
  // disagree between engines — floats appear only in rounded display
  // columns.
  private val ClsDim = 4096L

  /** THE model: bucketed weights and the keep rule — classifierScore
    * reports them per doc, curationFunnel filters by them; one
    * implementation each so the two can never drift. */
  private def clsWeights(s: SparkSession): DataFrame =
    s.range(ClsDim).select(
      col("id").as("bucket"),
      (((col("id") * 1103515245L) + 12345L) % 2048L - 1024L).as("w_int"))

  private def clsBuckets(df: DataFrame): DataFrame = df
    .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    .select(col("doc_id"),
      (graft.functions.PolyHash(col("tok")) % ClsDim).as("bucket"))

  /** logit >= 0.05 on exact integers: Σw·20 >= n·1024. */
  private def clsKeep(sw: Column, n: Column): Column =
    sw * 20L >= n * 1024L

  private def classifierScore(s: SparkSession, d: String): DataFrame = {
    val weights = clsWeights(s)
    val feats = clsBuckets(Tables.documents(s, d))
    feats.join(broadcast(weights), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w_int")).as("sw"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sw").cast("double") / (col("n_tokens") * 1024.0), 4)
          .as("score"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(col("sw").cast("double") / (col("n_tokens") * 1024.0)))), 4)
          .as("p_keep"),
        clsKeep(col("sw"), col("n_tokens")).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** THE model's weight table in SQL — emits CTEs `wbuckets`/`wweights`
    * (shared by classifierScoreSql and curationFunnelSql so the two
    * oracles can never diverge from each other; [[clsWeights]] is the
    * Spark twin). */
  private def clsWeightsSqlCtes =
    s"""wbuckets AS (
       |  SELECT unnest(range(0, $ClsDim)) AS bucket),
       |wweights AS (
       |  SELECT bucket, (bucket*1103515245 + 12345) % 2048 - 1024 AS w_int
       |  FROM wbuckets)""".stripMargin

  private def classifierScoreSql =
    s"""WITH $clsWeightsSqlCtes,
       |toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |feats AS (
       |  SELECT doc_id, (${phSql("tok")}) % $ClsDim AS bucket
       |  FROM toks),
       |agg AS (
       |  SELECT f.doc_id, count(*) AS n_tokens,
       |    CAST(sum(w.w_int) AS BIGINT) AS sw
       |  FROM feats f JOIN wweights w USING (bucket) GROUP BY 1)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  round(sw / (n_tokens * 1024.0), 4) AS score,
       |  round(1.0 / (1.0 + exp(-(sw / (n_tokens * 1024.0)))), 4) AS p_keep,
       |  (sw * 20 >= n_tokens * 1024) AS keep
       |FROM agg ORDER BY doc_id""".stripMargin

  // ---- profile-based language ID (Cavnar & Trenkle 1994, "N-Gram-Based
  // Text Categorization" — the classic rank-profile method fastText
  // displaced; public paper): per-language character-trigram profiles
  // are TRAINED from the corpus's own labels (top-N grams by frequency,
  // rank order), each document's trigram ranking is compared to every
  // profile by out-of-place distance (Σ |doc_rank − profile_rank|,
  // unmatched grams pay the max penalty), argmin predicts. The corpus
  // text here is synthetic so accuracy is chance — the operator's value
  // is the SHAPE: profiles TRAIN ONCE per (session, dir) and cache as
  // metadata (L×N rows, the k-means-codebook treatment), scoring is one
  // explode with the model broadcast as a local relation, fanning each
  // doc's N grams out L ways — key-partitioned shuffles only,
  // exact-integer distances with total tie-breaks so the oracle
  // replays bit for bit.
  private val LangProfSize = 20
  /** Language ID reads a PREFIX, not the document: the signal saturates
    * within a few hundred characters (every production identifier —
    * CLD, fastText langid — samples), and the trigram explode is the
    * operator's whole cost: the prefix bounds it at O(docs), not
    * O(corpus characters). */
  private val LangIdPrefix = 256

  // grams travel as their poly_hash (the codegen'd one-pass
  // PolyNgramHashes kernel): the declarative substring-per-position
  // formulation ran on the interpreted HOF path and was the whole cost
  // of the query. Profile matching needs only gram IDENTITY, never the
  // gram text, so hashed keys lose nothing (a collision is the same
  // collision in the oracle's replay).
  private def gramsOf(s: SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        substring(col("text"), 1, LangIdPrefix).as("t"))
      // the explode+hash kernel is CPU-bound and otherwise runs on the
      // handful of scan splits the single documents file yields (measured:
      // the docGramCache fill was one 0.53 s job over 5 tasks at 32
      // cores). The pre-explode rows are doc_id+lang+a 256-char prefix —
      // KBs per doc — so spreading THEM across the cores is a near-free
      // shuffle that parallelizes the expensive part (guide §2.5 input
      // parallelism; §8's rule — move the light proxy, not the payload).
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.PolyNgramHashes(col("t"), 3)).as("g"))

  /** Per-doc trigram counts, persisted per (session, dir): the trigram
    * explode over the corpus prefixes is the whole cost of the langid
    * family, and BOTH profile training and document scoring reduce from
    * this one frame (the oracle's own CTE chain derives `lc` from `dc`
    * the same way) — share one explode instead of running it per
    * consumer. */
  private val docGramCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), DataFrame]

  private def docGramCounts(s: SparkSession, d: String): DataFrame =
    graft.CacheFill(docGramCache, (graft.SessionKeys(s), d)) {
      gramsOf(s, d)
        .groupBy(col("doc_id"), col("lang"), col("g"))
        .agg(count(lit(1)).as("c"))
        // SER level: this frame is O(docs × distinct prefix trigrams) —
        // the whole corpus's trigram profile at 100 TB — and the default
        // deserialized MEMORY_AND_DISK level holds it as open Java rows.
        // Serialized columnar blocks are several× smaller, so eviction/
        // spill starts that much later (guide §5); the two consumers
        // each read it exactly once, so the per-read deserialization is
        // noise against the explode it replaces.
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    }

  /** Trained profiles per (session, dir): TRAIN ONCE, score many — the
    * model is L×N rows, metadata-sized like the k-means codebook
    * ([[Similarity.centroids]]'s pattern), so it collects to the driver
    * and re-enters scoring as a local relation. Without this the
    * broadcast side of the scoring join would re-run the corpus
    * explode per query (broadcast subtrees reuse no exchanges). */
  private val langProfileCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), Seq[(String, Long, Int)]]

  private[extensions] def langProfiles(s: SparkSession, d: String)
  : Seq[(String, Long, Int)] =
    graft.CacheFill(langProfileCache, (graft.SessionKeys(s), d)) {
      // Σ_doc c per (lang, g) ≡ count(*) per (lang, g) over the raw
      // grams — exact integers, and one shared explode with scoring
      val langCounts = docGramCounts(s, d).groupBy(col("lang"), col("g"))
        .agg(sum(col("c")).as("c"))
      val profW =
        Window.partitionBy(col("lang")).orderBy(col("c").desc, col("g"))
      langCounts.withColumn("prank", row_number().over(profW))
        .filter(col("prank") <= LangProfSize)
        .select(col("lang"), col("g"), col("prank"))
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    }

  def invalidateCaches(): Unit = {
    graft.CacheFill.invalidate(langProfileCache)(_ => ())
    graft.CacheFill.invalidate(docGramCache)(_.unpersist())
    graft.CacheFill.invalidate(lmScoreCache)(_.unpersist())
    graft.CacheFill.invalidate(evalGramsCache)(_.unpersist())
    graft.CacheFill.invalidate(bigramPairCache)(_.unpersist())
    graft.CacheFill.invalidate(lmPairCache)(_.unpersist())
  }

  private def langidProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val profiles = langProfiles(s, d).toDF("plang", "g", "prank")
    val langs = profiles.select(col("plang")).distinct()
    val docCounts = docGramCounts(s, d) // shared with profile training
    val docW = Window.partitionBy(col("doc_id")).orderBy(col("c").desc, col("g"))
    val docTop = docCounts.withColumn("drank", row_number().over(docW))
      .filter(col("drank") <= LangProfSize)
    val scored = docTop.crossJoin(broadcast(langs))
      .join(broadcast(profiles), Seq("plang", "g"), "left")
      .groupBy(col("doc_id"), col("lang"), col("plang"))
      .agg(sum(coalesce(abs(col("drank") - col("prank")),
        lit(LangProfSize.toLong))).as("oop"))
    val best = Window.partitionBy(col("doc_id")).orderBy(col("oop"), col("plang"))
    scored.withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("plang").as("predicted"),
        col("oop").cast("bigint").as("oop_dist"),
        (col("plang") === col("lang")).as("is_match"))
      .orderBy(col("doc_id"))
  }

  private val langidProfileSql =
    s"""WITH pre AS (
       |  SELECT doc_id, lang, substr(text, 1, $LangIdPrefix) AS t
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, lang,
       |    unnest(list_transform(
       |      list_transform(range(0, greatest(len(t)-2, 1)),
       |        i -> substr(t, i+1, 3)),
       |      w -> ${phSql("w")})) AS g
       |  FROM pre),
       |dc AS (SELECT doc_id, lang, g, count(*) AS c FROM grams GROUP BY 1,2,3),
       |lc AS (SELECT lang, g, CAST(sum(c) AS BIGINT) AS c FROM dc GROUP BY 1,2),
       |prof AS (SELECT lang AS plang, g, prank FROM (
       |  SELECT lang, g,
       |    row_number() OVER (PARTITION BY lang ORDER BY c DESC, g) AS prank
       |  FROM lc) WHERE prank <= $LangProfSize),
       |dt AS (SELECT doc_id, lang, g, drank FROM (
       |  SELECT doc_id, lang, g,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS drank
       |  FROM dc) WHERE drank <= $LangProfSize),
       |langs AS (SELECT DISTINCT plang FROM prof),
       |scored AS (
       |  SELECT d.doc_id, d.lang, l.plang,
       |    CAST(sum(coalesce(abs(d.drank - p.prank), $LangProfSize)) AS BIGINT) AS oop
       |  FROM dt d CROSS JOIN langs l
       |  LEFT JOIN prof p ON p.plang = l.plang AND p.g = d.g
       |  GROUP BY 1, 2, 3)
       |SELECT doc_id, lang, plang AS predicted, oop AS oop_dist,
       |  (plang = lang) AS is_match
       |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |        ORDER BY oop, plang) AS rn FROM scored)
       |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // ---- deterministic stratified sampling: keep doc_id iff
  // poly_hash(doc_id) ≡ 0 (mod 20) — a ~5% sample that is reproducible
  // across runs, engines and retries (no RNG), joinable (the same ids
  // sample everywhere), and embarrassingly parallel. This is how a
  // 100 TB pipeline samples: a pure filter ahead of every shuffle.
  private def sampleStratified(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(graft.functions.PolyHash(col("doc_id").cast("string")) % 20 === 0)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_id"))
      .orderBy(col("lang"))

  private val sampleStratifiedSql =
    s"""SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_id
       |FROM documents
       |WHERE list_reduce(list_transform(range(1, len(CAST(doc_id AS VARCHAR))+1),
       |    j -> CAST(unicode(substr(CAST(doc_id AS VARCHAR), j, 1)) AS BIGINT)),
       |    (a, b) -> (a * ${Signatures.PolyB} + b) % ${Signatures.MinhashP}) % 20 = 0
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ---- top terms per language: the explode-then-aggregate shape. The
  // groupBy gets map-side partial aggregation for free, so the shuffle
  // carries (lang, term, partial_count) — at 100 TB that is the difference
  // between shuffling 35M exploded tokens and shuffling the distinct-term
  // footprint. Top-5 folds into a per-lang window on the aggregated set.
  private def topTerms(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("term"))
      .filter(length(col("term")) >= 3)
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("term"))
    counts.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= 5)
      .orderBy(col("lang"), col("rk"))
  }

  private val topTermsSql =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
      |counts AS (
      |  SELECT lang, term, count(*) AS n FROM tok
      |  WHERE length(term) >= 3 GROUP BY lang, term),
      |ranked AS (
      |  SELECT lang, term, n, CAST(row_number() OVER (
      |    PARTITION BY lang ORDER BY n DESC, term) AS BIGINT) AS rk
      |  FROM counts)
      |SELECT lang, term, n, rk FROM ranked WHERE rk <= 5
      |ORDER BY lang, rk""".stripMargin

  // ---- TF-IDF: each document's most characteristic term. Classic shape:
  // explode → per-(doc,term) tf → per-term df → broadcast the corpus size
  // (computed as a 1-row aggregate crossed in, NOT a driver-side count —
  // keeps the whole thing one lazy plan) → score → per-doc top-1 window.
  // Ranking uses the ROUNDED score with the term as tiebreak, so the
  // order is insensitive to last-ulp ln() differences across engines.
  private def tfidfTop(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val t = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(length(col("term")) >= 3)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = t.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = t.join(df_, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n").cast("double") / col("dfreq")), 4)
          .as("tfidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"))
  }

  private val tfidfTopSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |t AS (SELECT doc_id, term, count(*) AS tf FROM toks
      |      WHERE length(term) >= 3 GROUP BY 1, 2),
      |d AS (SELECT term, count(*) AS dfreq FROM t GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |s AS (SELECT t.doc_id, t.term,
      |        round(t.tf * ln(CAST(n.n AS DOUBLE) / d.dfreq), 4) AS tfidf
      |      FROM t JOIN d USING (term) CROSS JOIN n)
      |SELECT doc_id, term, tfidf FROM s
      |QUALIFY row_number() OVER (PARTITION BY doc_id
      |  ORDER BY tfidf DESC, term) = 1
      |ORDER BY doc_id""".stripMargin

  // ---- composite cleaning pipeline: quality gates + exact dedup in one
  // pass — the C4-style "filter then keep one representative per content
  // fingerprint" shape. Gates and dedup are both shuffle-by-fp only; at
  // 100 TB the filters run scan-side (pushed ahead of the shuffle) and
  // the dedup is ONE partial-aggregated groupBy: keep-first-by-doc_id IS
  // min_by(doc_id) ([[Dedup]]'s exactGroups idiom), so a hot fingerprint
  // — the same boilerplate page crawled millions of times, routine — is
  // reduced to one candidate row PER MAP TASK before the shuffle instead
  // of buffering the whole duplicate cluster in one window task that AQE
  // cannot split.
  private def cleanCorpus(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      tokenCount(col("text")).as("n_tokens"),
      round(qualityScore(col("text")), 4).as("quality"),
      fingerprint(col("text")).as("fp"))
      .filter(col("n_tokens") >= 10 && col("quality") >= 0.2)
      .groupBy(col("fp"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("n_tokens"),
        col("quality")), col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.n_tokens").as("n_tokens"), col("r.quality").as("quality"))
      .orderBy(col("doc_id"))

  private val cleanCorpusSql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    round(least(1.0, len(string_split(text, ' ')) / 100.0)
      |      * (1.0 - len(list_filter(string_split(text, ' '),
      |           x -> x IN ('the', 'a'))) * 1.0
      |           / len(string_split(text, ' '))), 4) AS quality,
      |    md5(lower(text)) AS fp
      |  FROM documents),
      |gated AS (SELECT * FROM t WHERE n_tokens >= 10 AND quality >= 0.2)
      |SELECT doc_id, lang, n_tokens, quality FROM gated
      |QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
      |ORDER BY doc_id""".stripMargin

  // ---- PII redaction: the scrubbing stage every pretraining pipeline
  // runs before anything else sees the text. The synthetic corpus carries
  // no PII, so a deterministic email/phone/IPv4 per document (derived
  // from doc_id, appended IDENTICALLY by both engines) makes the oracle
  // bite: per-source detection counts, the redacted corpus length, and a
  // residual-PII self-scan that must come back zero. Pure column
  // expressions (regexp_count/regexp_replace are codegen'd) — at 100 TB
  // this is scan + per-row regex + one partial-aggregated groupBy; the
  // text itself never shuffles. Patterns stay in the Java∩RE2 regex
  // subset so Spark and DuckDB match the same spans.
  private val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val PhoneRe = """\d{3}-\d{3}-\d{4}"""
  private val IpRe = """\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"""

  private def piiRedact(s: SparkSession, d: String): DataFrame = {
    val aug = concat(col("text"),
      lit(" Contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or 555-"),
      lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
      lpad(((col("doc_id") * 3) % 10000).cast("string"), 4, "0"),
      lit(" at 10."), (col("doc_id") % 256).cast("string"), lit(".0."),
      ((col("doc_id") * 7) % 256).cast("string"))
    def scrub(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(c,
        lit(EmailRe), lit("[EMAIL]")),
        lit(PhoneRe), lit("[PHONE]")),
        lit(IpRe), lit("[IP]"))
    Tables.documents(s, d)
      .select(col("source"), aug.as("a"))
      .withColumn("r", scrub(col("a")))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(regexp_count(col("a"), lit(EmailRe))).cast("bigint").as("n_emails"),
        sum(regexp_count(col("a"), lit(PhoneRe))).cast("bigint").as("n_phones"),
        sum(regexp_count(col("a"), lit(IpRe))).cast("bigint").as("n_ips"),
        sum(length(col("r"))).cast("bigint").as("redacted_chars"),
        sum(regexp_count(col("r"), lit(EmailRe)) +
          regexp_count(col("r"), lit(PhoneRe)) +
          regexp_count(col("r"), lit(IpRe))).cast("bigint").as("residual_pii"))
      .orderBy(col("source"))
  }

  private val piiRedactSql =
    s"""WITH aug AS (
       |  SELECT source,
       |    text || ' Contact user' || CAST(doc_id AS VARCHAR)
       |      || '@mail.example.com or 555-'
       |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
       |      || lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0')
       |      || ' at 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
       |      || CAST((doc_id * 7) % 256 AS VARCHAR) AS a
       |  FROM documents),
       |red AS (
       |  SELECT source, a,
       |    regexp_replace(regexp_replace(regexp_replace(a,
       |      '$EmailRe', '[EMAIL]', 'g'),
       |      '$PhoneRe', '[PHONE]', 'g'),
       |      '$IpRe', '[IP]', 'g') AS r
       |  FROM aug)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(len(regexp_extract_all(a, '$EmailRe'))) AS BIGINT) AS n_emails,
       |  CAST(sum(len(regexp_extract_all(a, '$PhoneRe'))) AS BIGINT) AS n_phones,
       |  CAST(sum(len(regexp_extract_all(a, '$IpRe'))) AS BIGINT) AS n_ips,
       |  CAST(sum(length(r)) AS BIGINT) AS redacted_chars,
       |  CAST(sum(len(regexp_extract_all(r, '$EmailRe'))
       |    + len(regexp_extract_all(r, '$PhoneRe'))
       |    + len(regexp_extract_all(r, '$IpRe'))) AS BIGINT) AS residual_pii
       |FROM red GROUP BY source ORDER BY source""".stripMargin

  // ---- overlapping context-window chunking: the complement of
  // text_pack_sequences — instead of concatenating short docs into fixed
  // bins, each doc is cut into windows of ChunkW tokens every ChunkStride
  // (ChunkW - ChunkStride tokens of overlap preserve cross-boundary
  // context, the standard pretraining/RAG chunking shape). sequence +
  // explode + slice are pure codegen'd column expressions: chunking is
  // scan-side row multiplication, no shuffle until the presentation
  // sort — at 100 TB the chunk stream feeds the next stage partition-
  // local.
  private val ChunkW = 40
  private val ChunkStride = 30

  private def chunkOverlap(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      // degenerate docs (null text → size -1, or a 0-token array) must
      // DROP like the oracle's empty range(), not crash sequence()
      .filter(size(col("toks")) > 0)
      .withColumn("start",
        explode(sequence(lit(0), size(col("toks")) - 1, lit(ChunkStride))))
      .select(col("doc_id"),
        (col("start") / ChunkStride).cast("bigint").as("chunk_id"),
        slice(col("toks"), col("start") + 1, lit(ChunkW)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("bigint").as("n_tokens"),
        element_at(col("chunk"), 1).as("first_token"),
        element_at(col("chunk"), -1).as("last_token"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  private val chunkOverlapSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |c AS (SELECT doc_id, toks,
       |        unnest(range(0, len(toks), $ChunkStride)) AS start FROM t),
       |ch AS (SELECT doc_id, start // $ChunkStride AS chunk_id,
       |         toks[start + 1 : start + $ChunkW] AS chunk FROM c)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(len(chunk) AS BIGINT) AS n_tokens,
       |  chunk[1] AS first_token, chunk[len(chunk)] AS last_token
       |FROM ch ORDER BY doc_id, chunk_id""".stripMargin

  // ---- rolling-hash document fingerprint (order-sensitive; JVM kernel,
  // see Signatures.rollingFingerprint for the determinism contract)
  private def rollingFp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, Signatures.rollingFingerprint(t)) }
      .toDF("doc_id", "rolling_fp")
      .orderBy(col("doc_id"))
  }

  private val rollingFpSql =
    """SELECT doc_id,
      | CAST(list_sum(list_transform(range(1, len(string_split(text,' '))+1),
      |   i -> (('0x' || substr(md5(string_split(text,' ')[i]), 1, 8))::BIGINT) * i))
      |   % 1000000007 AS BIGINT) AS rolling_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- statistical LM scoring: each document's average corpus-frequency
  // of its word bigrams — the frequency half of perplexity-based quality
  // filtering (docs full of corpus-rare bigrams are the noise). Kept
  // integer-exact so it replays cross-engine: the per-doc numerator is a
  // BIGINT sum of occurrence counts (associative — no float accumulation
  // order), with ONE final division. Scale shape: explode → count by
  // bigram → per-doc agg; everything shuffles by bigram/doc key, the
  // classic two-pass n-gram-LM layout. A bigram is the k=2 case of
  // [[graft.functions.TokenWindowHashes]] — a 1-token doc's single
  // 'window' is the lone token, the engine-wide degenerate convention.
  /** Per-(doc, bigram) occurrence counts, PERSISTED per (session, dir):
    * the corpus-frequency stage reads this frame twice (count by bigram
    * + join-back), and without the persist both reads would re-run the
    * tokenize+explode corpus scan. One row per DISTINCT pair — the
    * explode's occurrence stream never materializes. */
  private val bigramPairCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def bigramPairs(s: SparkSession, d: String): DataFrame =
    graft.CacheFill(bigramPairCache, (graft.SessionKeys(s), d))(
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.functions.TokenWindowHashes(col("text"), 2)).as("bg"))
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("k"))
        .persist())

  private def bigramFreq(s: SparkSession, d: String): DataFrame = {
    // pre-aggregate per (doc, bigram) BEFORE the corpus count: the
    // shuffles then carry DISTINCT pairs, not the full occurrence
    // stream (freq_sum = Σ k·n and n_bigrams = Σ k over pairs are
    // identities of the per-occurrence sums), and map-side partial
    // aggregation compresses the explode's output before it hits the
    // wire. The corpus frequency is groupBy(bg) + join-back over the
    // PERSISTED pair frame, NOT sum(k) over (partition by bg): a
    // stopword bigram appears in essentially every document, so the
    // bg-keyed window would gather ≈N_docs rows into ONE task that
    // WindowExec buffers whole and AQE cannot split — the same hot-key
    // trap the exact-jaccard frequency stage already abandoned
    // ([[Dedup.exactJaccardPairsUncached]]). The groupBy
    // partial-aggregates map-side (a hot bigram reduces to one partial
    // count per map task) and the join-back is a plain shuffled
    // equi-join AQE's OptimizeSkewedJoin CAN split; the persist answers
    // the old double-evaluation objection — both consumers read cached
    // columnar batches, not the tokenize+explode lineage twice.
    // Bigrams travel as their poly_hash (one-pass codegen'd
    // TokenWindowHashes): frequency needs only gram IDENTITY, and the
    // string formulation paid an interpreted lambda + window-string
    // allocation per position.
    val perDoc = bigramPairs(s, d)
    val freq = perDoc.groupBy(col("bg")).agg(sum(col("k")).as("n"))
    perDoc.join(freq, "bg")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k") * col("n")).as("freq_sum"))
      .select(col("doc_id"), col("n_bigrams"), col("freq_sum"),
        round(col("freq_sum").cast("double") / col("n_bigrams"), 4).as("avg_freq"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB poly_hash of a string expression (empty → 0, matching the
    * kernel — list_reduce refuses an empty list). THE one guarded
    * implementation; every oracle that hashes a window string uses it. */
  private[extensions] def phSql(e: String) =
    s"""CASE WHEN len($e) = 0 THEN 0 ELSE
       |  list_reduce(list_transform(range(1, len($e)+1),
       |    j -> CAST(unicode(substr($e, j, 1)) AS BIGINT)),
       |    (a, b) -> (a * ${graft.extensions.Signatures.PolyB} + b)
       |      % ${graft.extensions.Signatures.MinhashP}) END""".stripMargin

  private val bigramFreqSql =
    s"""WITH bgr AS (
       |  SELECT doc_id,
       |    unnest(list_transform(
       |      list_transform(range(1, greatest(len(string_split(text,' '))-1, 1)+1),
       |        i -> array_to_string(string_split(text,' ')[i:i+1], ' ')),
       |      w -> ${phSql("w")})) AS bg
       |  FROM documents),
       |counts AS (SELECT bg, count(*) AS n FROM bgr GROUP BY bg)
       |SELECT b.doc_id, count(*) AS n_bigrams,
       |  CAST(sum(c.n) AS BIGINT) AS freq_sum,
       |  round(CAST(sum(c.n) AS DOUBLE) / count(*), 4) AS avg_freq
       |FROM bgr b JOIN counts c ON b.bg = c.bg
       |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin

  // ---- smoothed bigram log-probability (perplexity proper): the
  // CCNet/KenLM-style quality signal (Wenzek et al. 2020,
  // arXiv:1911.00359 — public paper). Complements text_bigram_freq (the
  // raw-frequency half): P(w2|w1) = (C(w1 w2) + 1) / (C(w1 ·) + V),
  // add-one smoothing over the corpus vocabulary V; a document scores
  // the occurrence-weighted mean log-prob of its bigrams, and perplexity
  // exp(-mean). Scale shape identical to bigramFreq: DISTINCT (doc,
  // bigram) pairs shuffle, never the token stream; history counts C(w1 ·)
  // derive from the already-aggregated bigram counts (one extra shuffle
  // over the far smaller distinct-bigram set); the scalar V broadcasts.
  // Cross-engine float honesty: per-term ln() agrees to ~1 ulp between
  // the JVM and DuckDB and the per-doc sum is ~60 terms, so the 1e-14
  // accumulated error sits ten orders of magnitude inside the round(4)
  // boundary — the same argument the tfidf oracle records.
  /** Per-doc LM scores (doc_id, n_bigrams, raw mean log-prob) — the
    * shared core of text_lm_perplexity and text_ppl_buckets.
    *
    * wordBigrams emits a lone token as a degenerate 'bigram' for
    * 1-token docs (an engine-wide convention text_bigram_freq keeps);
    * a language MODEL must not count it — it would pollute C(w1 ·) for
    * every real bigram sharing that first word — so the LM filters to
    * true 2-token grams and a <2-token doc simply has no defined score
    * (no output row), r16 ADVICE.
    * Corpus counts are groupBy + join-back over the PERSISTED pair
    * frame, not windows keyed on bg/w1: a stopword history key ("the ·")
    * opens a constant fraction of all bigrams, so a w1-keyed window
    * buffers that whole partition in one task AQE cannot split, while
    * the groupBy partial-aggregates map-side and the join-backs are
    * skew-splittable equi-joins. C(w1 w2) = sum(k) by bg; C(w1 ·) =
    * sum(k) by w1 — the total corpus occurrences of bigrams opening
    * with w1, exactly the history count the model divides by. The
    * persist answers the double-evaluation objection that once argued
    * for the windows: all three reads hit cached columnar batches.
    * Grams travel as poly_hashes (codegen'd TokenWindowHashes — the
    * string form paid an interpreted lambda per window): bigram i's
    * history key is the i-th single-token hash, aligned by position.
    *
    * PERSISTED per (session, dir): three consumers — text_lm_perplexity,
    * and text_ppl_buckets' cutoffs pass AND assignment pass — would each
    * re-run the tokenize+explode corpus scan off the raw lineage; the
    * persisted frame is one row per doc (id + two numbers), so the cache
    * is corpus-linear and tiny next to the exploded intermediates. */
  private val lmScoreCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def lmDocScores(s: SparkSession, d: String): DataFrame =
    graft.CacheFill(lmScoreCache, (graft.SessionKeys(s), d))(
      lmDocScoresUncached(s, d).persist())

  /** Distinct (doc, bigram, history) pair counts, PERSISTED per
    * (session, dir): the LM's three reads (corpus bigram counts, history
    * counts, per-doc scoring) share one evaluation of the
    * tokenize+explode lineage. Pair-linear, like [[bigramPairCache]]. */
  private val lmPairCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def lmPairs(s: SparkSession, d: String): DataFrame =
    graft.CacheFill(lmPairCache, (graft.SessionKeys(s), d)) {
      val tokh = graft.functions.TokenWindowHashes(col("text"), 1)
      val bgh = graft.functions.TokenWindowHashes(col("text"), 2)
      Tables.documents(s, d)
        .select(col("doc_id"), tokh.as("th"), bgh.as("bh"))
        .filter(size(col("th")) >= 2)
        .select(col("doc_id"), col("th"),
          posexplode(col("bh")).as(Seq("pos", "bg")))
        .select(col("doc_id"), col("bg"),
          element_at(col("th"), col("pos") + 1).as("w1"))
        .groupBy(col("doc_id"), col("bg"), col("w1"))
        .agg(count(lit(1)).as("k"))
        .persist()
    }

  private def lmDocScoresUncached(s: SparkSession, d: String): DataFrame = {
    val perDoc = lmPairs(s, d)
    val vocab = Tables.documents(s, d)
      .select(explode(graft.functions.TokenWindowHashes(col("text"), 1))
        .as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val c12 = perDoc.groupBy(col("bg")).agg(sum(col("k")).as("c12"))
    val c1 = perDoc.groupBy(col("w1")).agg(sum(col("k")).as("c1"))
    perDoc
      .join(c12, "bg")
      .join(c1, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("k"),
        log((col("c12") + 1).cast("double") / (col("c1") + col("v"))).as("lp"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        (sum(col("k") * col("lp")) / sum(col("k"))).as("raw"))
  }

  private def lmPerplexity(s: SparkSession, d: String): DataFrame =
    lmDocScores(s, d)
      .select(col("doc_id"), col("n_bigrams"),
        round(col("raw"), 4).as("avg_logp"),
        round(exp(-col("raw")), 2).as("ppl"))
      .orderBy(col("doc_id"))

  // ---- perplexity-bucketed pruning (Wenzek et al. 2020 §4.3 — CCNet's
  // actual application of the LM scores: split the corpus into
  // head/middle/tail perplexity terciles and keep the cleaner ones).
  // Scale shape: a global ntile would funnel every (doc, score) row
  // through ONE window task, so the terciles come instead from ORDER-
  // STATISTIC CUTOFFS computed on the distinct-ROUNDED-score grid —
  // bounded at ~1e5 rows by the 1e-4 granularity REGARDLESS of corpus
  // size (the lone ordered window runs over that bounded grid, never
  // the corpus) — then broadcast, and every doc buckets by plain
  // comparison, CCNet's own cutoff-then-filter application. Rounded
  // scores are the trusted 1e-4 cross-engine boundary and the cutoffs
  // ARE grid values (no interpolation), so assignment replays bit for
  // bit; score ties straddling a cutoff all take the cleaner bucket,
  // so bucket sizes are n/3 up to tie mass (documented CCNet behavior).
  private def pplBuckets(s: SparkSession, d: String): DataFrame = {
    val scores = lmDocScores(s, d)
      .select(col("doc_id"), round(col("raw"), 4).as("avg_logp"))
    val byScore = scores.groupBy(col("avg_logp"))
      .agg(count(lit(1)).as("c"))
    // cumulative doc count descending the score grid: the first score
    // whose cumulative count reaches ceil(n/3) is the head cutoff
    // (higher mean log-prob = more predictable = cleaner = "head")
    val wDesc = Window.orderBy(col("avg_logp").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byScore.withColumn("cum", sum(col("c")).over(wDesc))
    val cuts = ranked
      .crossJoin(broadcast(byScore.agg(sum(col("c")).as("n"))))
      .agg(
        max(when(col("cum") >= floor((col("n") + 2) / 3), col("avg_logp")))
          .as("c_hi"),
        max(when(col("cum") >= floor((col("n") * 2 + 2) / 3),
          col("avg_logp"))).as("c_lo"))
    scores.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("avg_logp"),
        when(col("avg_logp") >= col("c_hi"), 1L)
          .when(col("avg_logp") >= col("c_lo"), 2L)
          .otherwise(3L).as("bucket"))
      .withColumn("keep", col("bucket") <= 2)
      .orderBy(col("doc_id"))
  }

  private def pplBucketsSql =
    s"""WITH $lmScoredCtes,
       |byscore AS (
       |  SELECT avg_logp, count(*) AS c FROM docscore GROUP BY avg_logp),
       |ranked AS (
       |  SELECT avg_logp,
       |    sum(c) OVER (ORDER BY avg_logp DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM byscore),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM byscore),
       |cuts AS (
       |  SELECT
       |    max(CASE WHEN cum >= (n + 2) // 3 THEN avg_logp END) AS c_hi,
       |    max(CASE WHEN cum >= (n * 2 + 2) // 3 THEN avg_logp END) AS c_lo
       |  FROM ranked, tot)
       |SELECT d.doc_id, d.avg_logp,
       |  CAST(CASE WHEN d.avg_logp >= k.c_hi THEN 1
       |            WHEN d.avg_logp >= k.c_lo THEN 2
       |            ELSE 3 END AS BIGINT) AS bucket,
       |  (CASE WHEN d.avg_logp >= k.c_hi THEN 1
       |        WHEN d.avg_logp >= k.c_lo THEN 2
       |        ELSE 3 END) <= 2 AS keep
       |FROM docscore d, cuts k ORDER BY doc_id""".stripMargin

  /** Shared LM-scoring CTE chain; the final CTE is
    * `docscore(doc_id, n_bigrams, avg_logp, ppl)`. */
  private def lmScoredCtes =
    s"""pre AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |bgr AS (
       |  SELECT doc_id,
       |    ${phSql("array_to_string(tk[i:i+1], ' ')")} AS bg,
       |    ${phSql("tk[i]")} AS w1
       |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
       |        FROM pre WHERE len(tk) >= 2)),
       |pairs AS (SELECT doc_id, bg, w1, count(*) AS k FROM bgr
       |          GROUP BY doc_id, bg, w1),
       |counts AS (SELECT bg, CAST(sum(k) AS BIGINT) AS c12 FROM pairs GROUP BY bg),
       |hist AS (SELECT w1, CAST(sum(k) AS BIGINT) AS c1 FROM pairs GROUP BY w1),
       |voc AS (SELECT count(DISTINCT ${phSql("tok")}) AS v
       |        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
       |scored AS (
       |  SELECT p.doc_id, p.k,
       |    ln(CAST(c.c12 + 1 AS DOUBLE) / (h.c1 + voc.v)) AS lp
       |  FROM pairs p JOIN counts c USING (bg) JOIN hist h ON p.w1 = h.w1, voc),
       |docscore AS (
       |  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
       |    round(sum(k * lp) / sum(k), 4) AS avg_logp,
       |    round(exp(-sum(k * lp) / sum(k)), 2) AS ppl
       |  FROM scored GROUP BY doc_id)""".stripMargin

  private def lmPerplexitySql =
    s"""WITH $lmScoredCtes
       |SELECT doc_id, n_bigrams, avg_logp, ppl
       |FROM docscore ORDER BY doc_id""".stripMargin

  // ---- repetition measures (Gopher-style, Rae et al. 2021 §A1.1): the
  // filters that kill boilerplate/spam docs whose text is dominated by a
  // few repeated tokens or n-grams. Token-count fractions stand in for the
  // paper's character fractions (the corpus is single-space tokenized, so
  // they order documents identically). Scale shape: explode → count by
  // (doc, gram) → per-doc agg; both shuffles are keyed by doc granularity
  // and the second reuses the first's partitioning.
  private def repetition(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // grams travel as poly_hashes (codegen'd TokenWindowHashes) — the
    // fractions need only gram identity, and a collision is the same
    // collision in the oracle's replay
    val tok = docs.select(col("doc_id"),
        explode(graft.functions.TokenWindowHashes(col("text"), 1)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), max(col("c")).as("top_tok"),
        count(lit(1)).as("n_distinct"))
    val bg = docs.select(col("doc_id"),
        explode(graft.functions.TokenWindowHashes(col("text"), 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bg"))
    tok.join(bg, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 4).as("distinct_ratio"),
        round(col("top_tok").cast("double") / col("n_tokens"), 4).as("top_token_frac"),
        round(col("top_bg").cast("double") / col("n_bigrams"), 4).as("top_bigram_frac"))
      .withColumn("keep",
        col("distinct_ratio") >= 0.2 && col("top_token_frac") <= 0.2 &&
          col("top_bigram_frac") <= 0.2)
      .orderBy(col("doc_id"))
  }

  private def repetitionSql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(list_transform(string_split(text, ' '), w -> ${phSql("w")})) AS g
       |  FROM documents),
       |tc AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, max(c) AS top_tok,
       |    count(*) AS n_distinct
       |  FROM (SELECT doc_id, g, count(*) AS c FROM toks GROUP BY 1, 2)
       |  GROUP BY doc_id),
       |bgr AS (
       |  SELECT doc_id,
       |    unnest(list_transform(
       |      list_transform(range(1, greatest(len(string_split(text,' '))-1, 1)+1),
       |        i -> array_to_string(string_split(text,' ')[i:i+1], ' ')),
       |      w -> ${phSql("w")})) AS g
       |  FROM documents),
      |bc AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, max(c) AS top_bg
      |  FROM (SELECT doc_id, g, count(*) AS c FROM bgr GROUP BY 1, 2)
      |  GROUP BY doc_id),
      |m AS (
      |  SELECT t.doc_id, t.n_tokens,
      |    round(CAST(n_distinct AS DOUBLE) / t.n_tokens, 4) AS distinct_ratio,
      |    round(CAST(top_tok AS DOUBLE) / t.n_tokens, 4) AS top_token_frac,
      |    round(CAST(top_bg AS DOUBLE) / b.n_bigrams, 4) AS top_bigram_frac
      |  FROM tc t JOIN bc b ON t.doc_id = b.doc_id)
      |SELECT *, distinct_ratio >= 0.2 AND top_token_frac <= 0.2
      |  AND top_bigram_frac <= 0.2 AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  // ---- filter funnel: every document binned by the FIRST quality rule it
  // violates — the acceptance report a cleaning pipeline publishes per
  // snapshot. Pure column expressions (array_distinct is per-row, no
  // explode), so the whole query is one scan + a tiny final agg: the ideal
  // 100 TB shape.
  /** THE row-level cleaning verdict — filterFunnel reports its
    * distribution, curationFunnel keeps only `"keep"`; one expression
    * so the two can never drift. */
  private def funnelReason: Column = {
    val toks = tokens(col("text"))
    val nTok = tokenCount(col("text"))
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    when(nTok < 10, "too_short")
      .when(stopwordRatio(col("text")) > 0.5, "too_stoppy")
      .when(distinctRatio < 0.2, "repetitive")
      .when(qualityScore(col("text")) < 0.2, "low_quality")
      .otherwise("keep")
  }

  private def filterFunnel(s: SparkSession, d: String): DataFrame = {
    val nTok = tokenCount(col("text"))
    Tables.documents(s, d)
      .groupBy(funnelReason.as("reason"))
      .agg(count(lit(1)).as("n_docs"),
        sum(nTok).as("n_tokens"),
        round(avg(qualityScore(col("text"))), 4).as("avg_quality"))
      .orderBy(col("reason"))
  }

  private val filterFunnelSql =
    """WITH t AS (
      |  SELECT
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS distinct_ratio,
      |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) * 1.0
      |      / len(string_split(text, ' ')) AS stop_ratio,
      |    least(1.0, len(string_split(text, ' ')) / 100.0)
      |      * (1.0 - len(list_filter(string_split(text, ' '),
      |           x -> x IN ('the', 'a'))) * 1.0
      |           / len(string_split(text, ' '))) AS quality
      |  FROM documents),
      |binned AS (
      |  SELECT CASE WHEN n_tokens < 10 THEN 'too_short'
      |              WHEN stop_ratio > 0.5 THEN 'too_stoppy'
      |              WHEN distinct_ratio < 0.2 THEN 'repetitive'
      |              WHEN quality < 0.2 THEN 'low_quality'
      |              ELSE 'keep' END AS reason,
      |         n_tokens, quality
      |  FROM t)
      |SELECT reason, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  round(avg(quality), 4) AS avg_quality
      |FROM binned GROUP BY reason ORDER BY reason""".stripMargin

  // ---- benchmark decontamination (the n-gram-overlap check every
  // training pipeline runs before release, per GPT-3/Gopher appendices):
  // a deterministic held-out "benchmark" slice (doc_id % EvalMod = 0)
  // contributes its distinct word trigrams; every remaining corpus doc is
  // scored by the fraction of its trigram instances that appear in that
  // set. Scale shape: the eval set is tiny relative to the corpus, so its
  // distinct-gram table is BROADCAST against the exploded corpus scan —
  // the corpus (the 100 TB side) is shuffled only by doc_id for the final
  // per-doc aggregation. The flag threshold (>= 80%) is evaluated in
  // integer arithmetic so both engines agree exactly.
  private val EvalMod = 25

  /** Corpus word-trigram stream: grams travel as their poly_hash via
    * the one-pass codegen'd TokenWindowHashes (the
    * transform/concat_ws/slice form ran per window on the interpreted
    * HOF path); a collision replays identically in the oracle. Window
    * count max(n-2, 1) keeps the truncated-short-doc convention: a
    * 2-token doc contributes its single whole string. */
  private def grams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.functions.TokenWindowHashes(col("text"), 3)).as("g"))

  /** The held-out slice's distinct-gram table, persisted per (session,
    * dir): both decontamination variants consume it — exact as the
    * broadcast probe side, Bloom as sketch source AND verify side —
    * and the Bloom path alone reads it three times (count, sketch
    * aggregate, verify semi-join), so without the persist the
    * tokenize+explode+distinct lineage re-runs per read. */
  private val evalGramsCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def evalGrams(s: SparkSession, d: String): DataFrame =
    graft.CacheFill(evalGramsCache, (graft.SessionKeys(s), d))(
      grams(s, d).filter(col("doc_id") % EvalMod === 0)
        .select(col("g")).distinct().persist())

  private def contamination(s: SparkSession, d: String): DataFrame = {
    val evalHits = evalGrams(s, d).withColumn("hit", lit(1L))
    grams(s, d).filter(col("doc_id") % EvalMod =!= 0)
      .join(broadcast(evalHits), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 4).as("contamination"),
        (col("n_hit") * 5 >= col("n_grams") * 4).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Decontamination at benchmark-suite scale: when the held-out
    * n-gram set is too big to broadcast exactly, its distributed
    * Bloom sketch (driver-held bytes, metadata-sized) prefilters the
    * corpus gram stream SCAN-SIDE (`BloomFilterMightContain`,
    * codegen'd), and only the surviving (doc, gram) rows pay the exact
    * verification join that kills the sketch's false positives — the
    * corpus never joins in full, and the no-false-negative contract
    * means results are IDENTICAL to [[contamination]] (same oracle —
    * the sketch must be invisible in the output). Same layout as
    * [[Dedup.bloomPrefilter]], applied to the CCNet/GPT-3-style
    * decontamination stage. */
  private def contaminationBloom(s: SparkSession, d: String): DataFrame = {
    val ev = evalGrams(s, d) // persisted: read 3× below (count/sketch/verify)
    val nEval = math.max(ev.count(), 1L)
    val bloomBytes = ev
      .agg(org.apache.spark.sql.GraftBridge
        .bloomAggregate(col("g"), nEval).as("bf"))
      .head().getAs[Array[Byte]](0)
    val corpusGrams = grams(s, d).filter(col("doc_id") % EvalMod =!= 0)
    val totals = corpusGrams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    val hits = corpusGrams
      .where(org.apache.spark.sql.GraftBridge
        .bloomMightContain(lit(bloomBytes), col("g")))
      .join(ev, Seq("g"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 4)
          .as("contamination"),
        (col("n_hit") * 5 >= col("n_grams") * 4).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  private val contaminationSql =
    s"""WITH grams AS (
       |  SELECT doc_id,
       |    unnest(list_transform(
       |      list_transform(range(1, greatest(len(string_split(text,' '))-2, 1)+1),
       |        i -> array_to_string(string_split(text,' ')[i:i+2], ' ')),
       |      w -> ${phSql("w")})) AS g
       |  FROM documents),
       |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % $EvalMod = 0)
       |SELECT c.doc_id, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  round(CAST(sum(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 4) AS contamination,
       |  sum(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) * 5 >= count(*) * 4
       |    AS contaminated
       |FROM (SELECT * FROM grams WHERE doc_id % $EvalMod <> 0) c
       |LEFT JOIN ev e ON c.g = e.g
       |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin

  // ---- corpus shape report: doc counts / token mass / quality per
  // (lang, 16-token length bucket) — the histogram a pipeline publishes
  // per snapshot to catch length-distribution drift. Bucketing is integer
  // arithmetic (no log floats); one scan + one tiny agg.
  private def corpusStats(s: SparkSession, d: String): DataFrame = {
    val nTok = tokenCount(col("text"))
    // mean quality in integer basis points: per-doc quality scaled to
    // 1e4 and rounded (exact), summed as BIGINT (order-insensitive),
    // mean taken as half-up INTEGER division — a double avg() flipped
    // the last rounded digit between engines, and even identical
    // doubles tie-break differently under Spark's (decimal-string) vs
    // DuckDB's (binary) round at an exact .5, so no float ever appears
    val q4 = round(qualityScore(col("text")) * 10000).cast("long")
    Tables.documents(s, d)
      .groupBy(col("lang"), (nTok - nTok % 16).as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(nTok).as("n_tokens"),
        floor((sum(q4) * 2 + count(lit(1))) / (count(lit(1)) * 2))
          .cast("long").as("avg_quality_bp"))
      .orderBy(col("lang"), col("len_bucket"))
  }

  private val corpusStatsSql =
    """WITH t AS (
      |  SELECT lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(round((least(1.0, len(string_split(text, ' ')) / 100.0)
      |      * (1.0 - len(list_filter(string_split(text, ' '),
      |           x -> x IN ('the', 'a'))) * 1.0
      |           / len(string_split(text, ' ')))) * 10000) AS BIGINT) AS q4
      |  FROM documents)
      |SELECT lang, n_tokens - n_tokens % 16 AS len_bucket,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(floor((CAST(sum(q4) AS BIGINT) * 2 + count(*))
      |    / (count(*) * 2)) AS BIGINT) AS avg_quality_bp
      |FROM t GROUP BY 1, 2 ORDER BY lang, len_bucket""".stripMargin

  // ---- the end-to-end curation funnel: the whole pre-training data
  // pipeline COMPOSED — row-level cleaning → exact dedup → classifier
  // quality filter → benchmark decontamination — with per-stage
  // document/token counts (the acceptance report every curation run
  // publishes). Each stage reuses the standalone operator's exact
  // semantics (filterFunnel rules, fingerprint dedup, the hashed-linear
  // classifier, trigram-overlap decontamination incl. dropping the
  // benchmark slice itself), so the funnel proves the operators
  // compose. The lineage re-evaluates per stage aggregate here (gate
  // scale); a production run checkpoints between stages — the shapes
  // themselves are the scale story: row-local filters, one
  // fingerprint-key shuffle, broadcast model/benchmark joins.
  private def curationFunnel(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nTok = tokenCount(col("text"))
    // stage 1 IS filterFunnel's verdict — shared expression, no copy
    val clean = docs.where(funnelReason === "keep")
    // stage 2: keep-first-per-fingerprint as groupBy + min_by (NOT an
    // fp-keyed row_number window — a hot fingerprint is a massive
    // duplicate cluster one window task would buffer whole; min_by
    // partial-aggregates map-side, and first-by-doc_id IS min_by, so
    // the rewrite is semantics-preserving — cleanCorpus's shape)
    val deduped = clean
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(min_by(struct(clean.columns.map(col): _*), col("doc_id")).as("r"))
      .select(col("r.*"))
    val clsKeepDocs = clsBuckets(deduped)
      .join(broadcast(clsWeights(s)), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("w_int")).as("sw"))
      .where(clsKeep(col("sw"), col("n")))
      .select(col("doc_id"))
    val classified = deduped.join(clsKeepDocs, Seq("doc_id"), "left_semi")
    // the same persisted held-out gram table the standalone
    // decontamination queries probe
    val evalHits = evalGrams(s, d).withColumn("hit", lit(1L))
    // the benchmark slice itself leaves the training corpus, and so
    // does anything >= 80% covered by its trigrams
    val candidates = classified.where(col("doc_id") % EvalMod =!= 0)
    val contamKeep = candidates
      .select(col("doc_id"),
        explode(graft.functions.TokenWindowHashes(col("text"), 3)).as("g"))
      .join(broadcast(evalHits), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_g"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .where(col("n_hit") * 5 < col("n_g") * 4)
      .select(col("doc_id"))
    val finalSet = candidates.join(contamKeep, Seq("doc_id"), "left_semi")
    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"), sum(nTok).as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
    stage("0_raw", docs)
      .unionAll(stage("1_clean", clean))
      .unionAll(stage("2_exact_dedup", deduped))
      .unionAll(stage("3_classifier", classified))
      .unionAll(stage("4_decontaminated", finalSet))
      .orderBy(col("stage"))
  }

  private def curationFunnelSql =
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
       |      * 1.0 / len(string_split(text, ' ')) AS stop_ratio,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS distinct_ratio
       |  FROM documents),
       |clean AS (
       |  SELECT * FROM base
       |  WHERE n_tok >= 10 AND stop_ratio <= 0.5 AND distinct_ratio >= 0.2
       |    AND least(1.0, n_tok / 100.0) * (1.0 - stop_ratio) >= 0.2),
       |dedup AS (
       |  SELECT * FROM clean
       |  QUALIFY row_number() OVER (PARTITION BY md5(lower(text))
       |    ORDER BY doc_id) = 1),
       |$clsWeightsSqlCtes,
       |cls AS (
       |  SELECT f.doc_id FROM (
       |    SELECT doc_id, (${phSql("tok")}) % $ClsDim AS bucket
       |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |          FROM dedup)) f
       |  JOIN wweights w USING (bucket)
       |  GROUP BY f.doc_id
       |  HAVING CAST(sum(w.w_int) AS BIGINT) * 20 >= count(*) * 1024),
       |classified AS (
       |  SELECT * FROM dedup WHERE doc_id IN (SELECT doc_id FROM cls)),
       |trig AS (
       |  SELECT doc_id,
       |    unnest(list_transform(
       |      list_transform(range(1, greatest(len(string_split(text,' '))-2, 1)+1),
       |        i -> array_to_string(string_split(text,' ')[i:i+2], ' ')),
       |      w -> ${phSql("w")})) AS g
       |  FROM documents),
       |ev AS (SELECT DISTINCT g FROM trig WHERE doc_id % $EvalMod = 0),
       |cand AS (SELECT * FROM classified WHERE doc_id % $EvalMod <> 0),
       |cont AS (
       |  SELECT t.doc_id FROM trig t
       |  LEFT JOIN ev e ON t.g = e.g
       |  WHERE t.doc_id IN (SELECT doc_id FROM cand)
       |  GROUP BY t.doc_id
       |  HAVING sum(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) * 5
       |    < count(*) * 4),
       |fin AS (SELECT * FROM cand WHERE doc_id IN (SELECT doc_id FROM cont))
       |SELECT stage, n_docs, n_tokens FROM (
       |  SELECT '0_raw' AS stage, count(*) AS n_docs,
       |    CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens FROM base
       |  UNION ALL SELECT '1_clean', count(*),
       |    CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM clean
       |  UNION ALL SELECT '2_exact_dedup', count(*),
       |    CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM dedup
       |  UNION ALL SELECT '3_classifier', count(*),
       |    CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM classified
       |  UNION ALL SELECT '4_decontaminated', count(*),
       |    CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM fin)
       |ORDER BY stage""".stripMargin

  // ---- streaming corpus-quality monitor: the curation stats computed
  // INCREMENTALLY as documents arrive, via Structured Streaming — the
  // shape a live ingestion pipeline uses to watch quality/language
  // drift without re-scanning the corpus per batch. A 3-slice file
  // source drains AvailableNow one file per micro-batch, the per-lang
  // aggregate state carries across batches (complete mode — language
  // cardinality is bounded), and the LAST batch's table is the result.
  // The oracle recomputes the same aggregates from the full corpus, so
  // any state loss or double-count across batches fails the gate.
  // Integer quality basis points, the corpusStats convention — no float
  // crosses engines.
  private def streamQuality(s: SparkSession, d: String): DataFrame = {
    val base = graft.queries.Lifecycle.scratchDir(s, "graft_streamtext", d)
    val bp = new org.apache.hadoop.fs.Path(base)
    bp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(bp, true)
    val src = s"$base/src"
    val docs = Tables.documents(s, d)
    (0 to 2).foreach(i => docs.where(col("doc_id") % 3 === i)
      .coalesce(1).write.mode("append").parquet(src))
    val schema = s.read.parquet(src).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q4 = round(qualityScore(col("text")) * 10000).cast("long")
    val agg = stream.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).as("n_tokens"),
        sum(q4).as("q4sum"))
    val q = agg.writeStream
      .queryName("graft-stream-text-quality")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$base/out")
      }
      .start()
    q.awaitTermination()
    s.read.parquet(s"$base/out")
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        floor((col("q4sum") * 2 + col("n_docs")) / (col("n_docs") * 2))
          .cast("long").as("avg_quality_bp"))
      .orderBy(col("lang"))
  }

  private val streamQualitySql =
    """WITH t AS (
      |  SELECT lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(round((least(1.0, len(string_split(text, ' ')) / 100.0)
      |      * (1.0 - len(list_filter(string_split(text, ' '),
      |           x -> x IN ('the', 'a'))) * 1.0
      |           / len(string_split(text, ' ')))) * 10000) AS BIGINT) AS q4
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(floor((CAST(sum(q4) AS BIGINT) * 2 + count(*))
      |    / (count(*) * 2)) AS BIGINT) AS avg_quality_bp
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  // ---- sequence packing: bin documents into fixed token-budget training
  // sequences — the concat-and-chunk packing an LLM pretraining pipeline
  // runs as its last data-prep stage. Docs are laid end-to-end in
  // deterministic (doc_id) order and chopped every SeqLen tokens; each
  // doc is attributed to the sequence its first token lands in. Packing
  // is PER SOURCE (one window partition per shard — the standard
  // shard-local packing), so the cumulative sum parallelizes across
  // sources instead of serializing on a global order: the 100 TB shape,
  // where a single global ORDER BY window would bottleneck on one task.
  // SeqLen is a power of two, so the double division in floor() is exact
  // in both engines (binary-fp division by 2^11 cannot round).
  private val SeqLen = 2048L

  private def packSequences(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_id",
        floor((col("cum") - col("n_tokens")) / lit(SeqLen)).cast("long"))
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens_started"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("seq_id"))
  }

  private val packSequencesSql =
    s"""WITH toks AS (
       |  SELECT source, doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |cum AS (
       |  SELECT source, doc_id, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM toks)
       |SELECT source, CAST((cum - n_tokens) // $SeqLen AS BIGINT) AS seq_id,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens_started,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM cum GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- mixture rebalancing: downsample every source to the SMALLEST
  // source's token budget — the mixture-weighting stage a pretraining
  // pipeline runs to stop one giant crawl from drowning the curated
  // shards. Selection is a deterministic Knuth-hash threshold in EXACT
  // integer arithmetic (keep iff hash(doc_id) * source_tokens <
  // min_tokens * M — an exact rational comparison, no doubles), so both
  // engines pick the identical doc set and the choice is replayable at
  // any scale. The per-source totals are a tiny aggregate BROADCAST back
  // against the corpus (plan-pinned): the corpus itself never shuffles
  // until the final per-source rollup.
  private val MixMult = 2654435761L
  private val MixMod = 1000003L

  private def mixRebalance(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), tokenCount(col("text")).as("n_tokens"))
    val perSource = toks.groupBy(col("source")).agg(sum(col("n_tokens")).as("tot"))
    val minTot = perSource.agg(min(col("tot")).as("min_tot"))
    val keep = (col("doc_id") * MixMult % MixMod) * col("tot") <
      col("min_tot") * MixMod
    toks.join(broadcast(perSource), "source")
      .crossJoin(broadcast(minTot))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(keep, lit(1))).as("n_docs_kept"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(keep, col("n_tokens")).otherwise(0L)).as("n_tokens_kept"))
      .orderBy(col("source"))
  }

  private val mixRebalanceSql =
    s"""WITH toks AS (
       |  SELECT source, doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |per_source AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tot
       |  FROM toks GROUP BY 1),
       |m AS (SELECT min(tot) AS min_tot FROM per_source)
       |SELECT t.source, count(*) AS n_docs,
       |  count(CASE WHEN (t.doc_id * $MixMult) % $MixMod * p.tot
       |                  < m.min_tot * $MixMod THEN 1 END) AS n_docs_kept,
       |  CAST(sum(t.n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN (t.doc_id * $MixMult) % $MixMod * p.tot
       |                     < m.min_tot * $MixMod
       |                THEN t.n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept
       |FROM toks t JOIN per_source p USING (source), m
       |GROUP BY 1 ORDER BY 1""".stripMargin

  override def all: Seq[GraftQuery] = Seq(
    GraftQuery("text_mix_rebalance", mixRebalance, Some(mixRebalanceSql)),
    GraftQuery("text_pack_sequences", packSequences, Some(packSequencesSql)),
    GraftQuery("text_contamination", contamination, Some(contaminationSql)),
    GraftQuery("text_contamination_bloom", contaminationBloom,
      Some(contaminationSql)),
    GraftQuery("text_corpus_stats", corpusStats, Some(corpusStatsSql)),
    GraftQuery("text_bigram_freq", bigramFreq, Some(bigramFreqSql)),
    GraftQuery("text_lm_perplexity", lmPerplexity, Some(lmPerplexitySql)),
    GraftQuery("text_repetition", repetition, Some(repetitionSql)),
    GraftQuery("text_filter_funnel", filterFunnel, Some(filterFunnelSql)),
    GraftQuery("text_token_count", tokenCounts, Some(tokenCountsSql)),
    GraftQuery("text_quality", quality, Some(qualitySql)),
    GraftQuery("text_langid", langid, Some(langidSql)),
    GraftQuery("text_fingerprint", fingerprints, Some(fingerprintsSql)),
    GraftQuery("text_bpe_tokens", bpeTokens, Some(bpeTokensSql)),
    GraftQuery("text_bpe_train", bpeTrain, Some(bpeTrainSql)),
    GraftQuery("text_bpe_apply", bpeApply, Some(bpeApplySql)),
    GraftQuery("text_rolling_fp", rollingFp, Some(rollingFpSql)),
    GraftQuery("text_clean_corpus", cleanCorpus, Some(cleanCorpusSql)),
    GraftQuery("text_pii_redact", piiRedact, Some(piiRedactSql)),
    GraftQuery("text_chunk_overlap", chunkOverlap, Some(chunkOverlapSql)),
    GraftQuery("text_top_terms", topTerms, Some(topTermsSql)),
    GraftQuery("text_poly_fp", polyFp, Some(polyFpSql)),
    GraftQuery("text_sample_stratified", sampleStratified, Some(sampleStratifiedSql)),
    GraftQuery("text_tfidf_top", tfidfTop, Some(tfidfTopSql)),
    GraftQuery("text_classifier_score", classifierScore,
      Some(classifierScoreSql)),
    GraftQuery("text_langid_profile", langidProfile, Some(langidProfileSql)),
    GraftQuery("text_stream_quality", streamQuality, Some(streamQualitySql)),
    GraftQuery("text_curation_funnel", curationFunnel,
      Some(curationFunnelSql)),
    GraftQuery("text_ppl_buckets", pplBuckets, Some(pplBucketsSql)),
  )
}
