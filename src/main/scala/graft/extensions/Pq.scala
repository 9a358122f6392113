package graft.extensions

import graft.{GraftQuery, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) over the embedding corpus — the memory half
  * of the IVF-PQ design every production-scale ANN index uses (Jégou et
  * al. 2011, "Product Quantization for Nearest Neighbor Search" — public
  * paper; FAISS's IndexIVFPQ is the reference implementation shape).
  *
  * The vector space is split into M = dim/[[SubDim]] subspaces; each
  * subspace trains its own [[Ks]] = 16-centroid k-means codebook, and
  * every vector is encoded as M 4-bit codes — 8 bytes (+ one stored
  * norm) instead of 512 for a 64-dim float vector. At 100 TB of
  * embeddings the codes (~32× smaller) stay memory-resident on the
  * executors while the raw vectors stay in parquet; candidate scoring
  * reads ONLY codes plus a per-query M×[[Ks]] lookup table (ADC —
  * asymmetric distance computation).
  *
  * Determinism contract (same as [[Similarity]]): training runs on the
  * scaled-integer vectors, distances are exact BIGINTs, argmin tiebreak
  * is (dist, cid) lexicographic, means are floor(sum/count) — so the
  * DuckDB oracle RETRAINS bit-identical codebooks from the same parquet
  * and the ADC distances match exactly. The training frame is the
  * (vec_id, sub_id) EXPLOSION of the sample, so all M codebooks train in
  * ONE distributed aggregation per iteration (not M separate jobs).
  *
  * Search is the production IVF-PQ+refine cascade (FAISS
  * IndexRefineFlat): IVF lists prune the corpus, code-only ADC prunes
  * each list to a [[ShortK]] shortlist, and an exact-cosine re-rank over
  * just the shortlist emits top-k — raw vectors are touched for
  * shortlist × queries rows only. Approximation quality is measured,
  * not asserted: `sim_pq_recall` reports recall@5 of the full cascade
  * against the exact brute-force answer. (Code-only recall is
  * intrinsically poor here: the synthetic embeddings are near-uniform
  * random — no low intrinsic dimension for 1 bit/dim to exploit — which
  * is exactly why the refine stage is part of the design.)
  */
object Pq extends QueryModule {

  // 4-dim subspaces × 16 codes: on the near-random synthetic embeddings
  // (PQ's worst case — no low intrinsic dimension to exploit) the
  // narrower subspaces halve the per-cell distortion vs 8-dim ones at
  // the same 8-byte code budget. Real embedding corpora sit far below
  // their ambient dimension and recall improves accordingly.
  // Unlike the IVF list count (Similarity.ivfParams: K ≈ ⌈√n⌉, a
  // corpus-size function), Ks is a BITS-PER-CODE budget: capacity at
  // scale comes from the M·log2(Ks)-bit product space (16^M cells),
  // not from growing each codebook — so it stays a fixed design choice.
  private val SubDim = 4
  private val Ks = 16
  private val PqIters = 3
  /** ADC shortlist size feeding the exact re-rank (4× the final top-k). */
  private val ShortK = 20

  // ---------------------------------------------------------- training

  private[extensions] final case class PqCentroid(sub: Int, cid: Int, c: Seq[Long], cnrm: Long)

  /** Exploded (vec_id, sub_id, sv, snrm) projection of the corpus. */
  private def subVectors(s: SparkSession, d: String, m: Int): DataFrame = {
    val slices = array((0 until m).map(j =>
      slice(col("v"), j * SubDim + 1, SubDim)): _*)
    Similarity.scaledVecCached(s, d)
      .select(col("vec_id"), posexplode(slices).as(Seq("sub_id", "sv")))
      .withColumn("snrm", graft.functions.ScaledDotProduct(col("sv"), col("sv")))
  }

  private val codebookCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Seq[PqCentroid]]

  def invalidateCaches(): Unit =
    graft.CacheFill.invalidate(codebookCache)(_ => ())

  /** Number of subspaces, from the data (64-dim fixture → 8). */
  private def mOf(s: SparkSession, d: String): Int = {
    val dim = Similarity.scaledVecCached(s, d).select(size(col("v"))).head().getInt(0)
    require(dim % SubDim == 0, s"dim $dim not divisible by $SubDim")
    dim / SubDim
  }

  /** Flat-array codebook for the codegen'd kernels (see
    * [[graft.functions.PqKernels]]: the inlined M × Ks expression tree
    * version of these argmins blew janino's method limit and dropped the
    * stage out of whole-stage codegen). */
  private def cbData(cents: Seq[PqCentroid]): graft.functions.PqCodebookData = {
    val sorted = cents.sortBy(c => (c.sub, c.cid)).toArray
    val m = sorted.map(_.sub).max + 1
    val subOff = new Array[Int](m + 1)
    sorted.foreach(c => subOff(c.sub + 1) += 1)
    for (s <- 1 to m) subOff(s) += subOff(s - 1)
    new graft.functions.PqCodebookData(
      SubDim, subOff, sorted.map(_.cid),
      sorted.flatMap(_.c), sorted.map(_.cnrm))
  }

  private def nearestCidBySub(cents: Seq[PqCentroid]): Column =
    graft.functions.PqKernels.nearestCid(col("sub_id"), col("sv"), cbData(cents))

  /** Train all M codebooks: init per (sub, vec_id % Ks) from the lowest
    * sampled id, then [[PqIters]] iterations of ONE distributed
    * aggregation each. Only M × Ks × (SubDim + 1) longs reach the driver. */
  private[extensions] def codebooks(s: SparkSession, d: String): Seq[PqCentroid] =
    graft.CacheFill(codebookCache, (graft.SessionKeys(s), d)) {
      val m = mOf(s, d)
      val sample = subVectors(s, d, m).filter(
        (col("vec_id") * Similarity.SampleMult) % Similarity.SampleMod
          < Similarity.SampleKeep)
      val wInit = Window.partitionBy(col("sub_id"), col("vec_id") % Ks)
        .orderBy(col("vec_id"))
      var cents: Seq[PqCentroid] = sample
        .withColumn("rn", row_number().over(wInit)).filter(col("rn") === 1)
        .select(col("sub_id"), (col("vec_id") % Ks).cast("int").as("cid"),
          col("sv"), col("snrm"))
        .collect().map(r => PqCentroid(r.getInt(0), r.getInt(1),
          r.getSeq[Long](2), r.getLong(3)))
        .sortBy(c => (c.sub, c.cid)).toSeq
      for (_ <- 1 to PqIters) {
        val sums = (1 to SubDim).map(i => sum(element_at(col("sv"), i)).as(s"s$i"))
        val updated = sample
          .withColumn("cid", nearestCidBySub(cents))
          .groupBy(col("sub_id"), col("cid"))
          .agg(count(lit(1)).as("cnt"), sums: _*)
          .collect()
        cents = updated.map { r =>
          val cnt = r.getLong(2)
          val c = (1 to SubDim).map(i => math.floor(r.getLong(2 + i).toDouble / cnt).toLong)
          PqCentroid(r.getInt(0), r.getInt(1), c, c.map(x => x * x).sum)
        }.sortBy(c => (c.sub, c.cid)).toSeq
      }
      cents
    }

  // ---------------------------------------------------------- encoding

  /** Corpus with IVF assignment AND PQ codes — both pure expressions. */
  private def encoded(s: SparkSession, d: String): DataFrame =
    Similarity.assigned(s, d).withColumn("codes",
      graft.functions.PqKernels.encode(col("v"), cbData(codebooks(s, d))))

  // ---------------------------------------------------------- queries

  /** Code histogram per (sub_id, cid): proves both engines encode every
    * vector identically, and shows no code degenerates (the codebook
    * balance invariant, PqSpec-asserted). */
  private def pqCodes(s: SparkSession, d: String): DataFrame =
    encoded(s, d)
      .select(posexplode(col("codes")).as(Seq("sub_id", "cid")))
      .groupBy(col("sub_id"), col("cid"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("sub_id"), col("cid"))

  /** IVF-PQ search: candidates from the trained IVF lists (centroid-id
    * equi-join, same as sim_knn_ivf), scored by ADC over CODES + the
    * stored norm. Each query precomputes its M × Ks lookup table of
    * exact integer sub-DOT-PRODUCTS once; per candidate the approximate
    * dot is M array lookups and the cosine divides by the exact stored
    * norms (the "PQ + norm" trick for cosine/MIPS — raw ADC L2 ranks a
    * different metric than the cosine target and halves recall). The
    * candidate's raw vector is never touched: codes (M nibbles) + one
    * BIGINT norm per vector is the whole in-memory footprint. */
  private def knnIvfPq(s: SparkSession, d: String): DataFrame = {
    val cents = codebooks(s, d)
    val cb = cbData(cents)
    // lut[s][k] = q_s · c_sk  (exact BIGINT)
    val lut = graft.functions.PqKernels.lut(col("qv"), cb)
    val m = cb.m
    val probes = Similarity.multiAssigned(s, d)
      .filter(col("vec_id") < Similarity.NQueryVecs)
      .select(col("vec_id").as("query_id"), col("cid"), col("v").as("qv"),
        col("nrm").as("qnrm"))
      .withColumn("lut", lut)
      .drop("qv")
    val adcDot = (1 to m).map(sub =>
      element_at(element_at(col("lut"), sub), element_at(col("codes"), sub) + 1))
      .reduce(_ + _)
    // no dedup needed: the corpus side is SINGLE-assigned (one cid per
    // vector), so a (query, neighbor) pair joins on exactly one shared
    // cid — each pair is emitted once and goes straight to the window,
    // one exchange instead of the distinct-then-window two
    val scored = broadcast(probes)
      .join(encoded(s, d), Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(adcDot / sqrt(col("qnrm").cast("double") * col("nrm")), 4).as("adc_cos"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("neighbor_id"))
    val shortlist = scored.withColumn("srk", row_number().over(wAdc))
      .filter(col("srk") <= ShortK)
      .select(col("query_id"), col("neighbor_id"))
    // refine: exact cosine over the shortlist only — the raw vectors of
    // at most queries × ShortK rows (broadcast the shortlist, join the
    // corpus by id, never scan vectors for non-candidates)
    val v = Similarity.scaledVecCached(s, d)
    val q = v.select(col("vec_id").as("query_id"),
      col("v").as("qv"), col("nrm").as("qn"))
    val refined = broadcast(shortlist)
      .join(v.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("qn"), col("v"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    refined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Similarity.TopK)
      .select(col("query_id"), col("rk").cast("bigint").as("rk"),
        col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Recall@5 of the code-only ADC ranking vs the exact brute force —
    * the measured price of 64× memory compression. */
  private def pqRecall(s: SparkSession, d: String): DataFrame = {
    val exact = Similarity.knnBrute(s, d).select(col("query_id"), col("neighbor_id"))
    val approx = knnIvfPq(s, d).select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)) / lit(Similarity.TopK.toDouble), 4)
          .as("recall"))
      .orderBy(col("query_id"))
  }

  // ------------------------------------------------------------- oracle

  /** Sub-vector exploded view + sampled training set + init codebook +
    * PqIters update rounds, all keyed by sub_id so one CTE chain trains
    * every codebook (the SQL mirror of the exploded-frame training).
    * Appended after a `v AS (...)` CTE; final CTE is
    * `pqcent(sub_id, cid, c, cnrm)`. */
  private def pqCentSqlCtes: String = {
    val distSql =
      s"s.snrm + c.cnrm - 2 * list_sum(list_transform(range(1, ${SubDim + 1}), k -> s.sv[k] * c.c[k]))"
    val init =
      s"""v8 AS (
         |  SELECT vec_id, t.sub_id,
         |    list_transform(range(1, ${SubDim + 1}), i -> v[$SubDim * t.sub_id + i]) AS sv
         |  FROM v, (SELECT unnest(range(0, (SELECT len(v)//$SubDim FROM v LIMIT 1))) AS sub_id) t),
         |v8n AS (
         |  SELECT vec_id, sub_id, sv,
         |    CAST(list_sum(list_transform(sv, x -> x*x)) AS BIGINT) AS snrm
         |  FROM v8),
         |sample8 AS (
         |  SELECT vec_id, sub_id, sv, snrm FROM v8n
         |  WHERE (vec_id * ${Similarity.SampleMult}) % ${Similarity.SampleMod}
         |    < ${Similarity.SampleKeep}),
         |p0 AS (
         |  SELECT sub_id, CAST(vec_id % $Ks AS INT) AS cid, sv AS c, snrm AS cnrm
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY sub_id, vec_id % $Ks ORDER BY vec_id) AS rn
         |        FROM sample8)
         |  WHERE rn = 1)""".stripMargin
    val iters = (1 to PqIters).map { i =>
      s"""pa$i AS (
         |  SELECT vec_id, sub_id, sv, cid FROM (
         |    SELECT s.vec_id, s.sub_id, s.sv, c.cid,
         |      row_number() OVER (PARTITION BY s.vec_id, s.sub_id
         |        ORDER BY $distSql, c.cid) AS rn
         |    FROM sample8 s JOIN p${i - 1} c ON s.sub_id = c.sub_id)
         |  WHERE rn = 1),
         |pu$i AS (
         |  SELECT sub_id, cid, idx,
         |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS comp
         |  FROM (SELECT sub_id, cid, unnest(sv) AS x,
         |          generate_subscripts(sv, 1) AS idx FROM pa$i)
         |  GROUP BY sub_id, cid, idx),
         |p$i AS (
         |  SELECT sub_id, cid, c,
         |    CAST(list_sum(list_transform(c, x -> x*x)) AS BIGINT) AS cnrm
         |  FROM (SELECT sub_id, cid, list(comp ORDER BY idx) AS c
         |        FROM pu$i GROUP BY sub_id, cid))""".stripMargin
    }
    (Seq(init) ++ iters ++
      Seq(s"pqcent AS (SELECT sub_id, cid, c, cnrm FROM p$PqIters)")).mkString(",\n")
  }

  /** Per-(vec, sub) code assignment CTE over the full corpus. */
  private def pqCodesSqlCte: String =
    s"""pqcode AS (
       |  SELECT vec_id, sub_id, cid FROM (
       |    SELECT s.vec_id, s.sub_id, c.cid,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sub_id
       |        ORDER BY s.snrm + c.cnrm - 2 * list_sum(list_transform(range(1, ${SubDim + 1}), k -> s.sv[k] * c.c[k])),
       |        c.cid) AS rn
       |    FROM v8n s JOIN pqcent c ON s.sub_id = c.sub_id)
       |  WHERE rn = 1)""".stripMargin

  private def pqCodesSql =
    s"""WITH v AS (${Similarity.scaledVecSql}),
       |$pqCentSqlCtes,
       |$pqCodesSqlCte
       |SELECT sub_id, cid, count(*) AS n_vecs
       |FROM pqcode GROUP BY 1, 2 ORDER BY sub_id, cid""".stripMargin

  private def knnIvfPqSql =
    s"""WITH v AS (${Similarity.scaledVecSql}),
       |${Similarity.centroidsSqlCtes},
       |${Similarity.rankedSql},
       |$pqCentSqlCtes,
       |$pqCodesSqlCte,
       |probes AS (
       |  SELECT vec_id AS query_id, cid
       |  FROM ranked WHERE rn <= (SELECT np FROM kparam) AND vec_id < ${Similarity.NQueryVecs}),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p
       |  JOIN (SELECT vec_id, cid FROM ranked WHERE rn = 1) a ON p.cid = a.cid
       |  WHERE p.query_id <> a.vec_id),
       |adc AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    CAST(sum(list_sum(list_transform(range(1, ${SubDim + 1}), k -> q.sv[k] * pc.c[k]))) AS BIGINT)
       |      AS adc_dot
       |  FROM cand c
       |  JOIN pqcode n ON n.vec_id = c.neighbor_id
       |  JOIN pqcent pc ON pc.sub_id = n.sub_id AND pc.cid = n.cid
       |  JOIN v8n q ON q.vec_id = c.query_id AND q.sub_id = n.sub_id
       |  GROUP BY c.query_id, c.neighbor_id),
       |adcc AS (
       |  SELECT a.query_id, a.neighbor_id,
       |    round(a.adc_dot / sqrt(CAST(qn.nrm AS DOUBLE) * nn.nrm), 4) AS adc_cos
       |  FROM adc a
       |  JOIN v qn ON qn.vec_id = a.query_id
       |  JOIN v nn ON nn.vec_id = a.neighbor_id),
       |shortlist AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_cos DESC, neighbor_id) AS srk FROM adcc)
       |  WHERE srk <= $ShortK),
       |refined AS (
       |  SELECT sl.query_id, sl.neighbor_id,
       |    ${Similarity.cosineSql("q", "n")} AS cos
       |  FROM shortlist sl
       |  JOIN v q ON q.vec_id = sl.query_id
       |  JOIN v n ON n.vec_id = sl.neighbor_id),
       |topk AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id) AS rk FROM refined)
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, cos
       |FROM topk WHERE rk <= ${Similarity.TopK}
       |ORDER BY query_id, rk""".stripMargin

  private def pqRecallSql =
    s"""WITH exact AS (${Similarity.knnBruteSql}),
       |approx AS ($knnIvfPqSql),
       |hits AS (
       |  SELECT e.query_id, count(*) AS n_hits
       |  FROM exact e JOIN approx a
       |    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
       |  GROUP BY e.query_id)
       |SELECT q.query_id,
       |  coalesce(h.n_hits, 0) AS n_hits,
       |  round(coalesce(h.n_hits, 0) / CAST(${Similarity.TopK} AS DOUBLE), 4) AS recall
       |FROM (SELECT DISTINCT query_id FROM exact) q
       |LEFT JOIN hits h ON q.query_id = h.query_id
       |ORDER BY q.query_id""".stripMargin

  override def all: Seq[GraftQuery] = Seq(
    GraftQuery("sim_pq_codes", pqCodes, Some(pqCodesSql)),
    GraftQuery("sim_knn_ivfpq", knnIvfPq, Some(knnIvfPqSql)),
    GraftQuery("sim_pq_recall", pqRecall, Some(pqRecallSql)),
  )
}
