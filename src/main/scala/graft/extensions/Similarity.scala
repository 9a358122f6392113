package graft.extensions

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (vec_id, embedding: array<float>, label).
  *
  * Determinism contract: float dot products accumulate differently across
  * engines, so similarity is computed on SCALED-INTEGER vectors —
  * round(x * 1000) as BIGINT per component. Integer sums are associative
  * (any accumulation order gives the same value); the single final
  * divide + sqrt are correctly-rounded IEEE doubles, so both engines emit
  * bit-identical cosines. Rounded to 4 decimals on output.
  *
  * Two operators:
  *  - brute-force top-k: the exact baseline. The (tiny) query set is
  *    broadcast against the corpus scan — at 100 TB the corpus is never
  *    shuffled, and per-partition top-k folds into the final window.
  *  - IVF-style bucketed top-k: coarse-quantize every vector to a bucket
  *    (sign pattern of leading components here — deterministic stand-in
  *    for trained IVF centroids) and probe only the query's bucket. The
  *    scale path: candidate generation is a bucket equi-join, cost drops
  *    by the bucket fan-out, recall is approximate by design.
  */
object Similarity extends QueryModule {

  private val Scale = 1000
  private val TopK = 5
  private val NQueryVecs = 10 // vec_id < 10 are the query set
  private val SignDims = 3    // sign-bucket on the first 3 components

  /** Scaled-integer vectors with their squared norms. */
  def scaledVec(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"), col("label"),
      transform(col("embedding"), x => round(x.cast("double") * Scale).cast("long")).as("v"))
      .withColumn("nrm", graft.functions.ScaledDotProduct(col("v"), col("v")))

  /** One persisted copy per (session, sfDir): seven registered queries
    * consume this projection (brute/IVF/recall/centroids/embedding-dedup);
    * before the cache each of them persisted a private copy. Includes the
    * sign bucket — brute-force consumers just ignore the column. */
  private val vecCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  def scaledVecCached(s: SparkSession, d: String): DataFrame =
    vecCache.getOrElseUpdate((System.identityHashCode(s), d),
      scaledVec(s, d).withColumn("bucket", signBucket(col("v"))).persist())

  /** Release every persisted frame this module holds (see
    * [[Dedup.invalidateCaches]] for the contract). */
  def invalidateCaches(): Unit = {
    vecCache.values.foreach(_.unpersist())
    vecCache.clear()
  }

  val scaledVecSql: String =
    s"""SELECT vec_id, label,
       |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS v,
       |  list_sum(list_transform(list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * $Scale) AS BIGINT)), x -> x*x)) AS nrm
       |FROM embeddings""".stripMargin

  /** Exact cosine between two scaled vectors, rounded to 4 decimals.
    * The dot product is a native codegen'd expression — the interpreted
    * `aggregate(zip_with(...))` equivalent spent the whole bucketed-join
    * runtime in per-element lambda frames
    * (see [[graft.functions.ScaledDotProduct]]). */
  def cosine(va: Column, nrmA: Column, vb: Column, nrmB: Column): Column =
    round(
      graft.functions.ScaledDotProduct(va, vb) /
        sqrt(nrmA.cast("double") * nrmB.cast("double")), 4)

  /** DuckDB equivalent of [[cosine]] over aliases `a`/`b` with columns v/nrm. */
  def cosineSql(a: String, b: String): String =
    s"""round(list_sum(list_transform(range(1, len($a.v)+1), i -> $a.v[i] * $b.v[i]))
       |  / sqrt(CAST($a.nrm AS DOUBLE) * $b.nrm), 4)""".stripMargin

  /** Sign-pattern bucket over the first [[SignDims]] components: a coarse
    * quantizer that is identical in both engines. */
  def signBucket(v: Column): Column =
    concat((1 to SignDims).map(i =>
      when(element_at(v, i) >= 0, "1").otherwise("0")): _*)

  def signBucketSql(v: String): String =
    (1 to SignDims)
      .map(i => s"CASE WHEN $v[$i] >= 0 THEN '1' ELSE '0' END")
      .mkString("(", " || ", ")")

  // ------------------------------------------------------------ brute force

  private def knnBrute(s: SparkSession, d: String): DataFrame = {
    val v = scaledVecCached(s, d)
    val queries = v.filter(col("vec_id") < NQueryVecs)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = broadcast(queries)
      .join(v, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("label"),
        cosine(col("qv"), col("qnrm"), col("v"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk").cast("bigint").as("rk"),
        col("neighbor_id"), col("label"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  private val knnBruteSql =
    s"""WITH v AS ($scaledVecSql),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM v WHERE vec_id < $NQueryVecs),
       |scored AS (
       |  SELECT q.query_id, v.vec_id AS neighbor_id, v.label,
       |    round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i] * v.v[i]))
       |      / sqrt(CAST(q.qnrm AS DOUBLE) * v.nrm), 4) AS cos
       |  FROM q JOIN v ON q.query_id <> v.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id) AS rk FROM scored)
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, label, cos
       |FROM ranked WHERE rk <= $TopK
       |ORDER BY query_id, rk""".stripMargin

  // ----------------------------------------------------------- IVF-bucketed

  private def knnIvf(s: SparkSession, d: String): DataFrame = {
    val v = scaledVecCached(s, d)
    val queries = v.filter(col("vec_id") < NQueryVecs)
      .select(col("vec_id").as("query_id"), col("bucket"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = broadcast(queries)
      .join(v, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("qnrm"), col("v"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk").cast("bigint").as("rk"),
        col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  private val knnIvfSql =
    s"""WITH v0 AS ($scaledVecSql),
       |v AS (SELECT *, ${signBucketSql("v0.v")} AS bucket FROM v0),
       |q AS (SELECT vec_id AS query_id, bucket, v AS qv, nrm AS qnrm
       |      FROM v WHERE vec_id < $NQueryVecs),
       |scored AS (
       |  SELECT q.query_id, v.vec_id AS neighbor_id,
       |    round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i] * v.v[i]))
       |      / sqrt(CAST(q.qnrm AS DOUBLE) * v.nrm), 4) AS cos
       |  FROM q JOIN v ON q.bucket = v.bucket AND q.query_id <> v.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id) AS rk FROM scored)
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, cos
       |FROM ranked WHERE rk <= $TopK
       |ORDER BY query_id, rk""".stripMargin

  // ------------------------------------------------------------- IVF recall

  /** Recall@k of the IVF-bucketed search against the exact brute-force
    * answer — the quality metric that makes the approximate operator's
    * trade-off measurable (probing one sign bucket trades recall for a
    * 2^SignDims candidate-set reduction). Both sides are deterministic,
    * so the recall itself is oracle-checkable. */
  private def ivfRecall(s: SparkSession, d: String): DataFrame = {
    val exact = knnBrute(s, d).select(col("query_id"), col("neighbor_id"))
    val approx = knnIvf(s, d).select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)) / lit(TopK.toDouble), 4).as("recall"))
      .orderBy(col("query_id"))
  }

  private val ivfRecallSql =
    s"""WITH exact AS ($knnBruteSql),
       |approx AS ($knnIvfSql),
       |hits AS (
       |  SELECT e.query_id, count(*) AS n_hits
       |  FROM exact e JOIN approx a
       |    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
       |  GROUP BY e.query_id)
       |SELECT q.query_id,
       |  coalesce(h.n_hits, 0) AS n_hits,
       |  round(coalesce(h.n_hits, 0) / CAST($TopK AS DOUBLE), 4) AS recall
       |FROM (SELECT DISTINCT query_id FROM exact) q
       |LEFT JOIN hits h ON q.query_id = h.query_id
       |ORDER BY q.query_id""".stripMargin

  // --------------------------------------------------------- label centroids

  /** Mean vector per label (integer sums + one exact division per
    * component), then each query vector's nearest centroid — a
    * classify-by-centroid operator exercising distributed vector agg. */
  private def labelCentroids(s: SparkSession, d: String): DataFrame = {
    val v = scaledVecCached(s, d)
    val byLabel = v.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(element_at(col("v"), 1)), 4).as("c1"),
        round(avg(element_at(col("v"), 2)), 4).as("c2"),
        round(avg(element_at(col("v"), 3)), 4).as("c3"))
      .orderBy(col("label"))
    byLabel
  }

  private val labelCentroidsSql =
    s"""WITH v AS ($scaledVecSql)
       |SELECT label, count(*) AS n_vecs,
       |  round(avg(v[1]), 4) AS c1, round(avg(v[2]), 4) AS c2,
       |  round(avg(v[3]), 4) AS c3
       |FROM v GROUP BY label ORDER BY label""".stripMargin

  override def all: Seq[GraftQuery] = Seq(
    GraftQuery("sim_knn_brute", knnBrute, Some(knnBruteSql)),
    GraftQuery("sim_knn_ivf", knnIvf, Some(knnIvfSql)),
    GraftQuery("sim_ivf_recall", ivfRecall, Some(ivfRecallSql)),
    GraftQuery("sim_label_centroids", labelCentroids, Some(labelCentroidsSql)),
  )
}
