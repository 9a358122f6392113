package graft.extensions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Similarity-operator semantics on the sf0.001 fixture. */
class SimilaritySpec extends SparkTestBase {

  test("scaled cosine is exact: self-similarity is 1, symmetric pairs agree") {
    val v = Similarity.scaledVecCached(spark, sf0001).limit(20)
    val self = v.alias("a").join(v.alias("b"),
        col("a.vec_id") === col("b.vec_id"))
      .select(Similarity.cosine(
        col("a.v"), col("a.nrm"), col("b.v"), col("b.nrm")).as("cos"))
      .collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("sign bucket is a deterministic 2^3-way partition") {
    val b = Similarity.scaledVecCached(spark, sf0001)
      .select(col("bucket")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(b.subsetOf(Set("000", "001", "010", "011", "100", "101", "110", "111")))
    assert(b.nonEmpty)
  }

  test("IVF recall is between 0 and 1 and brute-force top-k is exactly k") {
    val brute = graft.SparkEntry.queries("sim_knn_brute")(spark, sf0001)
    val perQuery = brute.groupBy("query_id").count().collect()
    assert(perQuery.nonEmpty && perQuery.forall(_.getLong(1) === 5L))
    val recall = graft.SparkEntry.queries("sim_ivf_recall")(spark, sf0001)
      .collect().map(r => r.getDouble(r.fieldIndex("recall")))
    assert(recall.forall(r => r >= 0.0 && r <= 1.0))
  }
}
