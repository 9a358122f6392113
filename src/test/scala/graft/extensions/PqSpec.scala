package graft.extensions

import graft.SparkTestBase

/** Product-quantization semantics on the sf0.001 fixture. */
class PqSpec extends SparkTestBase {

  test("codebook training is deterministic and non-degenerate") {
    val c1 = Pq.codebooks(spark, sf0001)
    Pq.invalidateCaches()
    val c2 = Pq.codebooks(spark, sf0001)
    assert(c1 === c2, "retraining must be bit-identical")
    val bySub = c1.groupBy(_.sub)
    assert(bySub.size > 1, "only one subspace trained")
    bySub.foreach { case (sub, cs) =>
      assert(cs.map(_.c).distinct.size === cs.size,
        s"duplicate centroids in subspace $sub")
    }
  }

  test("no code degenerates: every subspace spreads the corpus") {
    val rows = graft.SparkEntry.queries("sim_pq_codes")(spark, sf0001).collect()
    val bySub = rows.groupBy(_.getInt(0))
    bySub.foreach { case (sub, rs) =>
      val sizes = rs.map(_.getAs[Long]("n_vecs"))
      val total = sizes.sum.toDouble
      assert(sizes.length >= 4, s"subspace $sub uses only ${sizes.length} codes")
      assert(sizes.max / total <= 0.5,
        s"subspace $sub: one code holds ${sizes.max / total} of the corpus")
    }
  }

  test("IVF-PQ cascade emits exactly top-k and recall clears the floor") {
    val topk = graft.SparkEntry.queries("sim_knn_ivfpq")(spark, sf0001)
    val perQuery = topk.groupBy("query_id").count().collect()
    assert(perQuery.nonEmpty && perQuery.forall(_.getLong(1) === Similarity.TopK.toLong))
    val recall = graft.SparkEntry.queries("sim_pq_recall")(spark, sf0001)
      .collect().map(r => r.getDouble(r.fieldIndex("recall")))
    assert(recall.forall(r => r >= 0.0 && r <= 1.0))
    // the exact re-rank bounds the cascade by IVF candidate recall; on the
    // near-random fixture the ADC shortlist must still keep most true
    // neighbors that reached the probed lists
    val mean = recall.sum / recall.length
    assert(mean >= 0.4, s"mean recall@5 = $mean — PQ cascade not earning its keep")
  }
}
