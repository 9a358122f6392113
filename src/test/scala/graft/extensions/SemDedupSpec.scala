package graft.extensions

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Semantic-dedup and decontamination invariants the oracle hash can't
  * express directly: set relationships between the outputs, not values. */
class SemDedupSpec extends SparkTestBase {

  test("dedup_semantic: kept < removed, removed set consistent with summary") {
    val removed = SparkEntry.queries("dedup_semantic")(spark, sf0001).collect()
    // keep-the-earliest rule: every removed vector's representative has a
    // strictly smaller id and lives in the same cluster
    removed.foreach { r =>
      assert(r.getAs[Long]("kept_id") < r.getAs[Long]("removed_id"))
      assert(r.getAs[Double]("cos") >= 0.45)
    }
    // a removed id appears exactly once (one representative each)
    val ids = removed.map(_.getAs[Long]("removed_id"))
    assert(ids.distinct.length === ids.length)
    // the per-cluster summary counts the same removals
    val summary = SparkEntry.queries("dedup_semantic_summary")(spark, sf0001).collect()
    assert(summary.map(_.getAs[Long]("n_removed")).sum === ids.length)
    summary.foreach { s =>
      assert(s.getAs[Long]("n_kept") + s.getAs[Long]("n_removed") === s.getAs[Long]("n_vecs"))
    }
    // the corpus is fully accounted for
    val nVecs = graft.Tables.embeddings(spark, sf0001).count()
    assert(summary.map(_.getAs[Long]("n_vecs")).sum === nVecs)
  }

  test("dedup_semantic removes no more than the probe-expanded pair family") {
    // single-assignment pairs are a subset of the multi-assigned (nprobe)
    // pairs dedup_embedding_pairs finds at the same threshold
    val semantic = SparkEntry.queries("dedup_semantic")(spark, sf0001)
      .select(col("kept_id"), col("removed_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expanded = SparkEntry.queries("dedup_embedding_pairs")(spark, sf0001)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(semantic.subsetOf(expanded),
      s"semantic pairs not within probe-expanded family: ${semantic -- expanded}")
  }

  test("text_contamination: eval slice excluded, duplicates of eval docs flagged") {
    val rows = SparkEntry.queries("text_contamination")(spark, sf0001).collect()
    // no benchmark doc scores itself
    assert(rows.forall(_.getAs[Long]("doc_id") % 25 != 0))
    // fractions are consistent
    rows.foreach { r =>
      val (n, hit) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"))
      assert(hit >= 0 && hit <= n)
      assert(r.getAs[Boolean]("contaminated") === (hit * 5 >= n * 4))
    }
    // every EXACT duplicate of an eval doc must be flagged contaminated
    // (its trigram multiset is identical to a benchmark member's)
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), md5(lower(col("text"))).as("fp"))
    val evalFps = docs.filter(col("doc_id") % 25 === 0)
      .select(col("fp")).distinct()
    val dupIds = docs.filter(col("doc_id") % 25 =!= 0)
      .join(evalFps, Seq("fp"), "left_semi")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val flagged = rows.filter(_.getAs[Boolean]("contaminated"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(dupIds.subsetOf(flagged),
      s"unflagged exact eval duplicates: ${dupIds -- flagged}")
  }
}
