package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan shape assertions: correctness says the numbers match;
  * these say the PLAN is the one that survives a 100× scale-up. */
class PlanSpec extends SparkTestBase {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("fixed-size dimensions are broadcast in the multiway join (q11)") {
    val plan = planOf("q11_multiway_join")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("filters and projections reach the parquet scan (q02)") {
    val plan = planOf("q02_filter_project")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThan(o_orderdate"),
      plan.take(3000))
    // column pruning: the scan reads only the 4 needed columns + filter col
    assert(!plan.contains("o_comment"), "scan should not read unused columns")
  }

  test("top-N compiles to TakeOrderedAndProject, not a full sort (q05)") {
    val plan = planOf("q05_topn")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("no cartesian products anywhere in the registered surface") {
    // every self-join in the dedup/similarity family must be an equi-join
    // on band/bucket keys; a CartesianProduct would mean an all-pairs plan
    for (name <- Seq("dedup_minhash_pairs", "dedup_simhash_pairs",
        "dedup_embedding_pairs", "dedup_incremental", "sim_knn_ivf")) {
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"), s"$name: ${plan.take(2000)}")
    }
  }

  test("IVF probes broadcast against the inverted lists (sim_knn_ivf)") {
    // the tiny probe set (queries x nprobe) must be the broadcast side;
    // the corpus is joined by centroid id, never shuffled wholesale
    val plan = planOf("sim_knn_ivf")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("DSv2 source scan keeps partial aggregation (cdc_source_scan)") {
    // decode + rollup over the WAL source: map-side partial agg before
    // the single exchange on the operation key
    val plan = planOf("cdc_source_scan")
    assert(plan.contains("BatchScan") || plan.contains("cdc_log"), plan.take(2000))
    assert(plan.contains("Partial") || plan.contains("partial_count"), plan.take(3000))
  }

  test("aggregations use partial (map-side) aggregation (q01)") {
    val plan = planOf("q01_pricing_summary")
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      plan.take(3000))
  }

  test("IVF recall has no cartesian product (sim_ivf_recall)") {
    // the embedded brute-force baseline IS a broadcast nested loop by
    // design (tiny broadcast query set x corpus scan); what must never
    // appear is an unbroadcast all-pairs product
    val plan = planOf("sim_ivf_recall")
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("explode-then-aggregate keeps partial aggregation (text_top_terms)") {
    val plan = planOf("text_top_terms")
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      plan.take(3000))
  }

  test("cluster assignment broadcasts the tiny label table (dedup_clusters)") {
    // the final corpus←labels join must not shuffle the corpus side
    val plan = planOf("dedup_clusters")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("as-of join compiles to a single keyed window, not a join (q37)") {
    val plan = planOf("q37_asof_join")
    assert(plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("Join"), "the window composition must avoid any join")
  }

  test("incremental merge is an anti-join + union, no cartesian (cdc_apply)") {
    val plan = planOf("cdc_apply_changes")
    assert(plan.contains("LeftAnti"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("corpus cleaning prunes unused columns at the scan (text_clean_corpus)") {
    val plan = planOf("text_clean_corpus")
    // only doc_id, lang, text feed the pipeline; the scan must not read
    // the table's other columns
    assert(!plan.contains("n_chars"), "scan should prune n_chars")
  }

  test("decontamination broadcasts the benchmark gram set (text_contamination)") {
    // the eval slice is tiny relative to the corpus: its distinct-gram
    // table must be the broadcast side — the corpus scan (the 100 TB
    // side) is never shuffled for the membership join
    val plan = planOf("text_contamination")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("range join broadcasts the band table, never the fact side (q43)") {
    // a non-equi band join is a nested-loop by nature; the only
    // admissible shape is broadcasting the 4-row band table
    val plan = planOf("q43_range_join")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("semantic dedup joins within clusters only, no cartesian (dedup_semantic)") {
    // SemDeDup's pairwise work is an equi-join on the centroid id; an
    // all-pairs product would be the O(n²) trap the clustering exists
    // to avoid
    val plan = planOf("dedup_semantic")
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("IVF-PQ ADC stage feeds the shortlist window directly (sim_knn_ivfpq)") {
    // the corpus side is single-assigned, so (query, neighbor) candidate
    // pairs are already unique off the broadcast join — a dedup before the
    // shortlist window would be a full extra exchange of the candidate
    // set. Admissible exchanges: the two shortlist/top-k windows plus the
    // final presentation sort; any more means a dedup crept back in.
    val plan = planOf("sim_knn_ivfpq")
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val exchanges = "(?m)^\\s*[+:]- Exchange".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <= 3 exchanges (2 windows + sort), got $exchanges:\n${plan.take(3000)}")
  }

  test("cluster sampling is one keyed window, no extra shuffle (sim_cluster_sample)") {
    // the per-cluster quota must come from a single window over the
    // assignment — anything joining the corpus back to itself here would
    // be a new shuffle the operator does not need
    val plan = planOf("sim_cluster_sample")
    assert(plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("Join"), "quota selection must not join")
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("truncate-state watermark is broadcast, never a driver collect (cdc_truncate_state)") {
    // the 1-row TRUNCATE watermark crosses back in via broadcast; the
    // envelope side must not shuffle for it
    val plan = planOf("cdc_truncate_state")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("cube expands grouping sets in one pass with partial agg (q41)") {
    val plan = planOf("q41_cube")
    assert(plan.contains("Expand"), plan.take(3000))
    assert(plan.contains("Partial") || plan.contains("partial_count"), plan.take(3000))
  }

  test("sequence packing is shard-parallel: window by source, no join (text_pack_sequences)") {
    // the cumulative token sum must be a PER-SOURCE window (shard-local
    // packing) — a global-order window would funnel the corpus through
    // one task; and assignment is pure arithmetic, never a join back
    val plan = planOf("text_pack_sequences")
    assert(plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("Join"), "bin assignment must not join")
    // window partition + final agg + presentation sort only
    val exchanges = "(?m)^\\s*[+:]- Exchange".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <= 3 exchanges, got $exchanges:\n${plan.take(3000)}")
    assert(!plan.contains("SinglePartition"),
      "packing must never collapse to a single partition")
  }

  test("mixture rebalance broadcasts the per-source totals (text_mix_rebalance)") {
    // the per-source token totals and the 1-row minimum are tiny
    // aggregates crossed back in via broadcast; the corpus must never
    // sort-merge or shuffle for them
    val plan = planOf("text_mix_rebalance")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), "corpus must not shuffle for the totals")
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("pixel stats stay partition-local until the presentation sort (mm_pixel_stats)") {
    // encode → decode → per-image stats are one mapPartitions chain; the
    // only admissible exchange is the final ORDER BY doc_id
    val plan = planOf("mm_pixel_stats")
    assert(!plan.contains("Join"), plan.take(2000))
    val exchanges = "(?m)^\\s*[+:]- Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected <= 1 exchange (sort only), got $exchanges:\n${plan.take(3000)}")
  }

  test("time-RANGE window is one keyed exchange + sort (q45_time_range_window)") {
    val plan = planOf("q45_time_range_window")
    assert(plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
    val exchanges = "(?m)^\\s*[+:]- Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 exchanges (window + sort), got $exchanges:\n${plan.take(3000)}")
  }

  test("overlap chunking is scan-side row multiplication, no shuffle (text_chunk_overlap)") {
    val plan = planOf("text_chunk_overlap")
    assert(plan.contains("Generate"), plan.take(2000)) // explode, not a join
    assert(!plan.contains("Join"), plan.take(2000))
    val exchanges = "(?m)^\\s*[+:]- Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected <= 1 exchange (sort only), got $exchanges:\n${plan.take(3000)}")
  }

  test("PII redaction is scan + partial agg; the text never shuffles (text_pii_redact)") {
    val plan = planOf("text_pii_redact")
    // per-row regex work happens scan-side; only partial aggregates cross
    // the wire (groupBy source), then the presentation sort
    assert(!plan.contains("Join"), plan.take(2000))
    assert(plan.contains("Partial") || plan.contains("partial_count"), plan.take(3000))
    val exchanges = "(?m)^\\s*[+:]- Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 exchanges (agg + sort), got $exchanges:\n${plan.take(3000)}")
    // column pruning: the scan must not read the unused lang/n_chars cols
    assert(!plan.contains("n_chars"), "scan should not read unused columns")
  }

  test("fp-dedup is a partial-aggregated min_by, not a window (text_clean_corpus)") {
    // keep-one-per-fingerprint must partial-aggregate map-side: a hot
    // fingerprint (one boilerplate page duplicated across the crawl)
    // reduces to one candidate row per map task BEFORE the shuffle,
    // where the old fp-keyed row_number window buffered the whole
    // duplicate cluster in a single task
    val plan = planOf("text_clean_corpus")
    assert(!plan.contains("Window"), s"fp dedup must not window:\n${plan.take(3000)}")
    // the marker must be the min_by aggregate itself in Partial mode —
    // a bare "Partial" matches any other partial aggregate in the plan
    // and would let a regression losing the partial min_by pass
    assert(plan.contains("partial_min_by"),
      s"min_by must partial-aggregate:\n${plan.take(3000)}")
  }

  test("top-K-per-group windows push a WindowGroupLimit below the shuffle") {
    // text_top_terms' lang and q20's c_nationkey partitions are
    // whitelisted low-cardinality keys, but the per-key row set (distinct
    // terms / customers per key) grows with the corpus — a plain
    // rank-then-filter window would buffer it whole in one task. Spark's
    // InferWindowGroupLimit turns `row_number/rank <= k` into a two-phase
    // WindowGroupLimit: each MAP task keeps only its local top-k per key
    // before the exchange, so the final window sees <= k x tasks rows per
    // key regardless of corpus size. Pin that the pushdown fires (a
    // refactor that breaks the filter pattern — e.g. ranking into a
    // non-literal bound — would silently lose it).
    for (name <- Seq("text_top_terms", "q20_window_rank",
        "sim_cluster_sample", "sim_coreset_prototypes")) {
      val plan = planOf(name)
      // formatted explain separates the node tree from its Arguments
      // blocks: the Partial-mode limit shows as
      // "Arguments: [key], [order], row_number()|rank(), k, Partial"
      assert(plan.contains("WindowGroupLimit") &&
        "(row_number|rank)\\([^)]*\\), \\d+, Partial".r.findFirstIn(plan).nonEmpty,
        s"$name: no map-side (Partial) WindowGroupLimit:\n${plan.take(3000)}")
    }
  }
}
