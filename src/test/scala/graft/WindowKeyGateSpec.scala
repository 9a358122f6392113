package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Plan-scan meta-gate over the WHOLE registered query surface: no query
  * may plan a Window keyed on a corpus-content key.
  *
  * WindowExec buffers each partition in ONE task and AQE cannot
  * skew-split a window, so a window keyed on corpus content — a shingle
  * hash, a bigram, a fingerprint, raw text — funnels the hottest key's
  * entire row set through a single straggler at 100×. The engine's
  * idioms for those stages are groupBy + join-back (partial-aggregates
  * map-side, leaves a skew-splittable equi-join) and groupBy + min_by
  * (keep-one-per-key). Earlier rounds fixed this class site by site
  * (exact-jaccard shingle frequency, dup-span window hashes, bigram
  * frequency, fp dedup); this gate makes the class unreinventable by
  * walking EVERY registered query's optimized plan — including plans
  * hidden inside persisted frames (InMemoryRelation), recursively — and
  * admitting only partition keys that are bounded by construction.
  *
  * Limitation (documented, inherent): windows inside frames a query
  * EXECUTES during construction and reduces to a driver-side local
  * relation (e.g. the langid profile trainer) never appear in any
  * returned plan; those sites are pinned by their own module specs.
  */
class WindowKeyGateSpec extends SparkTestBase {

  /** Partition keys bounded by construction: per-entity keys whose
    * partition size is one entity's rows (doc_id, vec_id, query_id,
    * user_id, o_custkey, pk/id), model-sized keys (cid, sub_id — one
    * partition per centroid/subspace over bounded training slices), or
    * enum-like keys over PRE-AGGREGATED frames (lang, plang). */
  private val allowed: Set[String] = Set(
    // per-document / per-vector / per-entity
    "doc_id", "query_id", "user_id", "o_custkey",
    // model-sized (one partition per centroid / language)
    "cid", "lang",
    // banded-join bucket ids (bounded by the overflow guard)
    "id_b",
    // low-cardinality enums — windows here implement the query's OWN
    // semantics (rank within status/priority, top-per-nation/source)
    // over frames the operator pre-aggregates or that group-bounded
    // semantics keep small; a NEW window on one of these over a raw
    // corpus-scale frame still deserves a look, but these are not
    // content keys and cannot be adversarially hot the way a shingle
    // hash or fingerprint can
    "o_orderstatus", "o_orderpriority", "c_nationkey", "source")
  // deliberately NOT listed (exercise the gate before adding): vec_id,
  // sub_id, plang, pk/id — today's plans surface no windows on them

  /** Queries whose plans legitimately contain a GLOBAL window (empty
    * partitionSpec), each over a frame bounded by construction —
    * global-ordered semantics over aggregated/bounded inputs, never the
    * raw corpus:
    *  - q29_moving_avg: 7-day moving average over the day-aggregated
    *    frame — one row per calendar day;
    *  - text_ppl_buckets: cumulative counts descending the DISTINCT
    *    ROUNDED-score grid, ≤ ~1e5 rows by the 1e-4 granularity
    *    regardless of corpus size (the operator's documented design —
    *    the corpus itself buckets by broadcast cutoff comparison). */
  private val globalWindowBounded: Set[String] =
    Set("q29_moving_avg", "text_ppl_buckets")

  /** Every window's partition-key name set, walked through persisted
    * frames, AQE wrappers, and query stages — [[PlanWalk.windowKeySets]],
    * the collector shared with the per-operator pins. */
  private def windows(plan: LogicalPlan): Seq[Set[String]] =
    PlanWalk.windowKeySets(plan)

  test("every registered query plans Windows keyed only on bounded keys") {
    // fresh caches: Spark's cache replacement would otherwise swallow
    // operator trees populated by earlier suites into opaque
    // InMemoryRelations built from THEIR plans; the walk above descends
    // into relations this pass persists itself.
    graft.EngineCaches.invalidateAll()
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      Future {
        val ws = windows(fn(spark, sf0001).queryExecution.optimizedPlan)
        (name, ws)
      }
    }
    val results = Await.result(Future.sequence(futures), Duration(1800, "s"))
    pool.shutdown()
    val offenders = results.flatMap { case (name, ws) =>
      val bad = ws.filter { ks =>
        if (ks.isEmpty) !globalWindowBounded.contains(name)
        else !ks.subsetOf(allowed)
      }
      if (bad.isEmpty) None
      else Some(s"$name: ${bad.map(_.toSeq.sorted.mkString("{", ",", "}")).mkString(" ")}")
    }
    info("observed window key sets: " + results.flatMap(_._2).distinct
      .map(_.toSeq.sorted.mkString("{", ",", "}")).sorted.mkString(" "))
    assert(offenders.isEmpty,
      s"\nwindows keyed on non-whitelisted keys:\n${offenders.mkString("\n")}")
    // anti-vacuity: the walk must actually see the engine's per-doc /
    // per-query windows, or the gate is matching nothing
    val total = results.map(_._2.size).sum
    assert(total >= 10, s"gate saw only $total windows — walk broken?")
    graft.EngineCaches.invalidateAll()
  }
}
