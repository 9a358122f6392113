package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Recursive plan collectors that see THROUGH the wrappers Spark hides
  * subtrees behind — persisted frames (InMemoryRelation / its scan), AQE
  * plan wrappers and query stages, reused exchanges — so plan pins can
  * assert over the whole EFFECTIVE operator tree. A pin that walks only
  * the top-level plan goes blind the moment an operator persists an
  * intermediate frame: the very anti-pattern it polices could hide
  * inside the cache.
  *
  * Note: a ReusedExchangeExec aliases a subtree that also exists
  * elsewhere in the same tree, so matches under it can appear twice —
  * fine for emptiness pins; exact-count pins should target plans
  * without reuse (all current ones do).
  */
object PlanWalk {
  /** Collect over a physical plan, descending through wrappers. */
  def deepCollect[T](sp: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val nested = sp.collectWithSubqueries {
      case a: AdaptiveSparkPlanExec => deepCollect(a.executedPlan)(pf)
      case q: QueryStageExec => deepCollect(q.plan)(pf)
      case r: ReusedExchangeExec => deepCollect(r.child)(pf)
      case s: InMemoryTableScanExec => deepCollect(s.relation.cachedPlan)(pf)
    }.flatten
    sp.collectWithSubqueries(pf) ++ nested
  }

  /** Collect over a logical plan AND the physical plans of every
    * persisted frame it reads, recursively. */
  def deepCollectLogical[T](p: LogicalPlan)(
      lpf: PartialFunction[LogicalPlan, T])(
      ppf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val nested = p.collectWithSubqueries {
      case r: InMemoryRelation => deepCollect(r.cachedPlan)(ppf)
    }.flatten
    p.collectWithSubqueries(lpf) ++ nested
  }

  /** Every window-family node's partition key set, walked through the
    * wrappers above — THE one window collector, shared by the global
    * WindowKeyGateSpec and the per-operator plan pins so the two can
    * never drift apart (a wrapper handled in one walk but not the other
    * would re-open exactly the blindness this object exists to close). */
  def windowKeySets(p: LogicalPlan): Seq[Set[String]] = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    def keys(exprs: Seq[Expression]): Set[String] =
      exprs.flatMap(_.references.toSeq.map(_.name)).toSet
    deepCollectLogical[Set[String]](p) {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        keys(w.partitionSpec)
      case w: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit =>
        keys(w.partitionSpec)
    } {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        keys(w.partitionSpec)
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        keys(w.partitionSpec)
    }
  }
}
