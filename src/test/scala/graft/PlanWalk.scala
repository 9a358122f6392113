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
}
