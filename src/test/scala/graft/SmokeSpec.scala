package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Every registered query runs at sf0.001 — the compile-and-run gate the
  * round-1 snapshot lacked (nothing in SparkEntry may reference a ghost
  * module or throw at plan/execution time). */
class SmokeSpec extends SparkTestBase {

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching oracle column discipline") {
    // every oracle key is a registered query
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    // rows-only queries are the explicit, justified exceptions: plan text
    // and runtime metrics embed paths/timings no oracle can replay
    assert((qs -- SparkEntry.oracleSql.keySet) ==
      Set("explain_plan", "explain_analyze"))
  }

  test("all registered queries execute at sf0.001") {
    val pool = Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val futures = SparkEntry.queries.toSeq.map { case (name, fn) =>
      Future {
        try { fn(spark, sf0001).collect(); () }
        catch { case e: Throwable => failures.add(s"$name: ${e.getMessage}"); () }
      }
    }
    Await.result(Future.sequence(futures), Duration.Inf)
    pool.shutdown()
    assert(failures.isEmpty, s"failed queries: ${failures.toArray.mkString("; ")}")
  }
}
