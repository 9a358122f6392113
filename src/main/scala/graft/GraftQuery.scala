package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine operation exposed through [[SparkEntry]].
  *
  * @param name   stable key, used by the driver's correctness + bench harness
  * @param run    (session, scale-factor dir) => result DataFrame
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same parquet
  *               tables; None for ops not expressible in portable SQL (those
  *               get a weaker rows-only check from the driver).
  *
  * Column names of `run`'s output and the oracle SELECT list must match
  * exactly — the driver sorts columns by name before hashing values.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A module contributing queries to the engine surface. */
trait QueryModule {
  def all: Seq[GraftQuery]
}
