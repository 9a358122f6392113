package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CdcQueries, Lifecycle, PipelineOps, Relational, SqlSurface}
import graft.extensions.{Dedup, Multimodal, Pq, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[QueryModule]] into the flat name → query map the
  * driver's correctness (DuckDB oracle at sf0.01) and bench (sf0.1)
  * harnesses consume.
  */
object SparkEntry {

  /** All registered engine modules. Order defines no semantics. */
  def modules: Seq[QueryModule] = Seq(
    Relational, CdcQueries, Lifecycle, SqlSurface, PipelineOps, TextAnalysis, Dedup, Similarity, Pq, Multimodal)

  private lazy val registry: Seq[GraftQuery] = modules.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
