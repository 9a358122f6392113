package org.apache.spark.sql.classic

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private-API bridge for graft's SQL DML lowering
  * (`graft.lake.GraftSqlExtensions`): `Dataset.ofRows` is
  * `private[sql]`, and the MERGE rule needs to materialize the already-
  * RESOLVED source plan as a DataFrame to hand to the commit log's
  * merge machinery. One forwarding method, nothing else — the same
  * in-package shim shape connector projects (e.g. Iceberg's Spark
  * extensions) use for this exact call. */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[Row] =
    Dataset.ofRows(spark, plan)
}
