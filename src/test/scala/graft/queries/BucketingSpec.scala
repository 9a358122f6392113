package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: the 100 TB answer to repeated large joins.
  * Both sides pre-hash-partitioned into the same bucket count on the join
  * key → the sort-merge join runs with NO Exchange on either side. This is
  * the layout the engine would use for the lineitem⋈orders family of
  * queries at scale instead of re-shuffling per query.
  */
class BucketingSpec extends SparkTestBase {

  test("join of co-bucketed tables plans without a shuffle") {
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      graft.Tables.orders(spark, sf0001)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.format("parquet")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable(s"$db.orders_b")
      graft.Tables.customer(spark, sf0001)
        .select("c_custkey", "c_name", "c_nationkey")
        .write.format("parquet")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable(s"$db.customer_b")

      // disable broadcast so the join exercises the bucketed SMJ path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(s"$db.orders_b")
        .join(spark.table(s"$db.customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n${plan.take(2000)}")
      // and it still computes the right thing
      val n = joined.count()
      val expected = graft.Tables.orders(spark, sf0001)
        .join(graft.Tables.customer(spark, sf0001),
          col("o_custkey") === col("c_custkey")).count()
      assert(n === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
