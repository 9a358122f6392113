package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("salted join equals the plain join and spreads hot keys") {
    import spark.implicits._
    // hot-key input: 90% of facts share key 1
    val facts = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toDouble))
      .toDF("k", "v")
    val dims = (1L to 1000L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = facts.join(dims, Seq("k"))
      .agg(count(lit(1)), sum("v"), countDistinct("name")).collect()(0)
    val salted = Skew.saltedEquiJoin(facts, dims, "k", nSalts = 8)
      .agg(count(lit(1)), sum("v"), countDistinct("name")).collect()(0)
    assert(salted === plain)

    // the hot key's rows really do carry multiple salt values
    val saltSpread = facts.withColumn("_salt",
      pmod(hash(struct(facts.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .filter(col("k") === 1).select("_salt").distinct().count()
    assert(saltSpread > 4, s"hot key only spread over $saltSpread salts")
  }

  test("salted join works against real tables") {
    val plain = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001)
        .withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"))
      .count()
    val salted = Skew.saltedEquiJoin(
      Tables.orders(spark, sf0001),
      Tables.customer(spark, sf0001).withColumnRenamed("c_custkey", "o_custkey"),
      "o_custkey", nSalts = 4).count()
    assert(salted === plain && plain > 0)
  }
}
