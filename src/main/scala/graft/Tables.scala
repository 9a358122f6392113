package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * code runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1+ (bench).
  * At cluster scale these would be Iceberg tables; plain parquet paths keep
  * the oracle (DuckDB over the same files) trivially comparable.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Name-based loader; routes `events` through its nanos fix. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else raw(spark, dir, name)

  private def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (older fixtures) and
    * as TIMESTAMP(MICROS, isAdjustedToUTC=false) (current fixtures), so the
    * loader adapts to whatever the footer declares instead of assuming one:
    *
    *  - NANOS: Spark 4 rejects it outright (PARQUET_TYPE_ILLEGAL), so read
    *    it as a raw nanos long via the legacy conf (runtime-settable, safe
    *    for every other table) and floor-divide to µs — lossless, the
    *    fixture's values are whole microseconds.
    *  - MICROS/NTZ: arrives as TimestampNTZType; cast to TimestampType so
    *    every downstream consumer (watermarks, windows, lag math) sees one
    *    type. The cast interprets the wall-clock value in the session
    *    timezone, which Verify/Bench pin to UTC — value-exact, and the
    *    DuckDB oracles' CAST(ts AS TIMESTAMP) is a no-op on the same data.
    *
    * Either way the query surface sees a single canonical TimestampType
    * `ts` column. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = raw(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df
      case other =>
        throw new IllegalStateException(s"unexpected events.ts physical type: $other")
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
