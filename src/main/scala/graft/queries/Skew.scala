package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key equi-joins.
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is
  * the static fallback when one key dominates so heavily that even a
  * split partition won't fit (the 100 TB "one customer is half the
  * table" case). The fact side gets a deterministic salt derived from
  * its full row (so a hot key's rows spread across `nSalts` buckets);
  * the dimension side is replicated once per salt value; the join key
  * becomes (key, salt). Row-deterministic, no RNG — results are stable
  * across retries, which per-row `rand()` salting is not.
  */
object Skew {

  /** Salted equi-join: semantically identical to
    * `facts.join(dims, keys, "inner")` but with the fact side's hot keys
    * spread over `nSalts` shuffle partitions per key. */
  def saltedEquiJoin(facts: DataFrame, dims: DataFrame,
                     key: String, nSalts: Int): DataFrame = {
    val saltedFacts = facts.withColumn("_salt",
      pmod(hash(struct(facts.columns.map(col).toIndexedSeq: _*)), lit(nSalts)))
    val saltedDims = dims.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFacts
      .join(saltedDims, Seq(key, "_salt"))
      .drop("_salt")
  }
}
