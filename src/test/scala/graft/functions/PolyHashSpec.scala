package graft.functions

import graft.SparkTestBase
import graft.extensions.Signatures
import org.apache.spark.sql.functions._

class PolyHashSpec extends SparkTestBase {

  test("expression matches the JVM kernel (and the DuckDB list_reduce value)") {
    import spark.implicits._
    val texts = Seq("abcde", "hello", "ab", "", "the quick brown fox")
    val out = texts.toDF("t")
      .select(col("t"), PolyHash(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach(t => assert(out(t) === Signatures.polyHash(t), t))
    // values cross-checked against DuckDB's
    // list_reduce(list_transform(range(1,len+1), j -> unicode(substr(s,j,1))),
    //             (a,b) -> (a*131+b) % 4294967311)
    assert(out("abcde") === 3018713529L)
    assert(out("hello") === 792145445L)
    assert(out("ab") === 12805L)
  }

  test("registered on the SQL surface; null-safe; rejects non-strings") {
    GraftFunctions.register(spark)
    import spark.implicits._
    assert(spark.sql("SELECT poly_hash('abcde') AS h").as[Long].head()
      === 3018713529L)
    val n = spark.sql("SELECT poly_hash(CAST(NULL AS STRING)) AS h")
      .collect()(0)
    assert(n.isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT poly_hash(42)").collect()
    }
  }
}
