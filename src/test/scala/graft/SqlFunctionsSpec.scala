package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextHashExpressions

/** The custom Catalyst expressions must be reachable from plain SQL (the
  * reference's users write SQL) — GraftSession.attach registers them. */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("vector and hash expressions are callable from SQL") {
    GraftSession.attach(spark, sf0001)
    val r = spark.sql("""
      SELECT cosine_f32(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                        array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
             simhash64(split('hello world hello', ' ')) AS sh,
             simhash64_md5(split('hello world hello', ' ')) AS shp,
             size(minhash_sig(split('a b c d', ' '), 16)) AS msize
    """).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getInt(3) === 16)
    // SQL path must agree with the Column API path
    val viaColumn = Seq("hello world hello").toDF("t")
      .select(TextHashExpressions.simhash64(split(col("t"), " ")).as("sh"),
              TextHashExpressions.simhash64_portable(split(col("t"), " ")).as("shp"))
      .head()
    assert(r.getLong(1) === viaColumn.getLong(0))
    assert(r.getLong(2) === viaColumn.getLong(1))
  }

  test("minhash_sig rejects a non-literal hash count") {
    GraftSession.attach(spark, sf0001)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(split('a b', ' '), s_nationkey) FROM supplier").collect()
    }
    assert(e.getMessage.contains("minhash_sig"))
  }
}
