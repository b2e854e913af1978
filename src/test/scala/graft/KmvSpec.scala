package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchExpressions

/** KMV bottom-k distinct sketch properties: exactness below k (the
  * oracle-checkable regime), bounded relative error far above k,
  * determinism under any partitioning (set-union merge commutes), and
  * duplicate-insensitivity (it estimates DISTINCT, not rows).
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("n < k regime is exact: estimate == COUNT(DISTINCT)") {
    val df = (1 to 5000).map(i => s"user_${i % 700}").toDF("u") // 700 distinct
    val est = df.agg(SketchExpressions.kmv_estimate(
        SketchExpressions.kmv_sketch(col("u"), k = 1024), k = 1024).as("e"))
      .collect()(0).getLong(0)
    assert(est === 700L)
  }

  test("empty and all-null groups estimate 0") {
    val df = Seq[Option[String]](None, None).toDF("u")
    val est = df.agg(SketchExpressions.kmv_estimate(
        SketchExpressions.kmv_sketch(col("u"))).as("e")).collect()(0).getLong(0)
    assert(est === 0L)
  }

  test("n >> k regime: relative error within 5/sqrt(k)") {
    val n = 100000
    val k = 512
    val df = (1 to n).map(i => s"id_$i").toDF("u")
    val est = df.agg(SketchExpressions.kmv_estimate(
        SketchExpressions.kmv_sketch(col("u"), k = k), k = k).as("e"))
      .collect()(0).getLong(0)
    val relErr = math.abs(est.toDouble - n) / n
    assert(relErr < 5.0 / math.sqrt(k.toDouble),
      s"est $est vs exact $n: relErr $relErr")
  }

  test("sketch is bit-identical under any partitioning (set-union merge)") {
    val df = (1 to 20000).map(i => s"v_${i % 3000}").toDF("u")
    def sketchOf(parts: Int): Seq[Long] =
      df.repartition(parts)
        .agg(SketchExpressions.kmv_sketch(col("u"), k = 256).as("sk"))
        .collect()(0).getSeq[Long](0)
    assert(sketchOf(1) === sketchOf(17))
  }

  test("duplicates don't move the estimate (distinct semantics)") {
    val once = (1 to 300).map(i => s"d_$i").toDF("u")
    val tenTimes = (1 to 3000).map(i => s"d_${i % 300 + 1}").toDF("u")
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(SketchExpressions.kmv_estimate(
        SketchExpressions.kmv_sketch(col("u"), k = 128), k = 128).as("e"))
        .collect()(0).getLong(0)
    assert(est(once) === est(tenTimes))
  }

  test("per-group sketches stay per-group") {
    val df = Seq(("g1", "a"), ("g1", "b"), ("g1", "a"), ("g2", "a")).toDF("g", "u")
    val got = df.groupBy("g")
      .agg(SketchExpressions.kmv_estimate(
        SketchExpressions.kmv_sketch(col("u"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("g1" -> 2L, "g2" -> 1L))
  }

  test("SQL registration: kmv_sketch / kmv_estimate callable from spark.sql") {
    SketchExpressions.register(spark)
    Seq("x", "y", "x").toDF("u").createOrReplaceTempView("kmv_in")
    val est = spark.sql(
      "SELECT kmv_estimate(kmv_sketch(u)) AS e FROM kmv_in")
      .collect()(0).getLong(0)
    assert(est === 2L)
  }
}
