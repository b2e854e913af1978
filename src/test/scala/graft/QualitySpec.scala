package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("profile computes per-column metrics in one pass") {
    val df = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (3L, Some("b")))
      .toDF("id", "v")
    val p = Quality.profile(df, Seq("id", "v")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    assert(p("id") === ((4L, 3L, "1", "3")))
    assert(p("v") === ((3L, 2L, "a", "b"))) // null ignored by count/distinct/min/max
  }

  test("profile runs as a single scan (one logical aggregate)") {
    val df = Tables.supplier(spark, sf0001)
    val plan = Quality.profile(df, Seq("s_suppkey", "s_name"))
      .queryExecution.optimizedPlan.toString
    // one scan of the source, not one per column
    assert("Relation".r.findAllIn(plan).size === 1, plan)
  }

  test("profile(exact = false) matches exact metrics except n_distinct within HLL error") {
    val df = Tables.orders(spark, sf0001)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val exact = Quality.profile(df, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Quality.profile(df, cols, exact = false).collect()
      .map(r => r.getString(0) -> r).toMap
    for (c <- cols) {
      val (e, a) = (exact(c), approx(c))
      assert(a.getLong(1) === e.getLong(1)) // n_nonnull identical
      assert(a.getString(3) === e.getString(3) && a.getString(4) === e.getString(4))
      val (end, and) = (e.getLong(2).toDouble, a.getLong(2).toDouble)
      assert(math.abs(and - end) / end < 0.1, s"$c: approx $and vs exact $end")
    }
  }

  test("profile(exact = false) plans without Expand (no xN row multiplication)") {
    val df = Tables.orders(spark, sf0001)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val exactPlan = Quality.profile(df, cols)
      .queryExecution.executedPlan.toString
    val approxPlan = Quality.profile(df, cols, exact = false)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand")) // the cost exact=false removes
    assert(!approxPlan.contains("Expand"), approxPlan)
  }

  test("drift gate flags moved volume/cardinality and missing columns only") {
    val prev = Quality.profile(
      (1 to 100).map(i => (i, i % 10)).toDF("id", "seg"), Seq("id", "seg"))
    // same shape -> no drift
    val same = Quality.driftCheck(prev, prev)
      .filter(col("drifted")).collect()
    assert(same.isEmpty, same.mkString(","))
    // volume halves (>20%), cardinality of seg collapses, id column vanishes
    val cur = Quality.profile(
      (1 to 50).map(i => (i, 0)).toDF("key", "seg").withColumnRenamed("key", "uid"),
      Seq("uid", "seg"))
    val flagged = Quality.driftCheck(cur, prev)
      .filter(col("drifted")).collect()
      .map(_.getString(0)).toSet
    assert(flagged === Set("uid", "id", "seg")) // new col, gone col, moved col
    // within-tolerance movement stays quiet
    val near = Quality.profile(
      (1 to 110).map(i => (i, i % 10)).toDF("id", "seg"), Seq("id", "seg"))
    assert(Quality.driftCheck(near, prev).filter(col("drifted")).count() === 0)
  }

  test("uniqueness check flags duplicated keys with multiplicity") {
    val df = Seq((1, "x"), (2, "y"), (1, "z")).toDF("k", "v")
    assert(!Quality.checkUnique(df, Seq("k")))
    val dups = Quality.duplicateKeys(df, Seq("k")).collect()
    assert(dups.length === 1 && dups.head.getInt(0) === 1 && dups.head.getLong(1) === 2L)
    assert(Quality.checkUnique(df, Seq("k", "v")))
  }

  test("referential integrity: lineitem orderkeys all resolve to orders") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    assert(Quality.orphans(li, "l_orderkey", o, "o_orderkey").isEmpty)
    // and a violation is caught when parents are withheld
    val truncated = o.filter(col("o_orderkey") < 100)
    assert(Quality.orphans(li, "l_orderkey", truncated, "o_orderkey").count() > 0)
  }
}
