package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._

/** Folding daily increments through IncrementalAgg.merge must equal the
  * full recompute over the union of all days — for any slicing of the
  * fact into increments.
  */
class IncrementalAggSpec extends SparkSpec {

  private val aggs = Seq(
    ("l_quantity", "sum"), ("l_quantity", "count"),
    ("l_extendedprice", "min"), ("l_extendedprice", "max"))

  test("fold of daily increments equals full recompute (sum/count/min/max)") {
    val li = Tables.lineitem(spark, sf0001)
      .withColumn("day", dayofmonth(col("l_shipdate")) % 5)
    val days = (0 until 5).map(d => li.filter(col("day") === d).drop("day"))

    val folded = days.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      (st, inc) => Some(IncrementalAgg.merge(st, inc, Seq("l_returnflag"), aggs))
    }.get
    val full = IncrementalAgg.partial(li.drop("day"), Seq("l_returnflag"), aggs)

    val f = folded.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val e = full.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(f === e)
  }

  test("derived average from merged carriers matches direct avg") {
    val li = Tables.lineitem(spark, sf0001)
    val halves = Seq(li.filter(col("l_orderkey") % 2 === 0),
                     li.filter(col("l_orderkey") % 2 === 1))
    val merged = halves.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      (st, inc) => Some(IncrementalAgg.merge(st, inc, Seq("l_linestatus"), aggs))
    }.get
    val got = IncrementalAgg.withDerivedAvg(merged, "l_quantity", "avg_qty")
      .select("l_linestatus", "avg_qty").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = li.groupBy("l_linestatus").agg(avg("l_quantity").as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-9, s"$k: ${got(k)} vs $v")
  }

  test("HLL sketch fold absorbs replays; estimates within HLL error of exact") {
    val li = Tables.lineitem(spark, sf0001)
      .withColumn("day", dayofmonth(col("l_shipdate")) % 4)
    val days = (0 until 4).map(d => li.filter(col("day") === d).drop("day"))

    def fold(incs: Seq[org.apache.spark.sql.DataFrame]): Map[String, Long] = {
      val st = incs.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        (s, inc) => Some(IncrementalAgg.distinctMerge(s, inc, Seq("l_returnflag"), "l_orderkey"))
      }.get
      IncrementalAgg.withDistinctEstimate(st, "l_orderkey", "nd")
        .select("l_returnflag", "nd").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }

    // set semantics: re-merging an already-merged increment is a no-op —
    // the property sum/count carriers do NOT have
    val clean = fold(days)
    val replayed = fold(days :+ days.head)
    assert(clean === replayed)

    // and both the folded and the one-pass estimate sit within HLL error
    // of the exact distinct count
    val onePass = IncrementalAgg.withDistinctEstimate(
      IncrementalAgg.distinctPartial(li.drop("day"), Seq("l_returnflag"), "l_orderkey"),
      "l_orderkey", "nd")
      .select("l_returnflag", "nd").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      assert(math.abs(clean(k).toDouble - e) / e < 0.05, s"$k: fold ${clean(k)} vs exact $e")
      assert(math.abs(onePass(k).toDouble - e) / e < 0.05, s"$k: one-pass ${onePass(k)} vs exact $e")
    }
  }

  test("merge plans touch only state + increment (no history rescan)") {
    val li = Tables.lineitem(spark, sf0001)
    val state = IncrementalAgg.partial(li, Seq("l_returnflag"), aggs)
      .localCheckpoint() // materialized state table stands in for parquet
    val merged = IncrementalAgg.merge(Some(state),
      li.limit(100), Seq("l_returnflag"), aggs)
    // exactly one scan relation in the plan: the increment (the state is a
    // checkpointed/materialized table, not a re-derivation over history)
    val plan = merged.queryExecution.optimizedPlan.toString
    assert("Relation".r.findAllIn(plan).size === 1, plan)
  }

  test("retraction fold over real change feeds equals bootstrap of the final version") {
    import spark.implicits._
    import graft.sources.WarehouseFs
    val t = s"${java.nio.file.Files.createTempDirectory("graft_ret_").toString}/acct"
    val keys = Seq("grp")
    val raggs = Seq(("v", "sum"), ("v", "count"))
    val v1 = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 5L))
      .toDF("k", "grp", "v")
    // v2: k=2 updated (20→25), k=3 deleted (group b vanishes entirely),
    // k=5 inserted into a new group d, k=4 untouched
    val v2 = Seq((1L, "a", 10L), (2L, "a", 25L), (4L, "c", 5L), (5L, "d", 7L))
      .toDF("k", "grp", "v")
    // v3: group c fully deleted, one more insert into a
    val v3 = Seq((1L, "a", 10L), (2L, "a", 25L), (6L, "a", 1L), (5L, "d", 7L))
      .toDF("k", "grp", "v")
    Seq(v1, v2, v3).foreach(WarehouseFs.publishVersioned(_, t, keepVersions = 5))

    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val boot = IncrementalAgg.bootstrapRetractable(v1, keys, raggs)
    val folded = (2L to 3L).foldLeft(boot) { (st, v) =>
      IncrementalAgg.mergeChanges(Some(st),
        WarehouseFs.changeFeed(spark, t, Seq("k"), v - 1, v).get, keys, raggs)
    }
    assert(snap(folded.select("grp", "sum_v", "count_v", "n_rows")) ===
      snap(IncrementalAgg.bootstrapRetractable(v3, keys, raggs)
        .select("grp", "sum_v", "count_v", "n_rows")))
    // groups b and c died along the way and must be absent
    val grps = folded.select("grp").collect().map(_.getString(0)).toSet
    assert(grps === Set("a", "d"))
  }

  test("retraction carriers reject non-retractable min/max") {
    import spark.implicits._
    val feed = Seq((1L, "a", 10L, "insert")).toDF("k", "grp", "v", "_change_type")
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.partialChanges(feed, Seq("grp"), Seq(("v", "min")))
    }
    assert(e.getMessage.contains("cannot retract"))
  }
}
