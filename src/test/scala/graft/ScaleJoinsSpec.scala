package graft

import graft.operators.ScaleJoins
import org.apache.spark.sql.functions._

/** The scale contracts of bucketed and salted joins, asserted at the plan
  * level (the data is tiny; the plan is what survives a 100× scale-up).
  */
class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join with zero Exchange (shuffle-free)") {
    val facts = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity")
    val dims = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    ScaleJoins.writeBucketed(facts, "bkt_lineitem", "l_orderkey", 8)
    ScaleJoins.writeBucketed(dims, "bkt_orders", "l_orderkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScaleJoins.bucketedJoin(
        spark.table("bkt_lineitem"), spark.table("bkt_orders"), "l_orderkey")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
    }
  }

  test("compaction merges small files and preserves content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val data = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    data.repartition(40).write.mode("overwrite").parquet(dir)
    def nFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = nFiles
    assert(before >= 30, s"fixture should be fragmented, got $before files")
    val sumBefore = spark.read.parquet(dir).agg(sum("l_quantity")).head().getDouble(0)
    ScaleJoins.compactParquet(spark, dir, targetMB = 128)
    assert(nFiles < before / 10, s"expected big reduction, got $nFiles files")
    val sumAfter = spark.read.parquet(dir).agg(sum("l_quantity")).head().getDouble(0)
    assert(sumAfter === sumBefore)
    assert(spark.read.parquet(dir).count() === data.count())
  }

  test("compaction preserves Hive partition layout (pruning survives)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_p_").toString
    val data = Tables.orders(spark, sf0001)
      .withColumn("status", col("o_orderstatus"))
    data.repartition(20).write.mode("overwrite").partitionBy("status").parquet(dir)
    val before = spark.read.parquet(dir)
    val cntBefore = before.count()
    ScaleJoins.compactParquet(spark, dir, targetMB = 128)
    // layout intact: key=value dirs still present, no flattening
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(subdirs.forall(_.startsWith("status=")), subdirs.mkString(","))
    assert(subdirs.length >= 2)
    val after = spark.read.parquet(dir)
    assert(after.count() === cntBefore)
    // partition pruning still works on the compacted table
    val p = after.filter(col("status") === "O").queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("status=f"), p)
  }

  test("capped interval self-join: cold keys match naive join, hot keys side-routed") {
    // user 99 is the power user (60 rows → 60² naive pairs); others ≤ 5
    val rows = (0 until 60).map(i => (99L, i.toLong * 10, 1000L + i)) ++
      (0 until 5).flatMap(u => (0 until u + 1).map(i => (u.toLong, i.toLong * 100, 2000L + u * 10 + i)))
    val df = rows.toDF("user_id", "ts", "row_id")
    val (pairs, hot) = ScaleJoins.intervalSelfJoinCapped(df, "user_id", "ts",
      window = 250L, maxPerKey = 10)

    val hotKeys = hot.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hotKeys === Map(99L -> 60L))

    val cold = df.filter(col("user_id") =!= 99L)
    val naive = cold.alias("a").join(cold.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") >= col("a.ts") && col("b.ts") <= col("a.ts") + 250L)
      .select(col("a.row_id"), col("b.row_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs.select(col("a_row_id"), col("b_row_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === naive)
    assert(capped.nonEmpty)
    // and no pair involves the hot key
    assert(pairs.filter(col("a_user_id") === 99L).count() === 0)
  }

  test("point-in-interval join equals the naive non-equi join, incl. overlaps") {
    val facts = spark.range(0L, 500L).selectExpr("id * 7 AS p")
    val intervals = Seq((1L, 0L, 100L), (2L, 50L, 150L), (3L, 140L, 141L),
                        (4L, 3000L, 3500L), (5L, 0L, 3500L))
      .toDF("iv_id", "lo", "hi")
    val naive = facts.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iv_id")
    val bucketed = ScaleJoins.pointInIntervalJoin(facts, "p", intervals, "lo", "hi", 64L)
      .select("p", "iv_id")
    assert(naive.exceptAll(bucketed).count() === 0)
    assert(bucketed.exceptAll(naive).count() === 0)
  }

  test("point-in-interval join plans as a hash join on the bucket, not BNL") {
    val facts = spark.range(0L, 1000L).selectExpr("id AS p")
    val intervals = spark.range(0L, 50L)
      .selectExpr("id AS iv_id", "id * 20 AS lo", "id * 20 + 40 AS hi")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = ScaleJoins.pointInIntervalJoin(facts, "p", intervals, "lo", "hi", 32L)
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join equals the plain join on a 90%-skewed fixture") {
    // one hot key carries 900 of 1000 fact rows
    val fact = spark.range(1000)
      .select(when(col("id") < 900, lit(1L)).otherwise(col("id")).as("k"),
              col("id").as("payload"))
    val dim = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2"))
      .toDF("k", "label")
    val plain = fact.join(dim, Seq("k"))
    val salted = ScaleJoins.saltedJoin(fact, dim, "k", salt = 8)
    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
    assert(salted.count() === 902) // 900 hot + 2 cold
  }

  test("salt reaches the shuffle keys (hot key spreads across reducers)") {
    val fact = spark.range(1000)
      .select(lit(1L).as("k"), col("id").as("payload"))
    val dim = Seq((1L, "hot")).toDF("k", "label")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = ScaleJoins.saltedJoin(fact, dim, "k", salt = 8)
      salted.collect()
      val p = salted.queryExecution.executedPlan.toString
      assert(p.contains("__salt"), s"salt column must participate in the join:\n$p")
      assert("hashpartitioning\\([^)]*__salt".r.findFirstIn(p).isDefined,
        s"shuffle must partition by (key, salt):\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
