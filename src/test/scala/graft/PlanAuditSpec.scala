package graft

/** Physical-plan audits: the 100 TB story is in the plan, not the row
  * counts — assert the plans stay the ones we designed (SURVEY §4).
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("filters and projections push into the parquet scan") {
    val p = plan("filt_between")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull"), p)
    // pruned read schema: only the 3 referenced columns
    assert(p.contains("l_quantity") && !p.contains("l_extendedprice"), p)
  }

  test("small dimension joins broadcast (no shuffle of the fact)") {
    val p = plan("join_broadcast_dim")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("5-way star join broadcasts region+nation") {
    val p = plan("join_5way_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("aggregations are partial+final (map-side combine)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("semi/anti joins plan as join types, not subquery re-execution") {
    assert(plan("join_semi").contains("LeftSemi"), plan("join_semi"))
    assert(plan("join_anti").contains("LeftAnti"), plan("join_anti"))
  }

  test("whole-stage codegen covers the custom vector expression") {
    // AQE finalizes the plan only on execution — run, then inspect
    val df = SparkEntry.queries("sim_bruteforce_topk")(spark, sf0001)
    df.collect() // count() would plan a different query execution
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages print as "*(n) Operator" in simpleString
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, p)
    assert(p.contains("cosinesimilarityf32"), p)
  }

  test("top-k uses TakeOrdered, not a full sort") {
    val p = plan("sort_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("theta residual stays attached to a hash/sort-merge join, not BNL") {
    val p = plan("join_theta_residual")
    assert(!p.contains("BroadcastNestedLoopJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("as-of join extracts the equi key (interval stays residual, not BNL)") {
    val p = plan("join_asof")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("deterministic split is map-only: no shuffle in the plan") {
    val p = plan("text_train_test_split")
    assert(!p.contains("Exchange"), p)
  }

  test("stacked same-partition windows share one shuffle") {
    // dense_rank + max windows both partition by l_returnflag — the
    // partitioning must be reused, not re-shuffled per window
    val p = plan("win_count_distinct")
    assert("Exchange".r.findAllIn(p).size === 1, p)
  }

  test("funnel plans as keyed joins, never a nested loop") {
    val p = plan("evt_funnel")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("large-volume top-k (Q18 shape) plans as TakeOrdered, not a full sort") {
    val p = plan("sql_top_customers_by_qty")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("correlated EXISTS (Q4 shape) pre-aggregates the fact before one join") {
    // r16: the EXISTS is max(l_shipdate)-per-order > threshold — the fact
    // side must aggregate BEFORE its exchange (map-side combine) and the
    // join must be a single equi hash/merge join, never a nested loop
    val p = plan("sql_order_priority_late")
    assert(p.contains("max(l_shipdate"), p)
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Join") || p.contains("join"), p)
  }

  test("scalar-max selection (Q15 shape) broadcasts the 1-row max") {
    val p = plan("sql_top_supplier")
    assert(p.contains("Broadcast"), p)
  }

  test("join strategy hints are honored (merge / shuffle_hash / broadcast)") {
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_orderstatus")
    def planOf(hint: String): String = {
      val j = li.join(o.hint(hint), col("l_orderkey") === col("o_orderkey"))
      j.collect()
      j.queryExecution.executedPlan.toString
    }
    assert(planOf("merge").contains("SortMergeJoin"), "merge hint")
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"), "shuffle_hash hint")
    assert(planOf("broadcast").contains("BroadcastHashJoin"), "broadcast hint")
  }

  test("runtime bloom filter prunes the fact side of a selectively-filtered join") {
    // At 100 TB the win is shuffling only fact rows whose join key MIGHT
    // match the filtered dim — Spark's runtime row-level filtering injects
    // a bloom_filter_might_contain predicate on the fact scan side.
    // Thresholds are production-sized defaults; scaled here so the sf0.001
    // fixture qualifies.
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import org.apache.spark.sql.functions.col
      val li = Tables.lineitem(spark, sf0001)
      val p = Tables.part(spark, sf0001).filter(col("p_brand") === "Brand#1")
      val j = li.join(p, col("l_partkey") === col("p_partkey"))
      val planStr = j.queryExecution.optimizedPlan.toString
      assert(planStr.contains("might_contain") || planStr.contains("bloom"),
        s"expected a runtime bloom filter on the fact side:\n$planStr")
    }
  }

  test("AQE splits a skewed sort-merge join at runtime (unknown-skew defense)") {
    // saltedJoin covers KNOWN skew; for skew discovered only at runtime the
    // defense is AQE's OptimizeSkewedJoin. Thresholds are scaled down so a
    // test-sized fixture crosses them; the assertion — the executed plan
    // carries a skew=true sort-merge join — is scale-independent.
    import org.apache.spark.sql.functions.{col, lpad, when}
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // 90% of the fact lands on key 0 → one shuffle partition dwarfs the rest
      val fact = spark.range(0, 50000)
        .select(when(col("id") % 10 === 0, col("id")).otherwise(0L).as("k"),
                lpad(col("id").cast("string"), 64, "x").as("pad"))
      val dim = spark.range(0, 50000).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      val joined = fact.join(dim, Seq("k"))
      joined.collect() // AQE finalizes the plan only on execution
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sequence packing shuffles once — the per-source window") {
    val p = plan("text_pack_sequences")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("Window"), p)
  }

  test("mixture weights scan the corpus once (totals via window, not self-join)") {
    val p = plan("text_mixture_weights")
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("decontamination probes the corpus with a broadcast semi-join") {
    // the eval shingle set broadcasts; the (100 TB) train side must reach
    // the semi-join without an Exchange of its own
    val p = plan("text_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    val semiIdx = p.indexOf("LeftSemi")
    val gen = p.indexOf("Generate") // the train-side shingle explode
    assert(gen > semiIdx, s"corpus shingles should feed the semi-join " +
      s"directly (no exchange between explode and probe)\n$p")
    assert(!p.substring(semiIdx, gen).contains("Exchange"), p)
  }

  test("bloom decontamination probes the bitset before the exact confirm") {
    val p = plan("text_decontaminate_bloom")
    // the bloom probe is a plain Filter on the corpus side…
    assert(p.contains("bloom_might_contain"), p)
    // …upstream of the exact-confirm semi-join that removes FPs (the join
    // strategy is AQE's call — broadcast when the eval set fits, shuffle
    // when it doesn't; what matters is the ORDER)
    assert(p.contains("LeftSemi"), p)
    val probeIdx = p.indexOf("bloom_might_contain")
    val semiIdx = p.indexOf("LeftSemi")
    assert(probeIdx > semiIdx, // executedPlan prints consumers above producers
      s"bloom probe must sit below (feed) the exact semi-join\n$p")
  }

  test("importance sampling broadcasts the enriched-bucket set (map-only probe)") {
    val p = plan("text_importance_sample")
    assert(p.contains("BroadcastHashJoin"), p)
    // fit + score are separate aggregations over the exploded words
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("salted join carries the salt through the shuffle keys") {
    val p = plan("join_salted_skew")
    assert(p.contains("__salt"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("mixture apply is a broadcast-rate, map-only corpus filter") {
    val p = plan("text_mixture_apply")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("weighted sampling is map-only: no shuffle in the plan") {
    val p = plan("text_sample_weighted")
    assert(!p.contains("Exchange"), p)
  }

  test("commonness score reuses the (doc, word) aggregation exchange") {
    // perDoc feeds both the tf rollup and the join probe — one shuffle,
    // materialized once
    val df = SparkEntry.queries("text_commonness_score")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedSubquery") ||
      "Exchange hashpartitioning\\(doc_id".r.findAllIn(p).size <= 1, p)
  }

  test("relational division plans as one agg + broadcast scalar, no correlated loop") {
    val p = plan("sub_division_forall")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("rolling actives join the day spine by broadcast after the explode") {
    val p = plan("evt_rolling_actives")
    assert(p.contains("Generate explode"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("CBO: the join build side follows committed ROW COUNT, not file " +
      "bytes — an RLE-compressed 400k-row table never broadcasts over a " +
      "genuinely tiny dimension whose files happen to be fatter") {
    import org.apache.spark.sql.functions._
    import graft.sources.WarehouseFs
    val base = java.nio.file.Files.createTempDirectory("graft_cbo_").toString
    // BIG: 400k rows, every column low-cardinality → parquet RLE/dict
    // compresses the files far below the tiny table's. File bytes LIE.
    def bigDf = spark.range(400000).select(
      (col("id") % 997).as("k"),
      lit("constant-padding-that-rle-compresses-away").as("pad"))
    // SMALL: 3k rows of incompressible digests — files LIE fat
    def smallDf = spark.range(3000).select(
      (col("id") % 997).as("k"),
      concat((1 to 20).map(i =>
        sha2(concat(col("id").cast("string"), lit(i.toString)), 256)): _*)
        .as("blob"))
    def publish(suffix: String, stats: Boolean): (String, String) = {
      val b = s"$base/big_$suffix"; val s = s"$base/small_$suffix"
      WarehouseFs.publishVersioned(bigDf, b, keepVersions = 2,
        collectStats = stats)
      WarehouseFs.publishVersioned(smallDf, s, keepVersions = 2,
        collectStats = stats)
      (b, s)
    }
    def bytesOf(t: String): Long =
      WarehouseFs.currentVersionBytes(spark, t).get
    def buildSideOf(big: String, small: String): String = {
      val b = spark.read.format("graft").option("table", big).load()
      val s = spark.read.format("graft").option("table", small).load()
      val j = b.join(s, "k").queryExecution.executedPlan
      val bhj = j.collectFirst {
        case x: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => x
      }.getOrElse(fail(s"expected a BroadcastHashJoin, got:\n$j"))
      val built = bhj.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => bhj.left
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => bhj.right
      }
      if (built.toString.contains("small_")) "small"
      else if (built.toString.contains("big_")) "big"
      else fail(s"cannot attribute the build side:\n$built")
    }
    val (bigS, smallS) = publish("stats", stats = true)
    // the inversion must actually be staged, or the test proves nothing
    assert(bytesOf(bigS) < bytesOf(smallS),
      s"fixture: big files (${bytesOf(bigS)}) must compress below small " +
        s"(${bytesOf(smallS)})")
    // AQE off for the inspection: the static plan shows the
    // statistics-driven choice itself, not AQE's runtime correction
    withConf("spark.sql.cbo.enabled" -> "true",
        "spark.sql.adaptive.enabled" -> "false") {
      assert(buildSideOf(bigS, smallS) === "small",
        "with committed stats, cardinality picks the build side")
      // counterfactual: the SAME data without stats falls back to file
      // bytes and builds on the compressed giant — the failure the
      // committed statistics exist to prevent
      val (bigN, smallN) = publish("nostats", stats = false)
      assert(buildSideOf(bigN, smallN) === "big",
        "without stats the size inversion fools the planner (fixture check)")
    }
  }

  test("CBO join reorder: with committed stats a 3-way join probes the " +
      "tiny dimension before the second fact, whatever the syntactic order") {
    import org.apache.spark.sql.functions._
    import graft.sources.WarehouseFs
    val base = java.nio.file.Files.createTempDirectory("graft_cbo_jr_").toString
    def fact(n: Int) = spark.range(120000).select(
      (col("id") % 1009).as("k"), (col("id") % 31).as(s"m$n"))
    WarehouseFs.publishVersioned(fact(1), s"$base/f1", keepVersions = 2,
      collectStats = true)
    WarehouseFs.publishVersioned(fact(2), s"$base/f2", keepVersions = 2,
      collectStats = true)
    WarehouseFs.publishVersioned(
      spark.range(40).select((col("id") % 1009).as("k"), col("id").as("d")),
      s"$base/dim", keepVersions = 2, collectStats = true)
    def rd(t: String) = spark.read.format("graft").option("table", s"$base/$t").load()
    withConf("spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true") {
      // syntactically fact ⋈ fact FIRST, dim last: the reorder must pull
      // the 40-row dim inward so the fact-fact join sees a filtered side
      val q = rd("f1").join(rd("f2"), "k").join(rd("dim"), "k")
        .groupBy("d").agg(sum("m1"), sum("m2"))
      val optimized = q.queryExecution.optimizedPlan.toString
      val joins = q.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joins.size === 2, optimized)
      // the INNERMOST join (last collected) must touch the dim relation
      val innermost = joins.last
      assert(innermost.toString.contains("dim"),
        s"stats-driven reorder must join the 40-row dim first, got:\n$optimized")
    }
  }

}
