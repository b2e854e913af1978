package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPerGroupOp

/** The custom heap-based per-group top-k physical operator must agree
  * with the window row_number idiom while planning without a sort.
  */
class TopKPerGroupSpec extends SparkSpec {

  test("heap top-k equals the window row_number idiom (unique order col)") {
    val orders = Tables.orders(spark, sf0001)
    val got = TopKPerGroupOp.topKPerGroup(orders, Seq("o_custkey"), "o_orderkey", 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").desc)
    val want = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("k larger than every group degenerates to the full (non-null) input") {
    val orders = Tables.orders(spark, sf0001)
    val got = TopKPerGroupOp.topKPerGroup(orders, Seq("o_custkey"), "o_totalprice", 1000)
    assert(got.count() === orders.filter(col("o_totalprice").isNotNull).count())
  }

  test("plan contains the custom exec, one Exchange, and NO sort") {
    val orders = Tables.orders(spark, sf0001)
    val df = TopKPerGroupOp.topKPerGroup(orders, Seq("o_custkey"), "o_orderkey", 3)
    df.collect()
    // under AQE the plan string prints Final + Initial plans; count
    // shuffles only in the final (executed) portion
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("TopKPerGroup"), p)
    assert("Exchange".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Sort "), p) // the whole point vs WindowExec
    // and the window idiom DOES sort — the cost the operator removes
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").desc)
    val wp = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .queryExecution.executedPlan.toString
    assert(wp.contains("Sort "), wp)
  }

  test("STRING order values survive row-buffer reuse (md5 rank ≡ window idiom)") {
    // eval(row) on a string column returns a UTF8String into the reused
    // row buffer — the heap must re-evaluate against its copied row or
    // stored keys go stale (regression: text_cap_per_source VALS diff).
    import org.apache.spark.sql.functions.md5
    val docs = Tables.documents(spark, sf0001)
      .withColumn("__rk", md5(col("doc_id").cast("string")))
    val got = TopKPerGroupOp.topKPerGroup(docs, Seq("source"), "__rk", 2)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy("source").orderBy(col("__rk").desc)
    val want = docs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("forced tiny budget: sort fallback fires and results are identical") {
    import org.apache.spark.sql.graft.TopKPerGroupExec
    val orders = Tables.orders(spark, sf0001)
    def run(budget: Option[String]): (Set[(Long, Long)], Long) =
      withConf(budget.map("spark.graft.topk.maxBufferedRows" -> _).toSeq: _*) {
        // collect() the operator's own DataFrame (a projection would be a
        // separate query execution whose metrics never touch this plan)
        val df = TopKPerGroupOp.topKPerGroup(
          orders.select("o_custkey", "o_orderkey"), Seq("o_custkey"), "o_orderkey", 3)
        val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        // AQE wraps the final plan in leaf nodes (AdaptiveSparkPlanExec,
        // ResultQueryStageExec) that collectFirst can't see through —
        // recurse into both to reach the physical operator that ran.
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        def find(p: SparkPlan): Option[TopKPerGroupExec] = p match {
          case e: TopKPerGroupExec => Some(e)
          case a: AdaptiveSparkPlanExec => find(a.executedPlan)
          case q: QueryStageExec => find(q.plan)
          case other => other.children.iterator.flatMap(find).nextOption()
        }
        val fallbacks = find(df.queryExecution.executedPlan).get
          .metrics("sortFallbackCount").value
        (got, fallbacks)
      }
    val (heapRes, heapFb) = run(None)
    val (sortRes, sortFb) = run(Some("10")) // every partition blows a 10-row budget
    assert(heapFb === 0L, "default budget must keep the heap path")
    assert(sortFb > 0L, "tiny budget must trigger the sort fallback")
    assert(sortRes === heapRes, "fallback path must return identical rows")
  }

  test("fallback with string order values equals the window idiom") {
    import org.apache.spark.sql.functions.md5
    val docs = Tables.documents(spark, sf0001)
      .withColumn("__rk", md5(col("doc_id").cast("string")))
    val got = withConf("spark.graft.topk.maxBufferedRows" -> "5") {
      TopKPerGroupOp.topKPerGroup(docs, Seq("source"), "__rk", 2)
        .select("source", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    }
    val w = Window.partitionBy("source").orderBy(col("__rk").desc)
    val want = docs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("wide rows blow the BYTE budget at a low row count (results identical)") {
    import spark.implicits._
    // 200 rows × ~10 KB strings ≈ 2 MB buffered if k retained them all —
    // far under the 4M-row budget, far over a 64 KB byte budget
    val wide = spark.range(200).select(
      (col("id") % 2).cast("string").as("g"),
      col("id").as("v"))
      .withColumn("pad", concat_ws("", (1 to 320).map(i => md5(concat_ws("-", col("v"), lit(i)))): _*))
    def run(conf: Seq[(String, String)]): (Set[(String, Long)], Long) =
      withConf(conf: _*) {
        val df = TopKPerGroupOp.topKPerGroup(wide, Seq("g"), "v", 50)
        val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.graft.TopKPerGroupExec
        def find(p: SparkPlan): Option[TopKPerGroupExec] = p match {
          case e: TopKPerGroupExec => Some(e)
          case a: AdaptiveSparkPlanExec => find(a.executedPlan)
          case q: QueryStageExec => find(q.plan)
          case other => other.children.iterator.flatMap(find).nextOption()
        }
        (got, find(df.queryExecution.executedPlan).get.metrics("sortFallbackCount").value)
      }
    val (heapRes, heapFb) = run(Nil)
    val (byteRes, byteFb) = run(Seq("spark.graft.topk.maxBufferedBytes" -> (64L * 1024).toString))
    assert(heapFb === 0L, "default budgets must keep the heap path")
    assert(byteFb > 0L, "64 KB byte budget must trigger the sort fallback on 10 KB rows")
    assert(byteRes === heapRes, "byte-budget fallback must return identical rows")
  }

  test("string group keys and double order values work (interpreted ordering)") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 2.0), ("b", 5.0), ("b", 4.0))
      .toDF("g", "v")
    val got = TopKPerGroupOp.topKPerGroup(df, Seq("g"), "v", 2)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(got === Set(("a", 3.0), ("a", 2.0), ("b", 5.0), ("b", 4.0)))
  }
}
