package graft

import org.apache.spark.sql.functions._

/** The scaling artifact is only as good as its replica: these invariants
  * prove `buildReplica` multiplies DATA while preserving DISTRIBUTION —
  * the property that makes t(scaled)/t(base) a scaling measurement
  * instead of a measurement of self-inflicted skew.
  */
class ScalingSpec extends SparkSpec {

  private val factor = 3
  private lazy val dst: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_replica_").toString
    Scaling.buildReplica(spark, sf0001, d, factor)
    d
  }
  private def base(t: String) = spark.read.parquet(s"$sf0001/$t.parquet")
  private def scaled(t: String) = spark.read.parquet(s"$dst/$t.parquet")

  test("row counts: facts multiply by the factor, shared dims stay fixed") {
    for (t <- Seq("customer", "orders", "lineitem", "events", "documents", "embeddings"))
      assert(scaled(t).count() === base(t).count() * factor, t)
    for (t <- Seq("region", "nation"))
      assert(scaled(t).count() === base(t).count(), t)
  }

  test("join cardinality scales exactly linearly (keys shift per replica, never collide)") {
    def joinCount(o: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
      l.join(o, l("l_orderkey") === o("o_orderkey")).count()
    assert(joinCount(scaled("orders"), scaled("lineitem"))
      === joinCount(base("orders"), base("lineitem")) * factor)
    // per-key group sizes are unchanged — the max basket is the max basket
    def maxBasket(l: org.apache.spark.sql.DataFrame) =
      l.groupBy("l_orderkey").count().agg(max("count")).head().getLong(0)
    assert(maxBasket(scaled("lineitem")) === maxBasket(base("lineitem")))
  }

  test("near-dup pair structure scales exactly linearly (salting is a shingle bijection; no cross-replica dups)") {
    val basePairs = graft.operators.DedupOps
      .minhashNearDups(base("documents"), "doc_id", "text", 0.5)
    val scaledPairs = graft.operators.DedupOps
      .minhashNearDups(scaled("documents"), "doc_id", "text", 0.5)
    assert(scaledPairs.count() === basePairs.count() * factor)
    // within-replica jaccard values are EXACTLY preserved (word suffixing
    // is injective, so shingle intersections/unions keep their sizes):
    // replica-0 pairs equal the base pairs value-for-value
    val b = basePairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val r0 = scaledPairs
      .filter(col("a_id") < lit(Scaling.KeyShift) && col("b_id") < lit(Scaling.KeyShift))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(r0 === b)
  }

  test("semantic-dup structure scales exactly linearly (rotation preserves within-replica cosine)") {
    def pairs(emb: org.apache.spark.sql.DataFrame) =
      graft.operators.AnnOps.semanticDupPairs(
        emb.withColumn("cell", col("label")), threshold = 0.9)
    assert(pairs(scaled("embeddings")).count()
      === pairs(base("embeddings")).count() * factor)
  }

  test("quality-gate signals survive salting (stopwords, token counts and punctuation untouched)") {
    def gateCounts(docs: org.apache.spark.sql.DataFrame) =
      TextPipeline.qualityFilter(docs).count()
    assert(gateCounts(scaled("documents")) === gateCounts(base("documents")) * factor)
  }
}
