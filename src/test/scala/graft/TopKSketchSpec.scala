package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKSketch

/** SpaceSaving heavy-hitters aggregate (TopKSketch.TopKAgg): exact-regime
  * equality with a true groupBy, partitioning invariance, and the three
  * saturated-regime guarantees (overestimate-only, error bound,
  * heavy-hitter completeness).
  */
class TopKSketchSpec extends SparkSpec {
  import spark.implicits._

  private def entries(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.select(explode(col("sk")).as("e"))
      .select("e.item", "e.est", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("exact regime: sketch equals a true groupBy count") {
    val words = (1 to 2000).map(i => s"w_${i % 40}") // 40 distinct << 256
    val df = words.toDF("w")
    val sk = entries(df.agg(TopKSketch.topk_sketch(col("w")).as("sk")))
    val truth = df.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk.map(e => e._1 -> e._2).toMap === truth)
    assert(sk.forall(_._3 === 0L)) // no eviction → zero error recorded
    // sorted by (est desc, item asc)
    assert(sk === sk.sortBy(e => (-e._2, e._1)))
  }

  test("exact regime is partitioning-invariant") {
    val words = (1 to 5000).map(i => s"w_${i % 100}")
    val a = entries(words.toDF("w").repartition(1)
      .agg(TopKSketch.topk_sketch(col("w")).as("sk")))
    val b = entries(words.toDF("w").repartition(13)
      .agg(TopKSketch.topk_sketch(col("w")).as("sk")))
    assert(a === b)
  }

  test("saturated regime: overestimate-only, bounded error, heavy hitters present") {
    // 2000 distinct keys over capacity 64; one key takes >n/8 of the stream
    val cap = 64
    val heavy = Seq.fill(4000)("HEAVY")
    val tail = (1 to 8000).map(i => s"t_${i % 2000}")
    val words = heavy ++ tail
    val n = words.size.toLong
    val df = words.toDF("w").repartition(7)
    val sk = entries(df.agg(TopKSketch.topk_sketch(col("w"), cap).as("sk")))
    val truth = words.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(sk.size <= cap)
    sk.foreach { case (item, est, err) =>
      val t = truth(item)
      assert(est >= t, s"$item est $est < true $t")     // one-sided
      assert(est - err <= t, s"$item est-err ${est - err} > true $t")
    }
    // total error bound: per-partial eviction floors sum to ≤ n/cap each side
    // of the merge tree; the HEAVY item (freq 4000 > n/cap = 187) must be kept
    assert(sk.exists(_._1 === "HEAVY"))
    val heavyEst = sk.find(_._1 === "HEAVY").get._2
    assert(heavyEst >= 4000L && heavyEst <= 4000L + n / cap * 2,
      s"heavy est $heavyEst far from 4000")
  }
}
