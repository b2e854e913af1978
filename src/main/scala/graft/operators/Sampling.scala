package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, engine-portable sampling and dataset splitting.
  *
  * Training-data pipelines must produce the SAME train/val/test membership
  * on every run, on every engine, at any parallelism — `rand()` sampling
  * gives none of that. These operators derive a [0, buckets) bucket from
  * the md5 of the row's key, so membership is a pure function of the key:
  * re-runs, backfills, and an external auditor (the DuckDB oracle) all
  * agree row-for-row. Map-only → zero shuffles, fully pushdown-friendly.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) from md5(key): the first 15 hex
    * chars (60 bits, always non-negative as a long) mod buckets. Any
    * engine with md5 reproduces it bit-for-bit (DuckDB:
    * `CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT) % buckets`).
    */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast(LongType),
         lit(buckets.toLong))

  /** Reproducible train/val/test split: adds `bucket` and `split` columns.
    * Percent thresholds are over a 100-bucket space. */
  def trainValTestSplit(df: DataFrame, keyCol: String,
                        trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct < 100)
    val b = hashBucket(col(keyCol))
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic `fraction` sample (resolution 1/10000): keeps a row iff
    * its key's bucket falls below fraction — stable across runs/engines.
    * The threshold ROUNDS (0.29 → 2900, not a truncated 2899 from the
    * binary-float product 2899.999…) so any oracle that rounds agrees. */
  def sampleDeterministic(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(hashBucket(col(keyCol), 10000) < math.round(fraction * 10000))
  }

  /** Per-stratum deterministic sampling: each stratum value keeps its own
    * fraction (absent strata keep nothing). The rates ride a broadcast
    * join — no driver-side filtering, works at any stratum cardinality. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       fractions: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rates = fractions.toSeq.toDF(strataCol, "__rate")
    df.join(broadcast(rates), Seq(strataCol))
      // round, don't truncate: 0.29 * 10000 is 2899.999… in binary floats
      .filter(hashBucket(col(keyCol), 10000) < round(col("__rate") * 10000).cast(LongType))
      .drop("__rate")
  }

  /** Weight-proportional Bernoulli sample: a row is kept with probability
    * `min(weight, cap) / cap` — the deterministic form of size-weighted
    * sampling (e.g. sample documents proportional to length so a fixed
    * row budget favors token mass). The keep test is the exact integer
    * cross-product `bucket · cap < min(weight, cap) · 10000` — no
    * float ratio whose rounding could differ between engines, so the
    * DuckDB oracle reproduces membership row-for-row. Map-only: the
    * filter is a pure function of (key, weight), pushes down, and never
    * shuffles. Rows at or above `cap` are always kept.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     cap: Long): DataFrame = {
    require(cap > 0)
    df.filter(hashBucket(col(keyCol), 10000) * lit(cap) <
      least(col(weightCol).cast(LongType), lit(cap)) * lit(10000L))
  }

  /** DSIR-inspired importance scoring over hashed token features
    * (Xie et al. 2023, "Data Selection for Language Models via Importance
    * Resampling" — the hashed-n-gram flavor, unigram features here).
    *
    * Fit: every token maps to one of `buckets` md5 hash buckets; a bucket
    * is TARGET-ENRICHED when its token share in the target slice exceeds
    * its share overall — compared as an exact integer cross-product
    * (`n_tgt·total_all > n_all·total_tgt`), so there is no ratio/log
    * arithmetic whose summation order could diverge between engines.
    * Score: a document's importance is the fraction of its tokens landing
    * in enriched buckets — a ratio of two exact counts.
    *
    * Scale shape: two corpus scans (fit + score), the DSIR minimum. The
    * fit aggregates to ≤ `buckets` rows (map-side combine does nearly all
    * the work; totals ride an unpartitioned window over those bounded
    * rows, not a second corpus scan); the enriched set broadcasts, so the
    * scoring pass is one map-only probe + a doc-keyed aggregation.
    *
    * Returns one row per `idCol`: (id, n_words, n_enriched).
    */
  def importanceWeights(docs: DataFrame, textCol: String, idCol: String,
                        isTarget: Column, buckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def words = docs.select(col(idCol), isTarget.as("__tgt"),
        explode(split(col(textCol), " ")).as("__w"))
      .withColumn("__bucket", hashBucket(col("__w"), buckets))
    val dist = words.groupBy("__bucket")
      .agg(count(lit(1)).as("__n_all"), count(when(col("__tgt"), 1)).as("__n_tgt"))
    // decimal(38,0) cross-products: count × total-count exceeds Long
    // around a few hundred GB of text (T·T_tgt > 9.2e18) — decimal
    // comparison stays exact to 1e38, far past 100 TB token counts
    def d38(c: Column) = c.cast("decimal(38,0)")
    val enriched = dist
      .select(col("__bucket"), col("__n_all"), col("__n_tgt"),
              sum("__n_all").over(w).as("__tot_all"),
              sum("__n_tgt").over(w).as("__tot_tgt"))
      .filter(d38(col("__n_tgt")) * d38(col("__tot_all")) >
              d38(col("__n_all")) * d38(col("__tot_tgt")))
      .select(col("__bucket"), lit(1).as("__e"))
    words.join(broadcast(enriched), Seq("__bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), count(col("__e")).as("n_enriched"))
  }
}
