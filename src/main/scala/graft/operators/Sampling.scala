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
}
