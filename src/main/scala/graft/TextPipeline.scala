package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{DedupClusters, DedupOps, Sampling}

/** End-to-end training-data curation over a `documents` corpus — the
  * composition the individual §2.9 operators exist for:
  *
  *   1. quality gate (length / punctuation / stopword signals),
  *   2. near-dup clustering (MinHash-LSH pairs → connected components),
  *      keeping one canonical doc per cluster (the minimum id),
  *   3. reproducible train/val/test split (md5-bucket, engine-portable).
  *
  * Every stage is a DataFrame transformation: the quality gate is map-only
  * and pushdown-friendly, dedup shuffles only signatures/band keys/edges,
  * and the split adds no shuffle at all — the whole flow is the same plan
  * shape at 100 TB, just with more partitions.
  *
  * Usage: runMain graft.TextPipeline [sfDir] [outDir]
  */
object TextPipeline {

  /** Quality gate: same signals as the `text_quality_score` query. */
  def qualityFilter(docs: DataFrame, minScore: Int = 2): DataFrame =
    docs
      .withColumn("n_tokens", size(split(col("text"), "\\s+")))
      .withColumn("n_punct",
        length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
      .withColumn("n_the", expr("regexp_count(text, '\\\\bthe\\\\b')"))
      .withColumn("quality_score",
        when(col("n_tokens").between(20, 1000), 1).otherwise(0) +
        when(col("n_punct") * 10 < col("n_tokens"), 1).otherwise(0) +
        when(col("n_the") > 0, 1).otherwise(0))
      .filter(col("quality_score") >= minScore)
      .drop("n_tokens", "n_punct", "n_the")

  /** Near-dup removal: cluster by MinHash-LSH + connected components and
    * keep each cluster's canonical (minimum-id) document. */
  def dedupCanonical(docs: DataFrame, jaccard: Double = 0.5): DataFrame = {
    val pairs = DedupOps.minhashNearDups(docs, "doc_id", "text", jaccard)
      .select("a_id", "b_id")
    val labels = DedupClusters.clusterLabels(docs, "doc_id", pairs)
    docs.join(labels.filter(col("doc_id") === col("cluster_id"))
                .select("doc_id"), Seq("doc_id"), "left_semi")
  }

  /** Full curation: quality gate → canonical dedup → split column. */
  def curate(docs: DataFrame): DataFrame =
    Sampling.trainValTestSplit(dedupCanonical(qualityFilter(docs)), "doc_id")

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft_curated")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val curated = curate(docs).cache()
    curated.write.mode(SaveMode.Overwrite).partitionBy("split").parquet(outDir)
    val total = docs.count()
    val kept = curated.count()
    val bySplit = curated.groupBy("split").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    println(s"[pipeline] in=$total curated=$kept ($bySplit) -> $outDir")
    spark.stop()
  }
}
