package graft

import org.apache.spark.sql.functions._

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001).cache()

  test("quality gate keeps a sane fraction and only high-score docs") {
    val kept = TextPipeline.qualityFilter(docs)
    assert(kept.count() > 0 && kept.count() < docs.count())
    assert(kept.filter(col("quality_score") < 2).count() === 0)
  }

  test("canonical dedup keeps exactly one doc per near-dup cluster") {
    val deduped = TextPipeline.dedupCanonical(docs)
    val pairs = graft.operators.DedupOps
      .minhashNearDups(docs, "doc_id", "text", 0.5).select("a_id", "b_id")
    val nonCanonical = graft.operators.DedupClusters
      .clusterLabels(docs, "doc_id", pairs)
      .filter(col("doc_id") =!= col("cluster_id")).count()
    assert(deduped.count() === docs.count() - nonCanonical)
    // survivors must contain no near-dup pair entirely inside them
    val survivors = deduped.select("doc_id").as[Long].collect().toSet
    val intact = pairs.collect()
      .count(r => survivors(r.getLong(0)) && survivors(r.getLong(1)))
    assert(intact === 0)
  }

  test("curate output carries a split and is deterministic") {
    val a = TextPipeline.curate(docs).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TextPipeline.curate(docs).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    assert(a.nonEmpty)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }
}
