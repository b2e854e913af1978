package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.ingest(
    Tables.documents(spark, sf0001), "doc_id", "text", "source").cache()

  test("ingest produces the media schema with accurate byte counts") {
    // compare names+types; nullability differs for literal-derived fields
    def shape(s: org.apache.spark.sql.types.StructType): String =
      s.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
    assert(shape(media.schema) === shape(Multimodal.mediaSchema))
    val r = media.filter(col("media_id") === 0).head()
    val payload = r.getAs[Array[Byte]]("payload")
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes")
      === payload.length.toLong)
  }

  test("content dedup: 500 docs → 500 distinct hashes, all single-copy") {
    val d = Multimodal.dedupByContent(media)
    assert(d.count() === 500)
    assert(d.filter(col("n_copies") > 1).count() === 0)
  }

  test("content dedup collapses byte-identical payloads") {
    val doubled = media.union(media)
    val d = Multimodal.dedupByContent(doubled)
    assert(d.count() === 500)
    assert(d.filter(col("n_copies") === 2).count() === 500)
  }

  test("decode stub emits deterministic per-item features") {
    val f1 = Multimodal.decodeFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.forall(f => f.width >= 64 && f.height >= 64))
    assert(f1.forall(f => f.mean_luma > 0 && f.mean_luma < 256))
    assert(f1.length === 500)
  }

  test("frame sampling: bounded slices with correct stride") {
    val frames = Multimodal.sampleFrames(spark, media, frameSize = 64, every = 2)
    val r = frames.filter(col("media_id") === 1).orderBy("frame_idx").collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Array[Byte]]("frame_bytes").length == 64))
    assert(r.map(_.getAs[Int]("frame_idx")).toSeq === r.indices)
  }
}
