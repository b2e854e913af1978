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

  test("PNG dimensions parse from a real IHDR header; non-PNGs stay null") {
    import spark.implicits._
    // hand-built valid PNG prefix: signature + IHDR chunk, 640×480
    def be4(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val png: Array[Byte] =
      Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
        be4(13) ++ "IHDR".getBytes("US-ASCII") ++ be4(640) ++ be4(480) ++
        Array[Byte](8, 6, 0, 0, 0)
    val notPng = "just some text bytes".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, notPng)).toDF("media_id", "payload")
    val out = Multimodal.withPngDims(df).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(r.fieldIndex("is_png")),
         Option(r.get(r.fieldIndex("png_width"))),
         Option(r.get(r.fieldIndex("png_height"))))).toMap
    assert(out(1L) === ((1, Some(640L), Some(480L))))
    assert(out(2L) === ((0, None, None)))
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
