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

  test("image dims parse from hand-built PNG, JPEG (SOF behind APP0/DQT) and GIF headers") {
    import spark.implicits._
    def be4(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be2(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    def le2(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)

    val png: Array[Byte] =
      Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
        be4(13) ++ "IHDR".getBytes("US-ASCII") ++ be4(640) ++ be4(480) ++
        Array[Byte](8, 6, 0, 0, 0)

    // JPEG: SOI, APP0/JFIF (len 16), DQT (len 67), SOF0 (len 17) with
    // 1024×768, then SOS — dims sit two variable-length segments deep
    def seg(marker: Int, body: Array[Byte]): Array[Byte] =
      Array[Byte](0xFF.toByte, marker.toByte) ++ be2(body.length + 2) ++ body
    val jpeg: Array[Byte] =
      Array[Byte](0xFF.toByte, 0xD8.toByte) ++
        seg(0xE0, "JFIF".getBytes("US-ASCII") ++ Array.fill[Byte](10)(0)) ++
        seg(0xDB, Array.fill[Byte](65)(1)) ++
        seg(0xC0, Array[Byte](8) ++ be2(768) ++ be2(1024) ++ Array.fill[Byte](10)(3)) ++
        seg(0xDA, Array.fill[Byte](5)(0)) ++ Array.fill[Byte](40)(0x55)

    val gif: Array[Byte] =
      "GIF89a".getBytes("US-ASCII") ++ le2(320) ++ le2(200) ++ Array.fill[Byte](5)(0)

    // a JPEG whose header truncates before any SOF: dims must stay null
    val jpegTrunc: Array[Byte] =
      Array[Byte](0xFF.toByte, 0xD8.toByte) ++
        seg(0xE0, "JFIF".getBytes("US-ASCII") ++ Array.fill[Byte](10)(0))

    val other = "just some text bytes".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, jpeg), (3L, gif), (4L, other), (5L, jpegTrunc))
      .toDF("media_id", "payload")
    val out = Multimodal.withImageDims(df).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(r.fieldIndex("image_format"))),
         Option(r.get(r.fieldIndex("img_width"))),
         Option(r.get(r.fieldIndex("img_height"))))).toMap
    assert(out(1L) === ((Some("png"), Some(640L), Some(480L))))
    assert(out(2L) === ((Some("jpeg"), Some(1024L), Some(768L))))
    assert(out(3L) === ((Some("gif"), Some(320L), Some(200L))))
    assert(out(4L) === ((None, None, None)))
    assert(out(5L) === ((Some("jpeg"), None, None)))
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
