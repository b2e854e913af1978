package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star §2.9): image/audio/video as
  * opaque `binary` payloads with a typed metadata struct, plus the
  * decode / feature-extract stages a training-data pipeline runs at scale.
  *
  * The actual media decode is STUBBED (`decodeStub`): this container has no
  * image/audio codecs, so the decoder derives deterministic pseudo-features
  * from the bytes. Everything AROUND the stub is real and is what matters
  * on a cluster: the schema contract, the per-partition batched execution
  * (mapPartitions — one decoder init per partition, the same shape a GPU/
  * codec pipeline needs), content-hash dedup, and size accounting.
  *
  * Scale notes: payloads never enter a shuffle key; dedup shuffles only
  * (hash, id); feature extraction is a narrow map with per-partition
  * resource reuse; repartitioning controls decoder parallelism.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("source", StringType),
      StructField("n_bytes", LongType))))))

  /** Wrap any (id, bytes-producing string, source) table into the media
    * schema — the ingestion contract. Used with `documents` as a
    * deterministic stand-in corpus for the binary payloads.
    */
  def ingest(df: DataFrame, idCol: String, textCol: String, srcCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        col(srcCol).as("source"),
        length(encode(col(textCol), "UTF-8")).cast(LongType).as("n_bytes")).as("meta"))

  /** Content-hash exact dedup over binary payloads: one aggregation keyed
    * by the hash; payloads themselves never shuffle. */
  def dedupByContent(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), xxhash64(col("payload")).as("content_hash"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("n_copies"), min("media_id").as("canonical_id"))

  /** REAL (non-stub) metadata extraction: PNG dimensions parsed straight
    * from the IHDR header with built-in functions. A PNG starts with the
    * fixed 8-byte signature, a 4-byte chunk length, the 4 bytes "IHDR",
    * then big-endian 4-byte width and height — so bytes 17-20/21-24
    * (1-indexed) ARE the dimensions. substring+hex+conv keeps the whole
    * thing codegen'd, and only the first 24 bytes of each payload are
    * touched — no codec, no UDF, column-pruning-friendly.
    * Adds is_png / png_width / png_height (null dims for non-PNGs).
    */
  def withPngDims(media: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val isPng = hex(expr(s"substring($payloadCol, 1, 8)")) === "89504E470D0A1A0A"
    def be4(pos: Int) =
      conv(hex(expr(s"substring($payloadCol, $pos, 4)")), 16, 10).cast(LongType)
    media
      .withColumn("is_png", isPng.cast(IntegerType))
      .withColumn("png_width", when(isPng, be4(17)))
      .withColumn("png_height", when(isPng, be4(21)))
  }

  /** JPEG SOF segment walk as a single SQL expression: JPEG dimensions
    * live in the frame header (SOF0-SOF3 marker), at a variable offset
    * behind APPn/DQT/COM segments, so unlike PNG/GIF a fixed substring
    * can't reach them. Each segment is `FF <type> <be16 length> ...`, so
    * the walk is: start after the 2-byte SOI, read the marker type, either
    * record dims (SOFn: height at +5, width at +7), stop (SOS — entropy
    * data follows), or hop `2 + length` forward. `aggregate` over a
    * 32-step sequence bounds the walk (real headers have ~10 segments);
    * state is (offset, w, h, stop). Only header bytes are touched —
    * substring reads at most ~9 bytes per step.
    */
  private def jpegSofScanSql(payloadCol: String): String = {
    def byteAt(off: String) =
      s"CAST(conv(hex(substring($payloadCol, CAST(($off) AS INT), 1)), 16, 10) AS BIGINT)"
    def be2(off: String) =
      s"CAST(conv(hex(substring($payloadCol, CAST(($off) AS INT), 2)), 16, 10) AS BIGINT)"
    s"""aggregate(
      sequence(1, 32),
      named_struct('off', CAST(3 AS BIGINT), 'w', CAST(NULL AS BIGINT),
                   'h', CAST(NULL AS BIGINT), 'stop', false),
      (st, i) -> IF(st.stop, st,
        IF(${byteAt("st.off")} <> 255 OR st.off + 9 > octet_length($payloadCol),
          named_struct('off', st.off, 'w', st.w, 'h', st.h, 'stop', true),
          IF(${byteAt("st.off + 1")} IN (192, 193, 194, 195),
            named_struct('off', st.off, 'w', ${be2("st.off + 7")},
                         'h', ${be2("st.off + 5")}, 'stop', true),
            IF(${byteAt("st.off + 1")} = 218,
              named_struct('off', st.off, 'w', st.w, 'h', st.h, 'stop', true),
              named_struct('off', st.off + 2 + ${be2("st.off + 2")},
                           'w', st.w, 'h', st.h, 'stop', false))))),
      st -> named_struct('w', st.w, 'h', st.h))"""
  }

  /** Header-only dimension extraction for the three dominant image
    * formats — no codec, no UDF, payloads pruned to their first bytes:
    *   - PNG: big-endian 4-byte width/height at fixed IHDR offsets 17/21;
    *   - GIF: little-endian 2-byte logical-screen size at offsets 7/9
    *     (byte-swap via concat of 1-byte substrings, then hex→conv);
    *   - JPEG: [[jpegSofScanSql]] segment walk to the SOFn frame header
    *     (the walk is a higher-order `aggregate` — JVM-native expression
    *     evaluation; the PNG/GIF arithmetic stays whole-stage-codegen'd).
    * Adds image_format ('png'/'jpeg'/'gif', null otherwise) and
    * img_width / img_height (null when not one of the three or header
    * truncated). Unknown formats cost only the magic-byte probes.
    */
  def withImageDims(media: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val isPng = hex(expr(s"substring($payloadCol, 1, 8)")) === "89504E470D0A1A0A"
    val isGif = hex(expr(s"substring($payloadCol, 1, 4)")).isin("47494638") // "GIF8"
    val isJpeg = hex(expr(s"substring($payloadCol, 1, 2)")) === "FFD8"
    def be4(pos: Int) =
      conv(hex(expr(s"substring($payloadCol, $pos, 4)")), 16, 10).cast(LongType)
    def le2(pos: Int) = // little-endian: swap the two bytes before conv
      conv(hex(expr(
        s"concat(substring($payloadCol, ${pos + 1}, 1), substring($payloadCol, $pos, 1))")),
        16, 10).cast(LongType)
    media
      .withColumn("__jpeg_sof", when(isJpeg, expr(jpegSofScanSql(payloadCol))))
      .withColumn("image_format",
        when(isPng, "png").when(isJpeg, "jpeg").when(isGif, "gif"))
      .withColumn("img_width",
        when(isPng, be4(17)).when(isJpeg, col("__jpeg_sof.w")).when(isGif, le2(7)))
      .withColumn("img_height",
        when(isPng, be4(21)).when(isJpeg, col("__jpeg_sof.h")).when(isGif, le2(9)))
      .drop("__jpeg_sof")
  }

  case class MediaFeatures(media_id: Long, n_bytes: Int, width: Int,
                           height: Int, mean_luma: Double)

  /** Per-partition batched "decode + feature extract". The decoder here is
    * a deterministic fake (byte statistics standing in for pixel
    * statistics); `init` simulates per-partition decoder setup — the
    * expensive-resource pattern (codec context, GPU handle) that makes
    * mapPartitions, not per-row UDFs, the right shape.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoderHandle = new java.util.zip.CRC32 // stand-in for codec init
        rows.map { case (id, bytes) =>
          decoderHandle.reset(); decoderHandle.update(bytes)
          // STUB decode: pseudo width/height from the content hash, mean
          // byte value as "luminance". Deterministic; replace with a real
          // codec behind the same signature.
          val h = decoderHandle.getValue
          val width = (h % 1280 + 64).toInt
          val height = ((h >> 16) % 720 + 64).toInt
          val luma = if (bytes.isEmpty) 0.0
            else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
          MediaFeatures(id, bytes.length, width, height, luma)
        }
      }
  }

  /** "Frame sampling" over a byte payload: every k-th fixed-size slice —
    * the video-frame-extraction access pattern (seek + bounded read),
    * emitted as (media_id, frame_idx, frame_bytes). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameSize: Int, every: Int): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Iterator.range(0, math.max(bytes.length - frameSize + 1, 0), frameSize * every)
          .zipWithIndex
          .map { case (off, idx) => (id, idx, bytes.slice(off, off + frameSize)) }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }
}
