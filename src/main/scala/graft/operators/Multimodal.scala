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
