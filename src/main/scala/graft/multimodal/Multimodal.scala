package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages as `mapPartitions` transforms over
  * typed Datasets (the Scala analogue of `mapInPandas` batch UDFs:
  * one iterator per partition, codec state initialized once per
  * partition, not once per row).
  *
  * The actual media codecs are NOT in this container, so the decode
  * kernels are deterministic STUBS (clearly marked) that derive
  * pseudo-features from the bytes; everything around them — schema,
  * batching, partitioning, null handling — is real and tested.
  * Swapping the stub for a JNI/FFmpeg kernel changes one function.
  *
  * Scale notes: media blobs make rows wide — keep
  * `spark.sql.files.maxPartitionBytes` small enough that a partition
  * of blobs fits executor memory, store blobs in their own table
  * keyed by asset_id (joinable to metadata), and never shuffle the
  * binary column through an aggregation (extract features first,
  * then drop the bytes — exactly what featurize() does).
  */
object Multimodal {

  /** Typed metadata accompanying every media asset. */
  final case class MediaAsset(
      asset_id: Long,
      media_type: String, // image | audio | video
      uri: String,
      content: Array[Byte],
      width: Option[Int], // images/video
      height: Option[Int],
      duration_ms: Option[Long]) // audio/video

  final case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      content_sha: String,
      feature: Array[Float]) // fixed-dim embedding

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("uri", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val featureDim = 16

  /** STUB decode kernel: a real implementation would decode the codec
    * and pool pixel/sample values; this derives a deterministic
    * pseudo-feature from byte content (sha-seeded), so the pipeline
    * is testable end-to-end without media libraries. */
  private[multimodal] def stubDecodeFeature(bytes: Array[Byte]): Array[Float] = {
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    Array.tabulate(featureDim) { i =>
      // two digest bytes per component, scaled to [-1, 1)
      val v = ((sha(2 * i) & 0xff) << 8) | (sha(2 * i + 1) & 0xff)
      (v.toFloat / 32768f) - 1f
    }
  }

  private def sha256Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Decode + feature-extract: mapPartitions so per-partition codec
    * init happens once; drops the heavy binary column on output. */
  def featurize(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    assets.mapPartitions { it =>
      // per-partition decoder init would go here (one codec context)
      it.map { a =>
        MediaFeatures(
          asset_id = a.asset_id,
          media_type = a.media_type,
          n_bytes = a.content.length.toLong,
          content_sha = sha256Hex(a.content),
          feature = stubDecodeFeature(a.content))
      }
    }
  }

  /** STUB resize: a real kernel would rescale pixels; the stub
    * truncates/pads bytes to the target "resolution" deterministically
    * and updates the metadata, preserving the transform's shape. */
  def resize(assets: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    implicit val enc = Encoders.product[MediaAsset]
    val target = w * h
    assets.mapPartitions(_.map { a =>
      val out = java.util.Arrays.copyOf(a.content, target)
      a.copy(content = out, width = Some(w), height = Some(h))
    })
  }

  /** Frame sampling for video-typed assets: emit one child asset per
    * sampled frame (every `everyMs` of duration). Real impl: seek +
    * decode keyframes; stub: slice the byte stream. One input row →
    * many output rows (flatMap), the shape a contrastive-pairs or
    * caption pipeline needs. */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Long): Dataset[MediaAsset] = {
    implicit val enc = Encoders.product[MediaAsset]
    assets.flatMap { a =>
      val dur = a.duration_ms.getOrElse(0L)
      if (a.media_type != "video" || dur <= 0 || a.content.isEmpty) Iterator.empty
      else {
        val n = ((dur + everyMs - 1) / everyMs).toInt.min(64)
        val chunk = math.max(1, a.content.length / math.max(n, 1))
        (0 until n).iterator.map { i =>
          val from = (i * chunk).min(a.content.length - 1)
          val until = ((i + 1) * chunk).min(a.content.length)
          a.copy(
            asset_id = a.asset_id * 1000 + i,
            media_type = "image",
            uri = s"${a.uri}#frame=$i",
            content = java.util.Arrays.copyOfRange(a.content, from, until),
            duration_ms = None)
        }
      }
    }
  }

  /** Build a deterministic media-asset table from the documents table
    * (bytes = utf-8 text): testdata carries no real media, but this
    * gives the multimodal plumbing a realistic distributed input. */
  def syntheticAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    graft.Tables.table(spark, dir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        concat(lit("synthetic://doc/"), col("doc_id")).as("uri"),
        encode(col("text"), "UTF-8").as("content"),
        when(col("doc_id") % 3 === 0, (col("n_chars") % 640 + 16).cast("int"))
          .otherwise(lit(null).cast("int")).as("width"),
        when(col("doc_id") % 3 === 0, (col("n_chars") % 480 + 16).cast("int"))
          .otherwise(lit(null).cast("int")).as("height"),
        when(col("doc_id") % 3 =!= 0, (col("n_chars") * 10).cast("long"))
          .otherwise(lit(null).cast("long")).as("duration_ms"))
      .as[MediaAsset](Encoders.product[MediaAsset])
  }
}
