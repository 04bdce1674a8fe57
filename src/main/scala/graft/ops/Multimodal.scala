package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in batch-shaped partition passes.
  *
  * The decode step is a clearly-marked STUB (no codec libraries in this
  * environment): it derives deterministic pseudo-features from the bytes so
  * the Spark-side contract — schema, partitioning, batch iteration, feature
  * shapes — is real and testable. Swapping in a real decoder changes only
  * the bodies marked STUB below.
  */
object Multimodal {

  /** Canonical multimodal asset schema. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("blob", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))), nullable = true)))

  private val decodedSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Wrap arbitrary rows (id, payload string) into multimodal assets; used
    * by tests and benchmarks to synthesize binary columns.
    */
  def synthesizeAssets(df: DataFrame, idCol: String, payloadCol: String,
      modality: String): DataFrame = {
    // Multiplicative hashes of the payload length: plain integer arithmetic
    // so the synthesized metadata is reproducible by the SQL oracle.
    val n = octet_length(col(payloadCol).cast(StringType).cast(BinaryType))
      .cast(LongType)
    df.select(
      col(idCol).cast(LongType).as("asset_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast(StringType).cast(BinaryType).as("blob"),
      struct(
        lit(s"application/x-$modality").as("mime"),
        (pmod(n * lit(2654435761L), lit(1920)) + 1).cast(IntegerType)
          .as("width"),
        (pmod(n * lit(19349663L) + lit(7L), lit(1080)) + 1).cast(IntegerType)
          .as("height"),
        pmod(n * lit(73856093L), lit(600000L)).cast(LongType)
          .as("duration_ms")).as("meta"))
  }

  /** Decode + feature-extract in one partition-batched pass (the
    * mapInPandas-shaped pipeline stage). Features: `dim` floats.
    *
    * STUB: a real implementation decodes `blob` with an image/audio codec;
    * here features are a deterministic byte histogram projection so results
    * are stable and testable.
    */
  def decodeAndFeaturize(assets: DataFrame, dim: Int = 16): DataFrame = {
    assets.select("asset_id", "modality", "blob", "meta.width", "meta.height")
      .mapPartitions { rows =>
        rows.map { row =>
          val blob = row.getAs[Array[Byte]]("blob")
          // STUB decode: byte-histogram folded to `dim` buckets, L1-normalized.
          val hist = new Array[Float](dim)
          var i = 0
          while (i < blob.length) {
            hist((blob(i) & 0xff) % dim) += 1.0f
            i += 1
          }
          val total = math.max(1.0f, blob.length.toFloat)
          var d = 0
          while (d < dim) { hist(d) /= total; d += 1 }
          Row(row.getLong(0), row.getString(1), blob.length,
            row.getInt(3), row.getInt(4), hist.toSeq)
        }
      }(Encoders.row(decodedSchema))
  }

  /** Resize metadata transform (STUB: real impl resamples pixels; the
    * metadata contract — aspect-preserving target dims — is real).
    */
  def resizePlan(assets: DataFrame, maxSide: Int): DataFrame =
    assets.withColumn("resize",
      struct(
        least(col("meta.width"), lit(maxSide)).as("target_width"),
        least(col("meta.height"), lit(maxSide)).as("target_height"),
        (col("meta.width") > maxSide || col("meta.height") > maxSide)
          .as("needs_resize")))

  /** Frame-sampling plan for video assets: timestamps of `fps`-spaced
    * frames from the metadata duration (STUB decode; real impl would seek).
    */
  def frameSamplePlan(assets: DataFrame, everyMs: Long): DataFrame =
    assets.where(col("modality") === "video")
      .withColumn("frame_ts_ms",
        sequence(lit(0L), col("meta.duration_ms"), lit(everyMs)))
      .withColumn("n_frames", size(col("frame_ts_ms")))
}
