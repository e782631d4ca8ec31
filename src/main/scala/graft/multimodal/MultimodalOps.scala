package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing (schema, batch shape, partitioning, the
  * mapPartitions batch loop) is real and tested; the actual media
  * decode is STUBBED with a deterministic fake (this container ships no
  * image/audio codecs — see the builder brief). Swapping `fakeDecode`
  * for a real codec (e.g. javacv/ffmpeg) changes nothing upstream or
  * downstream of the stage boundary.
  *
  * Scale notes: binary payloads stay columnar in parquet; the decode
  * stage is a mapPartitions pass (one batch per partition, no shuffle);
  * metadata-only consumers never touch the payload column thanks to
  * parquet column pruning.
  */
object MultimodalOps {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("format", StringType),
    StructField("byte_len", LongType)))

  /** STUB decode: deterministic pseudo-metadata derived from the
    * payload bytes (stands in for an image/video header parse).
    */
  private[multimodal] def fakeDecode(payload: Array[Byte]): Row = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 16 + math.floorMod(h, 1920)
    val height = 16 + math.floorMod(h >> 8, 1080)
    val frames = 1 + math.floorMod(h >> 16, 300)
    val fmt = Seq("jpeg", "png", "webm", "wav")(math.floorMod(h >> 24, 4))
    Row(width, height, frames, fmt, payload.length.toLong)
  }

  /** Decode stage: binary column → metadata struct, batched per
    * partition (the Scala analogue of a pandas-batch UDF: one iterator
    * pass per partition, constant memory).
    */
  def decodeMetadata(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("media_meta", mediaMetaSchema))
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](binCol)
        Row.fromSeq(row.toSeq :+
          (if (payload == null) null else fakeDecode(payload)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling stage: pick every `stride`-th frame index up to
    * `maxFrames` from the decoded metadata — pure plan-side arithmetic
    * once metadata exists (no payload access).
    */
  def sampleFrames(df: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    df.withColumn("sampled_frames",
      slice(sequence(lit(0), col("media_meta.n_frames") - 1, lit(stride)),
        1, maxFrames))

  /** Resize stage: target dimensions computed plan-side from the
    * decoded metadata (aspect-preserving fit into maxDim box, like an
    * image-pipeline thumbnailer); the payload re-encode is stubbed as a
    * proportional byte estimate. No payload column access — pure
    * metadata arithmetic after decode.
    */
  def resize(df: DataFrame, maxDim: Int): DataFrame = {
    val w = col("media_meta.width")
    val h = col("media_meta.height")
    val scale = least(lit(1.0), lit(maxDim) / greatest(w, h).cast("double"))
    df.withColumn("resized",
      struct(
        ceil(w * scale).cast("int").as("width"),
        ceil(h * scale).cast("int").as("height"),
        ceil(col("media_meta.byte_len") * scale * scale).cast("long")
          .as("est_bytes")))
  }

  /** Feature-extract stage (STUB): fixed-length feature vector derived
    * deterministically from payload bytes — stands in for an encoder
    * forward pass; the array<float> output schema and batching are the
    * real contract.
    */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int): DataFrame =
    df.withColumn("features",
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col(binCol), i), lit(2000)).cast("double") / 1000.0 - 1.0)
          .cast("float")))
}
