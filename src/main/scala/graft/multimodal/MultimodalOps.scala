package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with decode / feature-extract / frame-sample stages.
  *
  * Since round 9 the image decode is REAL: `javax.imageio` (JDK-built-
  * in PNG/JPEG/GIF/BMP readers) parses the payload into dimensions,
  * format, and exact per-channel pixel sums — no external codec
  * dependency. Payloads no JDK reader recognizes (video/audio
  * containers, or the synthetic text-byte fixtures) fall back to the
  * deterministic pseudo-metadata stub, now explicitly a documented
  * FALLBACK rather than the primary path; swapping it for a
  * javacv/ffmpeg container parse changes nothing upstream or
  * downstream of the stage boundary.
  *
  * Scale notes: binary payloads stay columnar in parquet; the decode
  * stage is a mapPartitions pass (one batch per partition, constant
  * memory, no shuffle); metadata-only consumers never touch the
  * payload column thanks to parquet column pruning.
  */
object MultimodalOps {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("format", StringType),
    StructField("byte_len", LongType)))

  /** FALLBACK decode for payloads no JDK image reader recognizes
    * (video/audio containers would need an external parser):
    * deterministic pseudo-metadata derived from the payload bytes, so
    * the pipeline stages stay exercisable end-to-end on any payload.
    */
  private[multimodal] def fakeDecode(payload: Array[Byte]): Row = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 16 + math.floorMod(h, 1920)
    val height = 16 + math.floorMod(h >> 8, 1080)
    val frames = 1 + math.floorMod(h >> 16, 300)
    val fmt = Seq("jpeg", "png", "webm", "wav")(math.floorMod(h >> 24, 4))
    Row(width, height, frames, fmt, payload.length.toLong)
  }

  /** Payloads are in-memory byte arrays; without this, ImageIO's
    * default use-cache wraps every read in a FileCacheImageInputStream
    * — one executor-disk temp-file create/write/delete PER ROW.
    */
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decode: `ImageIO` header+raster parse. Returns
    * (image, formatName, frameCount) when a JDK reader claims the
    * payload, None otherwise — including on ANY decode-path failure
    * (reader SPI throwing on malformed-but-claimed bytes, an
    * environment without usable stream SPIs): the stage contract is
    * deterministic fallback, never a task crash.
    */
  private[graft] def tryDecodeImage(payload: Array[Byte])
      : Option[(java.awt.image.BufferedImage, String, Int)] =
    try {
      imageIoNoDiskCache
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      if (iis == null) None
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            // allowSearch is cheap here — the stream is in-memory —
            // and multi-frame formats (GIF) report their real count;
            // -1 (reader cannot tell) floors to 1.
            val frames =
              try math.max(reader.getNumImages(true), 1)
              catch { case _: Exception => 1 }
            Some((reader.read(0),
              reader.getFormatName.toLowerCase(java.util.Locale.ROOT),
              frames))
          } catch { case _: Exception => None }
          finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode stage: binary column → metadata struct, batched per
    * partition (the Scala analogue of a pandas-batch UDF: one iterator
    * pass per partition, constant memory). Real `ImageIO` decode
    * first; [[fakeDecode]] fallback for unrecognized payloads.
    */
  def decodeMetadata(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("media_meta", mediaMetaSchema))
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](binCol)
        Row.fromSeq(row.toSeq :+
          (if (payload == null) null
           else tryDecodeImage(payload) match {
             case Some((img, fmt, frames)) =>
               Row(img.getWidth, img.getHeight, frames, fmt,
                 payload.length.toLong)
             case None => fakeDecode(payload)
           }))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Exact per-channel sums over a raster — the shared summation both
    * [[decodeImageStats]] and [[resizeImage]] report (one definition,
    * so the two entries' oracles can never diverge on it).
    */
  private def channelSums(
      img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    val rgbs = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0,
      img.getWidth)
    var i = 0
    while (i < rgbs.length) {
      val rgb = rgbs(i)
      sr += (rgb >> 16) & 0xff
      sg += (rgb >> 8) & 0xff
      sb += rgb & 0xff
      i += 1
    }
    (sr, sg, sb)
  }

  val imageStatsSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("byte_len", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  /** Full-raster decode stage: binary column → `image_stats` struct
    * with EXACT per-channel pixel sums (integers — PNG is lossless, so
    * a planted image's sums are exactly re-derivable from its
    * generation formula; the oracle-checkable contract behind
    * q_multimodal_decode). Unrecognized/null payloads yield a null
    * struct. Same constant-memory mapPartitions shape as
    * [[decodeMetadata]].
    */
  def decodeImageStats(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("image_stats", imageStatsSchema))
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](binCol)
        val stats =
          if (payload == null) null
          else tryDecodeImage(payload) match {
            case Some((img, fmt, _)) =>
              val (sr, sg, sb) = channelSums(img)
              Row(img.getWidth, img.getHeight, fmt, payload.length.toLong,
                sr, sg, sb)
            case None => null
          }
        Row.fromSeq(row.toSeq :+ stats)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  val resizeStatsSchema: StructType = StructType(Seq(
    StructField("src_w", IntegerType),
    StructField("src_h", IntegerType),
    StructField("resized_w", IntegerType),
    StructField("resized_h", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  /** Deterministic nearest-neighbor resample: output pixel (x, y)
    * samples input (⌊(x+0.5)·sw/ow⌋, ⌊(y+0.5)·sh/oh⌋) — pixel-center
    * mapping, the standard NN convention, chosen over Graphics2D
    * interpolation because its result is EXACTLY re-derivable by an
    * oracle from the source pixels (no implementation-defined
    * rounding).
    */
  private[graft] def resampleNearest(img: java.awt.image.BufferedImage,
      ow: Int, oh: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(ow, oh,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < oh) {
      val sy = math.min(((y + 0.5) * img.getHeight / oh).toInt,
        img.getHeight - 1)
      var x = 0
      while (x < ow) {
        val sx = math.min(((x + 0.5) * img.getWidth / ow).toInt,
          img.getWidth - 1)
        out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL resize stage: decode the payload, aspect-fit it into a
    * `maxDim` box (same `scale = min(1, maxDim / max(w, h))`,
    * ceil-rounded arithmetic as the metadata-only [[resize]] stage),
    * resample the actual raster nearest-neighbor, and report the
    * resized dimensions plus exact per-channel sums OF THE RESIZED
    * pixels. Unrecognized/null payloads yield a null struct. This
    * upgrades resize from metadata arithmetic to a real raster
    * kernel; the deterministic NN convention keeps it oracle-checkable
    * on planted images.
    */
  def resizeImage(df: DataFrame, binCol: String, maxDim: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("resize_stats", resizeStatsSchema))
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](binCol)
        val stats =
          if (payload == null) null
          else tryDecodeImage(payload) match {
            case Some((img, _, _)) =>
              val scale = math.min(1.0,
                maxDim.toDouble / math.max(img.getWidth, img.getHeight))
              val ow = math.max(1, math.ceil(img.getWidth * scale).toInt)
              val oh = math.max(1, math.ceil(img.getHeight * scale).toInt)
              val (sr, sg, sb) = channelSums(resampleNearest(img, ow, oh))
              Row(img.getWidth, img.getHeight, ow, oh, sr, sg, sb)
            case None => null
          }
        Row.fromSeq(row.toSeq :+ stats)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  val audioStatsSchema: StructType = StructType(Seq(
    StructField("n_channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType),
    StructField("sum_abs", LongType),
    StructField("byte_len", LongType)))

  /** REAL audio decode: `javax.sound.sampled.AudioSystem` (JDK
    * built-in WAV/AIFF/AU readers) parses the payload's format header
    * and PCM frames; the stats carry channel count, rate, bit depth,
    * frame count, and the exact sum of absolute 16-bit sample values —
    * PCM is lossless, so a planted waveform's sum is exactly
    * re-derivable from its generation formula. Unrecognized/null
    * payloads yield a null struct. Same constant-memory mapPartitions
    * shape as the image stages.
    */
  def decodeAudioStats(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("audio_stats", audioStatsSchema))
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](binCol)
        val stats =
          if (payload == null) None else tryDecodeAudio(payload)
        Row.fromSeq(row.toSeq :+ stats.orNull)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** None on ANY decode failure — not just the typed
    * unsupported-format signal: a corrupt payload that passes the
    * RIFF magic check can drive the JDK parser into runtime
    * exceptions, and the stage contract (like the image path's) is a
    * null struct, never a task crash.
    */
  private[graft] def tryDecodeAudio(payload: Array[Byte]): Option[Row] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          // getFrameSize may be NOT_SPECIFIED (-1) on exotic headers;
          // 16-bit PCM frames are channels x 2 bytes by definition.
          val frame =
            if (fmt.getFrameSize > 0) fmt.getFrameSize
            else math.max(fmt.getChannels, 1) * 2
          val buf = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(buf).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var sumAbs = 0L
          var i = 0
          while (i + 1 < buf.length) {
            sumAbs += math.abs(bb.getShort(i).toLong)
            i += 2
          }
          Some(Row(fmt.getChannels, fmt.getSampleRate.toInt,
            fmt.getSampleSizeInBits, (buf.length / frame).toLong, sumAbs,
            payload.length.toLong))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic planted WAV: `n` frames of 16-bit mono PCM at 8 kHz
    * whose sample `i` is `((id·7919 + i·31) mod 65536) − 32768`,
    * encoded through the JDK WAVE writer — the audio analog of
    * [[syntheticPng]]: anything derived from a decode (frame count,
    * absolute-sample sum) is exactly predictable from `id`.
    */
  def syntheticWav(id: Long, n: Int): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      bb.putShort(i * 2,
        (math.floorMod(id * 7919 + i.toLong * 31, 65536) - 32768).toShort)
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic planted PNG: a `w`×`h` RGB image whose pixel
    * (x, y) channels are fixed affine functions of (`id`, x, y) mod
    * 256, encoded through the JDK PNG writer. Because PNG is lossless,
    * anything derived from a decode of these bytes (dimensions,
    * channel sums) is exactly predictable from `id` alone — the
    * fixture behind the oracle-checked decode entry and the
    * planted-pixel spec.
    */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = math.floorMod(id * 31 + x * 7 + y * 13, 256).toInt
        val g = math.floorMod(id * 17 + x * 3 + y * 5, 256).toInt
        val b = math.floorMod(id * 29 + x * 11 + y * 2, 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
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

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("min_r", IntegerType), StructField("max_r", IntegerType),
    StructField("grad_r", LongType),
    StructField("min_g", IntegerType), StructField("max_g", IntegerType),
    StructField("grad_g", LongType),
    StructField("min_b", IntegerType), StructField("max_b", IntegerType),
    StructField("grad_b", LongType)))

  /** REAL image-feature extraction: decode the payload and compute
    * classic handcrafted per-channel features over the raster —
    * channel min/max and horizontal gradient energy (the sum of
    * |c(x+1, y) − c(x, y)| over every horizontally adjacent pixel
    * pair, a standard edge-energy statistic). All three are exact
    * integers, so on a planted lossless image every feature is
    * re-derivable from the generation formula by a SQL oracle — this
    * is the oracle-checkable upgrade of the stub encoder pass
    * ([[extractFeatures]], which remains the opaque-embedding
    * contract). Unrecognized/null payloads yield a null struct; same
    * constant-memory mapPartitions shape as the other stages.
    */
  def imageFeatureStats(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("image_features", imageFeatureSchema))
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](binCol)
        val stats =
          if (payload == null) null
          else tryDecodeImage(payload) match {
            case Some((img, _, _)) =>
              val w = img.getWidth
              val h = img.getHeight
              val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
              // Plain locals, no per-pixel allocation — the loop runs
              // w*h times per payload inside a per-row iterator.
              var (mnR, mnG, mnB) = (255, 255, 255)
              var (mxR, mxG, mxB) = (0, 0, 0)
              var (grR, grG, grB) = (0L, 0L, 0L)
              var i = 0
              while (i < rgbs.length) {
                val rgb = rgbs(i)
                val r = (rgb >> 16) & 0xff
                val g = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                if (r < mnR) mnR = r; if (r > mxR) mxR = r
                if (g < mnG) mnG = g; if (g > mxG) mxG = g
                if (b < mnB) mnB = b; if (b > mxB) mxB = b
                if (i % w != w - 1) { // has a right neighbor
                  val nxt = rgbs(i + 1)
                  grR += math.abs(((nxt >> 16) & 0xff) - r)
                  grG += math.abs(((nxt >> 8) & 0xff) - g)
                  grB += math.abs((nxt & 0xff) - b)
                }
                i += 1
              }
              Row(mnR, mxR, grR, mnG, mxG, grG, mnB, mxB, grB)
            case None => null
          }
        Row.fromSeq(row.toSeq :+ stats)
      }
    }
    spark.createDataFrame(rdd, outSchema)
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
