package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column model: image/audio/video travel as opaque `binary`
  * columns with a typed metadata struct alongside. Decode / feature-extract /
  * resize / frame-sample run as partition-local batch functions
  * (`mapPartitions` — the Scala analog of `mapInPandas`): one decoder
  * instance per partition, rows streamed through it in batches, output schema
  * declared up front. The Spark-side plumbing (schema, partitioning, batch
  * shape) is real and tested; the actual codec call is STUBBED with a
  * deterministic fake because no image/audio libraries exist in this
  * container — swap `decodeStub` for a real decoder in deployment.
  */
object Multimodal {

  /** Metadata carried with every media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)
  ))

  /** Decode: REAL for JDK-supported image formats (PNG/JPEG/GIF/BMP via
    * ImageIO — width/height and an 8-bin luminance histogram as features);
    * deterministic hash-derived fake for anything else (audio/video codecs
    * aren't in this container — that branch is the documented stub, same
    * signature, so a real codec slots in without touching the Spark side).
    */
  private[llm] def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val real: Option[(Int, Int, Array[Float])] =
      if (bytes == null || bytes.length < 8) None
      else
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            // 8-bin luminance histogram over a bounded sample grid
            val bins = new Array[Float](8)
            val (sx, sy) = (math.max(1, w / 32), math.max(1, h / 32))
            var n = 0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                bins(math.min(7, lum / 32)) += 1f
                n += 1
                x += sx
              }
              y += sy
            }
            if (n > 0) { var i = 0; while (i < 8) { bins(i) /= n; i += 1 } }
            Some((w, h, bins))
          }
        } catch { case _: Throwable => None }
    real.getOrElse {
      // STUB(no audio/video codecs): deterministic fake from the bytes alone
      val h = if (bytes == null || bytes.isEmpty) 0L
              else bytes.take(64).foldLeft(1125899906842597L)((a, b) => a * 31 + b)
      val width = (math.abs(h) % 1920 + 1).toInt
      val height = (math.abs(h / 7) % 1080 + 1).toInt
      val features = Array.tabulate(8)(i => ((math.abs(h / (i + 1)) % 1000) / 1000.0f))
      (width, height, features)
    }
  }

  /** Attach decode metadata + an 8-dim feature vector to a binary column.
    * Output schema: input columns + media_meta struct + features array.
    */
  def decodeAndFeaturize(df: DataFrame, binaryCol: String): DataFrame = {
    val spark = df.sparkSession
    val binIdx = df.columns.indexOf(binaryCol)
    require(binIdx >= 0, s"no column $binaryCol")
    val outSchema = df.schema
      .add("media_meta", mediaMetaSchema)
      .add("features", ArrayType(FloatType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // one "decoder" per partition — where a real codec would be initialized
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val (w, h, features) = decodeStub(bytes)
        val meta = Row("application/octet-stream", w, h, null)
        Row.fromSeq(row.toSeq :+ meta :+ features)
      }
    }(enc).toDF()
  }

  /** REAL bilinear resize + PNG re-encode for JDK-decodable images
    * (ImageIO → Graphics2D scale → PNG bytes — no external libraries);
    * deterministic fake for undecodable blobs (audio/video codecs aren't
    * in this container — the documented stub branch, same signature).
    * Returns (pngBytes, mime) — mime distinguishes the real path.
    */
  private[llm] def resizeBlob(bytes: Array[Byte], tw: Int, th: Int): (Array[Byte], String) = {
    val real: Option[Array[Byte]] =
      if (bytes == null || bytes.length < 8) None
      else
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) None
          else {
            val out = new java.awt.image.BufferedImage(
              tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, tw, th, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Some(bos.toByteArray)
          }
        } catch { case _: Throwable => None }
    real.map((_, "image/png")).getOrElse {
      // STUB(no audio/video codecs): deterministic area-proportional payload
      val targetLen = math.max(1, (tw * th) / 64)
      val out = Array.tabulate(targetLen) { i =>
        (if (bytes == null || bytes.isEmpty) i
         else bytes(i % bytes.length) ^ (i & 0x7f)).toByte
      }
      (out, "application/octet-stream")
    }
  }

  /** Resize media blobs to target dimensions: REAL decode-scale-reencode
    * for images (see [[resizeBlob]]), documented fake otherwise. Output:
    * input columns + `resized` binary + `resized_meta` struct carrying the
    * target dimensions and the mime of the path taken.
    */
  def resize(df: DataFrame, binaryCol: String, targetWidth: Int, targetHeight: Int): DataFrame = {
    val binIdx = df.columns.indexOf(binaryCol)
    require(binIdx >= 0, s"no column $binaryCol")
    val outSchema = df.schema
      .add("resized", BinaryType)
      .add("resized_meta", mediaMetaSchema)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val (tw, th) = (targetWidth, targetHeight)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = Option(row.getAs[Array[Byte]](binIdx)).getOrElse(Array.emptyByteArray)
        val (out, mime) = resizeBlob(bytes, tw, th)
        val meta = Row(mime, tw, th, null)
        Row.fromSeq(row.toSeq :+ out :+ meta)
      }
    }(enc).toDF()
  }

  /** Deterministic frame sampling for video-ish blobs: pick `n` evenly spaced
    * byte offsets as stand-in "frames" (STUB — a real impl samples decoded
    * frames). Demonstrates the explode-to-rows shape used for frame corpora.
    */
  def sampleFrames(df: DataFrame, binaryCol: String, n: Int): DataFrame = {
    val frameOffsets = transform(
      TextStats.safeSeq(lit(n)),
      i => ((i - 1) * greatest(length(col(binaryCol)) - 1, lit(1)) / math.max(n - 1, 1)).cast("long")
    )
    df.withColumn("frame_offset", explode(frameOffsets))
      .withColumn("frame_id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(binaryCol)).orderBy(col("frame_offset"))))
  }
}
