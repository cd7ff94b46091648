package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` content plus a
  * typed metadata struct, with decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing (schema, partition-preserving mapPartitions
  * batches, feature vector shape) is decoder-agnostic. Two decoders
  * ship: [[ImageIoDecoder]] — a REAL image decode over the JDK's
  * `javax.imageio` (PNG/JPEG/BMP/GIF, no external libraries) — and the
  * [[IdentityBytesDecoder]] stand-in for non-image bytes. Equivalent of
  * running a vectorized decode UDF per partition batch; executors
  * stream batches, nothing is collected.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Wrap a text table as a fake media table: content = UTF-8 bytes,
    * meta derived from length. Stands in for reading real image blobs. */
  def fromDocuments(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("content"),
      struct(
        lit("fake/raw").as("format"),
        (length(col(textCol)) % 64 + 8).cast("int").as("width"),
        (length(col(textCol)) % 48 + 8).cast("int").as("height")).as("meta"))

  /** THE DECODER SWAP POINT. Implementations turn opaque media bytes
    * into pixel/sample intensities; instances are shipped to executors
    * inside the mapPartitions closure, so they must be Serializable and
    * must lazily initialize any native codec state per-JVM (an eager
    * ffmpeg handle would fail to serialize; `javax.imageio`'s static
    * entry points carry no instance state and just work). */
  trait MediaDecoder extends Serializable {
    def decode(content: Array[Byte]): Array[Int]
  }

  /** Stand-in decoder for non-image bytes: each byte is one intensity.
    * Keeps byte-level pipelines oracle-checkable end-to-end. */
  object IdentityBytesDecoder extends MediaDecoder {
    override def decode(content: Array[Byte]): Array[Int] =
      if (content == null) Array.emptyIntArray else content.map(b => b & 0xFF)
  }

  /** REAL image decode over the JDK's `javax.imageio` — pure JVM, no
    * external codec libraries. Pixels surface as 0-255 luminance in
    * row-major order: grayscale rasters read their sample directly (so
    * a gray PNG round-trips bytes exactly — PNG is lossless); color
    * images reduce via the integer BT.601 weights
    * (299·R + 587·G + 114·B) / 1000 — deterministic across JVMs, no
    * floating point. Undecodable bytes fail LOUDLY: silently treating a
    * corrupt image as empty would poison downstream feature stats. */
  object ImageIoDecoder extends MediaDecoder {
    override def decode(content: Array[Byte]): Array[Int] = {
      if (content == null || content.isEmpty) return Array.emptyIntArray
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null)
        throw new IllegalArgumentException(
          s"javax.imageio found no decoder for ${content.length} content bytes")
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Int](w * h)
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            out(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
            x += 1
          }
          y += 1
        }
      }
      out
    }
  }

  /** Encode each row's content bytes as a REAL one-row 8-bit grayscale
    * PNG (pixel i = byte i): turns any byte column into genuine image
    * bytes whose decode is exact (PNG is lossless), so decode-based
    * operators stay oracle-checkable against byte-level SQL. Runs
    * executor-side per row; empty content stays empty. */
  def encodeGrayPng(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .map { case (id, content) =>
        if (content == null || content.isEmpty) (id, Array.emptyByteArray, 0)
        else {
          val img = new java.awt.image.BufferedImage(
            content.length, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          img.getRaster.setDataElements(0, 0, content.length, 1, content)
          val bos = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(img, "png", bos), "no PNG encoder")
          (id, bos.toByteArray, content.length)
        }
      }
      .toDF("media_id", "png", "n_px")
      .select($"media_id", $"png".as("content"),
        struct(lit("image/png").as("format"),
          $"n_px".cast("int").as("width"), lit(1).as("height")).as("meta"))
  }

  /** Encode each row's content bytes as a REAL 8-bit unsigned PCM mono
    * WAV (sample i = byte i — lossless, like [[encodeGrayPng]]): any
    * byte column becomes genuine audio whose decode is exact, so
    * audio-feature operators stay oracle-checkable against byte-level
    * SQL. The RIFF header is assembled directly (44 bytes, deterministic);
    * decoding goes through the JDK's real `javax.sound.sampled` codec. */
  def encodePcmWav(media: DataFrame, sampleRate: Int = 8000): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .map { case (id, content) =>
        if (content == null || content.isEmpty) (id, Array.emptyByteArray, 0)
        else {
          val n = content.length
          val bb = java.nio.ByteBuffer.allocate(44 + n)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1)                      // PCM
            .putShort(1)                      // mono
            .putInt(sampleRate)
            .putInt(sampleRate)               // byte rate (8-bit mono)
            .putShort(1)                      // block align
            .putShort(8)                      // bits per sample
            .put("data".getBytes("US-ASCII")).putInt(n)
            .put(content)
          (id, bb.array(), n)
        }
      }
      .toDF("media_id", "wav", "n_samples")
      .select($"media_id", $"wav".as("content"),
        struct(lit("audio/wav").as("format"),
          $"n_samples".cast("int").as("width"), lit(1).as("height")).as("meta"))
  }

  /** REAL audio decode over the JDK's `javax.sound.sampled` (WAV/PCM,
    * no external libraries). Samples surface as their unsigned 8-bit
    * values (0-255); undecodable bytes fail LOUDLY, like the image
    * decoder. */
  object WavDecoder extends MediaDecoder {
    override def decode(content: Array[Byte]): Array[Int] = {
      if (content == null || content.isEmpty) return Array.emptyIntArray
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        require(in.getFormat.getSampleSizeInBits == 8,
          s"expected 8-bit PCM, got ${in.getFormat}")
        val bytes = in.readAllBytes()
        bytes.map(b => b & 0xFF)
      } finally in.close()
    }
  }

  final case class AudioFeatures(
      media_id: Long, n_samples: Long, sample_sum: Long,
      peak: Long, sign_changes: Long)

  /** Per-clip audio features over partition-streamed batches: sample
    * count, amplitude sum, peak, and midline (≥128 vs <128) sign
    * changes — the zero-crossing-rate analog over unsigned samples.
    * Same mapPartitions shape as [[extractFeatures]]: one JVM pass per
    * partition, no shuffle, no driver data. */
  def extractAudioFeatures(
      media: DataFrame, decoder: MediaDecoder = WavDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, content) =>
          val s = decoder.decode(content)
          var sum = 0L
          var peak = 0L
          var changes = 0L
          var i = 0
          while (i < s.length) {
            sum += s(i)
            if (s(i) > peak) peak = s(i)
            if (i > 0 && ((s(i) >= 128) != (s(i - 1) >= 128))) changes += 1
            i += 1
          }
          AudioFeatures(id, s.length.toLong, sum, peak, changes)
        }
      }
      .toDF()
  }

  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, byte_sum: Long, hist: Array[Long])

  /** Per-media feature extraction over partition-streamed batches:
    * byte count, intensity sum, 16-bucket intensity histogram. Runs as
    * mapPartitions (the Scala analog of a pandas mapInPandas batch UDF):
    * one JVM pass per partition, no shuffle, no driver data. */
  def extractFeatures(
      media: DataFrame, decoder: MediaDecoder = IdentityBytesDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, content) =>
          val px = decoder.decode(content)
          val hist = new Array[Long](16)
          var sum = 0L
          var i = 0
          while (i < px.length) { sum += px(i); hist(px(i) % 16) += 1; i += 1 }
          MediaFeatures(id, px.length.toLong, sum, hist)
        }
      }
      .toDF()
  }

  /** "Frame sample": every k-th pixel/byte, as a new binary column —
    * the shape of video frame-striding without a real codec. */
  def frameSample(media: DataFrame, k: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .map { case (id, content) =>
        val c = if (content == null) Array.emptyByteArray else content
        (id, c.grouped(k).map(_.head).toArray, c.length.toLong)
      }
      .toDF("media_id", "sampled", "orig_bytes")
  }

  /** "Resize": truncate or zero-pad content to exactly n bytes — the
    * shape of a resize kernel without a real codec. */
  def resizeTo(media: DataFrame, n: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .map { case (id, content) =>
        val c = if (content == null) Array.emptyByteArray else content
        (id, java.util.Arrays.copyOf(c, n))
      }
      .toDF("media_id", "resized")
  }

  /** Frame sample over DECODED pixels: every k-th intensity after a real
    * decode (video frame-striding over actual image content). */
  def frameSampleDecoded(
      media: DataFrame, k: Int, decoder: MediaDecoder = ImageIoDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .map { case (id, content) =>
        val px = decoder.decode(content)
        (id, px.indices.by(k).map(px).toArray, px.length.toLong)
      }
      .toDF("media_id", "sampled", "orig_px")
  }

  /** Fused frame-sample + nearest-neighbor resize in ONE decode pass:
    * the codec dominates multimodal cost, so chaining
    * [[frameSampleDecoded]] and [[resizeDecoded]] (two decodes of every
    * image plus a join) is twice the work of this single
    * partition-streamed map — same outputs, half the decode budget, no
    * shuffle. At 100 TB of media the decode pass IS the pipeline cost;
    * every derived output must ride one pass. */
  def sampleAndResizeDecoded(
      media: DataFrame, k: Int, n: Int,
      decoder: MediaDecoder = ImageIoDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, content) =>
          val px = decoder.decode(content)
          val sampled = px.indices.by(k).map(px).toArray
          val resized = new Array[Int](n)
          if (px.nonEmpty) {
            var j = 0
            while (j < n) { resized(j) = px((j.toLong * px.length / n).toInt); j += 1 }
          }
          (id, px.length.toLong, sampled, resized)
        }
      }
      .toDF("media_id", "orig_px", "sampled", "resized")
  }

  /** Nearest-neighbor resize over DECODED pixels to exactly n samples:
    * out(j) = px(⌊j·L/n⌋) — the integer-exact NN kernel, deterministic
    * across JVMs (no float interpolation). Empty decodes yield zeros,
    * mirroring resizeTo's zero-pad contract. */
  def resizeDecoded(
      media: DataFrame, n: Int, decoder: MediaDecoder = ImageIoDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .map { case (id, content) =>
        val px = decoder.decode(content)
        val out = new Array[Int](n)
        if (px.nonEmpty) {
          var j = 0
          while (j < n) { out(j) = px((j.toLong * px.length / n).toInt); j += 1 }
        }
        (id, out)
      }
      .toDF("media_id", "resized")
  }
}
