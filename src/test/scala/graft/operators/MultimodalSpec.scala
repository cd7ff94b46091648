package graft.operators

import graft.delta.TestBase
import org.scalatest.funsuite.AnyFunSuite

/** The decoder seam is pluggable: a custom MediaDecoder flows through
  * extractFeatures' executor-side closure and changes the features.
  * ImageIoDecoder is a REAL javax.imageio decode — pinned against
  * in-memory PNG fixtures whose pixels are deterministic by
  * construction (PNG is lossless, so gray round-trips are byte-exact
  * and the BT.601 luminance of known RGB pixels is integer-exact). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  test("ImageIoDecoder round-trips a gray PNG byte-exactly") {
    val bytes = (0 until 256).map(_.toByte).toArray
    val img = new java.awt.image.BufferedImage(
      64, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, 64, 4, bytes)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val decoded = Multimodal.ImageIoDecoder.decode(bos.toByteArray)
    assert(decoded.toSeq == bytes.map(_ & 0xFF).toSeq,
      "gray PNG decode must be the identity on pixel bytes")
  }

  test("WAV encode → javax.sound decode round-trips samples byte-exactly") {
    import spark.implicits._
    val texts = Seq((1L, "hello wav"), (2L, ""), (3L, "x"))
    val media = Multimodal.encodePcmWav(
      Multimodal.fromDocuments(texts.toDF("doc_id", "text"), "doc_id", "text"))
    val rows = media.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // direct decoder round trip on the nontrivial clip
    assert(Multimodal.WavDecoder.decode(rows(1L)).toSeq ==
      "hello wav".getBytes("UTF-8").map(_ & 0xFF).toSeq)
    assert(Multimodal.WavDecoder.decode(rows(2L)).isEmpty)
    // undecodable bytes fail loudly
    intercept[Exception](Multimodal.WavDecoder.decode(Array[Byte](1, 2, 3, 4)))
  }

  test("audio features: sum, peak, and midline sign changes over crafted samples") {
    import spark.implicits._
    // bytes straddling the 128 midline: 3 sign changes, peak 200
    val crafted = Array[Byte](10, -56 /*200*/, 20, -126 /*130*/, 5)
    val media = Seq((7L, crafted)).toDF("media_id", "content")
      .select($"media_id", $"content",
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.lit("raw").as("format"),
          org.apache.spark.sql.functions.lit(5).as("width"),
          org.apache.spark.sql.functions.lit(1).as("height")).as("meta"))
    val wav = Multimodal.encodePcmWav(media)
    val f = Multimodal.extractAudioFeatures(wav, Multimodal.WavDecoder)
      .collect().head
    assert(f.getLong(1) == 5L)                      // n_samples
    assert(f.getLong(2) == 10L + 200L + 20L + 130L + 5L) // sample_sum
    assert(f.getLong(3) == 200L)                    // peak
    assert(f.getLong(4) == 4L, "10→200, 200→20, 20→130, 130→5 all cross 128")
  }

  test("ImageIoDecoder reduces RGB PNGs with integer BT.601 luminance") {
    val img = new java.awt.image.BufferedImage(
      3, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000) // pure red   → 299*255/1000 = 76
    img.setRGB(1, 0, 0x00FF00) // pure green → 587*255/1000 = 149
    img.setRGB(2, 0, 0x0000FF) // pure blue  → 114*255/1000 = 29
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    assert(Multimodal.ImageIoDecoder.decode(bos.toByteArray).toSeq == Seq(76, 149, 29))
  }

  test("undecodable bytes fail loudly; empty content decodes empty") {
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode("not an image".getBytes)
    }
    assert(Multimodal.ImageIoDecoder.decode(Array.emptyByteArray).isEmpty)
    assert(Multimodal.ImageIoDecoder.decode(null).isEmpty)
  }

  test("encodeGrayPng → decode pipeline equals byte stats; NN resize is exact") {
    import spark.implicits._
    val docs = Seq((1L, "abc"), (2L, "hello world!"), (3L, "x")).toDF("doc_id", "text")
    val media = Multimodal.encodeGrayPng(
      Multimodal.fromDocuments(docs, "doc_id", "text"))
    // content is a genuine PNG (magic bytes), not raw text
    val first = media.select("content").as[Array[Byte]].head()
    assert(first.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val feats = Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
      .select("media_id", "n_bytes", "byte_sum").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(feats(1L) == (3L, "abc".getBytes.map(_.toLong).sum))
    assert(feats(2L) == (12L, "hello world!".getBytes.map(_.toLong).sum))
    // NN resize of "abc" (L=3) to n=6: out(j) = px(j*3/6) = a,a,b,b,c,c
    val resized = Multimodal.resizeDecoded(media, 6)
      .filter($"media_id" === 1L).select("resized").as[Array[Int]].head()
    assert(resized.toSeq == "aabbcc".getBytes.map(_.toInt).toSeq)
    // frame-sample every 2nd decoded pixel of "hello world!"
    val sampled = Multimodal.frameSampleDecoded(media, 2)
      .filter($"media_id" === 2L).select("sampled").as[Array[Int]].head()
    assert(sampled.toSeq == "hlowrd".getBytes.map(_.toInt).toSeq)
    // the fused single-decode pass produces the SAME outputs as the
    // two-pass chain
    val fused = Multimodal.sampleAndResizeDecoded(media, k = 2, n = 6)
      .select("media_id", "orig_px", "sampled", "resized")
      .as[(Long, Long, Array[Int], Array[Int])]
      .collect().map(t => t._1 -> t).toMap
    assert(fused(2L)._3.toSeq == "hlowrd".getBytes.map(_.toInt).toSeq)
    assert(fused(1L)._4.toSeq == "aabbcc".getBytes.map(_.toInt).toSeq)
    assert(fused(1L)._2 == 3L && fused(2L)._2 == 12L)
  }

  test("custom MediaDecoder replaces the stub end-to-end") {
    import spark.implicits._
    val media = Multimodal.fromDocuments(
      Seq((1L, "abc"), (2L, "defgh")).toDF("doc_id", "text"), "doc_id", "text")

    val stub = Multimodal.extractFeatures(media)
      .select("media_id", "byte_sum").as[(Long, Long)].collect().toMap
    assert(stub(1L) == "abc".getBytes.map(_.toLong).sum)

    object ConstOne extends Multimodal.MediaDecoder {
      override def decode(c: Array[Byte]): Array[Int] =
        if (c == null) Array.emptyIntArray else Array.fill(c.length)(1)
    }
    val ones = Multimodal.extractFeatures(media, ConstOne)
      .select("media_id", "n_bytes", "byte_sum").as[(Long, Long, Long)].collect()
    assert(ones.forall { case (_, n, sum) => n == sum })
  }
}
