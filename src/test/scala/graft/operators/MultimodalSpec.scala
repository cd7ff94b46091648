package graft.operators

import graft.delta.TestBase
import org.scalatest.funsuite.AnyFunSuite

/** The decoder seam is pluggable: a custom MediaDecoder flows through
  * extractFeatures' executor-side closure and changes the features,
  * while the default stub stays the oracle-checked contract. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

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
