package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` content plus a
  * typed metadata struct, with decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing (schema, partition-preserving mapPartitions
  * batches, feature vector shape) is real and tested; the actual codec
  * is STUBBED with a deterministic fake (this container ships no
  * image/audio libraries) — swap `decodeStub` for a real decoder to
  * productionize. Equivalent of running a vectorized decode UDF per
  * partition batch; executors stream batches, nothing is collected.
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
    * ffmpeg/ImageIO handle would fail to serialize).
    *
    * To productionize: implement this over javax.imageio / a JNI ffmpeg
    * binding and pass it to `extractFeatures` — nothing else changes;
    * schema, batching, and partitioning are decoder-agnostic. */
  trait MediaDecoder extends Serializable {
    def decode(content: Array[Byte]): Array[Int]
  }

  /** Deterministic stand-in decoder (this container ships no codec
    * libraries): each byte is one intensity. Keeps the whole pipeline
    * oracle-checkable end-to-end. */
  object IdentityBytesDecoder extends MediaDecoder {
    override def decode(content: Array[Byte]): Array[Int] =
      if (content == null) Array.emptyIntArray else content.map(b => b & 0xFF)
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
}
