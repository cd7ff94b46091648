package graft.delta

import org.roaringbitmap.longlong.Roaring64NavigableMap

import java.nio.file.Files

/** Byte-level golden fixtures for the deletion-vector codec. The
  * container ships no delta-spark to cross-validate against, so foreign
  * interop rests on the protocol text — these pins freeze the EXACT
  * bytes the codec produced when it was verified against that text
  * (PROTOCOL.md "Deletion Vectors" + the public RoaringFormatSpec +
  * ZeroMQ spec 32 for Z85): any serde drift now fails against frozen
  * bytes, not round-trip symmetry (which would mask a symmetric bug).
  *
  * Golden bitmap: {0, 9, 2^32+1} — spans two 32-bit Roaring buckets, so
  * the portable 64-bit framing (LE bucket count + per-bucket 32-bit
  * containers) is exercised, not just a single-bucket trivial case. */
class GoldenDvSpec extends GraftSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def goldenBitmap: Roaring64NavigableMap = {
    val rb = new Roaring64NavigableMap()
    Seq(0L, 9L, 4294967297L).foreach(rb.addLong)
    rb
  }

  /** [LE magic 1681511377][Roaring64 portable: LE u64 bucket count = 2,
    * then (LE u32 high bits, Roaring32 portable container) per bucket]. */
  private val GoldenSerialized =
    "d1d339640200000000000000000000003a3000000100000000000100100000000000" +
      "0900010000003a30000001000000000000001000000001000000"

  /** A whole DV FILE: [1-byte format version 1][BE u32 size = 60]
    * [the 60 serialized bytes][BE u32 CRC32 of them]. */
  private val GoldenFile =
    "010000003c" + GoldenSerialized + "100185b7"

  test("Z85 codec matches the ZeroMQ spec 32 reference vector") {
    // the spec's worked example: 86 4F D2 6F B5 59 F7 5B <-> "HelloWorld"
    val bytes = hex("864fd26fb559f75b")
    assert(DeletionVectors.z85Encode(bytes) == "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").toSeq == bytes.toSeq)
  }

  test("bitmap serialization is byte-identical to the golden bytes") {
    val got = DeletionVectors.serializeBitmap(goldenBitmap)
    assert(got.map("%02x".format(_)).mkString == GoldenSerialized,
      "serializeBitmap drifted from the frozen protocol-conformant bytes")
    val back = DeletionVectors.deserializeBitmap(hex(GoldenSerialized))
    assert(back.getLongCardinality == 3L &&
      back.contains(0L) && back.contains(9L) && back.contains(4294967297L))
  }

  test("a golden DV file reads back through the descriptor path, CRC-checked") {
    val dir = Files.createTempDirectory("graft_golden_dv")
    dir.toFile.deleteOnExit()
    val root = new org.apache.hadoop.fs.Path(dir.toString)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // fixed UUID so the on-disk name and descriptor are fully frozen
    val uuidBytes = hex("00112233445566778899aabbccddeeff")
    val enc = DeletionVectors.z85Encode(uuidBytes)
    val uuid = java.util.UUID.fromString("00112233-4455-6677-8899-aabbccddeeff")
    val out = fs.create(new org.apache.hadoop.fs.Path(root,
      DeletionVectors.dvFileName(uuid)), true)
    out.write(hex(GoldenFile)); out.close()

    val desc = DeletionVectorDescriptor("u", enc, offset = Some(1),
      sizeInBytes = 60, cardinality = 3L)
    assert(DeletionVectors.uuidOfDescriptor(desc) == uuid)
    val bm = DeletionVectors.loadBitmap(fs, root, desc)
    assert(bm.getLongCardinality == 3L && bm.contains(4294967297L))

    // corrupting one payload byte must fail the CRC loudly
    val bad = hex(GoldenFile); bad(7) = (bad(7) ^ 1).toByte
    val out2 = fs.create(new org.apache.hadoop.fs.Path(root,
      DeletionVectors.dvFileName(uuid)), true)
    out2.write(bad); out2.close()
    val e = intercept[IllegalArgumentException](
      DeletionVectors.loadBitmap(fs, root, desc))
    assert(e.getMessage.contains("checksum"), e.getMessage)
  }

  test("a table whose add carries the golden descriptor scans correctly") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_golden_tbl")
    d.toFile.deleteOnExit()
    val path = s"$d/tbl"
    // one file of 12 rows; golden bitmap kills row positions 0 and 9
    // (2^32+1 is beyond the file: harmless, never probed)
    GraftDelta.toDelta((0 until 12).map(i => (i.toLong, s"r$i")).toDF("k", "v")
      .coalesce(1), path)
    val log = DeltaLog.forTable(spark, path)
    val add0 = log.snapshot(None).activeFiles.head
    val root = new org.apache.hadoop.fs.Path(path)
    val out = log.fs.create(new org.apache.hadoop.fs.Path(root,
      DeletionVectors.dvFileName(
        java.util.UUID.fromString("00112233-4455-6677-8899-aabbccddeeff"))), true)
    out.write(hex(GoldenFile)); out.close()
    val desc = DeletionVectorDescriptor("u",
      DeletionVectors.z85Encode(hex("00112233445566778899aabbccddeeff")),
      offset = Some(1), sizeInBytes = 60, cardinality = 3L)
    log.writeCommit(1L, Seq(
      Protocol(3, 7, readerFeatures = Some(Seq("deletionVectors")),
        writerFeatures = Some(Seq("deletionVectors"))),
      add0.copy(dataChange = true, deletionVector = Some(desc)),
      RemoveFile(add0.path, Some(1L), dataChange = true)))
    val got = GraftDelta.readDelta(spark, path).select($"k").as[Long].collect().sorted
    assert(got.toSeq == (1L to 8L) ++ Seq(10L, 11L),
      "golden DV must hide exactly rows 0 and 9")
  }
}
