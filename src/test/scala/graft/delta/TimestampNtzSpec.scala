package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import java.nio.file.Files
import java.time.LocalDateTime

/** TIMESTAMP_NTZ as a first-class Delta type (reader+writer feature
  * `timestampNtz`): creates stamp the feature, values round-trip
  * without session-timezone shifts, schema evolution upgrades the
  * protocol in the same commit, and plain timestamp tables keep their
  * legacy protocol. */
class TimestampNtzSpec extends GraftSuite {

  import TestBase.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_ntz")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  private def ntzFrame = Seq(
    (1L, LocalDateTime.parse("2021-03-01T10:30:00")),
    (2L, LocalDateTime.parse("2021-07-15T23:59:59"))).toDF("k", "ts")

  test("create with NTZ stamps the feature; values and type round-trip") {
    val path = tmp()
    assert(ntzFrame.schema("ts").dataType == TimestampNTZType) // precondition
    GraftDelta.toDelta(ntzFrame, path)
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    assert(snap.protocol.minReaderVersion == 3 && snap.protocol.minWriterVersion == 7)
    assert(snap.protocol.readerFeatures.exists(_.contains("timestampNtz")))
    assert(snap.protocol.writerFeatures.exists(_.contains("timestampNtz")))
    assert(snap.schema("ts").dataType == TimestampNTZType)
    val back = GraftDelta.readDelta(spark, path)
    assert(back.schema("ts").dataType == TimestampNTZType)
    assert(back.orderBy("k").select("ts").as[LocalDateTime].collect().toSeq ==
      Seq(LocalDateTime.parse("2021-03-01T10:30:00"),
        LocalDateTime.parse("2021-07-15T23:59:59")))
  }

  test("mergeSchema adding the first NTZ column upgrades the protocol in-commit") {
    val path = tmp()
    GraftDelta.toDelta((1L to 3L).map(i => (i, s"v$i")).toDF("k", "v"), path)
    val p0 = DeltaLog.forTable(spark, path).snapshot(None).protocol
    assert(p0.minReaderVersion == 1, "plain table stays legacy")
    GraftDelta.toDelta(
      Seq((4L, "v4", LocalDateTime.parse("2022-01-01T00:00:00"))).toDF("k", "v", "ts"),
      path, mode = "append", mergeSchema = true)
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    assert(snap.protocol.readerFeatures.exists(_.contains("timestampNtz")),
      s"protocol must upgrade with the schema: ${snap.protocol}")
    assert(snap.schema("ts").dataType == TimestampNTZType)
    assert(GraftDelta.readDelta(spark, path).count() == 4L)
  }

  test("plain timestamp tables are untouched; NTZ vs timestamp append refuses") {
    val path = tmp()
    val tsFrame = Seq((1L, java.sql.Timestamp.valueOf("2021-03-01 10:30:00")))
      .toDF("k", "ts")
    assert(tsFrame.schema("ts").dataType == TimestampType)
    GraftDelta.toDelta(tsFrame, path)
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    assert(snap.protocol.minReaderVersion == 1 && snap.protocol.minWriterVersion == 2)
    assert(snap.schema("ts").dataType == TimestampType)
    // the two timestamp flavors are distinct types — no silent coercion
    val e = intercept[Exception](
      GraftDelta.toDelta(ntzFrame, path, mode = "append", mergeSchema = true))
    assert(e.getMessage.contains("Cannot merge column ts"), e.getMessage)
  }

  test("CONVERT TO DELTA on an NTZ lake stamps the feature") {
    val dir = Files.createTempDirectory("graft_ntz_conv")
    dir.toFile.deleteOnExit()
    val p = s"$dir/lake"
    ntzFrame.write.parquet(p)
    GraftDelta.convertToDelta(spark, p)
    val snap = DeltaLog.forTable(spark, p).snapshot(None)
    assert(snap.protocol.readerFeatures.exists(_.contains("timestampNtz")),
      s"converted NTZ table must declare the feature: ${snap.protocol}")
    assert(GraftDelta.readDelta(spark, p).schema("ts").dataType == TimestampNTZType)
  }

  test("NTZ survives checkpoint replay and DML") {
    val path = tmp()
    GraftDelta.toDelta(ntzFrame, path)                                    // v0
    GraftDelta.deleteWhere(spark, path, Seq(Seq(Predicate("k", "==", 2L)))) // v1
    DeltaLog.forTable(spark, path).writeCheckpoint(1L)
    new java.io.File(s"$path/_delta_log/" + f"${0L}%020d.json").delete()
    val back = GraftDelta.readDelta(spark, path)
    assert(back.schema("ts").dataType == TimestampNTZType)
    assert(back.select("ts").as[LocalDateTime].collect().toSeq ==
      Seq(LocalDateTime.parse("2021-03-01T10:30:00")))
  }
}
