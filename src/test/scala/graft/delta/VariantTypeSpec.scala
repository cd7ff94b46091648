package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.VariantType

import java.nio.file.Files

/** VARIANT as a first-class Delta type (reader+writer feature
  * `variantType`): Delta's `variant` schemaString type is Spark 4's
  * native `VariantType`, the parquet physical encoding round-trips
  * through Spark's vectorized reader, creates stamp the feature, schema
  * evolution upgrades the protocol in the same commit, and per-file
  * stats never claim min/max over the opaque encoding. */
class VariantTypeSpec extends GraftSuite {

  import TestBase.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_variant")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  private def variantFrame = Seq(
    (1L, """{"a":1,"b":"x"}"""),
    (2L, """{"a":2,"b":"y","c":[1,2,3]}"""),
    (3L, """{"a":3,"nested":{"d":true}}""")).toDF("k", "j")
    .select(col("k"), parse_json(col("j")).as("v"))

  test("create with VARIANT stamps the feature; values and type round-trip") {
    val path = tmp()
    assert(variantFrame.schema("v").dataType == VariantType) // precondition
    GraftDelta.toDelta(variantFrame, path)
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    assert(snap.protocol.minReaderVersion == 3 && snap.protocol.minWriterVersion == 7)
    assert(snap.protocol.readerFeatures.exists(_.contains("variantType")))
    assert(snap.protocol.writerFeatures.exists(_.contains("variantType")))
    assert(snap.schema("v").dataType == VariantType)
    val back = GraftDelta.readDelta(spark, path)
    assert(back.schema("v").dataType == VariantType)
    // typed field extraction works through the engine read
    assert(back.select(sum(variant_get(col("v"), "$.a", "long"))).as[Long].head() == 6L)
    // and the full values survive (shape-insensitive compare via variant_get)
    assert(back.where(variant_get(col("v"), "$.nested.d", "boolean")).select("k")
      .as[Long].collect().toSeq == Seq(3L))
  }

  test("per-file stats carry numRecords but no min/max for the variant column") {
    val path = tmp()
    GraftDelta.toDelta(variantFrame.coalesce(1), path)
    val add = DeltaLog.forTable(spark, path).snapshot(None).activeFiles.head
    val stats = add.stats.getOrElse(fail("stats must be harvested"))
    assert(stats.contains("\"numRecords\":3"), stats)
    assert(stats.contains("\"k\":1"), "plain columns keep their stats: " + stats)
    assert(!stats.matches(""".*"(min|max)Values":\{[^}]*"v".*"""),
      "variant columns must not claim orderable stats: " + stats)
  }

  test("mergeSchema adding the first VARIANT column upgrades the protocol in-commit") {
    val path = tmp()
    GraftDelta.toDelta((1L to 3L).map(i => (i, s"v$i")).toDF("k", "s"), path)
    val p0 = DeltaLog.forTable(spark, path).snapshot(None).protocol
    assert(p0.minReaderVersion == 1, "plain table stays legacy")
    GraftDelta.toDelta(
      Seq((4L, "v4", """{"z":9}""")).toDF("k", "s", "j")
        .select(col("k"), col("s"), parse_json(col("j")).as("v")),
      path, mode = "append", mergeSchema = true)
    val snap = DeltaLog.forTable(spark, path).snapshot(None)
    assert(snap.protocol.readerFeatures.exists(_.contains("variantType")),
      s"protocol must upgrade with the schema: ${snap.protocol}")
    assert(snap.schema("v").dataType == VariantType)
    val back = GraftDelta.readDelta(spark, path)
    assert(back.count() == 4L)
    // pre-evolution files surface null variants
    assert(back.where(col("v").isNull).count() == 3L)
  }

  test("VARIANT survives DML rewrite and checkpoint replay") {
    val path = tmp()
    GraftDelta.toDelta(variantFrame, path)                                   // v0
    GraftDelta.deleteWhere(spark, path, Seq(Seq(Predicate("k", "==", 2L))))  // v1
    DeltaLog.forTable(spark, path).writeCheckpoint(1L)
    new java.io.File(s"$path/_delta_log/" + f"${0L}%020d.json").delete()
    val back = GraftDelta.readDelta(spark, path)
    assert(back.schema("v").dataType == VariantType)
    assert(back.select(sum(variant_get(col("v"), "$.a", "long"))).as[Long].head() == 4L)
  }

  test("variant tables serve the SQL SELECT surface through the reader views") {
    val path = tmp()
    GraftDelta.toDelta(variantFrame, path)
    val got = graft.sql.GraftSql.sql(spark,
      s"SELECT SUM(variant_get(v, '$$.a', 'long')) AS s FROM delta.`$path`")
      .head().getLong(0)
    assert(got == 6L)
  }

  test("foreign table declaring variantType reads (the r7 refusal is closed)") {
    val path = tmp()
    GraftDelta.toDelta(variantFrame, path)
    val log = DeltaLog.forTable(spark, path)
    val snap = log.snapshot(None)
    // a foreign writer might list extra honored features alongside
    log.writeCommit(1L, Seq(
      CommitInfo(System.currentTimeMillis(), "UPGRADE PROTOCOL"),
      Protocol(3, 7,
        readerFeatures = Some(Seq("variantType", "vacuumProtocolCheck")),
        writerFeatures = Some(
          (DeltaLog.legacyWriterFeatures(snap.protocol) ++
            Seq("variantType", "vacuumProtocolCheck")).distinct))))
    assert(GraftDelta.readDelta(spark, path).count() == 3L)
  }
}
