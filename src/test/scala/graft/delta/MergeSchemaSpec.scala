package graft.delta

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Append-side schema evolution: mode=append + mergeSchema=true. */
class MergeSchemaSpec extends GraftSuite {

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_ms")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  test("append with a new column widens the schema; old files read nulls") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1 to 5).map(i => (i.toLong, s"v$i")).toDF("id", "v"), path)
    GraftDelta.toDelta(
      (6 to 8).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("id", "v", "score"),
      path, mode = "append", mergeSchema = true)

    val out = GraftDelta.readDelta(spark, path)
    assert(out.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    assert(out.count() == 8)
    assert(out.filter($"score".isNull).count() == 5, "pre-evolution rows surface nulls")
    assert(out.filter($"id" === 7L).select($"score").as[Double].head() == 10.5)
    // version 0 still reads with the original 2-column schema
    assert(GraftDelta.readDelta(spark, path, version = Some(0L))
      .schema.fieldNames.toSeq == Seq("id", "v"))
    // table identity preserved: metadata id unchanged across the widen
    val log = DeltaLog.forTable(spark, path)
    val ids = (0L to 1L).map(v => log.snapshot(Some(v)).metadata.id)
    assert(ids.distinct.size == 1, "schema widen must not mint a new table id")
  }

  test("subset-column append is allowed under mergeSchema; missing cols null") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1 to 4).map(i => (i.toLong, s"v$i")).toDF("id", "v"), path)
    GraftDelta.toDelta(Seq(Tuple1(99L)).toDF("id"), path,
      mode = "append", mergeSchema = true)
    val out = GraftDelta.readDelta(spark, path)
    assert(out.schema.fieldNames.toSeq == Seq("id", "v"), "no metadata change needed")
    assert(out.count() == 5)
    assert(out.filter($"id" === 99L).select($"v").collect()(0).isNullAt(0))
    // no new metadata action was committed for the no-op merge
    assert(DeltaLog.forTable(spark, path).readCommitActions(1L)
      .collect { case m: MetadataAction => m }.isEmpty)
  }

  test("type conflicts and non-append modes are refused") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1 to 3).map(i => (i.toLong, s"v$i")).toDF("id", "v"), path)
    intercept[IllegalArgumentException] {
      GraftDelta.toDelta(Seq((9L, 42L)).toDF("id", "v"), path, // v: string -> long
        mode = "append", mergeSchema = true)
    }
    intercept[IllegalArgumentException] { // without the flag: strict mismatch
      GraftDelta.toDelta(Seq((9L, "x", 1.0)).toDF("id", "v", "s"), path, mode = "append")
    }
    // works through the format() writer too
    Seq((10L, "y", 2.0)).toDF("id", "v", "s").write.format("graft")
      .mode("append").option("mergeSchema", "true").save(path)
    assert(GraftDelta.readDelta(spark, path).schema.fieldNames.toSeq ==
      Seq("id", "v", "s"))
  }
}
