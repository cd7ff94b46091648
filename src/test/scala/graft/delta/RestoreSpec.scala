package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RESTORE TO VERSION + batch tableChanges semantics: history-preserving
  * data rewind, schema rewind, vacuum safety, and append-oriented CDC
  * (dataChange=false rewrites contribute no rows). */
class RestoreSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$prefix")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  test("restore rewinds data, preserves history, and keeps time travel working") {
    import spark.implicits._
    val path = tmp("restore")
    val v0 = (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name")
    GraftDelta.toDelta(v0, path)                                          // v0
    GraftDelta.toDelta((101L to 150L).map(i => (i, s"n$i")).toDF("id", "name"),
      path, mode = "append")                                              // v1
    GraftDelta.deleteWhere(spark, path, Seq(Seq(Predicate("id", "<", 40L)))) // v2
    val res = GraftDelta.restore(spark, path, 0L)                         // v3
    assert(res.tableVersion == 3L)

    // head reads as v0
    val got = GraftDelta.readDelta(spark, path).select("id").as[Long].collect().toSet
    assert(got == (1L to 100L).toSet)
    // history has all 4 commits, newest is RESTORE
    val hist = GraftDelta.readDeltaHistory(spark, path).collect()
    assert(hist.length == 4)
    assert(hist.head.getAs[String]("operation") == "RESTORE")
    // the pre-restore state is still reachable by version
    val v2 = GraftDelta.readDelta(spark, path, version = Some(2L))
      .select("id").as[Long].collect().toSet
    assert(v2 == (40L to 150L).toSet)
    // restoring to the head state is a valid no-data-motion commit
    val res2 = GraftDelta.restore(spark, path, 3L)
    assert(res2.restoredFiles == 0L && res2.removedFiles == 0L)
  }

  test("restore rewinds a mergeSchema widening back to the old schema") {
    import spark.implicits._
    val path = tmp("restore_schema")
    GraftDelta.toDelta((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), path)
    GraftDelta.toDelta(
      (11L to 20L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "name", "score"),
      path, mode = "append", mergeSchema = true)
    assert(GraftDelta.readDelta(spark, path).columns.toSeq == Seq("id", "name", "score"))
    GraftDelta.restore(spark, path, 0L)
    val df = GraftDelta.readDelta(spark, path)
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.count() == 10L)
  }

  test("restore refuses when a needed file was vacuumed") {
    import spark.implicits._
    val path = tmp("restore_vac")
    GraftDelta.toDelta((1L to 50L).map(i => (i, s"n$i")).toDF("id", "name"), path)
    // overwrite tombstones v0's files; vacuum(0h) physically deletes them
    GraftDelta.toDelta((1L to 5L).map(i => (i, "x")).toDF("id", "name"),
      path, mode = "overwrite")
    GraftDelta.vacuum(spark, path, retentionHours = 0.0, dryRun = false)
    val e = intercept[IllegalStateException](GraftDelta.restore(spark, path, 0L))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("tableChanges returns per-commit adds and skips dataChange=false rewrites") {
    import spark.implicits._
    val path = tmp("changes")
    GraftDelta.toDelta((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(3), path)                                              // v0
    GraftDelta.toDelta((11L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(3), path, mode = "append")                             // v1
    DeltaMaintenance.compact(spark, path)                                 // v2: dataChange=false
    GraftDelta.toDelta((21L to 25L).map(i => (i, s"n$i")).toDF("id", "name"),
      path, mode = "append")                                              // v3

    val all = GraftDelta.tableChanges(spark, path, fromVersion = 0L)
    val byVersion = all.groupBy("_commit_version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byVersion == Map(1L -> 10L, 3L -> 5L), byVersion.toString)

    // bounded range: only v1
    val ranged = GraftDelta.tableChanges(spark, path, 0L, Some(1L))
      .select("id").as[Long].collect().toSet
    assert(ranged == (11L to 20L).toSet)

    // empty range → empty frame with the schema + CDC columns
    val empty = GraftDelta.tableChanges(spark, path, 3L)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq ==
      Seq("id", "name", "_change_type", "_commit_version", "_commit_timestamp"))
  }
}
