package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The fluent `GraftTable` handle must be a pure veneer: every method
  * lands on the same engine path as the functional / SQL surfaces and
  * returns the same state. */
class GraftTableSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_tbl")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  private def seed(path: String): Unit =
    GraftDelta.toDelta(
      (1L to 20L).map(i => (i, s"v$i", i % 4)).toDF("k", "v", "g"), path)

  test("forPath validates; isDeltaTable distinguishes tables from plain dirs") {
    val path = tmp()
    assert(!GraftTable.isDeltaTable(spark, path))
    val e = intercept[IllegalArgumentException](GraftTable.forPath(spark, path))
    assert(e.getMessage.contains("not a Delta table"))
    seed(path)
    assert(GraftTable.isDeltaTable(spark, path))
    assert(GraftTable.forPath(spark, path).toDF.count() == 20L)
  }

  test("delete / updateExpr / history / time travel route through the engine") {
    val path = tmp()
    seed(path)
    val t = GraftTable.forPath(spark, path)
    t.delete("k > 15")                                         // v1
    assert(t.toDF.count() == 15L)
    t.updateExpr("g = 0", Map("v" -> "'zero'"))                // v2
    assert(t.toDF.filter($"v" === "zero").count() ===
      t.toDF.filter($"g" === 0).count())
    // conditionless full-table DML stays refused at the engine level
    val full = intercept[IllegalArgumentException](t.delete("1 = 1"))
    assert(full.getMessage.toLowerCase.contains("unsupported where term") ||
      full.getMessage.contains("non-empty"), full.getMessage)
    assert(t.history().count() == 3L)
    assert(t.asOf(0L).count() == 20L)
    assert(t.detail().select("numFiles").head().getLong(0) > 0L)
  }

  test("merge builder: updateAll+insertAll, updateExpr with source refs, delete") {
    val path = tmp()
    seed(path)
    val t = GraftTable.forPath(spark, path)
    val src = Seq((1L, "patched", 9L), (99L, "new", 9L)).toDF("k", "v", "g")
    val r = t.merge(src, Seq("k"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(r.matchedRows == 1L && r.insertedRows == 1L)
    assert(t.toDF.filter($"k" === 1L).select("v").as[String].head() == "patched")
    assert(t.toDF.filter($"k" === 99L).count() == 1L)
    // expression update with a source-column reference
    t.merge(src.filter($"k" === 1L), Seq("k"))
      .whenMatchedUpdateExpr(Map("v" -> "concat(source.v, '!')"))
      .execute()
    assert(t.toDF.filter($"k" === 1L).select("v").as[String].head() == "patched!")
    // matched-delete removes the matched keys only
    t.merge(src, Seq("k")).whenMatchedDelete().execute()
    assert(t.toDF.filter($"k".isin(1L, 99L)).count() == 0L)
    assert(t.toDF.count() == 19L)
  }

  test("optimize compaction and zorder; restore round-trips") {
    val path = tmp()
    GraftDelta.toDelta(
      (1L to 400L).map(i => (i, i % 7)).toDF("k", "b").repartition(8), path)
    val t = GraftTable.forPath(spark, path)
    val before = DeltaLog.forTable(spark, path).snapshot(None).activeFiles.size
    val res = t.optimize().executeCompaction()
    val after = DeltaLog.forTable(spark, path).snapshot(None).activeFiles.size
    assert(before == 8 && after < before, s"$before -> $after")
    assert(res.columns.contains("filesBefore"))
    t.optimize().executeZOrderBy("k", "b")
    assert(t.toDF.count() == 400L)
    t.restoreToVersion(0L)
    assert(DeltaLog.forTable(spark, path).snapshot(None).activeFiles.size == 8)
    assert(t.toDF.count() == 400L)
  }

  test("shallowClone returns a handle on an independent metadata clone") {
    val path = tmp()
    seed(path)
    val clonePath = tmp()
    val c = GraftTable.forPath(spark, path).shallowClone(clonePath)
    assert(c.toDF.count() == 20L)
    // DML on a clone reads cross-root files (no basePath) — this used to
    // crash in DeltaDml.readFiles
    c.delete("k <= 10")
    assert(c.toDF.count() == 10L)
    assert(GraftTable.forPath(spark, path).toDF.count() == 20L,
      "DML on the clone must not touch the source")
  }

  /** Partitioned-clone DML drives readFiles' per-partition-group union
    * branch: log-sourced partition literals, `_metadata` surviving the
    * union for the DV bitmap path, and partition-column predicates. */
  test("DML on a PARTITIONED shallow clone: rewrite and DV flavors, both scoped") {
    val srcPath = tmp()
    GraftDelta.toDelta(
      (1L to 40L).map(i => (i, s"g${i % 4}")).toDF("k", "g"),
      srcPath, partitionBy = Seq("g"))
    val clonePath = tmp()
    val c = GraftTable.forPath(spark, srcPath).shallowClone(clonePath)
    // rewrite flavor, data-column predicate (scans clone files cross-root)
    c.delete("k <= 8")
    assert(c.toDF.count() == 32L)
    // DV flavor (keepMeta bitmap path) on the cloned files
    GraftDelta.deleteWhereWithDv(spark, clonePath,
      Seq(Seq(Predicate("k", ">", 36L))))
    assert(c.toDF.count() == 28L)
    // partition-column predicate on the clone
    c.delete("g = 'g1'")
    assert(c.toDF.filter($"g" === "g1").count() == 0L)
    assert(c.toDF.count() == 21L)
    assert(GraftTable.forPath(spark, srcPath).toDF.count() == 40L,
      "clone DML must never touch the source table")
  }

  test("forName resolves a catalog-named graft table to the same handle") {
    val path = tmp()
    seed(path)
    spark.sql("DROP TABLE IF EXISTS graft_tbl_spec")
    spark.sql(s"CREATE TABLE graft_tbl_spec USING graft LOCATION '$path'")
    try {
      val t = GraftTable.forName(spark, "graft_tbl_spec")
      assert(t.path.stripPrefix("file:") == path)
      t.delete("k <= 5")
      assert(spark.table("graft_tbl_spec").count() == 15L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_tbl_spec")
  }
}
