package graft.sql

import graft.delta.{DeltaLog, GraftDelta, Predicate, TestBase}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** SQL-string command surface: every Delta command statement dispatches
  * to the engine API it names, WHERE clauses lower to the pruning DNF,
  * unsupported predicate shapes refuse, and non-command SQL falls
  * through to spark.sql. */
class GraftSqlSpec extends graft.delta.GraftSuite {

  import TestBase.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_sql")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  private def seed(path: String): Unit =
    GraftDelta.toDelta(
      (1L to 20L).map(i => (i, s"v$i", i % 4)).toDF("k", "v", "g"), path)

  test("SHOW PARTITIONS and DESCRIBE TABLE answer from the log") {
    val path = tmp()
    GraftDelta.toDelta(
      (1L to 12L).map(i => (i, s"v$i", i % 3)).toDF("k", "v", "g"), path,
      partitionBy = Seq("g"))
    val parts = GraftSql.sql(spark, s"SHOW PARTITIONS delta.`$path`")
      .as[Long].collect().toSeq
    assert(parts == Seq(0L, 1L, 2L))
    val desc = GraftSql.sql(spark, s"DESCRIBE TABLE delta.`$path`")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(desc.toSeq == Seq(
      ("k", "bigint", ""), ("v", "string", ""), ("g", "bigint", "partition column")))
    // the bare form works too; HISTORY/DETAIL keep their own routes
    assert(GraftSql.sql(spark, s"DESCRIBE delta.`$path`").count() == 3L)
    assert(GraftSql.sql(spark, s"DESCRIBE HISTORY delta.`$path`")
      .columns.contains("operation"))
    // non-graft refs fall through to spark.sql (a temp view describes
    // natively instead of refusing)
    spark.range(3).toDF("z").createOrReplaceTempView("graft_sql_plain_view")
    assert(GraftSql.sql(spark, "DESCRIBE graft_sql_plain_view")
      .collect().map(_.getString(0)).contains("z"))
  }

  test("table_changes TVF serves the change feed through plain SELECT") {
    val path = tmp()
    GraftDelta.toDelta(
      (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"), path,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))       // v0
    GraftDelta.deleteWhere(spark, path, Seq(Seq(Predicate("k", "<=", 2L)))) // v1
    GraftDelta.toDelta(Seq((99L, "new")).toDF("k", "v"), path, mode = "append") // v2
    // inclusive bounds, composing with WHERE/aggregation
    val counts = GraftSql.sql(spark,
      s"SELECT _change_type, COUNT(*) AS n FROM table_changes('$path', 1, 2) " +
        "GROUP BY _change_type ORDER BY _change_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("delete" -> 2L, "insert" -> 1L), counts.toString)
    // start-only form reaches the head; version filter works
    val v2only = GraftSql.sql(spark,
      s"SELECT k FROM table_changes('$path', 2) ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(v2only == Seq(99L))
  }

  test("CREATE OR REPLACE TABLE AS SELECT overwrites; plain CREATE refuses") {
    val path = tmp()
    GraftSql.sql(spark,
      s"CREATE TABLE delta.`$path` AS SELECT 1 AS k, 'a' AS v")
    val e = intercept[Exception](GraftSql.sql(spark,
      s"CREATE TABLE delta.`$path` AS SELECT 2 AS k, 'b' AS v"))
    assert(e.getMessage.toLowerCase.contains("exist"), e.getMessage)
    val r = GraftSql.sql(spark,
      s"CREATE OR REPLACE TABLE delta.`$path` AS SELECT 2 AS kk, 9.5 AS score")
    assert(r.select("operation").head().getString(0) == "REPLACE TABLE AS SELECT")
    val back = GraftDelta.readDelta(spark, path)
    assert(back.columns.toSeq == Seq("kk", "score"), "schema replaced")
    assert(back.count() == 1L)
    // history preserved: version 0 still readable
    assert(GraftDelta.readDelta(spark, path, version = Some(0L))
      .columns.toSeq == Seq("k", "v"))
  }

  test("DELETE with WHERE lowers to DNF; DV hint picks deletion vectors") {
    val path = tmp()
    seed(path)
    val r = GraftSql.sql(spark, s"DELETE FROM delta.`$path` WHERE k <= 3 OR k > 18")
    assert(r.select("affectedRows").as[Long].head() == 5L)
    assert(GraftDelta.readDelta(spark, path).count() == 15L)

    val p2 = tmp()
    seed(p2)
    GraftSql.sql(spark, s"/*+ DV */ DELETE FROM delta.`$p2` WHERE k IN (1, 2)")
    assert(GraftDelta.readDelta(spark, p2).count() == 18L)
    // the DV flavor rewrites nothing: v1 carries a DV add, no rewritten file
    val snap = DeltaLog.forTable(spark, p2).snapshot(None)
    assert(snap.activeFiles.exists(_.deletionVector.isDefined),
      "DV hint must route to the deletion-vector flavor")
  }

  test("UPDATE SET with WHERE; literal-first comparisons normalize") {
    val path = tmp()
    seed(path)
    GraftSql.sql(spark,
      s"UPDATE `$path` SET v = 'patched', g = g + 10 WHERE 5 >= k")
    val got = GraftDelta.readDelta(spark, path)
    assert(got.filter($"v" === "patched").count() == 5L)
    assert(got.filter($"g" >= 10).count() == 5L)
    assert(got.filter($"k" > 5 && $"v" === "patched").count() == 0L)
  }

  test("MERGE INTO with UPDATE SET * / source refs / insert") {
    val path = tmp()
    seed(path)
    Seq((19L, "merged", 99L), (100L, "inserted", 1L)).toDF("k", "v", "g")
      .createOrReplaceTempView("merge_src")
    val r = GraftSql.sql(spark,
      s"MERGE INTO delta.`$path` AS t USING merge_src AS s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(r.select("matchedRows").as[Long].head() == 1L)
    assert(r.select("insertedRows").as[Long].head() == 1L)
    val got = GraftDelta.readDelta(spark, path)
    assert(got.filter($"k" === 19L).select("v").as[String].head() == "merged")
    assert(got.filter($"k" === 100L).count() == 1L)

    // assignment flavor with a source-column reference
    val p2 = tmp()
    seed(p2)
    GraftSql.sql(spark,
      s"MERGE INTO `$p2` AS t USING merge_src AS s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v")
    assert(GraftDelta.readDelta(spark, p2)
      .filter($"k" === 19L).select("v").as[String].head() == "merged")
    // no NOT-MATCHED clause → no insert
    assert(GraftDelta.readDelta(spark, p2).filter($"k" === 100L).count() == 0L)
  }

  test("INSERT INTO t(cols) with no space before the list parses the column list") {
    val path = tmp()
    GraftDelta.toDelta(
      (1L to 3L).map(i => (i, s"v$i", i * 10L)).toDF("k", "v", "n"), path)
    GraftSql.sql(spark,
      s"ALTER TABLE delta.`$path` ALTER COLUMN n SET DEFAULT 7")
    // standard SQL shape: ref immediately followed by '(' — previously
    // matched ref='t(k,v)' and failed with a confusing resolve error
    GraftSql.sql(spark, s"INSERT INTO delta.`$path`(k, v) VALUES (9, 'ins')")
    val row = GraftDelta.readDelta(spark, path).filter($"k" === 9L)
      .select($"v", $"n").as[(String, Long)].head()
    assert(row == (("ins", 7L)), s"$row")
  }

  test("SHOW PARTITIONS refuses unpartitioned delta tables; non-delta paths fall through") {
    val path = tmp()
    seed(path) // unpartitioned
    val e = intercept[IllegalArgumentException](
      GraftSql.sql(spark, s"SHOW PARTITIONS delta.`$path`"))
    assert(e.getMessage.contains("not partitioned"), e.getMessage)
    // a path-shaped ref to a NON-delta location must fall through to
    // spark.sql (whose own error names the statement), not die inside
    // the snapshot load
    val plainDir = tmp()
    (1L to 3L).toDF("x").write.parquet(plainDir)
    val e2 = intercept[Exception](
      GraftSql.sql(spark, s"SHOW PARTITIONS '$plainDir'"))
    assert(!e2.getMessage.contains("Invalid version"),
      s"must fall through to spark.sql, got: ${e2.getMessage}")
    // DESCRIBE on the same non-delta path also falls through
    val e3 = intercept[Exception](
      GraftSql.sql(spark, s"DESCRIBE TABLE '$plainDir'"))
    assert(!e3.getMessage.contains("Invalid version"), e3.getMessage)
  }

  test("MERGE multi-clause SQL: conditioned MATCHED order + NOT MATCHED BY SOURCE") {
    val path = tmp()
    seed(path) // k=1..20, v=v<k>, g=k%4
    Seq((2L, "zero", 0L), (3L, "big", 99L), (7L, "mid", 50L))
      .toDF("k", "v", "g").createOrReplaceTempView("mc_src")
    val r = GraftSql.sql(spark,
      s"MERGE INTO delta.`$path` AS t USING mc_src AS s ON t.k = s.k " +
        "WHEN MATCHED AND s.g = 0 THEN DELETE " +
        "WHEN MATCHED AND s.g > 60 THEN UPDATE SET v = s.v " +
        "WHEN MATCHED THEN UPDATE SET v = 'fallback' " +
        "WHEN NOT MATCHED BY SOURCE AND t.k > 18 THEN DELETE " +
        "WHEN NOT MATCHED BY SOURCE AND t.g = 1 THEN UPDATE SET v = 'aged'")
    assert(r.select("matchedRows").as[Long].head() == 3L)
    val out = GraftDelta.readDelta(spark, path)
      .select($"k", $"v").as[(Long, String)].collect().toMap
    assert(!out.contains(2L), "clause 1 deleted k=2")
    assert(out(3L) == "big", "clause 2 won for k=3 (first-match-wins)")
    assert(out(7L) == "fallback", "clause 3 caught k=7 (g=50 fails clause 2)")
    assert(!out.contains(19L) && !out.contains(20L), "by-source delete for k>18")
    assert(out(5L) == "aged" && out(9L) == "aged", "by-source update for g=1")
    assert(out(4L) == "v4", "unmatched by-source rows outside both conditions keep")
  }

  test("OPTIMIZE, VACUUM, RESTORE, DESCRIBE HISTORY/DETAIL round-trip") {
    val path = tmp()
    GraftDelta.toDelta((1L to 10L).toDF("k").repartition(4), path)        // v0
    GraftDelta.toDelta((11L to 20L).toDF("k").repartition(4), path,
      mode = "append")                                                    // v1
    val opt = GraftSql.sql(spark, s"OPTIMIZE '$path'")
    assert(opt.select("filesBefore").as[Int].head() == 8)
    assert(opt.select("filesAfter").as[Int].head() < 8)

    val dry = GraftSql.sql(spark, s"VACUUM `$path` RETAIN 0 HOURS DRY RUN")
    assert(dry.count() == 8L, "dry run lists the compacted-away files")
    assert(new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet")) > 8 - 1)
    GraftSql.sql(spark, s"VACUUM `$path` RETAIN 0 HOURS")
    assert(GraftDelta.readDelta(spark, path).count() == 20L)

    val hist = GraftSql.sql(spark, s"DESCRIBE HISTORY delta.`$path` LIMIT 2")
    assert(hist.count() == 2L)
    val detail = GraftSql.sql(spark, s"DESCRIBE DETAIL delta.`$path`")
    assert(detail.count() == 1L)

    val p2 = tmp()
    GraftDelta.toDelta((1L to 10L).toDF("k"), p2)                         // v0
    GraftDelta.toDelta((11L to 20L).toDF("k"), p2, mode = "append")       // v1
    GraftSql.sql(spark, s"RESTORE TABLE delta.`$p2` TO VERSION AS OF 0")
    assert(GraftDelta.readDelta(spark, p2).count() == 10L)
  }

  test("ALTER TABLE constraints and unsupported WHERE refuse loudly") {
    val path = tmp()
    seed(path)
    GraftSql.sql(spark,
      s"ALTER TABLE delta.`$path` ADD CONSTRAINT k_pos CHECK (k > 0)")
    val e = intercept[Exception](
      GraftDelta.toDelta(Seq((-5L, "bad", 0L)).toDF("k", "v", "g"), path,
        mode = "append"))
    assert(e.getMessage != null)
    GraftSql.sql(spark, s"ALTER TABLE delta.`$path` DROP CONSTRAINT k_pos")
    GraftDelta.toDelta(Seq((-5L, "ok", 0L)).toDF("k", "v", "g"), path,
      mode = "append")
    assert(GraftDelta.readDelta(spark, path).count() == 21L)

    // a WHERE Spark can't even parse still refuses loudly (the scan-side
    // fallback only covers parseable expressions outside the DNF language)
    val bad = intercept[Exception](
      GraftSql.sql(spark, s"DELETE FROM delta.`$path` WHERE v IS NULLISH ==="))
    assert(bad.getMessage != null)
  }

  test("non-DNF WHERE falls back to scan-side DML (no pruning, right rows)") {
    // NOT over AND is outside the DNF language — delta-spark executes it,
    // so must we: scan-side filtering, no log pruning, same rows as the
    // dataframe mirror
    val path = tmp()
    seed(path) // k=1..20, g=k%4
    val r = GraftSql.sql(spark,
      s"DELETE FROM delta.`$path` WHERE NOT (g = 1 AND k <= 10)")
    // mirror: survivors are rows with g = 1 AND k <= 10 → k in {1,5,9}
    assert(r.select("affectedRows").as[Long].head() == 17L, r.collect().toSeq.toString)
    assert(GraftDelta.readDelta(spark, path).select("k").as[Long].collect().sorted
      .toSeq == Seq(1L, 5L, 9L))

    // arithmetic + IS NULL fallback on UPDATE, DV flavor
    val p2 = tmp()
    seed(p2)
    GraftSql.sql(spark,
      s"/*+ DV */ UPDATE delta.`$p2` SET v = 'even' WHERE k % 2 = 0 AND v IS NOT NULL")
    val got = GraftDelta.readDelta(spark, p2)
    assert(got.filter($"v" === "even").count() == 10L)
    assert(got.filter($"k" % 2 === 1 && $"v" === "even").count() == 0L)
    val snap = DeltaLog.forTable(spark, p2).snapshot(None)
    assert(snap.activeFiles.exists(_.deletionVector.isDefined),
      "DV hint must still route the fallback to the deletion-vector flavor")
    assert(got.count() == 20L)
  }

  test("MERGE alias tokens inside string literals survive the ref rewrite") {
    val path = tmp()
    seed(path)
    // 's.smith' contains the source alias token "s." — it is DATA, not a
    // reference, and must land verbatim (the rewrite runs on quote-masked
    // text and splices literals back)
    Seq((3L, "s.smith", 7L)).toDF("k", "v", "g").createOrReplaceTempView("alias_src")
    GraftSql.sql(spark,
      s"MERGE INTO delta.`$path` AS t USING alias_src AS s ON t.k = s.k " +
        "WHEN MATCHED AND s.v = 's.smith' THEN UPDATE SET v = concat(s.v, ' & t.jones')")
    val got = GraftDelta.readDelta(spark, path)
    assert(got.filter($"k" === 3L).select("v").as[String].head() == "s.smith & t.jones")
  }

  test("time-function WHERE conjuncts rewrite to exact ranges and prune files") {
    val path = tmp()
    // one file per year, so year pruning is visible as a file drop
    def rows(year: Int) = (1 to 10).map { d =>
      (year * 100L + d,
        java.sql.Timestamp.valueOf(f"$year-03-$d%02d 06:30:00"))
    }
    Seq(2023, 2024, 2025).zipWithIndex.foreach { case (y, i) =>
      GraftDelta.toDelta(rows(y).toDF("id", "ts").repartition(1), path,
        mode = if (i == 0) "error" else "append")
    }

    // log-level pruning: the year(ts)=2024 rewrite must reach the file
    // pruner — only the 2024 file survives
    val dnf = GraftSql.dnfOf(spark, Some("year(ts) = 2024"),
      c => if (c == "ts") Some(org.apache.spark.sql.types.TimestampType) else None)
    val pruned = GraftDelta.readDelta(spark, path, filters = dnf)
    assert(pruned.inputFiles.length == 1,
      s"year(ts)=2024 must prune to one file, scanned ${pruned.inputFiles.length}")
    assert(pruned.count() == 10L)

    // the SELECT COUNT path answers through the same rewrite
    assert(GraftSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM delta.`$path` WHERE year(ts) = 2024")
      .as[Long].head() == 10L)
    assert(GraftSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM delta.`$path` WHERE year(ts) >= 2025")
      .as[Long].head() == 10L)
    assert(GraftSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM delta.`$path` WHERE 2024 > year(ts)")
      .as[Long].head() == 10L)

    // to_date equality = one day; date_trunc to an aligned month = all of
    // it; an UNALIGNED date_trunc literal can never match (empty range)
    assert(GraftSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM delta.`$path` WHERE to_date(ts) = DATE '2024-03-05'")
      .as[Long].head() == 1L)
    assert(GraftSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM delta.`$path` " +
        s"WHERE date_trunc('month', ts) = TIMESTAMP '2024-03-01 00:00:00'")
      .as[Long].head() == 10L)
    assert(GraftSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM delta.`$path` " +
        s"WHERE date_trunc('month', ts) = TIMESTAMP '2024-03-02 00:00:00'")
      .as[Long].head() == 0L)

    // DML rides the same lowering: DELETE WHERE year(ts)=2023 removes
    // exactly the 2023 rows, everything else intact
    val del = GraftSql.sql(spark,
      s"DELETE FROM delta.`$path` WHERE year(ts) = 2023")
    assert(del.select("affectedRows").as[Long].head() == 10L)
    val left = GraftDelta.readDelta(spark, path)
    assert(left.count() == 20L)
    assert(left.agg(min($"ts")).as[java.sql.Timestamp].head()
      .toString.startsWith("2024-"))

    // an unrecognized function leaves the DNF language → scan-side
    // fallback executes it correctly (no pruning, right rows) — here no
    // surviving id has abs(id) = 202405, so nothing is deleted; a real
    // match deletes exactly it
    assert(GraftSql.sql(spark, s"DELETE FROM delta.`$path` WHERE abs(id) = 5")
      .select("affectedRows").as[Long].head() == 0L)
    assert(GraftDelta.readDelta(spark, path).count() == 20L)
    assert(GraftSql.sql(spark, s"DELETE FROM delta.`$path` WHERE abs(id) = 202405")
      .select("affectedRows").as[Long].head() == 1L)
    assert(GraftDelta.readDelta(spark, path).count() == 19L)
  }

  test("CONVERT TO DELTA and spark.sql fall-through") {
    val dir = Files.createTempDirectory("graft_sql_conv")
    dir.toFile.deleteOnExit()
    val p = s"$dir/plain"
    (1L to 12L).toDF("k").write.parquet(p)
    val r = GraftSql.sql(spark, s"CONVERT TO DELTA parquet.`$p`")
    assert(r.select("operation").as[String].head() == "CONVERT")
    assert(GraftDelta.readDelta(spark, p).count() == 12L)

    // plain SELECT goes straight to spark.sql
    assert(GraftSql.sql(spark, "SELECT 1 + 1 AS two").as[Int].head() == 2)
  }

  test("ALTER TABLE column DDL, SET TBLPROPERTIES routing, SHALLOW CLONE") {
    val path = tmp()
    seed(path)
    // generic property lands in configuration
    GraftSql.sql(spark,
      s"ALTER TABLE delta.`$path` SET TBLPROPERTIES ('custom.owner' = 'ml-team')")
    assert(DeltaLog.forTable(spark, path).snapshot(None)
      .metadata.configuration.get("custom.owner").contains("ml-team"))
    // feature property routes through its dedicated enable path
    GraftSql.sql(spark,
      s"ALTER TABLE delta.`$path` SET TBLPROPERTIES ('delta.columnMapping.mode' = 'name')")
    GraftSql.sql(spark, s"ALTER TABLE delta.`$path` RENAME COLUMN v TO label")
    GraftSql.sql(spark, s"ALTER TABLE delta.`$path` DROP COLUMN g")
    val cols = GraftDelta.readDelta(spark, path).columns.toSeq
    assert(cols == Seq("k", "label"), cols.toString)
    // ADD COLUMN under mapping: fresh id + uuid physical name, old files
    // read null, and the mapped write surface fills it on append
    GraftSql.sql(spark, s"ALTER TABLE delta.`$path` ADD COLUMN extra INT")
    assert(GraftDelta.readDelta(spark, path)
      .filter($"extra".isNull).count() == 20L)
    val snapM = DeltaLog.forTable(spark, path).snapshot(None)
    val extraField = snapM.schema("extra")
    assert(extraField.metadata.getString("delta.columnMapping.physicalName")
      .startsWith("col-"), "mapped add must assign a uuid physical name")
    GraftDelta.toDelta(Seq((500L, "m", 7)).toDF("k", "label", "extra"), path,
      mode = "append")
    assert(GraftDelta.readDelta(spark, path)
      .filter($"k" === 500L).select("extra").as[Int].head() == 7)

    val cloneDir = Files.createTempDirectory("graft_sql_clone")
    cloneDir.toFile.deleteOnExit()
    val target = s"$cloneDir/clone"
    val src = tmp()
    GraftDelta.toDelta((1L to 9L).toDF("k"), src)                         // v0
    Thread.sleep(20) // v1's clock strictly later: the TIMESTAMP AS OF pin below
    GraftDelta.toDelta((10L to 20L).toDF("k"), src, mode = "append")      // v1
    val r = GraftSql.sql(spark,
      s"CREATE TABLE delta.`$target` SHALLOW CLONE delta.`$src` VERSION AS OF 0")
    assert(r.select("clonedFiles").as[Long].head() > 0L)
    assert(GraftDelta.readDelta(spark, target).count() == 9L)

    // TIMESTAMP AS OF resolves on the travel clock: v0's instant pins v0
    val ts0 = DeltaLog.forTable(spark, src).commitTimestamps.head._2
    val tsLit = new java.sql.Timestamp(ts0).toString
    val target2 = s"$cloneDir/clone_ts"
    GraftSql.sql(spark,
      s"CREATE TABLE delta.`$target2` DEEP CLONE delta.`$src` TIMESTAMP AS OF '$tsLit'")
    assert(GraftDelta.readDelta(spark, target2).count() == 9L)
  }

  test("CLONE/RESTORE TIMESTAMP AS OF parse like the reader on a non-UTC JVM") {
    val dir = Files.createTempDirectory("graft_sql_tz")
    dir.toFile.deleteOnExit()
    val src = s"$dir/src"
    GraftDelta.toDelta((1L to 9L).toDF("k"), src)                        // v0
    Thread.sleep(20)
    GraftDelta.toDelta((10L to 20L).toDF("k"), src, mode = "append")     // v1
    val ts0 = DeltaLog.forTable(spark, src).commitTimestamps.head._2
    // zone-less ISO literal rendered in UTC — the reader's convention
    val tsLit = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(ts0))
    // same string through the READ path resolves v0
    assert(GraftDelta.readDelta(spark, src, timestamp = Some(tsLit)).count() == 9L)
    val prevTz = java.util.TimeZone.getDefault
    try {
      // the r12 ADVICE bug: Timestamp.valueOf parsed in the JVM-local
      // zone, so on a non-UTC JVM the SAME string resolved a different
      // millis — hence a different version — than the read path
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/Chicago"))
      val target = s"$dir/clone_tz"
      GraftSql.sql(spark,
        s"CREATE TABLE delta.`$target` SHALLOW CLONE delta.`$src` TIMESTAMP AS OF '$tsLit'")
      assert(GraftDelta.readDelta(spark, target).count() == 9L,
        "CLONE must resolve the timestamp exactly as the reader does")
      GraftSql.sql(spark, s"RESTORE TABLE delta.`$src` TO TIMESTAMP AS OF '$tsLit'")
      assert(GraftDelta.readDelta(spark, src).count() == 9L,
        "RESTORE must resolve the timestamp exactly as the reader does")
    } finally java.util.TimeZone.setDefault(prevTz)
  }

  test("INSERT INTO/OVERWRITE and CTAS write through the engine") {
    val dir = Files.createTempDirectory("graft_sql_ins")
    dir.toFile.deleteOnExit()
    val src = s"$dir/src"
    val dst = s"$dir/dst"
    GraftDelta.toDelta((1L to 10L).map(i => (i, i % 3)).toDF("k", "g"), src)
    // CTAS with partitioning, reading a delta ref
    GraftSql.sql(spark,
      s"CREATE TABLE delta.`$dst` PARTITIONED BY (g) AS SELECT * FROM delta.`$src` WHERE k <= 5")
    assert(GraftDelta.readDelta(spark, dst).count() == 5L)
    assert(DeltaLog.forTable(spark, dst).snapshot(None)
      .metadata.partitionColumns == Seq("g"))
    // INSERT INTO appends, INSERT OVERWRITE replaces
    GraftSql.sql(spark,
      s"INSERT INTO delta.`$dst` SELECT * FROM delta.`$src` WHERE k > 5")
    assert(GraftDelta.readDelta(spark, dst).count() == 10L)
    GraftSql.sql(spark, s"INSERT OVERWRITE delta.`$dst` VALUES (99, 0), (100, 1)")
    assert(GraftDelta.readDelta(spark, dst).orderBy("k")
      .select("k").as[Long].collect().toSeq == Seq(99L, 100L))
    // CTAS with CLUSTER BY stores the clustering spec in the same breath
    val cdst = tmp()
    GraftSql.sql(spark,
      s"CREATE TABLE delta.`$cdst` CLUSTER BY (k) AS SELECT * FROM delta.`$src`")
    assert(graft.delta.DeltaTableOps.clusteringColumnsOf(
      graft.delta.DeltaLog.forTable(spark, cdst).snapshot(None)) == Seq("k"))
    // PARTITIONED BY + CLUSTER BY together refuse (competing layouts)
    val e = intercept[IllegalArgumentException](GraftSql.sql(spark,
      s"CREATE TABLE delta.`${tmp()}` PARTITIONED BY (g) CLUSTER BY (k) " +
        s"AS SELECT * FROM delta.`$src`"))
    assert(e.getMessage.contains("not both"), e.getMessage)
  }

  test("SELECT over delta.`path` refs resolves through the engine, time travel included") {
    val path = tmp()
    GraftDelta.toDelta((1L to 10L).toDF("k"), path)                       // v0
    GraftDelta.toDelta((11L to 30L).toDF("k"), path, mode = "append")     // v1
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM delta.`$path`").as[Long].head() == 30L)
    // COUNT(*) routes to metadata (statsAggregate / countWhere) — exact
    // under DML, and non-DNF predicates fall through to the scan path
    GraftDelta.deleteWhere(spark, path, Seq(Seq(Predicate("k", "<=", 5L))))
    assert(GraftSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM delta.`$path`").as[Long].head() == 25L)
    assert(GraftSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM delta.`$path` WHERE k > 20").as[Long].head() == 10L)
    assert(GraftSql.sql(spark,
      s"SELECT COUNT(*) AS n FROM delta.`$path` WHERE k % 2 = 0").as[Long].head() == 13L)
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM delta.`$path` VERSION AS OF 0").as[Long].head() == 10L)
    // joins between two travel points of the same table work (distinct
    // views): latest (6..30 after the delete) ∩ v0 (1..10) = {6..10}
    val joined = GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM delta.`$path` a " +
        s"JOIN delta.`$path` VERSION AS OF 0 b ON a.k = b.k")
    assert(joined.as[Long].head() == 5L)
  }

  test("ALTER TABLE ADD COLUMN: metadata-only, ordering, restore interaction") {
    val path = tmp()
    seed(path)                                                            // v0: k,v,g
    GraftSql.sql(spark, s"ALTER TABLE delta.`$path` ADD COLUMN note STRING AFTER v")
    val got = GraftDelta.readDelta(spark, path)
    assert(got.columns.toSeq == Seq("k", "v", "note", "g"))
    assert(got.filter($"note".isNull).count() == 20L,
      "pre-add files surface the new column as null")
    // appends can now fill it, positionally through the new schema
    GraftSql.sql(spark, s"INSERT INTO delta.`$path` VALUES (100, 'x', 'noted', 9)")
    assert(GraftDelta.readDelta(spark, path)
      .filter($"k" === 100L).select("note").as[String].head() == "noted")
    // FIRST ordering
    GraftSql.sql(spark, s"ALTER TABLE delta.`$path` ADD COLUMN flag BOOLEAN FIRST")
    assert(GraftDelta.readDelta(spark, path).columns.head == "flag")
    // duplicate name refuses
    val dup = intercept[IllegalArgumentException](
      GraftSql.sql(spark, s"ALTER TABLE delta.`$path` ADD COLUMN note STRING"))
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    // restore to a pre-add version: the added columns vanish with the
    // restored metadata
    GraftSql.sql(spark, s"RESTORE TABLE delta.`$path` TO VERSION AS OF 0")
    val restored = GraftDelta.readDelta(spark, path)
    assert(restored.columns.toSeq == Seq("k", "v", "g"))
    assert(restored.count() == 20L)
  }

  test("catalog-named tables route through the same engine paths") {
    val path = tmp()
    seed(path)
    spark.sql(s"CREATE TABLE graft_cat_t USING graft LOCATION '$path'")
    try {
      // name-addressed read through spark.table and through GraftSql
      assert(spark.table("graft_cat_t").count() == 20L)
      assert(GraftSql.sql(spark,
        "SELECT COUNT(*) AS n FROM graft_cat_t").as[Long].head() == 20L)
      // name-addressed DML routes to the engine (same path as delta.`p`)
      val del = GraftSql.sql(spark, "DELETE FROM graft_cat_t WHERE k <= 5")
      assert(del.select("affectedRows").as[Long].head() == 5L)
      assert(spark.table("graft_cat_t").count() == 15L,
        "spark.table must see the post-DML state (relation cache refreshed)")
      assert(GraftDelta.readDelta(spark, path).count() == 15L)
      // maintenance + history by name
      GraftSql.sql(spark, "OPTIMIZE graft_cat_t")
      assert(GraftSql.sql(spark, "DESCRIBE HISTORY graft_cat_t").count() >= 3L)
      // predicate pushdown reaches the engine through the named relation
      assert(spark.table("graft_cat_t").filter($"k" > 15).count() == 5L)
      // a non-graft catalog table refuses name-addressed Delta commands
      spark.sql("CREATE TABLE graft_cat_plain (x INT) USING parquet " +
        s"LOCATION '${tmp()}'")
      try {
        val e = intercept[IllegalArgumentException](
          GraftSql.sql(spark, "DELETE FROM graft_cat_plain WHERE x = 1"))
        assert(e.getMessage.contains("USING graft"), e.getMessage)
      } finally spark.sql("DROP TABLE IF EXISTS graft_cat_plain")
    } finally spark.sql("DROP TABLE IF EXISTS graft_cat_t")
  }

  test("two distinct delta refs in one SELECT bind to their own tables") {
    val dir = Files.createTempDirectory("graft_sql_two")
    dir.toFile.deleteOnExit()
    val pa = s"$dir/ta"
    val pb = s"$dir/tb"
    GraftDelta.toDelta((1L to 7L).map(i => (i, "left")).toDF("k", "side"), pa)
    GraftDelta.toDelta((5L to 12L).map(i => (i, "right")).toDF("k", "side"), pb)
    val r = GraftSql.sql(spark,
      s"SELECT a.k AS k, a.side AS sa, b.side AS sb FROM delta.`$pa` a " +
        s"JOIN delta.`$pb` b ON a.k = b.k ORDER BY k")
    assert(r.as[(Long, String, String)].collect().toSeq ==
      Seq((5L, "left", "right"), (6L, "left", "right"), (7L, "left", "right")))
  }

  test("temp-view naming survives a 32-bit hashCode collision between refs") {
    val dir = Files.createTempDirectory("graft_sql_coll")
    dir.toFile.deleteOnExit()
    // construct two distinct paths whose (path, None, None).hashCode
    // collide — the name the pre-fix scheme truncated to 32 bits.
    // Store only the INDEX per hash (the path reconstructs from it):
    // the birthday search visits ~80k candidates and must stay lean —
    // a map of full path strings once tipped an already-pressured
    // full-suite JVM over the edge.
    val seen = scala.collection.mutable.HashMap[Int, Int]()
    var pair: Option[(String, String)] = None
    var i = 0
    while (pair.isEmpty) {
      val p = s"$dir/t$i"
      val h = (p, None, None).hashCode()
      seen.get(h) match {
        case Some(prev) => pair = Some((s"$dir/t$prev", p))
        case None => seen(h) = i
      }
      i += 1
    }
    val (pa, pb) = pair.get
    assert((pa, None, None).hashCode() == (pb, None, None).hashCode())
    assert(GraftSql.viewNameFor(pa, None, None) != GraftSql.viewNameFor(pb, None, None),
      s"colliding refs $pa / $pb must get distinct view names")
    GraftDelta.toDelta(Seq((1L, "a")).toDF("k", "v"), pa)
    GraftDelta.toDelta(Seq((2L, "b")).toDF("k", "v"), pb)
    val r = GraftSql.sql(spark,
      s"SELECT a.v AS va, b.v AS vb FROM delta.`$pa` a CROSS JOIN delta.`$pb` b")
    assert(r.as[(String, String)].head() == (("a", "b")))
  }

  test("string literals containing keywords never confuse statement parsing") {
    val path = tmp()
    seed(path)
    // SET literal containing WHERE must not split there
    GraftSql.sql(spark, s"UPDATE delta.`$path` SET v = 'a WHERE b' WHERE k = 1")
    val got = GraftDelta.readDelta(spark, path)
    assert(got.filter($"k" === 1L).select("v").as[String].head() == "a WHERE b")
    assert(got.filter($"v" === "a WHERE b").count() == 1L)
    // un-WHERE'd UPDATE whose literal contains WHERE parses as having NO
    // predicate — the engine's full-table-DML refusal fires (proving the
    // quoted WHERE wasn't taken as the split point)
    val noWhere = intercept[IllegalArgumentException](
      GraftSql.sql(spark, s"UPDATE delta.`$path` SET v = 'all WHERE rows'"))
    assert(noWhere.getMessage.contains("non-empty predicate"), noWhere.getMessage)
    // DELETE whose predicate literal contains a keyword
    val del = GraftSql.sql(spark,
      s"DELETE FROM delta.`$path` WHERE v != 'a WHERE b'")
    assert(del.select("affectedRows").as[Long].head() == 19L)
    assert(GraftDelta.readDelta(spark, path).count() == 1L)
    // MERGE assignment literal containing WHEN must not split the clause
    Seq((1L, "src", 0L)).toDF("k", "v", "g").createOrReplaceTempView("kw_src")
    GraftSql.sql(spark,
      s"MERGE INTO delta.`$path` AS t USING kw_src AS s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = 'x WHEN y'")
    assert(GraftDelta.readDelta(spark, path).filter($"k" === 1L)
      .select("v").as[String].head() == "x WHEN y")
    // backslash-escaped quote inside a literal: the masker must not take
    // \' as the literal's end (a keyword after it would then mis-split)
    GraftSql.sql(spark,
      s"UPDATE delta.`$path` SET v = 'don\\'t WHERE x' WHERE k = 1")
    assert(GraftDelta.readDelta(spark, path).filter($"k" === 1L)
      .select("v").as[String].head() == "don't WHERE x")
  }

  test("SHOW / UNSET TBLPROPERTIES round-trip; guarded keys refuse unset") {
    val path = tmp()
    seed(path)
    GraftSql.sql(spark,
      s"ALTER TABLE delta.`$path` SET TBLPROPERTIES ('team' = 'data', 'tier' = 'gold')")
    val all = GraftSql.sql(spark, s"SHOW TBLPROPERTIES delta.`$path`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(all("team") == "data" && all("tier") == "gold", all.toString)
    val one = GraftSql.sql(spark, s"SHOW TBLPROPERTIES delta.`$path` ('tier')")
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(one.toSeq == Seq("tier" -> "gold"))
    GraftSql.sql(spark,
      s"ALTER TABLE delta.`$path` UNSET TBLPROPERTIES ('tier')")
    val after = GraftSql.sql(spark, s"SHOW TBLPROPERTIES delta.`$path`")
      .collect().map(_.getString(0)).toSet
    assert(!after.contains("tier") && after.contains("team"), after.toString)
    // missing key: refuses without IF EXISTS, no-ops with it
    val miss = intercept[IllegalArgumentException](GraftSql.sql(spark,
      s"ALTER TABLE delta.`$path` UNSET TBLPROPERTIES ('nope')"))
    assert(miss.getMessage.contains("IF EXISTS"), miss.getMessage)
    GraftSql.sql(spark,
      s"ALTER TABLE delta.`$path` UNSET TBLPROPERTIES IF EXISTS ('nope')")
    // feature-bearing key: loud refusal (no disable protocol behind it)
    val guarded = intercept[IllegalArgumentException](GraftSql.sql(spark,
      s"ALTER TABLE delta.`$path` UNSET TBLPROPERTIES ('delta.enableChangeDataFeed')"))
    assert(guarded.getMessage.contains("feature obligations"), guarded.getMessage)
  }

  test("pre-epoch timestamp literals keep exact micros (floor, not truncate)") {
    val path = tmp()
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999")),
      (2L, java.sql.Timestamp.valueOf("1970-01-01 00:00:00")))
    GraftDelta.toDelta(rows.toDF("k", "ts"), path)
    // truncating micros→millis would round the literal up to the epoch
    // and delete both rows
    val r = GraftSql.sql(spark,
      s"DELETE FROM delta.`$path` WHERE ts <= TIMESTAMP '1969-12-31 23:59:59.9995'")
    assert(r.select("affectedRows").as[Long].head() == 1L)
    assert(GraftDelta.readDelta(spark, path).select("k").as[Long].head() == 2L)
  }
}
