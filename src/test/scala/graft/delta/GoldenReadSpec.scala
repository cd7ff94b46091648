package graft.delta

import org.apache.spark.sql.Row

/** Port of the reference's read-path pins (tests/test_core.py:87-251)
  * against its own golden fixtures. */
class GoldenReadSpec extends GraftSuite {

  private lazy val simple = fixture("simple")

  test("read latest: 200x4 with evolved schema (test_core.py:87-92)") {
    val df = GraftDelta.readDelta(spark, simple)
    assert(df.columns.toSeq == Seq("id", "count", "temperature", "newColumn"))
    assert(df.count() == 200)
  }

  test("time travel by version (test_core.py:94-99)") {
    val v0 = GraftDelta.readDelta(spark, simple, version = Some(0))
    assert(v0.count() == 100 && v0.columns.length == 3)
    val v1 = GraftDelta.readDelta(spark, simple, version = Some(1))
    assert(v1.count() == 200 && v1.columns.length == 4)
  }

  test("row filter count>30 -> 61 (test_core.py:102-109)") {
    val df = GraftDelta.readDelta(spark, simple, version = Some(0),
      filters = Seq(Seq(Predicate("count", ">", 30))))
    assert(df.count() == 61 && df.columns.length == 3)
  }

  test("projection pushdown (test_core.py:112-114)") {
    val df = GraftDelta.readDelta(spark, simple, columns = Seq("count", "temperature"))
    assert(df.columns.toSeq == Seq("count", "temperature"))
  }

  test("schema evolution: per-version columns (test_core.py:117-124)") {
    assert(GraftDelta.readDelta(spark, simple, version = Some(0)).columns.toSeq ==
      Seq("id", "count", "temperature"))
    assert(GraftDelta.readDelta(spark, simple, version = Some(1)).columns.toSeq ==
      Seq("id", "count", "temperature", "newColumn"))
  }

  test("pre-evolution files surface null for the added column") {
    val v1 = GraftDelta.readDelta(spark, simple, version = Some(1))
    assert(v1.filter("newColumn IS NULL").count() == 100)
  }

  test("partition filter prunes files (test_core.py:127-135)") {
    val part = fixture("partition")
    val one = GraftDelta.readDelta(spark, part, version = Some(0),
      filters = Seq(Seq(Predicate("col1", "==", 1))))
    assert(one.count() == 21 && one.columns.length == 3)
    val or = GraftDelta.readDelta(spark, part,
      filters = Seq(Seq(Predicate("col1", "==", 1)), Seq(Predicate("col1", "==", 2))))
    assert(or.count() == 39 && or.columns.length == 4)
    // log-level pruning: only matching files survive before any scan
    val snap = DeltaLog.forTable(spark, part).snapshot(None)
    val pruned = DeltaRead.prunedFiles(snap, Seq(Seq(Predicate("col1", "==", 1))))
    assert(pruned.nonEmpty && pruned.forall(_.partitionValues("col1") == "1"))
    assert(pruned.size < snap.activeFiles.size)
  }

  test("empty table scan (test_core.py:138-147)") {
    val e1 = fixture("empty1")
    val v4 = GraftDelta.readDelta(spark, e1, version = Some(4))
    assert(v4.count() == 0 && v4.columns.length == 2)
    val v0 = GraftDelta.readDelta(spark, e1, version = Some(0))
    assert(v0.count() == 5 && v0.columns.length == 2)
  }

  test("checkpoint-accelerated reads (test_core.py:150-163)") {
    val cp = fixture("checkpoint")
    assert(GraftDelta.readDelta(spark, cp, version = Some(4)).count() == 25)
    assert(GraftDelta.readDelta(spark, cp, version = Some(12)).count() == 65)
    assert(GraftDelta.readDelta(spark, cp, version = Some(22)).count() == 115)
    intercept[Exception] {
      GraftDelta.readDelta(spark, cp, version = Some(33)).count()
    }
  }

  test("out-of-range version errors (test_core.py:166-170)") {
    intercept[Exception] {
      GraftDelta.readDelta(spark, simple, version = Some(4)).count()
    }
  }

  test("timestamp time travel pins by commit timestamp (test_core.py:173-199)") {
    val s2 = fixture("simple2")
    val log = DeltaLog.forTable(spark, s2)
    val ts = log.commitTimestamps.toMap // version -> millis
    def read(at: Long) = GraftDelta.readDelta(spark, s2,
      timestamp = Some(java.time.Instant.ofEpochMilli(at).toString))
    def eq(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Boolean = {
      val ka = a.collect().map(_.toString).sorted.toSeq
      val kb = b.collect().map(_.toString).sorted.toSeq
      ka == kb
    }
    // exactly at v0's commit -> v0
    assert(eq(read(ts(0L)), GraftDelta.readDelta(spark, s2, version = Some(0))))
    // between v1 and v2 -> v1
    assert(eq(read(ts(1L) + (ts(2L) - ts(1L)) / 2),
      GraftDelta.readDelta(spark, s2, version = Some(1))))
    // before the first commit clamps to earliest (delta-rs behavior)
    assert(eq(read(ts(0L) - 1000000), GraftDelta.readDelta(spark, s2, version = Some(0))))
    // far future -> latest
    assert(eq(read(ts.values.max + 1000000), GraftDelta.readDelta(spark, s2)))
  }

  test("history: 26 commits, sorted desc, limit (test_core.py:202-231)") {
    val cp = fixture("checkpoint")
    val h = GraftDelta.readDeltaHistory(spark, cp)
    val rows = h.collect()
    assert(rows.length == 26)
    val tss = rows.map(_.getTimestamp(0).getTime).toSeq
    assert(tss == tss.sorted(Ordering[Long].reverse), "History Not Sorted")
    // last commit's operation metrics (pinned in the fixture log)
    val last = rows.head
    assert(last.getString(1) == "WRITE")
    assert(last.getString(3) == "6")   // numFiles
    assert(last.getString(4) == "5147") // numOutputBytes
    assert(last.getString(5) == "5")   // numOutputRows
    assert(GraftDelta.readDeltaHistory(spark, cp, limit = Some(5)).count() == 5)
  }

  test("history limit pushdown: history(5) opens only the newest 5 commit files") {
    val cp = fixture("checkpoint") // 26 commits
    val log = DeltaLog.forTable(spark, cp)
    val limited = DeltaTableOps.historyOf(log, Some(5)).collect()
    assert(limited.length == 5)
    assert(log.commitInfoReads <= 5,
      s"history(limit=5) parsed ${log.commitInfoReads} commit files")
    // the pushed-down result equals the head of the unlimited history
    val full = DeltaTableOps.historyOf(DeltaLog.forTable(spark, cp), None).collect()
    assert(limited.toSeq == full.take(5).toSeq)
  }

  test("vacuum dry-run lists 4 tombstones, delete shrinks 7->3 (test_core.py:234-245)") {
    val v = fixture("vacuum")
    val tombstones = GraftDelta.vacuum(spark, v, dryRun = true)
    assert(tombstones.length == 4)
    def pq(): Int = new java.io.File(v).listFiles().count(_.getName.endsWith(".parquet"))
    assert(pq() == 7)
    GraftDelta.vacuum(spark, v, dryRun = false)
    assert(pq() == 3)
    // table still reads after vacuum
    assert(GraftDelta.readDelta(spark, v).count() > 0)
  }

  test("missing path errors (test_core.py:248-251)") {
    intercept[Exception] {
      GraftDelta.readDelta(spark, "/nonexistent/delta/table").count()
    }
  }

  test("row values survive the read (simple v0 spot check)") {
    val rows = GraftDelta.readDelta(spark, simple, version = Some(0))
      .selectExpr("min(id)", "max(id)", "count(distinct id)").collect()
    assert(rows.head != Row(null, null, null))
  }
}
