package graft.delta

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** In-commit timestamps (delta.enableInCommitTimestamps, writer-7 table
  * feature): monotonic stamping, authority over file mtimes for time
  * travel / history / change feed, protocol upgrade, chain bootstrap. */
class InCommitTimestampSpec extends GraftSuite {

  import TestBase.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_ict")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  private def sample(n: Int) = (1 to n).map(i => (i.toLong, s"v$i")).toDF("k", "v")

  private def ictOf(path: String, v: Long): Option[Long] =
    DeltaLog.forTable(spark, path).commitInfoOf(v).flatMap(_.inCommitTimestamp)

  test("enable upgrades protocol and stamps every subsequent commit monotonically") {
    val path = tmp()
    GraftDelta.toDelta(sample(5), path)                                   // v0: no ICT
    assert(ictOf(path, 0L).isEmpty)
    val ev = GraftDelta.enableInCommitTimestamps(spark, path)             // v1
    assert(ev == 1L)
    val p = DeltaLog.forTable(spark, path).snapshot(None).protocol
    assert(p.minWriterVersion == 7 &&
      p.writerFeatures.exists(_.contains("inCommitTimestamp")), p.toString)
    // the enablement commit itself is stamped; rapid commits stay strict
    GraftDelta.toDelta(sample(1), path, mode = "append")                  // v2
    GraftDelta.toDelta(sample(1), path, mode = "append")                  // v3
    GraftDelta.deleteWhere(spark, path, Seq(Seq(Predicate("k", "==", 5L)))) // v4
    val icts = (1L to 4L).map(v => ictOf(path, v))
    assert(icts.forall(_.isDefined), icts.toString)
    val vals = icts.flatten
    assert(vals == vals.sorted && vals.distinct == vals,
      s"ICTs must strictly increase: $vals")
    // enablement provenance recorded
    val cfg = DeltaLog.forTable(spark, path).snapshot(None).metadata.configuration
    assert(cfg.get("delta.inCommitTimestampEnablementVersion").contains("1"))
  }

  test("a future foreign ICT cannot be descended from — next commit goes above it") {
    val path = tmp()
    GraftDelta.toDelta(sample(3), path,
      configuration = Map("delta.enableInCommitTimestamps" -> "true"))    // v0 stamped
    assert(ictOf(path, 0L).isDefined, "create-with-config stamps from commit 0")
    // a foreign writer stamped one hour into the future — raw file write
    // (our own writeCommit would re-stamp it)
    val future = System.currentTimeMillis() + 3600_000L
    val log = DeltaLog.forTable(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(log.commitFile(1L), false)
    out.write((ActionCodec.toJsonLine(
      CommitInfo(future, "WRITE", inCommitTimestamp = Some(future))) + "\n")
      .getBytes("UTF-8"))
    out.close()
    GraftDelta.toDelta(sample(1), path, mode = "append")                  // v2
    assert(ictOf(path, 2L).exists(_ == future + 1L),
      s"clock regress: v2 must stamp prev+1, got ${ictOf(path, 2L)} vs $future")
  }

  test("time travel, history, and the change feed follow the ICT, not mtimes") {
    val path = tmp()
    GraftDelta.toDelta(sample(3), path,
      configuration = Map("delta.enableInCommitTimestamps" -> "true"))    // v0
    Thread.sleep(15)
    GraftDelta.toDelta(sample(2), path, mode = "append")                  // v1
    Thread.sleep(15)
    GraftDelta.toDelta(sample(1), path, mode = "append")                  // v2
    val log = DeltaLog.forTable(spark, path)
    val icts = (0L to 2L).map(v => ictOf(path, v).get)

    // sabotage the file mtimes: reverse them so mtime ordering is WRONG
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    (0L to 2L).foreach { v =>
      fs.setTimes(log.commitFile(v), icts(2L.toInt - v.toInt) + 999999L, -1L)
    }
    // travel by each ICT still resolves the right version
    assert(log.versionAtOrBefore(icts(1)) == 1L)
    assert(log.versionAtOrBefore(icts(2)) == 2L)
    assert(log.versionAtOrBefore(icts(0)) == 0L)
    // history shows the ICT clock
    val hist = DeltaTableOps.history(spark, path)
      .select($"version", $"timestamp").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert((0L to 2L).forall(v => hist(v) == icts(v.toInt)), hist.toString)
    // the change feed's _commit_timestamp is the ICT
    val cf = GraftDelta.tableChanges(spark, path, 0L)
      .select($"_commit_version", $"_commit_timestamp").distinct().collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert(cf == Map(1L -> icts(1), 2L -> icts(2)), cf.toString)
  }

  test("timestamp-bounded change feed resolves its window on the ICT clock") {
    val path = tmp()
    GraftDelta.toDelta(sample(3), path,
      configuration = Map("delta.enableInCommitTimestamps" -> "true"))    // v0
    GraftDelta.toDelta(Seq((10L, "a")).toDF("k", "v"), path, mode = "append") // v1
    GraftDelta.toDelta(Seq((11L, "b")).toDF("k", "v"), path, mode = "append") // v2
    GraftDelta.toDelta(Seq((12L, "c")).toDF("k", "v"), path, mode = "append") // v3
    val icts = (0L to 3L).map(v => ictOf(path, v).get)
    // window [ict(v1), ict(v2)] → exactly v1 and v2's rows
    val got = GraftDelta.tableChangesByTimestamp(spark, path, icts(1), Some(icts(2)))
      .select($"k", $"_commit_version").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (11L, 2L)), got.toString)
    // open-ended start mid-history
    val tail = GraftDelta.tableChangesByTimestamp(spark, path, icts(3))
      .select($"k").as[Long].collect().toSet
    assert(tail == Set(12L))
    // a window before the first commit refuses the END bound, not silently
    intercept[IllegalArgumentException] {
      GraftDelta.tableChangesByTimestamp(spark, path, icts(0) - 10, Some(icts(0) - 5))
    }
  }

  test("the chain survives metadata-less commits and stops when disabled") {
    val path = tmp()
    GraftDelta.toDelta(sample(2), path,
      configuration = Map("delta.enableInCommitTimestamps" -> "true"))    // v0
    GraftDelta.toDelta(sample(1), path, mode = "append")                  // v1 (no metadata action)
    assert(ictOf(path, 1L).isDefined, "chain must continue through plain appends")
    // disable via a metadata commit — subsequent commits stop stamping
    val log = DeltaLog.forTable(spark, path)
    val snap = log.snapshot(None)
    log.writeCommit(2L, Seq(
      CommitInfo(System.currentTimeMillis(), "SET TBLPROPERTIES"),
      snap.metadata.copy(configuration =
        snap.metadata.configuration - "delta.enableInCommitTimestamps")))
    GraftDelta.toDelta(sample(1), path, mode = "append")                  // v3
    assert(ictOf(path, 3L).isEmpty, "a disabled table must stop stamping")
  }
}
