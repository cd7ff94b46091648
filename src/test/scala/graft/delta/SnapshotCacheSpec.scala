package graft.delta

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Snapshot cache with incremental tail replay (r13 VERDICT next-round
  * #1): a repeat snapshot of an unchanged table costs one `_delta_log`
  * listing and ZERO action reads; a post-append snapshot applies exactly
  * the new tail commits; foreign truncation / re-creation / torn tails
  * invalidate rather than serve stale state. */
class SnapshotCacheSpec extends GraftSuite {

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_sc")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  private case class Counts(commits: Long, checkpoints: Long, listings: Long)
  private def counts(): Counts = Counts(
    DeltaLog.commitReadCount.get(),
    DeltaLog.checkpointReadCount.get(),
    DeltaLog.logListCount.get())
  private def delta(before: Counts): Counts = {
    val now = counts()
    Counts(now.commits - before.commits,
      now.checkpoints - before.checkpoints,
      now.listings - before.listings)
  }

  test("repeat snapshot costs one listing, zero action reads; append applies one tail commit") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1L to 100L).toDF("k"), path)                      // v0
    GraftDelta.toDelta((101L to 110L).toDF("k"), path, mode = "append")   // v1

    val log = DeltaLog.forTable(spark, path)
    assert(log eq DeltaLog.forTable(spark, path),
      "forTable must return the cached handle for the same (session, path)")

    val s1 = log.snapshot(None)
    assert(s1.version == 1L)
    // exact hit: same Snapshot instance, one listing, zero reads
    val c0 = counts()
    val s2 = log.snapshot(None)
    val d0 = delta(c0)
    assert(s2 eq s1, "unchanged table must serve the built snapshot")
    assert(d0.commits == 0 && d0.checkpoints == 0,
      s"cache hit must read no action files: $d0")
    assert(d0.listings == 1, s"cache hit costs exactly one listing: $d0")

    // append + next snapshot → exactly ONE tail commit read TOTAL, no
    // checkpoint re-read. (The commit path itself advances the cache —
    // the N.crc write snapshots at the new version — so the read happens
    // inside the append and the explicit snapshot after it is free.)
    val c1 = counts()
    GraftDelta.toDelta((111L to 120L).toDF("k"), path, mode = "append")   // v2
    val s3 = log.snapshot(None)
    val d1 = delta(c1)
    assert(s3.version == 2L && s3.activeFiles.nonEmpty)
    assert(d1.commits == 1 && d1.checkpoints == 0,
      s"append + post-append snapshot must apply exactly the tail commit: $d1")
    assert(GraftDelta.readDelta(spark, path).count() == 120)

    // the previously served snapshot is immutable — still v1's view
    assert(s2.version == 1L)
  }

  test("incremental tail equals full replay (DML, DV, metadata change in the tail)") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"), path)
    val log = DeltaLog.forTable(spark, path)
    log.snapshot(None) // seed the cache at v0

    // tail with a DV delete (incarnation reconciliation), an update, and
    // a schema change (metadata action) — the hard replay cases
    GraftDelta.deleteWhereWithDv(spark, path,
      Seq(Seq(Predicate("id", "<=", 10L))))                               // v1
    GraftDelta.updateWhere(spark, path,
      Seq(Seq(Predicate("id", ">", 45L))), Map("v" -> lit("upd")))        // v2
    DeltaTableOps.addColumn(spark, path, "extra",
      org.apache.spark.sql.types.StringType)                              // v3

    val inc = log.snapshot(None) // incremental: v1..v3 applied on cache
    val full = new DeltaLog(spark, path).snapshot(None) // cold full replay
    assert(inc.version == full.version)
    def fileIds(s: Snapshot) =
      s.activeFiles.map(f => (f.path, f.deletionVector.map(DeltaLog.dvUniqueId))).toSet
    assert(fileIds(inc) == fileIds(full),
      "incremental active set must equal full replay")
    assert(inc.tombstones.map(_.path).toSet == full.tombstones.map(_.path).toSet)
    assert(inc.metadata.schema == full.metadata.schema,
      "metadata change in the tail must land")
    assert(inc.domainMetadata == full.domainMetadata)
    assert(GraftDelta.readDelta(spark, path).count() == 40)
  }

  test("foreign truncation and re-creation invalidate; checkpoint-cleaned tail full-replays") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta(Seq((0L, "a")).toDF("id", "v"), path, checkpointInterval = 2)
    (1 to 4).foreach(i => GraftDelta.toDelta(Seq((i.toLong, s"b$i")).toDF("id", "v"),
      path, mode = "append", checkpointInterval = 2))                     // v0..v4, cps at 2,4
    val log = DeltaLog.forTable(spark, path)
    assert(log.snapshot(None).version == 4L)

    // log cleanup removes the pre-checkpoint tail: cached state (v4) is
    // still valid and serves; a COLD handle replays from the checkpoint
    DeltaMaintenance.cleanupLog(spark, path, retentionHours = 0.0, dryRun = false)
    assert(log.snapshot(None).version == 4L)
    assert(GraftDelta.readDelta(spark, path).count() == 5)

    // foreign rm-rf + re-create at a LOWER version: version regression
    // must invalidate (full replay of the new table, not stale state)
    val dir = new java.io.File(path)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(dir)
    GraftDelta.toDelta(Seq((100L, "z")).toDF("id", "v"), path)            // fresh v0
    val fresh = log.snapshot(None)
    assert(fresh.version == 0L)
    assert(GraftDelta.readDelta(spark, path).as[(Long, String)].collect().toSeq ==
      Seq((100L, "z")), "stale cache would resurrect the old table")

    // re-creation landing on the SAME version with different content:
    // the (len, mtime) fingerprint must catch it (longer stats strings
    // guarantee a different commit-file length)
    rmrf(dir)
    GraftDelta.toDelta(
      Seq((200L, "yyyy"), (201L, "xxxx"), (202L, "wwww")).toDF("id", "v"), path)
    val again = log.snapshot(None)
    assert(again.version == 0L)
    assert(GraftDelta.readDelta(spark, path).count() == 3,
      "same-version re-create must not serve the cached file set")
  }

  test("time travel serves from cache without poisoning the head") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1L to 10L).toDF("k"), path)                       // v0
    GraftDelta.toDelta((11L to 20L).toDF("k"), path, mode = "append")     // v1
    GraftDelta.toDelta((21L to 30L).toDF("k"), path, mode = "append")     // v2
    val log = DeltaLog.forTable(spark, path)
    assert(log.snapshot(Some(0L)).activeFiles.nonEmpty)
    assert(log.snapshot(None).version == 2L)
    assert(GraftDelta.readDelta(spark, path, version = Some(1L)).count() == 20)
    assert(GraftDelta.readDelta(spark, path).count() == 30)
    // pinned old version again — cache may full-replay; result exact
    assert(GraftDelta.readDelta(spark, path, version = Some(0L)).count() == 10)
    assert(GraftDelta.readDelta(spark, path).count() == 30)
  }

  test("time-travel read does not evict a newer still-valid cached state (ADVICE r14)") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1L to 10L).toDF("k"), path)                       // v0
    GraftDelta.toDelta((11L to 20L).toDF("k"), path, mode = "append")     // v1
    GraftDelta.toDelta((21L to 30L).toDF("k"), path, mode = "append")     // v2
    val log = DeltaLog.forTable(spark, path)
    val head = log.snapshot(None)                                          // cache at v2
    assert(head.version == 2L)
    // a historical read full-replays but must NOT re-seed the cache with
    // the old state — the head would then re-replay its whole tail
    assert(log.snapshot(Some(0L)).version == 0L)
    val c0 = counts()
    val again = log.snapshot(None)
    val d0 = delta(c0)
    assert(again eq head, "head must still be served from cache after time travel")
    assert(d0.commits == 0 && d0.checkpoints == 0,
      s"time travel must not evict the newer cached state: $d0")
  }

  test("incremental advance expires tombstones past the retention window (ADVICE r14)") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1L to 100L).toDF("k").repartition(4), path)        // v0
    GraftDelta.deleteWhere(spark, path, Seq(Seq(Predicate("k", "<=", 50L)))) // v1
    val log = DeltaLog.forTable(spark, path)
    val atDelete = log.snapshot(None)
    // default 7 d window: young tombstones survive incremental advances
    assert(atDelete.tombstones.nonEmpty, "the delete must tombstone rewritten files")
    GraftDelta.toDelta((101L to 110L).toDF("k"), path, mode = "append")    // v2 (tail apply)
    assert(log.snapshot(None).tombstones.nonEmpty,
      "in-retention tombstones must survive a tail apply")
    Thread.sleep(10)
    // shrink BOTH windows to 0 h (the cache prune lags tombstone expiry
    // by the log-retention window so vacuum keeps its prey — see
    // pruneExpired): the properties land in the same tail batch and the
    // advance prunes with the NEW windows
    DeltaTableOps.setTableProperties(spark, path,
      Map("delta.deletedFileRetentionDuration" -> "interval 0 hours",
        "delta.logRetentionDuration" -> "interval 0 hours"))               // v3
    val advanced = log.snapshot(None)
    assert(advanced.version == 3L)
    assert(advanced.tombstones.isEmpty,
      s"cached state must expire aged tombstones on tail apply: " +
        s"${advanced.tombstones.map(_.path)}")
    assert(GraftDelta.readDelta(spark, path).count() == 60)
    // the already-served older snapshot is immutable
    assert(atDelete.tombstones.nonEmpty)
  }

  test("checkpoint drops tombstones past the retention window (ADVICE r14)") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1L to 100L).toDF("k").repartition(4), path)        // v0
    DeltaTableOps.setTableProperties(spark, path,
      Map("delta.deletedFileRetentionDuration" -> "interval 0 hours"))     // v1
    GraftDelta.deleteWhere(spark, path, Seq(Seq(Predicate("k", "<=", 50L)))) // v2
    Thread.sleep(10)
    val log = DeltaLog.forTable(spark, path)
    log.writeCheckpoint(2L)
    // a COLD replay anchored at the checkpoint reconstructs no expired
    // tombstones — the checkpoint did not persist them
    val fresh = new DeltaLog(spark, path)
    val snap = fresh.snapshot(None)
    assert(snap.version == 2L)
    assert(snap.tombstones.isEmpty,
      s"checkpoint must not persist expired tombstones: ${snap.tombstones.map(_.path)}")
    assert(GraftDelta.readDelta(spark, path).count() == 50)
    // young tombstones (default 7 d window) DO persist: vacuum's
    // tombstone-driven mode depends on them
    val path2 = tmp()
    GraftDelta.toDelta((1L to 100L).toDF("k").repartition(4), path2)
    GraftDelta.deleteWhere(spark, path2, Seq(Seq(Predicate("k", "<=", 50L))))
    val log2 = DeltaLog.forTable(spark, path2)
    log2.writeCheckpoint(1L)
    assert(new DeltaLog(spark, path2).snapshot(None).tombstones.nonEmpty,
      "in-retention tombstones must survive the checkpoint")
  }

  test("version checksums: written per commit, validated clean, doctored crc forces a cold replay") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1L to 50L).toDF("k"), path)                       // v0
    GraftDelta.toDelta((51L to 60L).toDF("k"), path, mode = "append")     // v1
    val log = DeltaLog.forTable(spark, path)
    // every commit wrote its sibling N.crc with the delta-spark fields
    (0L to 1L).foreach { v =>
      val body = {
        val in = log.fs.open(log.crcFile(v))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      }
      assert(body.contains("\"tableSizeBytes\"") && body.contains("\"numFiles\""), body)
      // a clean round-trip: the crc must agree with the snapshot it describes
      assert(DeltaLog.crcMismatch(body, log.snapshot(Some(v))).isEmpty, body)
    }
    // steady state: a matching crc costs nothing after its first check
    log.snapshot(None)
    val c0 = counts()
    log.snapshot(None)
    val dHit = delta(c0)
    assert(dHit.commits == 0 && dHit.checkpoints == 0, dHit.toString)

    // doctor the crc (foreign corruption / a checkpointed lie): the next
    // snapshot must DISCARD the cache and replay cold — the tripwire —
    // then serve the log-derived state (the log is the authority)
    val out = log.fs.create(log.crcFile(1L), true)
    try out.write("""{"tableSizeBytes":1,"numFiles":999}""".getBytes("UTF-8"))
    finally out.close()
    val c1 = counts()
    val snap = log.snapshot(None)
    val dCold = delta(c1)
    assert(dCold.commits >= 2,
      s"a doctored crc must force a cold replay of the whole tail: $dCold")
    assert(snap.version == 1L)
    assert(GraftDelta.readDelta(spark, path).count() == 60,
      "the log-derived state is served despite the lying checksum")
    // the lying crc is remembered by (len, mtime): hits are cheap again
    val c2 = counts()
    log.snapshot(None)
    val dAgain = delta(c2)
    assert(dAgain.commits == 0, s"validated-once crc must not re-trip: $dAgain")
  }

  test("a delta-spark-shaped foreign crc (extra fields) validates; junk crc is tolerated") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1L to 30L).toDF("k"), path)                        // v0
    val log = DeltaLog.forTable(spark, path)
    val snap = log.snapshot(None)
    val size = snap.activeFiles.map(_.size).sum
    // delta-spark's VersionChecksum carries many fields we don't write —
    // agreement on the shared ones must validate, unknowns ignored
    val foreign =
      s"""{"txnId":"00000000-0000-0000-0000-000000000000","tableSizeBytes":$size,""" +
        s""""numFiles":${snap.activeFiles.size},"numMetadata":1,"numProtocol":1,""" +
        s""""inCommitTimestampOpt":null,"setTransactions":[],""" +
        s""""metadata":{"id":"${snap.metadata.id}","format":{"provider":"parquet"}},""" +
        s""""protocol":{"minReaderVersion":${snap.protocol.minReaderVersion},""" +
        s""""minWriterVersion":${snap.protocol.minWriterVersion}},""" +
        s""""histogramOpt":{"sortedBinBoundaries":[0],"fileCounts":[1],"totalBytes":[$size]},""" +
        s""""allFiles":[]}"""
    val out = log.fs.create(log.crcFile(0L), true)
    try out.write(foreign.getBytes("UTF-8")) finally out.close()
    val c0 = counts()
    assert(log.snapshot(None) eq snap, "agreeing foreign crc must not trip the cache")
    assert(delta(c0).commits == 0)
    // unparseable junk is tolerated (foreign conventions never brick a table)
    val out2 = log.fs.create(log.crcFile(0L), true)
    try out2.write("not json at all".getBytes("UTF-8")) finally out2.close()
    assert(log.snapshot(None).version == 0L)
    assert(GraftDelta.readDelta(spark, path).count() == 30)
  }

  test("checkpoint write (verbatim stats) bypasses the built cache but stays coherent") {
    import spark.implicits._
    val path = tmp()
    GraftDelta.toDelta((1L to 40L).toDF("k"), path)
    val log = DeltaLog.forTable(spark, path)
    val compact = log.snapshot(None)
    val verbatim = log.snapshot(None, compactStats = false)
    assert(verbatim ne compact)
    assert(verbatim.activeFiles.map(_.path).toSet == compact.activeFiles.map(_.path).toSet)
    // after the verbatim call the cached head still serves correctly
    assert(log.snapshot(None).activeFiles.map(_.path).toSet ==
      compact.activeFiles.map(_.path).toSet)
  }
}
