package graft.delta

import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** V2 (uuid-named) checkpoints — reader feature `v2Checkpoint`:
  * sidecar-based round trip through our own writer, foreign JSON-flavor
  * top files, replay acceleration with the JSON tail removed, and the
  * checkpointMetadata version guard. */
class V2CheckpointSpec extends GraftSuite {

  import TestBase.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_v2cp")
    d.toFile.deleteOnExit()
    s"$d/tbl"
  }

  /** Upgrade a table's protocol to reader-3/writer-7 with v2Checkpoint. */
  private def enableV2(path: String): Unit = {
    val log = DeltaLog.forTable(spark, path)
    val snap = log.snapshot(None)
    val rf = (snap.protocol.readerFeatures.getOrElse(Nil) :+ "v2Checkpoint").distinct
    val wf = DeltaLog.legacyWriterFeatures(snap.protocol)
    log.writeCommit(snap.version + 1, Seq(
      CommitInfo(System.currentTimeMillis(), "UPGRADE PROTOCOL"),
      Protocol(3, 7, readerFeatures = Some(rf), writerFeatures = Some(wf))))
  }

  test("v2 table writes uuid checkpoint + sidecars; replay matches full log") {
    val path = tmp()
    GraftDelta.toDelta((1L to 10L).toDF("k"), path)                       // v0
    GraftDelta.toDelta((11L to 20L).toDF("k"), path, mode = "append")     // v1
    enableV2(path)                                                        // v2
    GraftDelta.toDelta((21L to 30L).toDF("k"), path, mode = "append")     // v3
    val log = DeltaLog.forTable(spark, path)
    log.writeCheckpoint(3L)
    // uuid-named top file + at least one sidecar exist; no classic file
    val logDir = new java.io.File(s"$path/_delta_log")
    val names = logDir.listFiles().map(_.getName).toSeq
    assert(names.exists(_.matches("""\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet""")),
      s"expected uuid checkpoint among $names")
    assert(!names.contains(f"${3L}%020d.checkpoint.parquet"),
      "v2 table must not write a classic checkpoint")
    val sidecars = new java.io.File(s"$path/_delta_log/_sidecars")
    assert(sidecars.isDirectory && sidecars.listFiles().nonEmpty)

    // replay through the checkpoint equals replay from JSON alone
    val viaCp = DeltaLog.forTable(spark, path).snapshot(None)
    assert(viaCp.activeFiles.map(_.path).sorted ==
      log.snapshot(Some(3L)).activeFiles.map(_.path).sorted)
    assert(GraftDelta.readDelta(spark, path).as[Long].collect().sorted.toSeq ==
      (1L to 30L))

    // append past the checkpoint, remove the pre-checkpoint JSON tail:
    // the snapshot must still build (checkpoint-accelerated)
    GraftDelta.toDelta((31L to 35L).toDF("k"), path, mode = "append")     // v4
    (0L to 2L).foreach(v =>
      new java.io.File(s"$path/_delta_log/" + f"$v%020d.json").delete())
    val accel = DeltaLog.forTable(spark, path)
    assert(accel.snapshot(None).version == 4L)
    assert(GraftDelta.readDelta(spark, path).as[Long].collect().sorted.toSeq ==
      (1L to 35L))
  }

  test("foreign JSON-flavor v2 checkpoint reads through sidecars") {
    val path = tmp()
    GraftDelta.toDelta((1L to 12L).toDF("k").repartition(2), path)        // v0
    enableV2(path)                                                        // v1
    val log = DeltaLog.forTable(spark, path)
    val snap = log.snapshot(None)
    // write the sidecar through our v2 writer, then hand-author a JSON
    // top file referencing it (the delta-kernel flavor)
    log.writeCheckpoint(1L)
    val logDir = new java.io.File(s"$path/_delta_log")
    val topParquet = logDir.listFiles()
      .filter(_.getName.matches("""\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet""")).head
    val sidecarNames = new java.io.File(s"$path/_delta_log/_sidecars")
      .listFiles().map(_.getName).toSeq
    topParquet.delete() // leave only the JSON flavor
    val uuid = java.util.UUID.randomUUID().toString
    val lines =
      ActionCodec.toJsonLine(CheckpointMetadata(1L)) +:
        ActionCodec.toJsonLine(snap.protocol) +:
        ActionCodec.toJsonLine(snap.metadata) +:
        sidecarNames.map { n =>
          val f = new java.io.File(s"$path/_delta_log/_sidecars/$n")
          ActionCodec.toJsonLine(Sidecar(n, f.length(), f.lastModified()))
        }
    Files.write(
      java.nio.file.Paths.get(s"$path/_delta_log/" + f"${1L}%020d.checkpoint.$uuid.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    // drop the JSON commits entirely: the JSON v2 checkpoint is now the
    // only source of v1 state
    (0L to 1L).foreach(v =>
      new java.io.File(s"$path/_delta_log/" + f"$v%020d.json").delete())
    val got = DeltaLog.forTable(spark, path).snapshot(None)
    assert(got.version == 1L)
    assert(got.activeFiles.map(_.path).sorted == snap.activeFiles.map(_.path).sorted)
    assert(GraftDelta.readDelta(spark, path).as[Long].collect().sorted.toSeq ==
      (1L to 12L))
  }

  test("checkpointMetadata version mismatch and missing sidecars refuse") {
    val path = tmp()
    GraftDelta.toDelta((1L to 5L).toDF("k"), path)                        // v0
    enableV2(path)                                                        // v1
    val log = DeltaLog.forTable(spark, path)
    log.writeCheckpoint(1L)
    val logDir = new java.io.File(s"$path/_delta_log")
    val top = logDir.listFiles()
      .filter(_.getName.matches("""\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet""")).head
    // copy the v1 top file to v0's name: declared version no longer matches
    val bogus = new java.io.File(logDir,
      top.getName.replaceFirst("""^\d{20}""", f"${0L}%020d"))
    Files.copy(top.toPath, bogus.toPath)
    val e = intercept[IllegalArgumentException](log.readCheckpointActions(0L))
    assert(e.getMessage.contains("declares version"), e.getMessage)
    bogus.delete()

    // deleting a referenced sidecar refuses instead of silently dropping
    // that sidecar's adds
    new java.io.File(s"$path/_delta_log/_sidecars")
      .listFiles().foreach(_.delete())
    val e2 = intercept[IllegalArgumentException](log.readCheckpointActions(1L))
    assert(e2.getMessage.contains("missing sidecar"), e2.getMessage)
  }

  test("log cleanup reclaims superseded v2 tops + orphan sidecars, keeps live ones") {
    val path = tmp()
    GraftDelta.toDelta((1L to 10L).toDF("k"), path)                       // v0
    enableV2(path)                                                        // v1
    val log = DeltaLog.forTable(spark, path)
    log.writeCheckpoint(1L)                                               // cp A
    GraftDelta.toDelta((11L to 20L).toDF("k"), path, mode = "append")     // v2
    DeltaLog.forTable(spark, path).writeCheckpoint(2L)                    // cp B
    // age everything; cp B and its sidecars must still survive (they are
    // the newest checkpoint), cp A's top + sidecars must go
    val logDir = new java.io.File(s"$path/_delta_log")
    def ageAll(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(ageAll)
      else f.setLastModified(System.currentTimeMillis() - 100L * 3600 * 1000)
    }
    ageAll(logDir)
    val live = DeltaLog.forTable(spark, path)
    val liveRefs = logDir.listFiles()
      .filter(_.getName.matches("""\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet"""))
      .filter(_.getName.startsWith(f"${2L}%020d"))
      .flatMap(t => live.v2SidecarRefs(new org.apache.hadoop.fs.Path(t.getPath))).toSet
    val removed = GraftDelta.cleanupLog(spark, path, retentionHours = 1.0, dryRun = false)
    assert(removed.exists(_.startsWith(f"${1L}%020d.checkpoint.")),
      s"superseded v2 top must be reclaimed: $removed")
    assert(removed.exists(_.startsWith("_sidecars/")),
      s"orphan sidecars must be reclaimed: $removed")
    val sidecarsLeft = new java.io.File(s"$path/_delta_log/_sidecars")
      .listFiles().map(_.getName).toSet
    assert(liveRefs.subsetOf(sidecarsLeft),
      s"live checkpoint's sidecars must survive: refs=$liveRefs left=$sidecarsLeft")
    // the table still reads through the surviving checkpoint (cache
    // cleared: the pin is the cold post-cleanup replay)
    DeltaLog.clearCache()
    assert(GraftDelta.readDelta(spark, path).count() == 20L)
  }

  test("classic-NAMED v2 checkpoint (compat mode) resolves sidecars, never drops actions") {
    val path = tmp()
    GraftDelta.toDelta((1L to 10L).toDF("k"), path)                       // v0
    GraftDelta.toDelta((11L to 20L).toDF("k"), path, mode = "append")     // v1
    enableV2(path)                                                        // v2
    val log = DeltaLog.forTable(spark, path)
    log.writeCheckpoint(2L)
    val logDir = new java.io.File(s"$path/_delta_log")
    val top = logDir.listFiles()
      .filter(_.getName.matches("""\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet""")).head
    // delta-spark compat mode: V2-structured content under the CLASSIC
    // name — sidecar-resident adds must still be resolved, not dropped
    val classic = new java.io.File(logDir, f"${2L}%020d.checkpoint.parquet")
    Files.move(top.toPath, classic.toPath)
    (0L to 2L).foreach(v =>
      new java.io.File(s"$path/_delta_log/" + f"$v%020d.json").delete())
    val got = DeltaLog.forTable(spark, path).snapshot(None)
    assert(got.version == 2L)
    assert(GraftDelta.readDelta(spark, path).as[Long].collect().sorted.toSeq ==
      (1L to 20L))

    // a classic-named V2 top copied to the wrong version refuses through
    // the same checkpointMetadata guard as uuid-named tops
    val bogus = new java.io.File(logDir, f"${1L}%020d.checkpoint.parquet")
    Files.copy(classic.toPath, bogus.toPath)
    val e = intercept[IllegalArgumentException](
      DeltaLog.forTable(spark, path).readCheckpointActions(1L))
    assert(e.getMessage.contains("declares version"), e.getMessage)
    bogus.delete()
  }

  test("cleanup keeps sidecars referenced by a surviving classic-named top") {
    val path = tmp()
    GraftDelta.toDelta((1L to 10L).toDF("k"), path)                       // v0
    enableV2(path)                                                        // v1
    DeltaLog.forTable(spark, path).writeCheckpoint(1L)                    // cp A (uuid)
    GraftDelta.toDelta((11L to 20L).toDF("k"), path, mode = "append")     // v2
    val log = DeltaLog.forTable(spark, path)
    log.writeCheckpoint(2L)                                               // cp B
    val logDir = new java.io.File(s"$path/_delta_log")
    val topB = logDir.listFiles()
      .filter(_.getName.matches("""\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet"""))
      .filter(_.getName.startsWith(f"${2L}%020d")).head
    Files.move(topB.toPath,
      new java.io.File(logDir, f"${2L}%020d.checkpoint.parquet").toPath)
    def ageAll(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(ageAll)
      else f.setLastModified(System.currentTimeMillis() - 100L * 3600 * 1000)
    }
    ageAll(logDir)
    val removed = GraftDelta.cleanupLog(spark, path, retentionHours = 1.0, dryRun = false)
    assert(removed.exists(_.startsWith(f"${1L}%020d.checkpoint.")),
      s"superseded cp A top must be reclaimed: $removed")
    // cp B is classic-named: its sidecars must survive the orphan sweep,
    // or the live checkpoint becomes unreadable (cold replay pinned)
    DeltaLog.clearCache()
    assert(GraftDelta.readDelta(spark, path).as[Long].collect().sorted.toSeq ==
      (1L to 20L))
  }

  test("v2 checkpoint preserves txn, domainMetadata, and DV descriptors") {
    val path = tmp()
    GraftDelta.toDelta((1L to 20L).toDF("k").repartition(1), path)        // v0
    GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("k", "<=", 3L)))) // v1
    val log0 = DeltaLog.forTable(spark, path)
    val s0 = log0.snapshot(None)
    log0.writeCommit(2L, Seq(
      CommitInfo(System.currentTimeMillis(), "TXN"),
      SetTransaction("appA", 7L, Some(System.currentTimeMillis())),
      DomainMetadata("custom.domain", """{"x":1}""")))                    // v2
    enableV2(path)                                                        // v3
    val log = DeltaLog.forTable(spark, path)
    log.writeCheckpoint(3L)
    (0L to 3L).foreach(v =>
      new java.io.File(s"$path/_delta_log/" + f"$v%020d.json").delete())
    val got = DeltaLog.forTable(spark, path).snapshot(None)
    assert(got.setTransactions.exists(t => t.appId == "appA" && t.version == 7L))
    assert(got.domainMetadata.get("custom.domain").contains("""{"x":1}"""))
    assert(got.activeFiles.exists(_.deletionVector.isDefined),
      "DV descriptor must survive the sidecar round trip")
    assert(GraftDelta.readDelta(spark, path).as[Long].collect().sorted.toSeq ==
      (4L to 20L))
  }
}
