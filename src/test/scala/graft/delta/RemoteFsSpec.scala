package graft.delta

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._

import java.net.URI
import scala.jdk.CollectionConverters._

/** A RawLocalFileSystem re-registered under scheme `mockfs:` — stands in
  * for a remote object store so every path/scheme seam (staging writes,
  * log replay, scan construction, vacuum's path re-prefixing) is
  * exercised off `file:`. Mirrors the reference's remote-path semantics
  * (core.py:59-70, 110-119; writer.py:202-220), which our design
  * delegates to the Hadoop FileSystem abstraction — this spec proves the
  * delegation actually holds end-to-end. */
class MockFs extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: URI = URI.create("mockfs:///")
}

/** An S3A-shaped filesystem: `create(overwrite=false)` is check-then-put
  * (RawLocalFileSystem's own private create does `exists(f)` then opens a
  * truncating stream), and a barrier between those two steps lets two
  * committers deterministically interleave check/check/put/put. The hook
  * point is `createOutputStreamWithMode` — the ONE protected seam every
  * public `create` overload funnels through AFTER the exists check (the
  * 7-arg `create(FsPermission,...)` overload is NOT on the
  * `FileSystem.create(path, overwrite)` convenience-chain path, which is
  * why an override there silently never fired under the full suite).
  * Models the object-store anomaly the LogStore seam exists for. */
class RacyFs extends RawLocalFileSystem {
  override def getScheme: String = "racyfs"
  override def getUri: URI = URI.create("racyfs:///")
  // The blind PUT in the r13 temp+RENAME publish shape: the commit body
  // is fully staged before the exists check, and the rename IS the
  // publish — park committers here (after both passed the check, before
  // either publishes) to stage the lost-update window deterministically.
  // Only COMMIT destinations consume barrier slots: parquet staging and
  // temp files also funnel through rename on some paths.
  override def rename(src: Path, dst: Path): Boolean = {
    if (dst.getName.endsWith(".json") && dst.toString.contains("_delta_log"))
      RacyFs.widenWindow()
    // raw-local rename REPLACES an existing destination — last writer wins
    super.rename(src, dst)
  }
}

object RacyFs {
  @volatile var gate: Option[java.util.concurrent.CyclicBarrier] = None
  val arrivals = new java.util.concurrent.atomic.AtomicInteger(0)
  val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private[delta] def widenWindow(): Unit = gate.foreach { b =>
    arrivals.incrementAndGet()
    // generous bound: under full-suite CPU contention the two committers
    // can start far apart; the timeout exists only so a test failure
    // can't deadlock the pool
    try { b.await(60, java.util.concurrent.TimeUnit.SECONDS); outcomes.add("tripped") }
    catch { case e: Exception => outcomes.add(e.getClass.getSimpleName) }
  }
  private[delta] def reset(): Unit = { arrivals.set(0); outcomes.clear() }
}

class RemoteFsSpec extends GraftSuite {

  private lazy val table: String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_mockfs")
    dir.toFile.deleteOnExit()
    s"mockfs:$dir/tbl"
  }

  test("write/read/time-travel roundtrip on a non-local scheme") {
    import spark.implicits._
    val v0 = (1 to 40).map(i => (i.toLong, s"row$i", i % 4)).toDF("id", "payload", "bucket")
    DeltaWrite.write(v0, table, mode = "error", partitionBy = Seq("bucket"))
    val v1 = (41 to 60).map(i => (i.toLong, s"row$i", i % 4)).toDF("id", "payload", "bucket")
    DeltaWrite.write(v1, table, mode = "append")

    val df = GraftDelta.readDelta(spark, table)
    assert(df.count() == 60)
    assert(df.inputFiles.nonEmpty && df.inputFiles.forall(_.startsWith("mockfs:")),
      s"scan must plan mockfs: URIs, got ${df.inputFiles.take(2).mkString(", ")}")
    assert(GraftDelta.readDelta(spark, table, version = Some(0)).count() == 40)
    // partition pruning happens on the remote scheme too
    val pruned = GraftDelta.readDelta(spark, table,
      filters = Seq(Seq(Predicate("bucket", "==", 2))))
    assert(pruned.count() == 15)
    assert(pruned.inputFiles.forall(f => f.startsWith("mockfs:") && f.contains("bucket=2")))
  }

  test("history reads the remote log") {
    val h = GraftDelta.readDeltaHistory(spark, table).collect()
    assert(h.length == 2)
    assert(h.head.getString(1) == "WRITE")
  }

  test("vacuum re-prefixes tombstones with the remote scheme and deletes") {
    import spark.implicits._
    val repl = (1 to 10).map(i => (i.toLong, s"new$i", i % 4)).toDF("id", "payload", "bucket")
    DeltaWrite.write(repl, table, mode = "overwrite")
    Thread.sleep(5)
    val tombstones = GraftDelta.vacuum(spark, table, retentionHours = 0.0, dryRun = true)
    assert(tombstones.nonEmpty, "overwrite must tombstone the previous files")

    val fs = new Path(table).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.isInstanceOf[MockFs], s"resolved ${fs.getClass} for the mockfs scheme")
    // enumerate data files via the LOCAL backing dir (test bookkeeping only;
    // the deletes under test go through the mockfs scheme)
    val backing = java.nio.file.Paths.get(table.stripPrefix("mockfs:"))
    def liveParquet(): Set[String] = {
      val s = java.nio.file.Files.walk(backing)
      try s.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala
        .map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_delta_log"))
        .toSet
      finally s.close()
    }
    val before = liveParquet()
    GraftDelta.vacuum(spark, table, retentionHours = 0.0, dryRun = false)
    val after = liveParquet()
    assert(before.size - after.size == tombstones.size,
      s"expected ${tombstones.size} deletions, got ${before.size} -> ${after.size}")
    // the surviving table still reads correctly through the remote scheme
    assert(GraftDelta.readDelta(spark, table).count() == 10)
  }

  /** Stage a fresh racyfs table at v0 and return its log. */
  private def stage(): DeltaLog = {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.racyfs.impl", classOf[RacyFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_racyfs")
    dir.toFile.deleteOnExit()
    val t = s"racyfs:$dir/tbl"
    DeltaWrite.write(Seq((1L, "a")).toDF("id", "v"), t, mode = "error")
    DeltaLog.forTable(spark, t)
  }

  /** Two committers race on version 1 of `log`; per-committer outcome. */
  private def race(log: DeltaLog): Seq[Either[Throwable, Unit]] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val tasks = Seq("w1", "w2").map { who =>
        new java.util.concurrent.Callable[Either[Throwable, Unit]] {
          override def call(): Either[Throwable, Unit] =
            try Right(log.writeCommit(1L, Seq(
              CommitInfo(System.currentTimeMillis(), s"WRITE-$who"))))
            catch { case e: Throwable => Left(e) }
        }
      }
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
    } finally pool.shutdown()
  }

  test("LogStore seam: check-then-put loses an update; a registered locked store serializes") {
    // (a) the anomaly: both committers pass the existence check before
    // either puts — both "win", the log keeps only the LAST body (the
    // object-store lost update the seam exists for). The barrier sits at
    // RENAME of the commit destination, i.e. AFTER publishViaRename's
    // exists check and BEFORE the publish: when both committers are
    // parked there, both have already passed the check with no file
    // present, so both MUST win — deterministic, not a timing lottery.
    // The gate arms AFTER staging so the v0 commit can't consume a slot.
    val staged = stage()
    RacyFs.reset()
    RacyFs.gate = Some(new java.util.concurrent.CyclicBarrier(2))
    val anomalous =
      try race(staged)
      finally RacyFs.gate = None
    val failures = anomalous.collect { case Left(e) =>
      val sw = new java.io.StringWriter(); e.printStackTrace(new java.io.PrintWriter(sw)); sw.toString
    }
    // precondition: the hook must have fired for BOTH committers — an
    // arrivals shortfall means the choke point was bypassed (a Hadoop
    // call-path change), which must fail with a diagnosis, not a coin flip
    assert(RacyFs.arrivals.get() == 2,
      s"commit-rename hook bypassed: arrivals=${RacyFs.arrivals.get()}, " +
        s"outcomes=${RacyFs.outcomes}, committer errors=${failures.mkString("\n---\n")}")
    assert(RacyFs.outcomes.asScala.forall(_ == "tripped"),
      s"barrier must trip cleanly for both committers: outcomes=${RacyFs.outcomes}")
    assert(anomalous.count(_.isRight) == 2,
      s"check-then-put must let both aligned committers win; " +
        s"committer errors=${failures.mkString("\n---\n")}")

    // (b) the fix: register a Locked store for the scheme (stand-in for a
    // DynamoDB/etcd lease) — exactly ONE committer wins, the loser gets
    // the version conflict the retry loop upstream understands
    val mutex = new java.util.concurrent.ConcurrentHashMap[String, Object]()
    LogStore.register("racyfs", new LogStore.Locked(LogStore.CheckThenPut,
      (key, body) => mutex.computeIfAbsent(key, _ => new Object).synchronized(body())))
    try {
      val log = stage()
      val r = race(log)
      assert(r.count(_.isRight) == 1, s"exactly one committer must win: $r")
      assert(r.collect { case Left(e) => e }
        .forall(_.isInstanceOf[java.util.ConcurrentModificationException]), r.toString)
      // the winner's commit is intact and replayable
      assert(log.snapshot(None).version == 1L)
    } finally LogStore.register("racyfs", LogStore.CreateNoOverwrite)
  }

  test("shipped FileLease lock provider serializes racing committers on the racy store") {
    // the lease lives on LOCAL disk (an atomic-create namespace) while the
    // table lives on the racy store — the externalized-arbitration shape
    // of delta-spark's S3DynamoDBLogStore, using only shipped pieces
    val leaseDir = java.nio.file.Files.createTempDirectory("graft_lease")
    leaseDir.toFile.deleteOnExit()
    val leasePath = new Path(s"file:$leaseDir")
    val leaseFs = leasePath.getFileSystem(spark.sessionState.newHadoopConf())
    val lease = new LogStore.FileLease(leaseFs, leasePath)
    LogStore.register("racyfs",
      new LogStore.Locked(LogStore.CheckThenPut, lease.withLock))
    try {
      val log = stage()
      val r = race(log)
      assert(r.count(_.isRight) == 1, s"exactly one committer must win: $r")
      assert(r.collect { case Left(e) => e }
        .forall(_.isInstanceOf[java.util.ConcurrentModificationException]), r.toString)
      assert(log.snapshot(None).version == 1L)
      // leases are released, not leaked
      assert(leaseFs.listStatus(leasePath).forall(!_.getPath.getName.endsWith(".lease")),
        "all lease files must be deleted after release")
    } finally LogStore.register("racyfs", LogStore.CreateNoOverwrite)
  }

  test("expired FileLease from a crashed committer is taken over") {
    val leaseDir = java.nio.file.Files.createTempDirectory("graft_lease2")
    leaseDir.toFile.deleteOnExit()
    val leasePath = new Path(s"file:$leaseDir")
    val leaseFs = leasePath.getFileSystem(spark.sessionState.newHadoopConf())
    // a dead committer's lease, already expired
    val crashed = new LogStore.FileLease(leaseFs, leasePath, ttlMs = -1000L)
    val stale = new java.util.concurrent.atomic.AtomicBoolean(false)
    intercept[RuntimeException] {
      crashed.withLock("k1", () => { stale.set(true); sys.error("committer crash") })
    }
    // the crash path's release correctly LEAVES its already-expired lease
    // in place (deleting it would race a takeover); overwrite it with a
    // distinct dead committer's stale content for the takeover below
    val out = leaseFs.create(new Path(leasePath,
      java.net.URLEncoder.encode("k1", "UTF-8") + ".lease"), true)
    out.write(LogStore.FileLease.leaseBody(
      "deadbeef", System.currentTimeMillis() - 5000)); out.close()
    val healthy = new LogStore.FileLease(leaseFs, leasePath, acquireTimeoutMs = 5000L)
    var ran = false
    healthy.withLock("k1", () => { ran = true })
    assert(ran, "an expired lease must be taken over within the acquire timeout")
  }

  test("commit on a non-atomic store warns once when another writer is in the log") {
    LogStore.register("racyfs", LogStore.CheckThenPut) // atomicPutIfAbsent = false
    try {
      val log = stage() // v0: this engine
      // v1: a FOREIGN writer (pre-set engineInfo survives stamping)
      log.writeCommit(1L, Seq(CommitInfo(System.currentTimeMillis(), "WRITE",
        engineInfo = Some("other-engine/9.9"))))
      assert(!DeltaLog.multiWriterWarnings.containsKey(log.tablePath),
        "v1's predecessor was our own commit — no warning yet")
      // v2: our commit, predecessor is foreign → hazard is live → WARN
      log.writeCommit(2L, Seq(CommitInfo(System.currentTimeMillis(), "WRITE")))
      val msg = DeltaLog.multiWriterWarnings.get(log.tablePath)
      assert(msg != null && msg.contains("NON-ATOMIC") && msg.contains("other-engine/9.9"),
        s"warning must name the hazard and the foreign writer, got: $msg")
      // once per table: clear the record, commit again, no re-warn
      DeltaLog.multiWriterWarnings.remove(log.tablePath)
      log.writeCommit(3L, Seq(CommitInfo(System.currentTimeMillis(), "WRITE")))
      assert(!DeltaLog.multiWriterWarnings.containsKey(log.tablePath), "warn must fire once")
      // and the log round-trips the engineInfo stamp
      assert(log.commitInfoOf(3L).flatMap(_.engineInfo).contains(DeltaLog.engineId))
    } finally LogStore.register("racyfs", LogStore.CreateNoOverwrite)
  }

  test("restore and tableChanges operate through the remote scheme") {
    import spark.implicits._
    // the shared table's pre-overwrite files were vacuumed above: restore
    // must detect the missing remote files and refuse
    val e = intercept[IllegalStateException](GraftDelta.restore(spark, table, 0L))
    assert(e.getMessage.contains("vacuumed"))

    // fresh mockfs table: change feed + rewind end-to-end off file:
    val dir = java.nio.file.Files.createTempDirectory("graft_mockfs2")
    dir.toFile.deleteOnExit()
    val t2 = s"mockfs:$dir/tbl"
    DeltaWrite.write((1 to 20).map(i => (i.toLong, s"a$i")).toDF("id", "v"), t2, mode = "error")
    DeltaWrite.write((21 to 30).map(i => (i.toLong, s"b$i")).toDF("id", "v"), t2, mode = "append")

    val changes = GraftDelta.tableChanges(spark, t2, fromVersion = 0L)
    assert(changes.count() == 10)
    assert(changes.inputFiles.forall(_.startsWith("mockfs:")),
      s"change feed must scan mockfs: URIs, got ${changes.inputFiles.take(2).mkString(", ")}")

    val res = GraftDelta.restore(spark, t2, 0L)
    assert(res.removedFiles > 0)
    assert(GraftDelta.readDelta(spark, t2).count() == 20)
  }
}
