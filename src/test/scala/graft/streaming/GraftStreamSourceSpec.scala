package graft.streaming

import graft.delta.{DeltaMaintenance, GraftDelta, Predicate, TestBase}
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end `spark.readStream.format("graft")` — the log-tail
  * streaming source through the real micro-batch engine. */
class GraftStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_ss_$tag")
    d.toFile.deleteOnExit()
    s"$d/t"
  }

  test("streams the existing table then follows appends, skipping OPTIMIZE rewrites") {
    import spark.implicits._
    val path = tmp("follow")
    GraftDelta.toDelta((0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4), path)
    val q = spark.readStream.format("graft").load(path)
      .writeStream.format("memory").queryName("graft_follow").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_follow").count() == 40, "initial snapshot streams first")

      GraftDelta.toDelta((100 until 110).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
        path, mode = "append")
      q.processAllAvailable()
      assert(spark.table("graft_follow").count() == 50)

      // OPTIMIZE rewrites carry dataChange=false: nothing re-streams
      val (before, after) = DeltaMaintenance.compact(spark, path)
      assert(after < before)
      GraftDelta.toDelta(Seq((999L, "last")).toDF("id", "v"), path, mode = "append")
      q.processAllAvailable()
      assert(spark.table("graft_follow").count() == 51,
        "compaction must not duplicate rows into the stream")
      assert(spark.table("graft_follow").as[(Long, String)].collect().toSet
        .contains((999L, "last")))
    } finally q.stop()
  }

  test("column-mapped tables stream: logical schema, appends + DV deletes + cdc feed") {
    import spark.implicits._
    val path = tmp("mapped")
    GraftDelta.toDelta((0 until 20).map(i => (i.toLong, s"v$i")).toDF("k", "v"), path)
    GraftDelta.enableColumnMapping(spark, path)
    GraftDelta.renameColumn(spark, path, "k", "id")
    GraftDelta.toDelta(Seq((100L, "new"), (102L, "keep")).toDF("id", "v").coalesce(1),
      path, mode = "append")

    // plain append-mode stream surfaces the LOGICAL schema
    val q = spark.readStream.format("graft").load(path)
      .writeStream.format("memory").queryName("graft_mapped").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("graft_mapped")
      assert(got.columns.toSeq == Seq("id", "v"), got.columns.toSeq.toString)
      assert(got.count() == 22)
      GraftDelta.toDelta(Seq((101L, "more")).toDF("id", "v"), path, mode = "append")
      q.processAllAvailable()
      assert(spark.table("graft_mapped").count() == 23)
    } finally q.stop()

    // DV delete, then an ignoreChanges re-subscription: the re-emitted
    // DV-carrying add applies its bitmap through the MAPPED scan — the
    // soft-deleted row never streams
    GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("id", "==", 100L))))
    val dvV = graft.delta.DeltaLog.forTable(spark, path).latestVersion
    // subscribe AT the DV commit: only the re-emitted DV-carrying add
    // streams, and its bitmap applies through the mapped scan
    val q1 = spark.readStream.format("graft")
      .option("ignoreChanges", "true")
      .option("startingVersion", dvV.toString).load(path)
      .writeStream.format("memory").queryName("graft_mapped_dv").outputMode("append").start()
    try {
      q1.processAllAvailable()
      val ids = spark.table("graft_mapped_dv").select($"id").as[Long].collect()
      assert(ids.toSet == Set(102L),
        s"only the file's surviving row re-emits through the mapped scan: ${ids.toSeq}")
    } finally q1.stop()

    // changeFeed mode: per-row deletes through the mapped DV-diff scan
    val q2 = spark.readStream.format("graft")
      .option("changeFeed", "true").option("startingVersion", "4").load(path)
      .writeStream.format("memory").queryName("graft_mapped_cdc").outputMode("append").start()
    try {
      q2.processAllAvailable()
      val feed = spark.table("graft_mapped_cdc")
        .select($"id", $"_change_type").as[(Long, String)].collect().toSet
      assert(feed == Set((101L, "insert"), (100L, "delete")), feed.toString)
    } finally q2.stop()
  }

  test("startingVersion=latest emits only post-subscription commits") {
    import spark.implicits._
    val path = tmp("latest")
    GraftDelta.toDelta((0 until 20).map(i => (i.toLong, "old")).toDF("id", "v"), path)
    val q = spark.readStream.format("graft").option("startingVersion", "latest").load(path)
      .writeStream.format("memory").queryName("graft_latest").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_latest").count() == 0)
      GraftDelta.toDelta(Seq((1000L, "new")).toDF("id", "v"), path, mode = "append")
      q.processAllAvailable()
      assert(spark.table("graft_latest").as[(Long, String)].collect().toSeq ==
        Seq((1000L, "new")))
    } finally q.stop()
  }

  test("startingTimestamp begins at the first commit at/after the bound (ICT clock)") {
    import spark.implicits._
    val path = tmp("ts")
    GraftDelta.toDelta((0 until 5).map(i => (i.toLong, "v0")).toDF("id", "v"), path,
      configuration = Map("delta.enableInCommitTimestamps" -> "true"))    // v0
    Thread.sleep(15)
    GraftDelta.toDelta(Seq((100L, "v1")).toDF("id", "v"), path, mode = "append") // v1
    Thread.sleep(15)
    GraftDelta.toDelta(Seq((200L, "v2")).toDF("id", "v"), path, mode = "append") // v2
    val ictV1 = graft.delta.DeltaLog.forTable(spark, path)
      .commitInfoOf(1L).get.inCommitTimestamp.get
    val q = spark.readStream.format("graft")
      .option("startingTimestamp",
        java.time.Instant.ofEpochMilli(ictV1).toString)
      .load(path)
      .writeStream.format("memory").queryName("graft_ts").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_ts").as[(Long, String)].collect().toSet ==
        Set((100L, "v1"), (200L, "v2")))
    } finally q.stop()
    // both options together refuse (surfaced through the stream thread)
    val e = intercept[StreamingQueryException] {
      val q2 = spark.readStream.format("graft")
        .option("startingVersion", "0").option("startingTimestamp", "2020-01-01")
        .load(path)
        .writeStream.format("memory").queryName("graft_ts2").start()
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(e.getCause.getMessage.contains("not both"), e.getCause.getMessage)
  }

  test("a data-changing remove fails the stream unless ignoreChanges=true") {
    import spark.implicits._
    val path = tmp("chg")
    GraftDelta.toDelta((0 until 30).map(i => (i.toLong, "a")).toDF("id", "v"), path)

    val q = spark.readStream.format("graft").load(path)
      .writeStream.format("memory").queryName("graft_strict").outputMode("append").start()
    try {
      q.processAllAvailable()
      GraftDelta.deleteWhere(spark, path, Seq(Seq(Predicate("id", "<", 10))))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getCause.getMessage.contains("ignoreChanges"),
        s"unexpected failure: ${e.getCause}")
    } finally q.stop()

    // tolerant mode: the rewrite's add side re-emits (documented contract)
    val q2 = spark.readStream.format("graft").option("ignoreChanges", "true").load(path)
      .writeStream.format("memory").queryName("graft_tolerant").outputMode("append").start()
    try {
      q2.processAllAvailable()
      GraftDelta.updateWhere(spark, path,
        Seq(Seq(Predicate("id", "==", 15L))),
        Map("v" -> org.apache.spark.sql.functions.lit("upd")))
      q2.processAllAvailable()
      val got = spark.table("graft_tolerant").as[(Long, String)].collect()
      assert(got.contains((15L, "upd")), "rewritten rows must arrive in tolerant mode")
    } finally q2.stop()
  }

  test("DV delete commits stream like change commits and never leak deleted rows") {
    import spark.implicits._
    val path = tmp("dv")
    GraftDelta.toDelta((0 until 30).map(i => (i.toLong, "a")).toDF("id", "v"), path)

    // default: a DV delete is a data-changing commit → fail loudly
    val q = spark.readStream.format("graft").load(path)
      .writeStream.format("memory").queryName("graft_dv_strict").outputMode("append").start()
    try {
      q.processAllAvailable()
      GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("id", "<", 5))))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getCause.getMessage.contains("ignoreChanges"), s"${e.getCause}")
    } finally q.stop()

    // ignoreChanges + startingVersion=latest: the commit's re-emitted
    // DV'd file arrives WITHOUT its soft-deleted rows (old and new alike)
    val q2 = spark.readStream.format("graft")
      .option("ignoreChanges", "true").option("startingVersion", "latest").load(path)
      .writeStream.format("memory").queryName("graft_dv_tolerant").outputMode("append").start()
    try {
      q2.processAllAvailable() // nothing yet — subscribed at latest
      GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("id", "==", 10L))))
      q2.processAllAvailable() // re-emit of the re-DV'd file(s)
      val ids = spark.table("graft_dv_tolerant").as[(Long, String)].collect().map(_._1)
      assert(ids.nonEmpty, "the DV'd file must re-emit under ignoreChanges")
      assert(!ids.contains(10L),
        s"row 10 (deleted in this commit) must not stream: ${ids.sorted.toSeq}")
      assert(ids.forall(_ >= 5L),
        s"rows deleted by the EARLIER DV must stay deleted in the union: ${ids.sorted.toSeq}")
    } finally q2.stop()
  }

  test("skipChangeCommits skips rewrite commits wholesale, appends still stream") {
    import spark.implicits._
    val path = tmp("skipchg")
    GraftDelta.toDelta((0 until 30).map(i => (i.toLong, "a")).toDF("id", "v"), path)
    val q = spark.readStream.format("graft").option("skipChangeCommits", "true").load(path)
      .writeStream.format("memory").queryName("graft_skip").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_skip").count() == 30)
      // a rewrite commit contributes NOTHING (not even its adds)…
      GraftDelta.updateWhere(spark, path,
        Seq(Seq(Predicate("id", "<", 10L))),
        Map("v" -> org.apache.spark.sql.functions.lit("upd")))
      q.processAllAvailable()
      assert(spark.table("graft_skip").count() == 30,
        "a rewrite commit must not re-emit rows under skipChangeCommits")
      // …while a later plain append streams normally
      GraftDelta.toDelta(Seq((1000L, "new")).toDF("id", "v"), path, mode = "append")
      q.processAllAvailable()
      val got = spark.table("graft_skip").as[(Long, String)].collect()
      assert(got.contains((1000L, "new")) && got.length == 31)
    } finally q.stop()
  }

  test("a mid-stream schema change fails the stream with a restart-required error") {
    import spark.implicits._
    val path = tmp("schema")
    GraftDelta.toDelta((0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"), path)
    val q = spark.readStream.format("graft").load(path)
      .writeStream.format("memory").queryName("graft_schema").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_schema").count() == 10)
      // widen the table under the running stream: new files carry a column
      // the stale source schema would silently drop
      GraftDelta.toDelta(Seq((100L, "w", 3.5)).toDF("id", "v", "extra"),
        path, mode = "append", mergeSchema = true)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getCause.getMessage.contains("Restart the stream"),
        s"unexpected failure: ${e.getCause}")
    } finally q.stop()

    // a restarted stream picks up the widened schema
    val q2 = spark.readStream.format("graft").load(path)
      .writeStream.format("memory").queryName("graft_schema2").outputMode("append").start()
    try {
      q2.processAllAvailable()
      val t = spark.table("graft_schema2")
      assert(t.columns.toSeq == Seq("id", "v", "extra"))
      assert(t.count() == 11)
    } finally q2.stop()
  }

  test("checkpoint recovery resumes at the committed version without replay") {
    import spark.implicits._
    val path = tmp("ckpt")
    val ckpt = tmp("ckptdir")
    GraftDelta.toDelta((0 until 25).map(i => (i.toLong, "a")).toDF("id", "v"), path)

    val sinkPath = tmp("sink")
    def start() = spark.readStream.format("graft").load(path)
      .writeStream.format("graft").option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        DeltaSink.addBatch(df, sinkPath, "ss-spec", id): Unit
      }.start()

    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(GraftDelta.readDelta(spark, sinkPath).count() == 25)

    GraftDelta.toDelta((100 until 105).map(i => (i.toLong, "b")).toDF("id", "v"),
      path, mode = "append")
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val rows = GraftDelta.readDelta(spark, sinkPath).as[(Long, String)].collect()
    assert(rows.length == 30, s"restart must not replay: ${rows.length} rows")
    assert(rows.count(_._2 == "b") == 5)
  }

  test("maxVersionsPerTrigger paces the backfill one commit per batch") {
    import spark.implicits._
    val path = tmp("pace")
    (0 until 4).foreach { i =>
      GraftDelta.toDelta(Seq((i.toLong, s"c$i")).toDF("id", "v"), path,
        mode = if (i == 0) "error" else "append")
    }
    var batches = 0
    val q = spark.readStream.format("graft").option("maxVersionsPerTrigger", "1").load(path)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (df.count() > 0) batches += 1: Unit
      }.start()
    try {
      q.processAllAvailable()
      assert(batches == 4, s"expected 4 single-commit batches, got $batches")
    } finally q.stop()
  }

  test("maxFilesPerTrigger splits an oversized commit; no row lost or duplicated") {
    import spark.implicits._
    val path = tmp("fpace")
    // one commit with 6 files, then a 2-file append
    GraftDelta.toDelta((1L to 12L).toDF("id").repartition(6), path)
    GraftDelta.toDelta((13L to 16L).toDF("id").repartition(2), path, mode = "append")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft").option("maxFilesPerTrigger", "2").load(path)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select("id").as[Long].collect()
        if (rows.nonEmpty) { sizes += rows.length.toLong; seen ++= rows }: Unit
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.sorted.toSeq == (1L to 16L), s"rows lost/duplicated: ${seen.sorted}")
      // 8 files at ≤2 per trigger → at least 4 batches; the 6-file commit split
      assert(sizes.length >= 4, s"expected the commit to split: batches=$sizes")
    } finally q.stop()
  }

  test("maxBytesPerTrigger budgets on file sizes; an oversized file still admits") {
    import spark.implicits._
    val path = tmp("bpace")
    GraftDelta.toDelta((1L to 12L).toDF("id").repartition(6), path)
    // budget of 1 byte: every file is oversized, so each batch admits
    // exactly one file — progress is guaranteed, nothing is lost
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft").option("maxBytesPerTrigger", "1").load(path)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select("id").as[Long].collect()
        if (rows.nonEmpty) { sizes += rows.length.toLong; seen ++= rows }: Unit
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.sorted.toSeq == (1L to 12L), s"rows lost/duplicated: ${seen.sorted}")
      assert(sizes.length == 6, s"expected one file per batch: $sizes")
    } finally q.stop()
  }

  test("availableNow drains to the subscription head in paced batches, then stops") {
    import spark.implicits._
    val path = tmp("anow")
    (0 until 3).foreach { i =>
      GraftDelta.toDelta(Seq((i.toLong, s"c$i")).toDF("id", "v"), path,
        mode = if (i == 0) "error" else "append")
    }
    var batches = 0
    val q = spark.readStream.format("graft")
      .option("availableNow", "true").option("maxVersionsPerTrigger", "1").load(path)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (df.count() > 0) batches += 1: Unit
      }.start()
    try {
      q.processAllAvailable()
      assert(batches == 3, s"expected 3 paced single-commit batches, got $batches")
      // a commit landing AFTER subscription is never served: the backfill
      // is bounded at the subscription-time head
      GraftDelta.toDelta(Seq((99L, "late")).toDF("id", "v"), path, mode = "append")
      q.processAllAvailable()
      assert(batches == 3, s"post-subscription commit leaked into the backfill")
    } finally q.stop()
  }

  test("availableNow restart from checkpoint serves exactly the new commits") {
    import spark.implicits._
    val path = tmp("anowck")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_anow_ck").toString
    GraftDelta.toDelta((1L to 6L).toDF("id").repartition(3), path)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("availableNow", "true").option("maxFilesPerTrigger", "1").load(path)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen ++= df.select("id").as[Long].collect(): Unit
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(seen.sorted.toSeq == (1L to 6L), s"first drain incomplete: ${seen.sorted}")
    // each restart re-subscribes at the CURRENT head: the second drain
    // picks up exactly what landed since the checkpointed offset
    GraftDelta.toDelta((7L to 8L).toDF("id"), path, mode = "append")
    drain()
    assert(seen.sorted.toSeq == (1L to 8L),
      s"restart replayed or dropped rows: ${seen.sorted}")
  }

  test("admission-control size cache evicts fully-served commits") {
    import spark.implicits._
    val path = tmp("evict")
    (0 until 4).foreach { i =>
      GraftDelta.toDelta(Seq((i.toLong, s"c$i")).toDF("id", "v"), path,
        mode = if (i == 0) "error" else "append")
    }
    val src = new GraftStreamSource(spark.sqlContext, path,
      Map("maxFilesPerTrigger" -> "1"))
    try {
      var last: Option[org.apache.spark.sql.execution.streaming.Offset] = None
      var guard = 0
      var next = src.getOffset
      while (next.isDefined && guard < 20) {
        src.getBatch(last, next.get)
        last = next
        next = src.getOffset
        guard += 1
      }
      assert(guard == 4, s"expected 4 single-file batches, got $guard")
      // every commit the walk memoized has been served and evicted; a
      // long-running stream's cache stays bounded by the in-flight window
      assert(src.eligibleSizesCache.isEmpty,
        s"stale size-cache entries: ${src.eligibleSizesCache.keys.toSeq.sorted}")
    } finally src.stop()
  }

  test("mid-commit offsets survive checkpoint recovery") {
    import spark.implicits._
    val path = tmp("frec")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_frec_ck").toString
    GraftDelta.toDelta((1L to 12L).toDF("id").repartition(6), path)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft").option("maxFilesPerTrigger", "2").load(path)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen ++= df.select("id").as[Long].collect(): Unit
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val afterFirst = seen.sorted.toSeq
    assert(afterFirst == (1L to 12L), s"first run incomplete: $afterFirst")
    // append more and restart from the checkpoint: only the new rows arrive
    GraftDelta.toDelta((13L to 14L).toDF("id"), path, mode = "append")
    run()
    assert(seen.sorted.toSeq == (1L to 14L),
      s"recovery replayed or dropped rows: ${seen.sorted}")
  }

  test("changeFeed stream names the error when DROP FEATURE truncates under it") {
    import spark.implicits._
    val path = tmp("cdftrunc")
    GraftDelta.toDelta((0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartitionByRange(2, $"id"), path)                               // v0
    GraftDelta.enableChangeDataFeed(spark, path)                         // v1
    val ckpt = Files.createTempDirectory("graft_cdf_ck").toString
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    // foreachBatch (not the memory sink — it refuses checkpoint recovery)
    def subscribe() = spark.readStream.format("graft")
      .option("changeFeed", "true").load(path)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.addAndGet(b.count()): Unit)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q = subscribe()
    try {
      q.processAllAvailable()
      assert(seen.get() == 20, s"backfill streams: ${seen.get()}")
    } finally q.stop()
    // history truncates underneath the checkpointed offset: DV lifecycle
    // ending in DROP FEATURE … TRUNCATE HISTORY
    GraftDelta.deleteWhereWithDv(spark, path, Seq(Seq(Predicate("id", "<=", 5L)))) // v2
    DeltaMaintenance.reorgPurge(spark, path)                             // v3
    graft.delta.DeltaTableOps.dropFeature(spark, path, "deletionVectors",
      truncateHistory = true)                                            // v4, log truncated
    val q2 = subscribe()
    val ex = intercept[Exception] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("predates the retained log")),
      s"must fail with the NAMED truncation error, not a raw file error: " +
        messages(ex).mkString(" | "))
  }
}
