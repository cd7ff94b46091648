package graft.streaming

import graft.delta.{GraftDelta, TestBase}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("watermarked hourly counts over a micro-batched stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = EventStreams.hourlyTypeCounts(mem.toDF(), "ts", "event_type")
    val q = out.writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    try {
      mem.addData(
        SessionEvent(1, ts(0), "click"), SessionEvent(1, ts(10), "click"),
        SessionEvent(2, ts(20), "view"), SessionEvent(1, ts(70), "click"))
      q.processAllAvailable()
      // advance watermark far enough to close the first hour's windows
      mem.addData(SessionEvent(9, ts(60 * 5), "click"))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select($"hour_start", $"event_type", $"n").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L)))
      assert(rows.contains(("2024-01-01 10:00:00.0", "view", 1L)))
      assert(rows.contains(("2024-01-01 11:00:00.0", "click", 1L)))
    } finally q.stop()
  }

  test("gap-based sessionization with event-time timeout state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 0,10 (one session), then 100 (new session)
      mem.addData(SessionEvent(1, ts(0), "a"), SessionEvent(1, ts(10), "a"))
      q.processAllAvailable()
      mem.addData(SessionEvent(1, ts(100), "a"))
      q.processAllAvailable()
      // push the watermark way forward so open sessions time out
      mem.addData(SessionEvent(2, ts(60 * 24), "a"))
      q.processAllAvailable()
      mem.addData(SessionEvent(3, ts(60 * 48), "a"))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[UserSession].collect()
        .filter(_.user_id == 1).sortBy(_.session_start.getTime)
      assert(sessions.length == 2)
      assert(sessions(0).n_events == 2)
      assert(sessions(0).session_start == ts(0) && sessions(0).session_end == ts(10))
      assert(sessions(1).n_events == 1 && sessions(1).session_start == ts(100))
    } finally q.stop()
  }

  test("delta log tail returns only newly added rows per pull") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_tail").toString + "/tbl"
    val mk = (from: Int, n: Int) =>
      (from until from + n).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    GraftDelta.toDelta(mk(0, 10), path)
    val b0 = DeltaTail.changesSince(spark, path, -1L)
    assert(b0.toVersion == 0 && b0.data.count() == 10)
    // no new commits -> empty batch, cursor unchanged
    val b1 = DeltaTail.changesSince(spark, path, b0.toVersion)
    assert(b1.toVersion == 0 && b1.data.count() == 0)
    GraftDelta.toDelta(mk(10, 5), path, mode = "append")
    GraftDelta.toDelta(mk(15, 5), path, mode = "append")
    val b2 = DeltaTail.changesSince(spark, path, b1.toVersion)
    assert(b2.toVersion == 2 && b2.data.count() == 10)
    assert(b2.data.agg(min($"id")).head().getLong(0) == 10)
    // follow() drains to the head and stops advancing
    var seen = 0L
    val cursor = DeltaTail.follow(spark, path, -1L, maxBatches = 3)(b => seen += b.data.count())
    assert(cursor == 2 && seen == 20)
  }

  test("streaming dedup drops replayed events within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val ded = EventStreams.dedupEvents(
      in.toDF().toDF("event_id", "ts_ms")
        .withColumn("ts", timestamp_millis($"ts_ms")),
      idCols = Seq("event_id"), tsCol = "ts")
    val q = ded.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData((1L, 1000L), (2L, 2000L), (1L, 1000L)) // dup in-batch
      q.processAllAvailable()
      in.addData((2L, 2000L), (3L, 3000L))              // dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("log tail skips OPTIMIZE rewrites (dataChange=false adds)") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_tail_opt").toString + "/tbl"
    val mk = (from: Int, n: Int) =>
      (from until from + n).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    GraftDelta.toDelta(mk(0, 20).repartition(8), path)
    val b0 = DeltaTail.changesSince(spark, path, -1L)
    assert(b0.data.count() == 20)
    // compaction rewrites every row into fewer files with dataChange=false;
    // a tail consumer must NOT re-ingest them as new rows
    graft.delta.DeltaMaintenance.compact(spark, path)
    val b1 = DeltaTail.changesSince(spark, path, b0.toVersion)
    assert(b1.toVersion > b0.toVersion, "compaction must commit a new version")
    assert(b1.data.count() == 0,
      s"OPTIMIZE rewrite re-ingested ${b1.data.count()} rows as changes")
    // genuine appends after the compaction still flow
    GraftDelta.toDelta(mk(20, 5), path, mode = "append")
    val b2 = DeltaTail.changesSince(spark, path, b1.toVersion)
    assert(b2.data.count() == 5)
  }

  test("stream-static enrichment broadcasts the dim and keeps unmatched events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[SessionEvent]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val out = EventStreams.enrichWithStatic(events.toDF(), dim, Seq("user_id"))
    val q = out.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      events.addData(
        SessionEvent(1, ts(0), "click"),
        SessionEvent(2, ts(1), "click"),
        SessionEvent(9, ts(2), "click")) // no dim row → kept, tier null
      q.processAllAvailable()
      val got = spark.table("enrich").select($"user_id", $"tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toSet
      assert(got == Set(1L -> Some("gold"), 2L -> Some("silver"), 9L -> None),
        s"got $got")
      // the per-batch join must be a broadcast hash join, never a shuffle
      val plans = q.recentProgress.flatMap(p => Option(p.sources)).nonEmpty
      assert(plans) // progress recorded; plan shape checked on the batch DF:
      val batchPlan = EventStreams.enrichWithStatic(
        Seq(SessionEvent(1, ts(0), "click")).toDF(), dim, Seq("user_id"))
        .queryExecution.executedPlan.toString
      assert(batchPlan.contains("BroadcastHashJoin"), s"plan:\n$batchPlan")
    } finally q.stop()
  }

  test("watermarked stream-stream interval join matches within the bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[SessionEvent]
    val buys = MemoryStream[SessionEvent]
    val joined = EventStreams.intervalJoin(
      clicks.toDF().select($"user_id", $"ts".as("click_ts")),
      buys.toDF().select($"user_id", $"ts".as("buy_ts")),
      Seq("user_id"), "click_ts", "buy_ts", withinSeconds = 3600)
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      clicks.addData(SessionEvent(1, ts(0), "click"), SessionEvent(2, ts(5), "click"))
      buys.addData(
        SessionEvent(1, ts(30), "buy"),    // within the hour → matches
        SessionEvent(2, ts(70), "buy"),    // 65 min after → outside bound
        SessionEvent(3, ts(10), "buy"))    // no click for user 3
      q.processAllAvailable()
      val got = spark.table("attr")
        .select($"user_id", $"click_ts", $"buy_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(got == Set((1L, ts(0), ts(30))), s"got $got")
      // a second click for user 2 inside the window of its buy matches on
      // the next micro-batch (state buffered both sides)
      clicks.addData(SessionEvent(2, ts(40), "click"))
      q.processAllAvailable()
      val got2 = spark.table("attr").count()
      assert(got2 == 2, s"buffered right row must match a later left row: $got2")
    } finally q.stop()
  }

  /** `writeStream.format("graft")` — the registered exactly-once sink:
    * table→table streaming pipe lands every upstream commit exactly
    * once, and a RESTART from the same checkpoint (same idempotency
    * appId) replays no batch twice. */
  test("format('graft') streaming sink: table-to-table pipe, idempotent restart") {
    import spark.implicits._
    val srcPath = java.nio.file.Files.createTempDirectory("graft_pipe_src").toString + "/t"
    val dstPath = java.nio.file.Files.createTempDirectory("graft_pipe_dst").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pipe_ck").toString
    GraftDelta.toDelta((1L to 10L).map(i => (i, s"a$i")).toDF("k", "v"), srcPath)
    def pipe() = spark.readStream.format("graft").load(srcPath)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(dstPath)
    val q = pipe()
    try {
      q.processAllAvailable()
      assert(GraftDelta.readDelta(spark, dstPath).count() == 10L)
      GraftDelta.toDelta((11L to 15L).map(i => (i, s"a$i")).toDF("k", "v"),
        srcPath, mode = "append")
      q.processAllAvailable()
      assert(GraftDelta.readDelta(spark, dstPath).count() == 15L)
    } finally q.stop()
    // restart from the same checkpoint: nothing re-lands, new commits do
    val q2 = pipe()
    try {
      q2.processAllAvailable()
      assert(GraftDelta.readDelta(spark, dstPath).count() == 15L,
        "restart must not double-append already-committed batches")
      GraftDelta.toDelta(Seq((16L, "a16")).toDF("k", "v"), srcPath, mode = "append")
      q2.processAllAvailable()
      val got = GraftDelta.readDelta(spark, dstPath).select("k").as[Long]
        .collect().toSet
      assert(got == (1L to 16L).toSet, s"got ${got.toSeq.sorted}")
    } finally q2.stop()
    // wrong mode refuses loudly
    val e = intercept[Exception] {
      spark.readStream.format("graft").load(srcPath)
        .groupBy($"v").count()
        .writeStream.format("graft")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_pipe_ck2").toString)
        .outputMode("complete")
        .start(java.nio.file.Files.createTempDirectory("graft_pipe_d2").toString + "/t")
    }
    assert(e.getMessage.contains("Append"), e.getMessage)
  }
}
