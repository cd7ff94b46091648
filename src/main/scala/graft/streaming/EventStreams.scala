package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
final case class UserSession(
    user_id: Long,
    session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp,
    n_events: Long)

private final case class SessionState(startMs: Long, endMs: Long, n: Long)

/** Structured-Streaming operators over event streams: watermarked
  * windowed aggregation and gap-based sessionization with custom state.
  *
  * Both take a streaming OR batch DataFrame — the transformations are
  * plan-level, so the same code serves `readStream` (incremental,
  * state-store-backed at scale) and batch backfills. State is per-key in
  * the executor state store; nothing accumulates on the driver.
  */
object EventStreams {

  /** Tumbling-window counts per event type with a watermark bounding
    * state: classic `readStream → window agg → writeStream` shape. */
  def hourlyTypeCounts(
      events: DataFrame, tsCol: String, typeCol: String,
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 hour"), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .select(
        col(s"window.start").as("hour_start"),
        col(typeCol),
        col("n"))

  /** Streaming exactly-once event dedup: at-least-once sources (Kafka
    * retries, replayed log tails) deliver duplicates; dropDuplicates over
    * the id WITH a watermark bounds the dedup state store — without the
    * watermark the state grows forever. Ids older than the watermark can
    * recur (documented trade-off: state is bounded by the delay window,
    * the same contract as Spark's own streaming dedup). Batch frames get
    * plain exact dedup semantics from the identical plan. */
  def dedupEvents(
      events: DataFrame, idCols: Seq[String], tsCol: String,
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicates(idCols :+ tsCol)

  /** Watermarked stream-stream interval join: each left event matched
    * with the same key's right events whose timestamp falls in
    * [left_ts, left_ts + `withinSeconds`] — attribution joins (click →
    * purchase within the hour) as a genuine stream-stream inner join.
    *
    * Both sides carry watermarks and the join condition carries the time
    * bound, so Spark can EVICT state: a buffered left row is droppable
    * once the right watermark passes left_ts + withinSeconds, and vice
    * versa — without the bound the state store grows forever (the
    * documented stream-stream-join requirement). Column names are taken
    * from the frames; the key columns must match by name. Batch frames
    * get the identical plan as an ordinary range-predicate join. */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String,
      withinSeconds: Long,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right.withWatermark(rightTsCol, watermarkDelay)
    val keyEq = keyCols.map(k => l(k) === r(k)).reduce(_ && _)
    val bound = r(rightTsCol) >= l(leftTsCol) &&
      r(rightTsCol) <= l(leftTsCol) + expr(s"INTERVAL $withinSeconds SECONDS")
    val joined = l.join(r, keyEq && bound, "inner")
    // drop the right side's duplicated key columns
    keyCols.foldLeft(joined)((d, k) => d.drop(r(k)))
  }

  /** Gap-based sessionization via flatMapGroupsWithState: a session ends
    * when no event arrives within `gapMinutes` (event time). Emits one
    * row per closed session; open sessions flush on event-time timeout. */
  /** Stream-static enrichment join: each micro-batch of the stream hash-
    * joins a broadcast of the (small-by-contract) static dimension frame
    * — no streaming state at all, unlike stream-stream joins; the dim is
    * re-resolved per batch, so a Delta-backed dim picks up new versions
    * between triggers. Left outer keeps stream rows with no dim match
    * (enrichment must never drop events). */
  def enrichWithStatic(
      stream: DataFrame, dim: DataFrame, keyCols: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keyCols, "left_outer")

  def sessionize(
      events: Dataset[SessionEvent],
      gapMinutes: Int = 30,
      watermarkDelay: String = "2 hours"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(
        userId: Long,
        it: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[UserSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(UserSession(userId,
          new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n))
      }
      val times = it.map(_.ts.getTime).toSeq.sorted
      var closed = List.empty[UserSession]
      var cur = state.getOption
      times.foreach { t =>
        cur match {
          case Some(s) if t - s.endMs <= gapMs =>
            cur = Some(s.copy(endMs = math.max(s.endMs, t), n = s.n + 1))
          case Some(s) =>
            closed ::= UserSession(userId,
              new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close the open session once the event-time watermark passes its gap
        state.setTimeoutTimestamp(s.endMs + gapMs)
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
