package graft.streaming

import graft.delta.{DeltaLog, GraftDelta, SetTransaction}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Exactly-once streaming append sink for Delta tables: each micro-batch
  * commits atomically WITH a `txn` action (appId = query id, version =
  * batch id). A replayed batch after failure/restart is detected from
  * the snapshot's SetTransaction state and skipped — the idempotent-
  * writer protocol delta-spark streaming sinks use (and the reason the
  * engine tracks txn through replay and checkpoints). */
object DeltaSink {

  /** Idempotent append of one micro-batch. Returns false if the batch
    * was already committed by a previous attempt (skipped). */
  def addBatch(
      batch: DataFrame, path: String, appId: String, batchId: Long,
      partitionBy: Seq[String] = Nil): Boolean = {
    val log = DeltaLog.forTable(batch.sparkSession, path)
    val exists = log.tableExists
    if (exists) {
      val last = log.snapshot(None).setTransactions.find(_.appId == appId)
      if (last.exists(_.version >= batchId)) return false
    }
    GraftDelta.toDelta(batch, path,
      mode = if (exists) "append" else "error",
      partitionBy = partitionBy,
      txn = Some(SetTransaction(appId, batchId, Some(System.currentTimeMillis()))))
    true
  }

  /** Attach the sink to a streaming DataFrame:
    * {{{ DeltaSink.writeStream(df, path, ckpt).start() }}} */
  def writeStream(
      stream: DataFrame, path: String, checkpointLocation: String,
      appId: String = "graft-sink",
      partitionBy: Seq[String] = Nil): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        addBatch(batch, path, appId, batchId, partitionBy); ()
      }
}
