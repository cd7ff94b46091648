package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table-maintenance surface: history + vacuum
  * (reference core.py:88-151, 268-324). */
object DeltaTableOps {

  /** The reference's fixed 9-column history projection (core.py:99-107),
    * commitInfo of every commit, timestamp-descending, optional limit.
    * Returns a real (small) DataFrame. */
  def history(spark: SparkSession, path: String, limit: Option[Int] = None): DataFrame = {
    val log = DeltaLog.forTable(spark, path)
    if (!log.fs.exists(new Path(path)))
      throw new IllegalArgumentException(s"Path does not exist: $path")
    historyOf(log, limit)
  }

  /** History over an existing log handle (limit pushed down: only the
    * newest n commit files are parsed — pinned by GoldenReadSpec). */
  def historyOf(log: DeltaLog, limit: Option[Int]): DataFrame = {
    val spark = log.spark
    val rows = log.commitInfos(limit).map { case (v, ciOpt) =>
      // commits without commitInfo use the same file-mtime fallback clock
      // as time travel, so the two surfaces order identically
      val ci = ciOpt.getOrElse(CommitInfo(log.commitFallbackTimestamp(v), ""))
      Row(
        new java.sql.Timestamp(ci.timestamp),
        ci.operation,
        ci.operationParameters.get("mode").orNull,
        ci.operationMetrics.get("numFiles").orNull,
        ci.operationMetrics.get("numOutputBytes").orNull,
        ci.operationMetrics.get("numOutputRows").orNull,
        ci.operationParameters.get("partitionBy").orNull,
        ci.readVersion.map(Long.box).orNull,
        ci.isBlindAppend.map(Boolean.box).orNull,
        v
      )
    }
    val schema = StructType(Seq(
      StructField("timestamp", TimestampType),
      StructField("operation", StringType),
      StructField("operationParameters_mode", StringType),
      StructField("operationMetrics_numFiles", StringType),
      StructField("operationMetrics_numOutputBytes", StringType),
      StructField("operationMetrics_numOutputRows", StringType),
      StructField("operationParameters_partitionBy", StringType),
      StructField("readVersion", LongType),
      StructField("isBlindAppend", BooleanType),
      StructField("version", LongType)
    ))
    val df = spark
      .createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy(desc("timestamp"), desc("version"))
    limit.map(df.limit).getOrElse(df)
  }

  /** Tombstoned file paths older than the retention window
    * (reference core.py:121-151). dryRun returns the list; otherwise the
    * deletes fan out as a Spark job when the list is large (the
    * reference's delayed-per-file pattern), driver-side below a threshold.
    */
  def vacuum(
      spark: SparkSession,
      path: String,
      retentionHours: Double = 168.0,
      dryRun: Boolean = true,
      distributedDeleteThreshold: Int = 1000
  ): Seq[String] = {
    val log = DeltaLog.forTable(spark, path)
    val snap = log.snapshot(None)
    val cutoff = System.currentTimeMillis() - (retentionHours * 3600 * 1000).toLong
    val tombstones = snap.tombstones
      .filter(_.deletionTimestamp.forall(_ < cutoff))
      .map(_.path)
    if (!dryRun && tombstones.nonEmpty) {
      val tablePath = path
      if (tombstones.size <= distributedDeleteThreshold) {
        val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
        tombstones.foreach(p => fs.delete(new Path(DeltaRead.resolvePath(tablePath, p)), false))
      } else {
        // 100 TB path: distribute deletes across executors.
        val confBc = spark.sparkContext.broadcast(
          new org.apache.spark.util.SerializableConfiguration(
            spark.sessionState.newHadoopConf()))
        spark.sparkContext
          .parallelize(tombstones, math.min(64, 1 + tombstones.size / 1000))
          .foreachPartition { it =>
            val conf = confBc.value.value
            it.foreach { p =>
              val hp = new Path(DeltaRead.resolvePath(tablePath, p))
              hp.getFileSystem(conf).delete(hp, false)
            }
          }
      }
    }
    tombstones
  }
}
