package graft.delta

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Public API of the engine — the four entry points the reference exports
  * from dask_deltalake/__init__.py:1-2 (`read_delta`, `read_delta_history`,
  * `vacuum`, `to_delta`), re-expressed Spark-first. Everything returns or
  * accepts plain DataFrames so the whole Spark relational surface
  * (joins/aggs/windows/functions — SURVEY.md §2 ⑮) composes for free.
  */
object GraftDelta {

  /** read_delta (reference core.py:158-265). */
  def readDelta(
      spark: SparkSession,
      path: String,
      version: Option[Long] = None,
      timestamp: Option[String] = None,
      columns: Seq[String] = Nil,
      filters: Seq[Seq[Predicate]] = Nil
  ): DataFrame = DeltaRead.load(spark, path, version, timestamp, columns, filters)

  /** to_delta (reference writer.py:134-313). */
  def toDelta(
      df: DataFrame,
      path: String,
      mode: String = "error",
      partitionBy: Seq[String] = Nil,
      overwriteSchema: Boolean = false,
      mergeSchema: Boolean = false,
      name: Option[String] = None,
      description: Option[String] = None,
      configuration: Map[String, String] = Map.empty,
      checkpointInterval: Int = 10,
      txn: Option[SetTransaction] = None,
      replaceWhere: Seq[Seq[Predicate]] = Nil
  ): Unit = DeltaWrite.write(df, path, mode, partitionBy, overwriteSchema, mergeSchema,
    name, description, configuration, checkpointInterval, txn, replaceWhere)

  /** read_delta_history (reference core.py:268-293). */
  def readDeltaHistory(spark: SparkSession, path: String, limit: Option[Int] = None): DataFrame =
    DeltaTableOps.history(spark, path, limit)

  /** DELETE FROM … WHERE (beyond the reference's surface; DeltaDml). */
  def deleteWhere(
      spark: SparkSession,
      path: String,
      filters: Seq[Seq[Predicate]]
  ): DeltaDml.DmlResult = DeltaDml.delete(spark, path, filters)

  /** DELETE via deletion vectors: soft-delete bitmap instead of a file
    * rewrite (beyond the reference's surface; DeltaDml). */
  def deleteWhereWithDv(
      spark: SparkSession,
      path: String,
      filters: Seq[Seq[Predicate]]
  ): DeltaDml.DmlResult = DeltaDml.deleteWithDv(spark, path, filters)

  /** UPDATE via deletion vectors: DV the old rows, append only the
    * updated ones (beyond the reference's surface; DeltaDml). */
  def updateWhereWithDv(
      spark: SparkSession,
      path: String,
      filters: Seq[Seq[Predicate]],
      set: Map[String, org.apache.spark.sql.Column]
  ): DeltaDml.DmlResult = DeltaDml.updateWithDv(spark, path, filters, set)

  /** UPDATE … SET … WHERE (beyond the reference's surface; DeltaDml). */
  def updateWhere(
      spark: SparkSession,
      path: String,
      filters: Seq[Seq[Predicate]],
      set: Map[String, org.apache.spark.sql.Column]
  ): DeltaDml.DmlResult = DeltaDml.update(spark, path, filters, set)

  /** MERGE INTO … USING … ON (beyond the reference's surface; DeltaDml). */
  def mergeInto(
      spark: SparkSession,
      path: String,
      source: DataFrame,
      on: Seq[String],
      whenMatched: DeltaDml.WhenMatched = DeltaDml.WhenMatched.UpdateAll,
      insertNotMatched: Boolean = true
  ): DeltaDml.MergeResult =
    DeltaDml.merge(spark, path, source, on, whenMatched, insertNotMatched)

  /** RESTORE TABLE … TO VERSION (beyond the reference's surface). */
  def restore(spark: SparkSession, path: String, toVersion: Long): DeltaTableOps.RestoreResult =
    DeltaTableOps.restore(spark, path, toVersion)

  /** SHALLOW CLONE — metadata-only table fork (beyond the reference's
    * surface). */
  def shallowClone(
      spark: SparkSession, sourcePath: String, targetPath: String,
      version: Option[Long] = None,
      replace: Boolean = false): DeltaTableOps.CloneResult =
    DeltaTableOps.shallowClone(spark, sourcePath, targetPath, version, replace)

  /** DEEP CLONE: independent physical copy (data + DV files copied). */
  def deepClone(
      spark: SparkSession, sourcePath: String, targetPath: String,
      version: Option[Long] = None,
      replace: Boolean = false): DeltaTableOps.CloneResult =
    DeltaTableOps.deepClone(spark, sourcePath, targetPath, version, replace)

  /** ALTER TABLE … ADD CONSTRAINT … CHECK (beyond the reference's
    * surface; writer protocol v3). */
  def addCheckConstraint(
      spark: SparkSession, path: String, name: String,
      exprSql: String): DeltaTableOps.ConstraintResult =
    DeltaTableOps.addCheckConstraint(spark, path, name, exprSql)

  /** ALTER TABLE … DROP CONSTRAINT. */
  def dropConstraint(
      spark: SparkSession, path: String, name: String): DeltaTableOps.ConstraintResult =
    DeltaTableOps.dropConstraint(spark, path, name)

  /** Enable column mapping (mode `name`) — the metadata-only upgrade
    * that makes RENAME/DROP COLUMN legal. */
  def enableColumnMapping(spark: SparkSession, path: String): DeltaTableOps.MappingResult =
    DeltaTableOps.enableColumnMapping(spark, path)

  /** ALTER TABLE … RENAME COLUMN (requires column mapping). */
  def renameColumn(spark: SparkSession, path: String, oldName: String,
      newName: String): DeltaTableOps.MappingResult =
    DeltaTableOps.renameColumn(spark, path, oldName, newName)

  /** Type widening (ALTER COLUMN … TYPE): metadata-only; old files keep
    * their narrow physical type, the scan widens them. */
  def widenColumnType(spark: SparkSession, path: String, column: String,
      newType: org.apache.spark.sql.types.DataType): Long =
    DeltaTableOps.widenColumnType(spark, path, column, newType)

  /** Liquid clustering: store clustering columns (metadata-only) so
    * OPTIMIZE lays data out by them; Nil removes the spec. */
  def clusterBy(spark: SparkSession, path: String, columns: Seq[String]): Long =
    DeltaTableOps.clusterBy(spark, path, columns)

  /** ALTER TABLE … ADD COLUMN — metadata-only; pre-existing files
    * surface the new column as null. */
  def addColumn(spark: SparkSession, path: String, name: String,
      dataType: org.apache.spark.sql.types.DataType,
      after: Option[String] = None, first: Boolean = false): DeltaTableOps.MappingResult =
    DeltaTableOps.addColumn(spark, path, name, dataType, after, first)

  /** ALTER TABLE … DROP COLUMN (requires column mapping). */
  def dropColumn(spark: SparkSession, path: String,
      name: String): DeltaTableOps.MappingResult =
    DeltaTableOps.dropColumn(spark, path, name)

  /** CONVERT TO DELTA — adopt a plain-parquet directory in place (beyond
    * the reference's surface). */
  def convertToDelta(spark: SparkSession, path: String): DeltaTableOps.ConvertResult =
    DeltaTableOps.convertToDelta(spark, path)

  /** ALTER TABLE … SET TBLPROPERTIES (delta.enableChangeDataFeed=true):
    * subsequent row-removing writes record exact per-row changes as
    * `cdc` actions, served by [[tableChanges]]. Returns the commit
    * version (beyond the reference's surface). */
  def enableInCommitTimestamps(spark: SparkSession, path: String): Long =
    DeltaTableOps.enableInCommitTimestamps(spark, path)

  def enableRowTracking(spark: SparkSession, path: String): Long =
    RowTracking.enable(spark, path)

  /** DESCRIBE DETAIL — one-row table summary from the log alone. */
  def tableDetail(spark: SparkSession, path: String): DataFrame =
    DeltaTableOps.tableDetail(spark, path)

  /** Snapshot read with `_row_id`/`_row_commit_version` columns. */
  def readDeltaWithRowIds(spark: SparkSession, path: String): DataFrame =
    RowTracking.readWithRowIds(spark, path)

  def enableChangeDataFeed(spark: SparkSession, path: String): Long =
    DeltaTableOps.enableChangeDataFeed(spark, path)

  /** Batch change feed: per-row changes in versions (from, to], stamped
    * with `_change_type` and `_commit_version`. Commits carrying `cdc`
    * actions (CDF-enabled writers) serve exact insert / delete /
    * update_preimage / update_postimage rows; cdc-less commits fall back
    * to adds-as-inserts + DV-diffs-as-deletes (beyond the reference's
    * surface). */
  def tableChanges(
      spark: SparkSession, path: String, fromVersion: Long,
      toVersion: Option[Long] = None): DataFrame =
    DeltaTableOps.tableChanges(spark, path, fromVersion, toVersion)

  def tableChangesByTimestamp(
      spark: SparkSession, path: String, startingTs: Long,
      endingTs: Option[Long] = None): DataFrame =
    DeltaTableOps.tableChangesByTimestamp(spark, path, startingTs, endingTs)

  /** vacuum (reference core.py:296-324). `includeOrphans` adds the
    * delta-spark directory-listing mode (crashed-write debris past
    * retention; beyond the reference's tombstone-only surface). */
  def vacuum(
      spark: SparkSession,
      path: String,
      retentionHours: Double = 168.0,
      dryRun: Boolean = true,
      includeOrphans: Boolean = false
  ): Seq[String] = DeltaTableOps.vacuum(spark, path, retentionHours, dryRun,
    includeOrphans = includeOrphans)

  /** Log-retention cleanup — the `_delta_log` twin of vacuum (delta's
    * logRetentionDuration; beyond the reference's surface). */
  def cleanupLog(
      spark: SparkSession,
      path: String,
      retentionHours: Double = 720.0,
      dryRun: Boolean = true
  ): Seq[String] = DeltaMaintenance.cleanupLog(spark, path, retentionHours, dryRun)
}
