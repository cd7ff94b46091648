package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.time.Instant
import java.util.UUID

/** Predicate DML — DELETE and UPDATE on a Delta table. Beyond the
  * reference's surface (delta-rs 0.6.4 exposes neither to the Python
  * binding), but a training-data pipeline needs targeted removal
  * (contamination purges, takedown requests) and in-place correction
  * without rewriting the whole table.
  *
  * Scale shape (the same two-phase plan delta-spark uses):
  *   phase 0 (driver, O(#files) metadata): partition values + per-file
  *     min/max stats prune the candidate file list — files that provably
  *     contain no matching row are never read or rewritten. Files whose
  *     partition values prove EVERY row matches are removed wholly
  *     without reading (delete only).
  *   phase 1 (one distributed scan of the remaining candidates, with the
  *     predicate pushed to parquet): per-file matched-row counts via
  *     input_file_name(). Files with zero matches are left untouched;
  *     delete drops fully-matched files without rewrite.
  *   phase 2 (one distributed rewrite job over partially-matched files
  *     only): keep/transform rows, stage, move, and commit remove+add
  *     with dataChange=true.
  *
  * Row semantics are SQL DELETE/UPDATE: rows where the predicate is NULL
  * are NOT matched (kept / left unmodified).
  */
object DeltaDml {

  final case class DmlResult(
      affectedRows: Long,
      removedFiles: Int,
      rewrittenFiles: Int,
      addedFiles: Int)

  /** DELETE FROM table WHERE <filters>. Returns counts; the commit is a
    * single atomic remove+add version with operation "DELETE". */
  def delete(
      spark: SparkSession,
      path: String,
      filters: Seq[Seq[Predicate]],
      checkpointInterval: Int = 10): DmlResult =
    mutate(spark, path, filters, assignments = Map.empty, checkpointInterval)

  /** UPDATE table SET <assignments> WHERE <filters>. Each assignment's
    * expression is evaluated against the pre-update row; non-matching
    * rows pass through byte-identical semantics. */
  def update(
      spark: SparkSession,
      path: String,
      filters: Seq[Seq[Predicate]],
      assignments: Map[String, Column],
      checkpointInterval: Int = 10): DmlResult = {
    require(assignments.nonEmpty, "UPDATE requires at least one assignment")
    mutate(spark, path, filters, assignments, checkpointInterval)
  }

  private def mutate(
      spark: SparkSession,
      path: String,
      filters: Seq[Seq[Predicate]],
      assignments: Map[String, Column],
      checkpointInterval: Int): DmlResult = {
    require(filters.nonEmpty && filters.forall(_.nonEmpty),
      "DML requires a non-empty predicate (refusing an implicit full-table operation)")
    val isDelete = assignments.isEmpty
    val log = DeltaLog.forTable(spark, path)
    val snap = log.snapshot(None)
    if (snap.protocol.minWriterVersion > DeltaWrite.MaxSupportedWriterVersion)
      throw new IllegalStateException(
        s"Table requires writer version ${snap.protocol.minWriterVersion} > " +
          s"${DeltaWrite.MaxSupportedWriterVersion}")
    assignments.keys.foreach { c =>
      require(snap.schema.fieldNames.contains(c), s"Unknown column in SET: $c")
      require(!snap.partitionColumns.contains(c),
        s"Updating partition column $c is not supported (would move rows across files)")
    }

    val partCols = snap.partitionColumns.toSet
    val fieldTypes = snap.schema.fields.map(f => f.name -> f.dataType).toMap

    // ---- phase 0: metadata-only pruning ---------------------------------
    val candidates = DeltaRead.prunedFiles(snap, filters)
    if (candidates.isEmpty) return DmlResult(0, 0, 0, 0)

    // Files whose partition values satisfy a whole OR-branch of
    // partition-only conjuncts match on EVERY row — a delete removes them
    // without ever reading them (the partition-drop fast path).
    def partitionFullMatch(f: AddFile): Boolean =
      filters.exists { conj =>
        conj.forall(p => partCols.contains(p.column) &&
          DeltaRead.evalPredicate(f.partitionValues.get(p.column).flatMap(Option(_)),
            fieldTypes.getOrElse(p.column, org.apache.spark.sql.types.StringType), p))
      }
    val (provenFull, toScan) =
      if (isDelete) candidates.partition(partitionFullMatch)
      else (Seq.empty[AddFile], candidates)

    // ---- phase 1: one scan for per-file matched-row counts --------------
    val cond = DeltaRead.dnfToColumn(filters)
    val matchedByFile: Map[String, Long] =
      if (toScan.isEmpty) Map.empty
      else readFiles(spark, path, snap, toScan)
        .filter(cond)
        .groupBy(input_file_name().as("__f"))
        .agg(count(lit(1)).as("__n"))
        .collect()
        .map(r => normalizePath(r.getString(0)) -> r.getLong(1))
        .toMap
    def matchedOf(f: AddFile): Long =
      matchedByFile.getOrElse(normalizePath(DeltaRead.resolvePath(path, f.path)), 0L)

    def numRecords(f: AddFile): Option[Long] =
      StatsPruning.parse(f.stats).flatMap(_.numRecords)

    val touchedScanned = toScan.filter(matchedOf(_) > 0L)
    // delete: fully-matched files (every row matches) need no rewrite
    val (scannedFull, partial) =
      if (isDelete) touchedScanned.partition(f => numRecords(f).contains(matchedOf(f)))
      else (Seq.empty[AddFile], touchedScanned)
    val fullRemoves = provenFull ++ scannedFull

    if (fullRemoves.isEmpty && partial.isEmpty) return DmlResult(0, 0, 0, 0)

    // Affected rows: counted for scanned files; proven-full files use
    // stats.numRecords, falling back to a count-only scan of just those
    // files (stats can be absent on foreign-written tables).
    val provenRows: Long = {
      val (withStats, statless) = provenFull.partition(f => numRecords(f).isDefined)
      withStats.map(f => numRecords(f).get).sum +
        (if (statless.isEmpty) 0L else readFiles(spark, path, snap, statless).count())
    }
    val affected = provenRows + touchedScanned.map(matchedOf).sum

    // ---- phase 2: rewrite partially-matched files -----------------------
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val version = snap.version + 1
    val adds: Seq[AddFile] =
      if (partial.isEmpty) Nil
      else {
        val src = readFiles(spark, path, snap, partial)
        val matched = coalesce(cond, lit(false)) // NULL predicate = no match
        val rewritten =
          if (isDelete) src.filter(!matched)
          else {
            // all assignments see the PRE-update row: compute into shadow
            // columns first, then swap — self-referencing and cross-column
            // SETs (a = b, b = a) stay order-independent
            val shadowed = assignments.zipWithIndex.foldLeft(src) {
              case (d, ((c, expr), i)) =>
                d.withColumn(s"__set_$i", when(matched, expr).otherwise(col(c)))
            }
            val swapped = assignments.zipWithIndex.foldLeft(shadowed) {
              case (d, ((c, _), i)) => d.withColumn(c, col(s"__set_$i"))
            }
            swapped.select(snap.schema.fieldNames.map(col).toSeq: _*)
          }
        val stagingDir = new Path(path, s".graft_dml_${UUID.randomUUID().toString.take(12)}")
        try DeltaWrite.stageAndMove(rewritten, spark, fs, path, stagingDir,
          snap.partitionColumns, version)
        finally if (fs.exists(stagingDir)) fs.delete(stagingDir, true)
      }

    // ---- commit ---------------------------------------------------------
    val now = Instant.now().toEpochMilli
    val removes = (fullRemoves ++ partial).map(f =>
      RemoveFile(f.path, deletionTimestamp = Some(now), dataChange = true,
        extendedFileMetadata = Some(true), partitionValues = f.partitionValues,
        size = Some(f.size)))
    val op = if (isDelete) "DELETE" else "UPDATE"
    val commitInfo = CommitInfo(
      timestamp = now,
      operation = op,
      operationParameters = Map("predicate" -> filters.map(_.map(p =>
        s"${p.column} ${p.op} ${p.value}").mkString("(", " AND ", ")")).mkString(" OR ")),
      operationMetrics = Map(
        (if (isDelete) "numDeletedRows" else "numUpdatedRows") -> affected.toString,
        "numRemovedFiles" -> removes.size.toString,
        "numAddedFiles" -> adds.size.toString),
      readVersion = Some(snap.version),
      isBlindAppend = Some(false))

    try log.writeCommit(version, Seq(commitInfo) ++ adds ++ removes)
    catch {
      case e: java.util.ConcurrentModificationException =>
        adds.foreach(a => fs.delete(new Path(DeltaRead.resolvePath(path, a.path)), false))
        throw e
    }
    if (checkpointInterval > 0 && version % checkpointInterval == 0)
      log.writeCheckpoint(version)
    DmlResult(affected, removes.size, partial.size, adds.size)
  }

  /** Scan a specific subset of the snapshot's files with the snapshot
    * schema and hive partition columns restored. */
  private def readFiles(
      spark: SparkSession, path: String, snap: Snapshot, files: Seq[AddFile]): DataFrame =
    spark.read
      .format("parquet")
      .schema(snap.schema)
      .option("basePath", path)
      .load(files.map(f => DeltaRead.resolvePath(path, f.path)): _*)

  /** input_file_name() yields a scheme-qualified URI; our resolved paths
    * may be bare. Compare on the scheme-less path. */
  private def normalizePath(p: String): String =
    new Path(p).toUri.getPath
}
