package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.time.Instant

/** Table maintenance beyond the reference's surface: small-file
  * compaction (OPTIMIZE). Many streaming/append workloads fragment a
  * table into thousands of tiny files; compaction rewrites each
  * partition's files into ~targetFileSize outputs and commits the swap
  * as remove+add with dataChange=false (readers see identical rows;
  * concurrent appends are not invalidated).
  *
  * Scale: the rewrite is an ordinary distributed Spark job per
  * partition-group; the commit is O(#files) control-plane like any
  * delta commit. Vacuum later reclaims the replaced files.
  */
object DeltaMaintenance {

  /** Compact the current snapshot's files. Returns (filesBefore,
    * filesAfter). Partition boundaries are preserved.
    *
    * @param sortBy optional clustering columns: the rewrite range-
    *   partitions and sorts each partition group by these, so the
    *   compacted files carry disjoint min/max ranges and later scans
    *   with predicates on them prune whole files (StatsPruning) — the
    *   OPTIMIZE ... ZORDER role for single-dimension keys. */
  def compact(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      minFilesToCompact: Int = 2,
      sortBy: Seq[String] = Nil): (Int, Int) = {
    val log = DeltaLog.forTable(spark, path)
    val snap = log.snapshot(None)
    sortBy.foreach { c =>
      require(snap.schema.fieldNames.contains(c), s"Unknown sortBy column: $c")
      require(!snap.partitionColumns.contains(c),
        s"sortBy column $c is a partition column (constant within a group)")
    }
    val byPartition = snap.activeFiles.groupBy(_.partitionValues)
    val toCompact = byPartition.filter { case (_, fs) =>
      fs.size >= minFilesToCompact && fs.map(_.size).sum <= targetFileBytes * fs.size
    }
    if (toCompact.isEmpty) return (snap.activeFiles.size, snap.activeFiles.size)

    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val now = Instant.now().toEpochMilli
    val statsSchema = org.apache.spark.sql.types.StructType(
      snap.schema.fields.filterNot(f => snap.partitionColumns.contains(f.name)))

    var adds = List.empty[AddFile]
    var removes = List.empty[RemoveFile]
    toCompact.foreach { case (pv, files) =>
      val paths = files.map(f => DeltaRead.resolvePath(path, f.path))
      val numOut = math.max(1, (files.map(_.size).sum / targetFileBytes).toInt)
      val partitionDir = snap.partitionColumns.map { c =>
        val v = pv.getOrElse(c, null)
        val escaped = if (v == null) "__HIVE_DEFAULT_PARTITION__" else v
        s"$c=$escaped"
      }.mkString("/")
      // rewrite: read only this partition's files, keep partition columns
      // out of the data (they live in the path)
      val df = spark.read.schema(statsSchema).parquet(paths: _*)
      val clustered =
        if (sortBy.isEmpty) df.coalesce(numOut)
        else {
          val cols = sortBy.map(org.apache.spark.sql.functions.col)
          df.repartitionByRange(numOut, cols: _*).sortWithinPartitions(cols: _*)
        }
      val tmp = new Path(path, s".graft_compact_${java.util.UUID.randomUUID().toString.take(12)}")
      clustered.write.parquet(tmp.toString)
      fs.listStatus(tmp)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (st, i) =>
          val fileName =
            f"part-${snap.version + 1}%05d-${java.util.UUID.randomUUID()}-$i%04d.c.snappy.parquet"
          val destRel = if (partitionDir.isEmpty) fileName else s"$partitionDir/$fileName"
          val dest = new Path(path, destRel)
          fs.mkdirs(dest.getParent)
          if (!fs.rename(st.getPath, dest))
            throw new java.io.IOException(s"Failed to move ${st.getPath} -> $dest")
          val status = fs.getFileStatus(dest)
          adds ::= AddFile(
            path = DeltaWrite.uriEncodePath(destRel),
            partitionValues = pv,
            size = status.getLen,
            modificationTime = status.getModificationTime,
            dataChange = false,
            stats = Some(DeltaWrite.harvestStats(fs.getConf, dest, statsSchema)))
        }
      fs.delete(tmp, true)
      removes :::= files.map(f => RemoveFile(f.path, Some(now), dataChange = false,
        extendedFileMetadata = Some(true), partitionValues = f.partitionValues,
        size = Some(f.size))).toList
    }

    val commitInfo = CommitInfo(
      timestamp = now,
      operation = "OPTIMIZE",
      operationParameters = Map("targetFileBytes" -> targetFileBytes.toString) ++
        (if (sortBy.isEmpty) Map.empty
         else Map("sortBy" -> sortBy.mkString("[\"", "\",\"", "\"]"))),
      operationMetrics = Map(
        "numRemovedFiles" -> removes.size.toString,
        "numAddedFiles" -> adds.size.toString),
      readVersion = Some(snap.version),
      isBlindAppend = Some(false))
    log.writeCommit(snap.version + 1, Seq(commitInfo) ++ adds ++ removes)
    (snap.activeFiles.size, snap.activeFiles.size - removes.size + adds.size)
  }
}
