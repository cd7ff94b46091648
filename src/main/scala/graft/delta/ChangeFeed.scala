package graft.delta

import org.apache.hadoop.fs.{FileSystem, Path}

/** Change-data capture over deletion-vector commits — the piece that
  * turns "a DV commit re-adds an overwhelmingly-unchanged file" from a
  * refusal (r4) into exact per-row changes: for each DV-carrying add,
  * `newDV ∖ oldDV` is precisely the set of row positions soft-deleted in
  * that commit (the protocol grows bitmaps monotonically per incarnation
  * chain; the old bitmap rides the same-commit remove's descriptor).
  * Scanning the file at those `_metadata.row_index` positions yields the
  * deleted rows' full content — data files are immutable, so this is
  * exact at any later read time.
  *
  * Used by batch [[DeltaTableOps.tableChanges]] and the streaming
  * source's changeFeed mode; both label rows with `_change_type`
  * ('insert' | 'delete') and `_commit_version`.
  *
  * Scale: per version this loads only that commit's DV bitmaps (KBs) and
  * scans only the DV-carrying files — the same files a snapshot read of
  * that version would already probe — with the broadcast + codegen'd
  * DvProbe machinery (DeletionVectors.selectDeleted).
  */
object ChangeFeed {

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  val CommitTimestampCol = "_commit_timestamp"

  /** A commit's wall-clock for the feed's `_commit_timestamp` — the
    * monotonic in-commit clock when the table carries one, else the
    * commitInfo clock (already parsed with the commit's actions, zero
    * extra I/O), file mtime for foreign commitInfo-less commits. */
  def commitTimestamp(
      fs: FileSystem, commitFile: Path, actions: Seq[Action]): java.sql.Timestamp =
    new java.sql.Timestamp(
      actions.collectFirst { case ci: CommitInfo =>
        ci.inCommitTimestamp.getOrElse(ci.timestamp)
      }.getOrElse(fs.getFileStatus(commitFile).getModificationTime))

  /** One commit's change plan: files whose full content inserts, plus
    * data-file-name → serialized bitmap of the positions deleted in
    * exactly this commit. When the commit carries `cdc` actions
    * (a CDF-enabled writer recorded its exact row changes), those files
    * ARE the plan — the protocol obliges readers to use them
    * exclusively, since the add/remove interpretation of such a commit
    * (e.g. a rewritten file re-adding its surviving rows) double-counts. */
  final case class VersionPlan(
      version: Long,
      insertFiles: Seq[AddFile],
      deleteDiffs: Map[String, Array[Byte]],
      deleteCarriers: Seq[AddFile],
      cdcFiles: Seq[AddCDCFile])

  /** A DV diff still to be loaded: `newDv ∖ oldDv` of one add. Pure
    * metadata — carrying descriptors instead of bitmaps lets a range
    * plan batch every load into one Spark job. */
  final case class PendingDiff(
      version: Long, add: AddFile,
      newDv: DeletionVectorDescriptor, oldDv: Option[DeletionVectorDescriptor])

  /** Classify one commit's actions WITHOUT any bitmap I/O.
    * dataChange=false rewrites (OPTIMIZE) plan nothing. A DV-carrying
    * add contributes its bitmap DIFF as deletes — its live rows are
    * unchanged rows, not changes; a plain add contributes its rows as
    * inserts (append-CDC stance for rewrite DML / overwrite / restore,
    * documented at the call sites). cdc actions are exclusive. */
  def classify(version: Long, actions: Seq[Action])
      : (Seq[AddCDCFile], Seq[AddFile], Seq[PendingDiff]) = {
    val cdc = actions.collect { case c: AddCDCFile => c }
    if (cdc.nonEmpty) return (cdc, Nil, Nil)
    val adds = actions.collect { case a: AddFile if a.dataChange => a }
    val removesByPath: Map[String, RemoveFile] =
      actions.collect { case r: RemoveFile => r.path -> r }.toMap
    val (dvAdds, plainAdds) = adds.partition(_.deletionVector.isDefined)
    (Nil, plainAdds, dvAdds.map(a => PendingDiff(version, a,
      a.deletionVector.get, removesByPath.get(a.path).flatMap(_.deletionVector))))
  }

  /** `newDv ∖ oldDv`, serialized; None when the diff is empty (restore
    * re-adding the same incarnation content deletes nothing — don't
    * scan the file for it). */
  private def diffBytes(
      fs: FileSystem, root: Path, p: PendingDiff): Option[Array[Byte]] = {
    val bm = DeletionVectors.loadBitmap(fs, root, p.newDv)
    p.oldDv.foreach(old => bm.andNot(DeletionVectors.loadBitmap(fs, root, old)))
    if (bm.isEmpty) None else Some(DeletionVectors.serializeBitmap(bm))
  }

  private def assemble(
      root: Path,
      classified: Seq[(Long, (Seq[AddCDCFile], Seq[AddFile], Seq[PendingDiff]))],
      loaded: Map[(Long, String), Array[Byte]]): Seq[VersionPlan] =
    classified.map { case (v, (cdc, plainAdds, pend)) =>
      if (cdc.nonEmpty) VersionPlan(v, Nil, Map.empty, Nil, cdc)
      else {
        val carried = pend.filter(p => loaded.contains((v, p.add.path)))
        VersionPlan(v, plainAdds,
          carried.map(p => fileNameOf(root, p.add) -> loaded((v, p.add.path))).toMap,
          carried.map(_.add), Nil)
      }
    }

  /** One commit's change plan, bitmaps loaded driver-side — for the
    * incremental (streaming) case of a single small commit. Wide ranges
    * go through [[planRange]], which batches the loads. */
  def planVersion(
      fs: FileSystem, root: Path, version: Long, actions: Seq[Action]): VersionPlan = {
    val classified = Seq(version -> classify(version, actions))
    val loaded = classified.head._2._3.flatMap(p =>
      diffBytes(fs, root, p).map((p.version, p.add.path) -> _)).toMap
    assemble(root, classified, loaded).head
  }

  /** Change plans for a RANGE of commits. All DV bitmap diffs across the
    * range load in ONE pass — driver-side below
    * [[DeletionVectors.DistributedLoadThreshold]], else a single Spark
    * job (a 100-commit DV history plans in one round of parallel tasks
    * instead of a serial driver loop; each task opens its own
    * FileSystem from the broadcast Hadoop conf). */
  def planRange(
      spark: org.apache.spark.sql.SparkSession, root: Path,
      commits: Seq[(Long, Seq[Action])],
      distributedThreshold: Int = DeletionVectors.DistributedLoadThreshold)
      : Seq[VersionPlan] = {
    val classified = commits.map { case (v, actions) => v -> classify(v, actions) }
    val pending = classified.flatMap(_._2._3)
    val loaded: Map[(Long, String), Array[Byte]] =
      if (pending.isEmpty) Map.empty
      else if (pending.size <= distributedThreshold) {
        val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
        pending.flatMap(p => diffBytes(fs, root, p).map((p.version, p.add.path) -> _)).toMap
      } else {
        val confBc = spark.sparkContext.broadcast(
          new org.apache.spark.util.SerializableConfiguration(
            spark.sessionState.newHadoopConf()))
        val rootStr = root.toString
        val items = pending.map(p => (p.version, p.add.path, p.newDv, p.oldDv))
        spark.sparkContext
          .parallelize(items, math.min(64, 1 + items.size / 32))
          .flatMap { case (v, addPath, nd, od) =>
            val r = new Path(rootStr)
            val fs = r.getFileSystem(confBc.value.value)
            val bm = DeletionVectors.loadBitmap(fs, r, nd)
            od.foreach(o => bm.andNot(DeletionVectors.loadBitmap(fs, r, o)))
            if (bm.isEmpty) None
            else Some((v, addPath) -> DeletionVectors.serializeBitmap(bm))
          }.collect().toMap
      }
    assemble(root, classified, loaded)
  }

  private def fileNameOf(root: Path, a: AddFile): String = {
    val raw = DeltaRead.resolvePath(root.toString, a.path)
    raw.substring(raw.lastIndexOf('/') + 1)
  }
}
