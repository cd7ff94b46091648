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

  /** Classify one commit's actions. dataChange=false rewrites
    * (OPTIMIZE) plan nothing. A DV-carrying add contributes its bitmap
    * DIFF as deletes — its live rows are unchanged rows, not changes; a
    * plain add contributes its rows as inserts (append-CDC stance for
    * rewrite DML / overwrite / restore, documented at the call sites). */
  def planVersion(
      fs: FileSystem, root: Path, version: Long, actions: Seq[Action]): VersionPlan = {
    val cdc = actions.collect { case c: AddCDCFile => c }
    if (cdc.nonEmpty)
      return VersionPlan(version, Nil, Map.empty, Nil, cdc)
    val adds = actions.collect { case a: AddFile if a.dataChange => a }
    val removesByPath: Map[String, RemoveFile] =
      actions.collect { case r: RemoveFile => r.path -> r }.toMap
    val (dvAdds, plainAdds) = adds.partition(_.deletionVector.isDefined)
    val diffs: Seq[(AddFile, Array[Byte])] = dvAdds.flatMap { a =>
      val bm = DeletionVectors.loadBitmap(fs, root, a.deletionVector.get)
      removesByPath.get(a.path).flatMap(_.deletionVector).foreach { old =>
        bm.andNot(DeletionVectors.loadBitmap(fs, root, old))
      }
      // an unchanged bitmap (restore re-adding the same incarnation
      // content) deletes nothing — don't scan the file for it
      if (bm.isEmpty) None
      else Some(a -> DeletionVectors.serializeBitmap(bm))
    }
    VersionPlan(
      version,
      plainAdds,
      diffs.map { case (a, b) => fileNameOf(root, a) -> b }.toMap,
      diffs.map(_._1),
      Nil)
  }

  private def fileNameOf(root: Path, a: AddFile): String = {
    val raw = DeltaRead.resolvePath(root.toString, a.path)
    raw.substring(raw.lastIndexOf('/') + 1)
  }
}
