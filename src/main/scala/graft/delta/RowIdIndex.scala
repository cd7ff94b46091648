package graft.delta

import org.apache.spark.unsafe.types.UTF8String

/** Executor-side row-tracking index: data-file NAME → (baseRowId,
  * defaultRowCommitVersion). Ships once per executor inside a
  * `Broadcast` (two longs per active file — KBs at 100 TB scale, vs a
  * per-row join against a file-keyed map). Same hot-path shape as
  * [[DvIndex]]: rows arrive file-by-file, so a per-thread single-entry
  * memo collapses the name-parse + lookup to a UTF8String equality
  * check inside whole-stage codegen. */
final class RowIdIndex(byName: Map[String, (Long, Long)]) extends Serializable {

  @transient private lazy val lookup: java.util.HashMap[String, (Long, Long)] = {
    val m = new java.util.HashMap[String, (Long, Long)](byName.size * 2)
    byName.foreach { case (k, v) => m.put(k, v) }
    m
  }

  // memo slots: (0) last file path seen by this thread, (1) its entry
  @transient private lazy val memo: ThreadLocal[Array[AnyRef]] =
    ThreadLocal.withInitial(() => new Array[AnyRef](2))

  private def entryFor(path: UTF8String): (Long, Long) = {
    val c = memo.get()
    if (path.equals(c(0))) c(1).asInstanceOf[(Long, Long)]
    else {
      val s = path.toString
      val e = lookup.get(s.substring(s.lastIndexOf('/') + 1))
      if (e == null)
        throw new IllegalStateException(s"No row-tracking entry for file $s")
      c(0) = path.clone() // the input may alias a reused scan buffer
      c(1) = e
      e
    }
  }

  /** Fresh row id = the file's baseRowId + the row's physical position. */
  def rowId(path: UTF8String, rowIndex: Long): Long = entryFor(path)._1 + rowIndex

  /** The commit version that added the row's file. */
  def commitVersion(path: UTF8String): Long = entryFor(path)._2
}
