package graft.delta

import org.apache.spark.unsafe.types.UTF8String
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Executor-side deletion-vector index: data-file NAME → bitmap of
  * soft-deleted row positions. Ships as raw bytes (a few KB per file by
  * construction) inside a `Broadcast`, so each EXECUTOR fetches it once
  * — not once per task closure — and deserializes the bitmaps once,
  * lazily.
  *
  * The scan-side probe (`live`/`deleted`) runs per ROW inside whole-stage
  * codegen ([[org.apache.spark.sql.graft.DvProbe]]); rows arrive
  * file-by-file, so a per-thread single-entry memo collapses the
  * name-parse + map lookup to a UTF8String equality check on the hot
  * path. ThreadLocal because one broadcast value is shared by every task
  * thread on the executor. */
final class DvIndex(bytesByName: Map[String, Array[Byte]]) extends Serializable {

  @transient private lazy val byName: java.util.HashMap[String, Roaring64NavigableMap] = {
    val m = new java.util.HashMap[String, Roaring64NavigableMap](bytesByName.size * 2)
    bytesByName.foreach { case (k, b) => m.put(k, DeletionVectors.deserializeBitmap(b)) }
    m
  }

  // memo slots: (0) last file path seen by this thread, (1) its bitmap
  // (null = file has no DV)
  @transient private lazy val memo: ThreadLocal[Array[AnyRef]] =
    ThreadLocal.withInitial(() => new Array[AnyRef](2))

  def isEmpty: Boolean = bytesByName.isEmpty

  private def bitmapFor(path: UTF8String): Roaring64NavigableMap = {
    val c = memo.get()
    if (path.equals(c(0))) c(1).asInstanceOf[Roaring64NavigableMap]
    else {
      val s = path.toString
      val bm = byName.get(s.substring(s.lastIndexOf('/') + 1))
      c(0) = path.clone() // the input may alias a reused scan buffer
      c(1) = bm
      bm
    }
  }

  /** True iff the row survives its file's deletion vector. */
  def live(path: UTF8String, rowIndex: Long): Boolean = {
    val bm = bitmapFor(path)
    bm == null || !bm.contains(rowIndex)
  }

  /** True iff the row is marked deleted (change-feed polarity: a file
    * absent from the index contributes nothing). */
  def deleted(path: UTF8String, rowIndex: Long): Boolean = {
    val bm = bitmapFor(path)
    bm != null && bm.contains(rowIndex)
  }
}
