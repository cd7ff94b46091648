package graft.delta

import org.apache.spark.unsafe.types.UTF8String

/** Executor-side partition-value index: data-file NAME → one string (or
  * null) per partition column. Lets a partitioned scan whose files hive
  * discovery cannot cover (outside-root shallow-clone adds, column-mapped
  * physical dirs) run as ONE parquet relation with the log-carried
  * partition values attached inside whole-stage codegen — instead of one
  * relation per partition-value group union'd together, whose plan size
  * (and analyzer cost, and driver memory) grows with the partition count.
  *
  * Same executor-side shape as [[RowIdIndex]]/[[DvIndex]]: the table
  * ships once per executor inside a `Broadcast` (a few strings per
  * active file); rows arrive file-by-file, so a per-thread single-entry
  * memo collapses the name-parse + hash lookup to a UTF8String equality
  * check per row. */
/** `fullPath = true` keys entries by the DECODED absolute path instead of
  * the basename — the fallback for the (corrupt-log / multi-source
  * shallow-clone) case where two partition roots carry the same data-file
  * basename; Delta's uuid names make this vanishingly rare, so the
  * basename fast path stays the default. */
final class PartValueIndex(
    byName: Map[String, Array[String]],
    fullPath: Boolean = false) extends Serializable {

  @transient private lazy val lookup: java.util.HashMap[String, Array[UTF8String]] = {
    val m = new java.util.HashMap[String, Array[UTF8String]](byName.size * 2)
    byName.foreach { case (k, v) =>
      m.put(k, v.map(s => if (s == null) null else UTF8String.fromString(s)))
    }
    m
  }

  // memo slots: (0) last file path seen by this thread, (1) its entry
  @transient private lazy val memo: ThreadLocal[Array[AnyRef]] =
    ThreadLocal.withInitial(() => new Array[AnyRef](2))

  private def entryFor(path: UTF8String): Array[UTF8String] = {
    val c = memo.get()
    if (path.equals(c(0))) c(1).asInstanceOf[Array[UTF8String]]
    else {
      val s = path.toString
      val key =
        if (fullPath) PartValueIndex.decodedPath(s)
        else s.substring(s.lastIndexOf('/') + 1)
      val e = lookup.get(key)
      if (e == null)
        throw new IllegalStateException(s"No partition-value entry for file $s")
      c(0) = path.clone() // the input may alias a reused scan buffer
      c(1) = e
      e
    }
  }

  /** The file's value for partition column `ordinal`; null for the
    * `__HIVE_DEFAULT_PARTITION__` sentinel. */
  def value(path: UTF8String, ordinal: Int): UTF8String = entryFor(path)(ordinal)
}

object PartValueIndex {
  /** Scan-side paths (`_metadata.file_path`) arrive as URL-ENCODED
    * scheme-qualified URIs: decode them to the scheme-less absolute path
    * (the DeltaDml.scanFileKey convention). Applies to the SCAN side
    * only — file-side keys go through [[fileSideKey]], which must NOT
    * decode (a literal '%' in a raw resolved path is data, not an
    * escape). */
  private[delta] def decodedPath(p: String): String =
    try Option(new java.net.URI(p).getPath).filter(_.nonEmpty)
      .getOrElse(new org.apache.hadoop.fs.Path(p).toUri.getPath)
    catch { case _: java.net.URISyntaxException =>
      new org.apache.hadoop.fs.Path(p).toUri.getPath }

  /** File-side keys are RAW resolved paths (resolvePath output): take
    * the hadoop-Path path component verbatim — no percent-decoding
    * (the DeltaDml.normalizePath convention). Decoding a raw path would
    * corrupt directory names containing a literal '%XX'. */
  private[delta] def fileSideKey(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath
}
