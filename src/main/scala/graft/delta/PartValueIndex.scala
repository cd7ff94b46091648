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
final class PartValueIndex(byName: Map[String, Array[String]]) extends Serializable {

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
      val e = lookup.get(s.substring(s.lastIndexOf('/') + 1))
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
