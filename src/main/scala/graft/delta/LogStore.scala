package graft.delta

import org.apache.hadoop.fs.{FileSystem, Path}

/** The commit-write seam: Delta's whole transactional story reduces to
  * "exactly one writer creates `_delta_log/N.json`". How that mutual
  * exclusion is achieved is a PER-SCHEME property of the storage system
  * (the delta-spark LogStore idea):
  *
  *  - POSIX filesystems: `O_CREAT|O_EXCL` (CREATE_NEW) is atomic.
  *  - HDFS / ABFS / GCS: `FileSystem.create(overwrite=false)` is a
  *    namespace operation — atomic.
  *  - S3A-style object stores: `create(overwrite=false)` is CHECK-THEN-
  *    PUT — two committers can both "win". S3 proper now offers
  *    conditional PUT (If-None-Match), but Hadoop's S3A doesn't surface
  *    it through this API; the reference's delta-rs 0.6.4 documents the
  *    same caveat. The [[CheckThenPut]] default keeps that documented
  *    parity; deployments needing true safety register a store backed by
  *    a lock service or a conditional-put client via [[LogStore.register]].
  */
trait LogStore {

  /** Create `target` holding exactly `bytes` iff it does not exist.
    * MUST throw [[org.apache.hadoop.fs.FileAlreadyExistsException]] (or
    * any IOException after which `target` exists) when another committer
    * won — the retry loop upstream treats that as a version conflict. */
  def writePutIfAbsent(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit

  /** Whether writePutIfAbsent is truly conditional on this store. False
    * means a lost-update window exists (document, don't pretend). */
  def atomicPutIfAbsent: Boolean = true
}

object LogStore {

  /** POSIX CREATE_NEW — atomic on local filesystems. */
  object Posix extends LogStore {
    override def writePutIfAbsent(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit = {
      val p = java.nio.file.Paths.get(target.toUri.getPath)
      val out = java.nio.file.Files.newOutputStream(p,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      try out.write(bytes) finally out.close()
    }
  }

  /** `FileSystem.create(overwrite=false)` — atomic where the namespace
    * is transactional (HDFS, ABFS, GCS connector). */
  object CreateNoOverwrite extends LogStore {
    override def writePutIfAbsent(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit = {
      val out =
        try fs.create(target, /*overwrite=*/ false)
        catch {
          case e: java.io.IOException if fs.exists(target) =>
            val ex = new org.apache.hadoop.fs.FileAlreadyExistsException(
              s"$target already exists")
            ex.initCause(e)
            throw ex
        }
      try out.write(bytes) finally out.close()
    }
  }

  /** S3A-style fallback: an explicit existence probe narrows (but cannot
    * close) the lost-update window; `atomicPutIfAbsent` is honestly
    * false. Matches the reference stack's documented S3 behavior. */
  object CheckThenPut extends LogStore {
    override def atomicPutIfAbsent: Boolean = false
    override def writePutIfAbsent(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit = {
      if (fs.exists(target))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(s"$target already exists")
      val out = fs.create(target, /*overwrite=*/ false)
      try out.write(bytes) finally out.close()
    }
  }

  /** Wrap a non-atomic store with external mutual exclusion (the
    * "lock provider" hook: a DynamoDB/ZooKeeper/etcd lease in a real
    * deployment; any `withLock` that serializes committers of one table
    * works). Inside the lock, exists + put IS conditional. */
  final class Locked(inner: LogStore, withLock: (String, () => Unit) => Unit)
      extends LogStore {
    override def writePutIfAbsent(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit =
      withLock(target.toString, { () =>
        if (fs.exists(target))
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"$target already exists")
        inner.writePutIfAbsent(fs, target, bytes)
      })
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, LogStore]()
  Seq("s3", "s3a", "s3n").foreach(registry.put(_, CheckThenPut))
  registry.put("file", Posix)

  /** Register (or replace) the store for a scheme — the deployment hook
    * for conditional-put/locked commit on object stores. */
  def register(scheme: String, store: LogStore): Unit = registry.put(scheme, store)

  def forScheme(scheme: String): LogStore =
    registry.getOrDefault(scheme, CreateNoOverwrite)
}
