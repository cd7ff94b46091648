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

  /** The conditional-put primitive modern object stores expose natively
    * (S3 `If-None-Match: *`, GCS `x-goog-if-generation-match: 0`, Azure
    * `If-None-Match: *`). Hadoop's FileSystem API doesn't surface it, so
    * a deployment supplies a thin client against the store's own SDK;
    * [[ConditionalPut]] turns that one primitive into a fully atomic
    * LogStore. Return false (or throw) when the key already existed. */
  trait ConditionalPutClient {
    def putIfAbsent(key: String, bytes: Array[Byte]): Boolean
  }

  /** LogStore over a native conditional-put primitive — the modern,
    * lock-free answer for object stores. Atomicity comes from the store
    * itself, not from a Hadoop create path. */
  final class ConditionalPut(client: ConditionalPutClient) extends LogStore {
    override def writePutIfAbsent(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit =
      if (!client.putIfAbsent(target.toString, bytes))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          s"$target already exists (conditional put refused)")
  }

  /** Shipped lock-provider reference implementation: a TTL lease file per
    * commit key, arbitrated by atomic create-no-overwrite on `leaseFs`.
    * Mirrors the externalized-arbitration shape of delta-spark's
    * S3DynamoDBLogStore: the lease lives on a filesystem whose namespace
    * IS transactional (HDFS, local POSIX, ABFS — possibly a different
    * store than the table; placing it on a check-then-put store would
    * just move the race). Expired leases (a crashed committer) are taken
    * over: delete + re-race through CREATE_NEW, so the kernel/namenode
    * stays the arbiter. Use via
    * `LogStore.register(scheme, new Locked(CheckThenPut, new FileLease(fs, dir).withLock))`.
    */
  final class FileLease(
      leaseFs: FileSystem, leaseDir: Path,
      ttlMs: Long = 30000L, acquireTimeoutMs: Long = 60000L,
      ownerId: String = java.util.UUID.randomUUID().toString) {

    private def leasePath(key: String): Path =
      // one lease per commit key; sanitize the URI into a flat file name
      new Path(leaseDir, java.net.URLEncoder.encode(key, "UTF-8") + ".lease")

    private def tryAcquire(lock: Path): Boolean = {
      val body = s"$ownerId ${System.currentTimeMillis() + ttlMs}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      try {
        val out = leaseFs.create(lock, /*overwrite=*/ false)
        try out.write(body) finally out.close()
        true
      } catch {
        case _: java.io.IOException =>
          // lease exists (or a transient error): take over iff expired,
          // then loop back to CREATE_NEW so concurrent takers re-race
          try {
            val in = leaseFs.open(lock)
            val txt = try {
              val buf = new java.io.ByteArrayOutputStream()
              org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
              new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
            } finally in.close()
            val expiry = txt.trim.split("\\s+").lastOption.flatMap(_.toLongOption)
            if (expiry.exists(_ < System.currentTimeMillis())) leaseFs.delete(lock, false)
          } catch { case _: java.io.IOException => () /* deleted under us — retry */ }
          false
      }
    }

    def withLock(key: String, body: () => Unit): Unit = {
      val lock = leasePath(key)
      leaseFs.mkdirs(leaseDir)
      val deadline = System.currentTimeMillis() + acquireTimeoutMs
      var held = tryAcquire(lock)
      while (!held && System.currentTimeMillis() < deadline) {
        Thread.sleep(20)
        held = tryAcquire(lock)
      }
      if (!held)
        throw new java.io.IOException(
          s"FileLease: could not acquire $lock within ${acquireTimeoutMs}ms")
      try body()
      finally leaseFs.delete(lock, false)
    }
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
