package graft.delta

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Safety pins for the shipped FileLease lock provider — every property a
  * lock provider exists to deliver, exercised directly (no Spark needed).
  *
  * The r11 verdict's failure mode: `leaseFs.create(overwrite=false)` on
  * RawLocalFileSystem is exists-check-then-truncating-open, so two
  * committers could both "hold" the lease. The fix routes acquisition
  * through the atomic LogStore primitive for the lease scheme
  * (`O_CREAT|O_EXCL` on `file:`); these pins fail against the pre-fix
  * code and guard against regressing to any check-then-put acquire. */
/** A local filesystem whose next OVERWRITING `create` truncates the file
  * and then fails — the exact state a heartbeat rewrite interrupted
  * between its truncate and its write leaves behind (a torn, empty
  * lease). Non-overwriting creates and every other operation pass
  * through untouched. */
class TearingLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  val tearNextOverwrite = new java.util.concurrent.atomic.AtomicBoolean(false)
  override def create(f: Path, overwrite: Boolean): org.apache.hadoop.fs.FSDataOutputStream = {
    val out = super.create(f, overwrite)
    if (overwrite && tearNextOverwrite.compareAndSet(true, false)) {
      out.close() // the truncation already happened at open
      throw new java.io.IOException("injected tear: write failed after truncate")
    }
    out
  }
}

class FileLeaseSpec extends AnyFunSuite {

  private def localFs(dir: java.nio.file.Path) = {
    val p = new Path(s"file:$dir")
    (p, p.getFileSystem(new org.apache.hadoop.conf.Configuration()))
  }

  private def tmpDir(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  test("loop-pin: 120 sequential two-committer races, exactly one holder at a time") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_race"))
    val a = new LogStore.FileLease(leaseFs, leasePath, ownerId = "owner-a")
    val b = new LogStore.FileLease(leaseFs, leasePath, ownerId = "owner-b")
    val inside = new AtomicInteger(0)
    val violations = new AtomicInteger(0)
    def critical(): Unit = {
      // a non-atomic acquire admits both committers here concurrently;
      // the 2 ms hold makes any overlap certain to be observed
      if (inside.incrementAndGet() > 1) violations.incrementAndGet()
      Thread.sleep(2)
      inside.decrementAndGet()
    }
    val pool = Executors.newFixedThreadPool(2)
    try {
      (1 to 120).foreach { i =>
        val gate = new CyclicBarrier(2)
        // barrier-aligned entry maximizes the odds that a check-then-put
        // regression's microsecond window is actually hit
        val fa = pool.submit(new Runnable {
          override def run(): Unit = { gate.await(); a.withLock(s"race$i", () => critical()) }
        })
        val fb = pool.submit(new Runnable {
          override def run(): Unit = { gate.await(); b.withLock(s"race$i", () => critical()) }
        })
        fa.get(30, TimeUnit.SECONDS); fb.get(30, TimeUnit.SECONDS)
      }
    } finally pool.shutdown()
    assert(violations.get() == 0,
      s"mutual exclusion violated in ${violations.get()} of 120 races")
    // every lease released
    assert(leaseFs.listStatus(leasePath).forall(!_.getPath.getName.endsWith(".lease")))
  }

  test("a live lease is never taken over, even by an impatient waiter") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_live"))
    // another committer's lease, live for 60 more seconds
    val liveBody = new String(
      LogStore.FileLease.leaseBody("other-owner", System.currentTimeMillis() + 60000),
      "UTF-8")
    val lock = new Path(leasePath, java.net.URLEncoder.encode("k", "UTF-8") + ".lease")
    LogStore.forScheme("file").writePutIfAbsent(leaseFs, lock, liveBody.getBytes("UTF-8"))
    val waiter = new LogStore.FileLease(leaseFs, leasePath, acquireTimeoutMs = 400L)
    val e = intercept[java.io.IOException](waiter.withLock("k", () => fail("must not run")))
    assert(e.getMessage.contains("could not acquire"))
    // the live lease is intact — same owner, same expiry, no reap debris
    val in = leaseFs.open(lock)
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(txt == liveBody, s"live lease must be untouched, got: $txt")
    assert(!leaseFs.listStatus(leasePath).exists(_.getPath.getName.contains(".reap.")))
  }

  test("renewal keeps a slow body's lease alive past its initial TTL") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_renew"))
    // ttl 1.5 s + grace 300 ms: without the ttl/3 (500 ms) heartbeat the
    // lease is reapable 1.8 s in and the concurrent waiter below would
    // steal it well before the 4 s body ends. The budget deliberately
    // absorbs full-suite scheduler/GC stalls: losing the lease requires
    // the renewer to miss ~3 consecutive periods (an earlier 300 ms/100 ms
    // tuning failed under suite-wide CPU contention — a correct OBSERVED
    // loss, but not the property under test)
    val slow = new LogStore.FileLease(leaseFs, leasePath,
      ttlMs = 1500L, graceMs = 300L, ownerId = "slow-owner")
    val thief = new LogStore.FileLease(leaseFs, leasePath,
      ttlMs = 1500L, graceMs = 300L, acquireTimeoutMs = 2500L, ownerId = "thief")
    val pool = Executors.newFixedThreadPool(2)
    try {
      val bodyDone = new java.util.concurrent.atomic.AtomicBoolean(false)
      val holder = pool.submit(new Runnable {
        override def run(): Unit =
          slow.withLock("k", () => { Thread.sleep(4000); bodyDone.set(true) })
      })
      Thread.sleep(150) // let the slow holder acquire first
      val stolen = pool.submit(new java.util.concurrent.Callable[Boolean] {
        override def call(): Boolean =
          try { thief.withLock("k", () => ()); true }
          catch { case _: java.io.IOException => false }
      })
      assert(!stolen.get(20, TimeUnit.SECONDS),
        "the waiter must time out while the renewed lease stays live")
      holder.get(20, TimeUnit.SECONDS)
      assert(bodyDone.get())
      assert(slow.ownershipLostCount.get() == 0,
        "the renewed holder must never observe lost ownership")
      // after release the key is acquirable again
      var ran = false
      thief.withLock("k", () => { ran = true })
      assert(ran)
    } finally pool.shutdown()
  }

  test("release never deletes a usurper's lease; the loss is observed") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_usurp"))
    val holder = new LogStore.FileLease(leaseFs, leasePath, ownerId = "original")
    val lock = new Path(leasePath, java.net.URLEncoder.encode("k", "UTF-8") + ".lease")
    val usurped = new String(
      LogStore.FileLease.leaseBody("usurper", System.currentTimeMillis() + 60000), "UTF-8")
    holder.withLock("k", () => {
      // simulate a takeover mid-body (as if the body had outlived its
      // TTL): overwrite the lease with another owner's live content
      val out = leaseFs.create(lock, true)
      out.write(usurped.getBytes("UTF-8")); out.close()
    })
    // the unconditional-delete bug would have removed the usurper's lease
    val in = leaseFs.open(lock)
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(txt == usurped, "release must leave the usurper's live lease in place")
    assert(holder.ownershipLostCount.get() == 1,
      "lost ownership at release must be observable")
  }

  test("concurrent takeover of one expired lease stays mutually exclusive") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_reap"))
    // a crashed committer's lease, expired far past any grace
    val lock = new Path(leasePath, java.net.URLEncoder.encode("k", "UTF-8") + ".lease")
    LogStore.forScheme("file").writePutIfAbsent(leaseFs, lock,
      LogStore.FileLease.leaseBody("deadbeef", System.currentTimeMillis() - 60000))
    val inside = new AtomicInteger(0)
    val violations = new AtomicInteger(0)
    val done = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val gate = new CyclicBarrier(8)
      val futures = (1 to 8).map { i =>
        val lease = new LogStore.FileLease(leaseFs, leasePath, ownerId = s"taker-$i")
        pool.submit(new Runnable {
          override def run(): Unit = {
            gate.await()
            lease.withLock("k", () => {
              if (inside.incrementAndGet() > 1) violations.incrementAndGet()
              Thread.sleep(2)
              inside.decrementAndGet()
              done.incrementAndGet()
            })
          }
        })
      }
      futures.foreach(_.get(60, TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(violations.get() == 0, "expired-lease takeover admitted two holders")
    assert(done.get() == 8, "every taker must eventually run")
    assert(leaseFs.listStatus(leasePath).forall(s =>
      !s.getPath.getName.endsWith(".lease") && !s.getPath.getName.contains(".reap.")),
      "no lease or tombstone debris after all releases")
  }

  test("a torn lease with a stale mtime is reaped; a fresh one is not") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_torn"))
    val lock = new Path(leasePath, java.net.URLEncoder.encode("k", "UTF-8") + ".lease")
    // a holder killed between the heartbeat's truncate and write leaves
    // content that never parses — pre-fix this deadlocked the key forever
    LogStore.forScheme("file").writePutIfAbsent(leaseFs, lock, "torn".getBytes("UTF-8"))
    val lease = new LogStore.FileLease(leaseFs, leasePath, acquireTimeoutMs = 400L)
    // fresh mtime: someone may be mid-rewrite — must read as LIVE
    val e = intercept[java.io.IOException](lease.withLock("k", () => fail("must not run")))
    assert(e.getMessage.contains("could not acquire"))
    // age the file past ttl+grace: no heartbeat is behind it — reapable
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(lock.toUri.getPath),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    var ran = false
    lease.withLock("k", () => { ran = true })
    assert(ran, "a stale torn lease must be reaped, not deadlock the key")
  }

  test("a stale reap claim left by a crashed taker is cleared, not a deadlock") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_claim"))
    val lock = new Path(leasePath, java.net.URLEncoder.encode("k", "UTF-8") + ".lease")
    val body = LogStore.FileLease.leaseBody("deadbeef", System.currentTimeMillis() - 60000)
    LogStore.forScheme("file").writePutIfAbsent(leaseFs, lock, body)
    // the claim file a taker that crashed mid-reap would leave for
    // exactly this lease content
    val digest = {
      val md = java.security.MessageDigest.getInstance("SHA-1")
      md.digest(new String(body, "UTF-8").getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val claim = new Path(leasePath, lock.getName + ".reap." + digest + ".claim")
    LogStore.forScheme("file").writePutIfAbsent(leaseFs, claim, "crashed".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(claim.toUri.getPath),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    val lease = new LogStore.FileLease(leaseFs, leasePath, acquireTimeoutMs = 5000L)
    var ran = false
    lease.withLock("k", () => { ran = true })
    assert(ran, "a stale claim must be cleared so the expired lease can be reaped")
    assert(leaseFs.listStatus(leasePath).forall(s =>
      !s.getPath.getName.endsWith(".lease") && !s.getPath.getName.contains(".reap.")),
      "no lease, tombstone, or claim debris after release")
  }

  test("release distinguishes acquisitions, not just instances (same ownerId)") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_token"))
    val holder = new LogStore.FileLease(leaseFs, leasePath, ownerId = "shared")
    val lock = new Path(leasePath, java.net.URLEncoder.encode("k", "UTF-8") + ".lease")
    // simulate a SIBLING acquisition (same FileLease instance, another
    // thread) that reaped this stalled body's lease and re-acquired: the
    // lease carries the same ownerId with a different per-acquisition
    // nonce. An instance-identity release would delete it.
    val sibling = new String(
      LogStore.FileLease.leaseBody("shared:ffffffff", System.currentTimeMillis() + 60000),
      "UTF-8")
    holder.withLock("k", () => {
      val out = leaseFs.create(lock, true)
      out.write(sibling.getBytes("UTF-8")); out.close()
    })
    val in = leaseFs.open(lock)
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(txt == sibling, "release must not delete a sibling acquisition's lease")
    assert(holder.ownershipLostCount.get() == 1,
      "the same-instance takeover must be observed as lost ownership")
  }

  test("abandoned-lease chaos: expired and torn debris is reaped under racing acquirers") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_chaos"))
    val inside = new AtomicInteger(0)
    val violations = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(4)
    try {
      (1 to 20).foreach { r =>
        val key = s"chaos$r"
        val lock = new Path(leasePath, java.net.URLEncoder.encode(key, "UTF-8") + ".lease")
        // pre-seed each round's key with a crashed committer's debris:
        // even rounds a well-formed expired lease, odd rounds a torn one
        // (killed mid-heartbeat-rewrite) with its mtime past ttl+grace
        if (r % 2 == 0)
          LogStore.forScheme("file").writePutIfAbsent(leaseFs, lock,
            LogStore.FileLease.leaseBody(s"crashed-$r", System.currentTimeMillis() - 60000))
        else {
          LogStore.forScheme("file").writePutIfAbsent(leaseFs, lock, "to".getBytes("UTF-8"))
          java.nio.file.Files.setLastModifiedTime(
            java.nio.file.Paths.get(lock.toUri.getPath),
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
        }
        val gate = new CyclicBarrier(4)
        val leases = (1 to 4).map(i =>
          new LogStore.FileLease(leaseFs, leasePath, ownerId = s"t$i"))
        val racers = leases.map { lease =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              gate.await()
              lease.withLock(key, () => {
                if (inside.incrementAndGet() > 1) violations.incrementAndGet()
                Thread.sleep(1)
                inside.decrementAndGet()
              })
            }
          })
        }
        racers.foreach(_.get(30, TimeUnit.SECONDS))
        leases.foreach(l => assert(
          l.ownershipLostCount.get() == 0 && l.reapHazardCount.get() == 0,
          s"round $r: a racer observed lost ownership or an unrestorable reap"))
      }
    } finally pool.shutdown()
    assert(violations.get() == 0, "chaos debris admitted two holders")
    assert(leaseFs.listStatus(leasePath).forall(s =>
      !s.getPath.getName.endsWith(".lease") && !s.getPath.getName.contains(".reap.")),
      "all debris reaped and all leases released")
  }

  test("the renewer repairs its own torn heartbeat write; the lease stays live") {
    val dir = tmpDir("graft_lease_selftear")
    // a filesystem whose next OVERWRITING create truncates the target and
    // then fails the write — exactly the failure a transient disk/FS error
    // in the heartbeat produces. Acquisition is untouched (Posix's
    // writePutIfAbsent goes through java.nio, not this object), so the
    // injected tear lands precisely on the renewer's rewrite.
    val fs = new TearingLocalFs()
    fs.initialize(java.net.URI.create("file:///"), new org.apache.hadoop.conf.Configuration())
    val leasePath = new Path(s"file:$dir")
    // ttl 2000 / period 666: the stall guard added to the repair path
    // aborts on any >ttl gap between renewer ticks, so the budget must
    // absorb full-suite scheduler stalls the way the renewal test's
    // documented tuning does — a 1500 ms ttl left only the same margin
    // that an earlier 300/100 tuning failed under
    val slow = new LogStore.FileLease(fs, leasePath,
      ttlMs = 2000L, graceMs = 300L, ownerId = "slow-owner")
    val thief = new LogStore.FileLease(fs, leasePath,
      ttlMs = 2000L, graceMs = 300L, acquireTimeoutMs = 3500L, ownerId = "thief")
    val pool = Executors.newFixedThreadPool(2)
    try {
      val bodyDone = new java.util.concurrent.atomic.AtomicBoolean(false)
      fs.tearNextOverwrite.set(true) // first heartbeat (≈ttl/3 in) tears
      val holder = pool.submit(new Runnable {
        override def run(): Unit =
          slow.withLock("k", () => { Thread.sleep(5000); bodyDone.set(true) })
      })
      // readiness latch: the thief must start only once the holder OWNS
      // the lease, or scheduling jitter lets the thief acquire first
      val lock = new Path(leasePath, java.net.URLEncoder.encode("k", "UTF-8") + ".lease")
      val acquireDeadline = System.currentTimeMillis() + 5000
      while (!fs.exists(lock) && System.currentTimeMillis() < acquireDeadline)
        Thread.sleep(10)
      assert(fs.exists(lock), "the holder must acquire within 5s")
      // pre-repair, the tear's mtime froze: a waiter would reap the lease
      // ttl+grace after the tear (~3.0 s in) while the body still runs —
      // with self-repair the next tick restores it and the waiter times out
      val stolen = pool.submit(new java.util.concurrent.Callable[Boolean] {
        override def call(): Boolean =
          try { thief.withLock("k", () => ()); true }
          catch { case _: java.io.IOException => false }
      })
      assert(!stolen.get(20, TimeUnit.SECONDS),
        "the waiter must time out: the self-repaired lease stays live")
      holder.get(20, TimeUnit.SECONDS)
      assert(bodyDone.get())
      assert(!fs.tearNextOverwrite.get(), "the tear must actually have fired")
      assert(slow.ownershipLostCount.get() == 0,
        "a repaired self-tear must never surface as lost ownership")
    } finally pool.shutdown()
  }

  test("stale-claim reclaim restores a fresh claim instead of deleting it") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_reclaim"))
    leaseFs.mkdirs(leasePath)
    val lease = new LogStore.FileLease(leaseFs, leasePath, ttlMs = 1500L)
    // the TOCTOU victim: a taker judged the OLD claim at this path stale,
    // but before its removal executed, the path was reclaimed and a FRESH
    // winner's claim landed at the same name. A raw delete would remove
    // the live winner's claim and admit two concurrent takeovers.
    val fresh = new Path(leasePath, "k.lease.reap.aaaa.claim")
    LogStore.forScheme("file").writePutIfAbsent(leaseFs, fresh, "winner".getBytes("UTF-8"))
    lease.reclaimJudgedStaleClaim(fresh)
    assert(leaseFs.exists(fresh), "a fresh claim must survive the reclaim")
    val in = leaseFs.open(fresh)
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(txt == "winner", "the restored claim must carry the winner's content")
    assert(lease.reapHazardCount.get() == 0)
    leaseFs.delete(fresh, false)
    // and a genuinely stale claim is discarded, with no .gc debris behind
    val stale = new Path(leasePath, "k.lease.reap.bbbb.claim")
    LogStore.forScheme("file").writePutIfAbsent(leaseFs, stale, "crashed".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(stale.toUri.getPath),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    lease.reclaimJudgedStaleClaim(stale)
    assert(!leaseFs.exists(stale), "a genuinely stale claim must be discarded")
    assert(leaseFs.listStatus(leasePath).isEmpty, "no .gc or claim debris may remain")
  }

  test("orphan takeover debris from crashed takers is swept at the next acquisition") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_sweep"))
    leaseFs.mkdirs(leasePath)
    val old = System.currentTimeMillis() - 120000L
    def plant(name: String, aged: Boolean): Path = {
      val p = new Path(leasePath, name)
      LogStore.forScheme("file").writePutIfAbsent(leaseFs, p, "debris".getBytes("UTF-8"))
      if (aged) java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(p.toUri.getPath),
        java.nio.file.attribute.FileTime.fromMillis(old))
      p
    }
    val lockName = java.net.URLEncoder.encode("k", "UTF-8") + ".lease"
    // a taker that died between the lock→tomb rename and the tomb delete
    val tomb = plant(lockName + ".reap.deadbeef", aged = true)
    // one that died between winning its claim and the rename
    val claim = plant(lockName + ".reap.cafebabe.claim", aged = true)
    // one that died inside the claim GC itself
    val gc = plant(lockName + ".reap.cafebabe.claim.gc.12345678", aged = true)
    // a FRESH tombstone (a takeover in flight right now) must be left alone
    val freshTomb = plant(lockName + ".reap.feedface", aged = false)
    // debris of ANOTHER key is out of scope for this acquisition
    val otherTomb = plant("other.lease.reap.deadbeef", aged = true)
    // a pathological KEY whose encoded lock name prefix-matches k's debris
    // namespace — neither its lock file nor its own takeover debris is
    // k's to sweep (k's lease makes staleness conclusive only for k)
    val foreignLock = plant(lockName + ".reap.x.lease", aged = true)
    val foreignDebris = plant(lockName + ".reap.x.lease.reap.deadbeef", aged = true)
    // the boundary-straddling shape: a key literally named "k.lease.reap"
    // has lock "k.lease.reap.lease", whose ".lease" segment begins AT the
    // prefix edge — the dot must not be consumed by the prefix match
    val straddleLock = plant(lockName + ".reap.lease", aged = true)
    val straddleDebris = plant(lockName + ".reap.lease.reap.deadbeef", aged = true)
    // an expired lease at k itself: the acquisition goes through a reap,
    // i.e. is CONTENDED, which is what makes the sweep deterministic
    // (uncontended acquisitions only sample the sweep)
    LogStore.forScheme("file").writePutIfAbsent(leaseFs,
      new Path(leasePath, lockName),
      LogStore.FileLease.leaseBody("crashed", System.currentTimeMillis() - 60000))
    val lease = new LogStore.FileLease(leaseFs, leasePath, ttlMs = 1500L, graceMs = 300L)
    var ran = false
    lease.withLock("k", () => { ran = true })
    assert(ran)
    assert(!leaseFs.exists(tomb), "a stale orphan tombstone must be swept")
    assert(!leaseFs.exists(claim), "a stale orphan claim must be swept")
    assert(!leaseFs.exists(gc), "a stale orphan claim-GC file must be swept")
    assert(leaseFs.exists(freshTomb), "a fresh tombstone must not be touched")
    assert(leaseFs.exists(otherTomb), "another key's debris is not this lock's to sweep")
    assert(leaseFs.exists(foreignLock),
      "a prefix-matching foreign LOCK file must never be swept")
    assert(leaseFs.exists(foreignDebris),
      "a prefix-matching foreign key's own debris is not k's to judge")
    assert(leaseFs.exists(straddleLock),
      "a .lease segment straddling the prefix boundary must still exclude")
    assert(leaseFs.exists(straddleDebris),
      "a boundary-straddling foreign key's debris must still exclude")
  }

  test("a lease that vanishes from under its holder is declared lost at renewal") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_vanish"))
    val holder = new LogStore.FileLease(leaseFs, leasePath,
      ttlMs = 1500L, graceMs = 300L, ownerId = "holder")
    val lock = new Path(leasePath, java.net.URLEncoder.encode("k", "UTF-8") + ".lease")
    var observedMidBody = -1
    holder.withLock("k", () => {
      // a stray delete (or a taker crashed between its rename and its
      // restore): the lock file is simply GONE while the body runs
      leaseFs.delete(lock, false)
      // pre-fix, every renewal tick read this as a transient IOException
      // forever and the loss surfaced only at release — the renewer must
      // now declare it after a full TTL of consecutive missing reads,
      // while the body is still running
      Thread.sleep(5000)
      observedMidBody = holder.ownershipLostCount.get()
    })
    assert(observedMidBody == 1,
      "the vanished lease must be observed at RENEWAL, mid-body")
    assert(holder.ownershipLostCount.get() == 1, "release must not double-count")
  }

  test("release leaves an already-expired own lease for reaping") {
    val (leasePath, leaseFs) = localFs(tmpDir("graft_lease_relexp"))
    // default ttl 30 s → renewal period 10 s: no tick fires in this test
    val holder = new LogStore.FileLease(leaseFs, leasePath, ownerId = "o")
    val lock = new Path(leasePath, java.net.URLEncoder.encode("k", "UTF-8") + ".lease")
    holder.withLock("k", () => {
      // forge this acquisition's own lease as long-expired (as if the
      // renewer had been failing at the end of the body): same token,
      // past expiry — a taker may be mid-claim on exactly this content,
      // so release must NOT delete it
      val in = leaseFs.open(lock)
      val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      val tok = LogStore.FileLease.parseLease(txt).get._1
      val out = leaseFs.create(lock, true)
      out.write(LogStore.FileLease.leaseBody(tok, System.currentTimeMillis() - 60000))
      out.close()
    })
    assert(leaseFs.exists(lock),
      "an expired own lease must be left for reaping, not deleted")
    assert(holder.ownershipLostCount.get() == 0,
      "an expired-but-own lease at release is not a lost ownership")
    // the key stays acquirable through the normal reap path
    var ran = false
    new LogStore.FileLease(leaseFs, leasePath, ownerId = "p").withLock("k", () => { ran = true })
    assert(ran)
  }

  test("a check-then-put lease namespace is refused at construction") {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.mockfs.impl", classOf[MockFs].getName)
    val fs = new Path("mockfs:///").getFileSystem(conf)
    LogStore.register("mockfs", LogStore.CheckThenPut)
    try {
      val e = intercept[IllegalArgumentException](
        new LogStore.FileLease(fs, new Path("mockfs:/tmp/leases")))
      assert(e.getMessage.contains("check-then-put"))
    } finally LogStore.register("mockfs", LogStore.CreateNoOverwrite)
  }
}
