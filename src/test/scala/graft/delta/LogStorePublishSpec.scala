package graft.delta

import java.nio.file.Files

/** The Posix no-hardlink publish fallback (ADVICE r14): exclusivity via a
  * zero-byte CREATE_NEW reservation, content via ATOMIC_MOVE over it —
  * racers fail the reservation, readers never see partial content (the
  * old stream-into-destination shape let a newline-boundary truncation
  * parse as a valid-but-incomplete commit). The branch is unreachable on
  * a hardlink-capable FS through the public API, so it is pinned
  * directly. */
class LogStorePublishSpec extends GraftSuite {

  test("no-hardlink publish: content-complete, exclusive, tmp consumed") {
    val dir = Files.createTempDirectory("graft_nhl")
    dir.toFile.deleteOnExit()
    val p = dir.resolve("00000000000000000001.json")
    val bytes = ("{\"commitInfo\":{\"timestamp\":1}}\n" * 200).getBytes
    val tmp1 = dir.resolve(".t1")
    Files.write(tmp1, bytes)
    LogStore.Posix.publishNoHardlink(p, tmp1)
    assert(java.util.Arrays.equals(Files.readAllBytes(p), bytes),
      "published content must be the complete temp body")
    assert(!Files.exists(tmp1), "ATOMIC_MOVE must consume the temp")
    // a racer loses on the reservation and the winner's content is intact
    val tmp2 = dir.resolve(".t2")
    Files.write(tmp2, "{\"other\":1}\n".getBytes)
    intercept[java.nio.file.FileAlreadyExistsException](
      LogStore.Posix.publishNoHardlink(p, tmp2))
    assert(java.util.Arrays.equals(Files.readAllBytes(p), bytes),
      "the losing racer must not disturb the published body")
  }

  test("no-hardlink publish races: exactly one winner, loser sees EEXIST") {
    val dir = Files.createTempDirectory("graft_nhl_race")
    dir.toFile.deleteOnExit()
    (1 to 20).foreach { i =>
      val p = dir.resolve(f"$i%020d.json")
      val bodies = Seq("A", "B").map(tag =>
        (s"""{"who":"$tag"}""" + "\n") * 50)
      val tmps = bodies.zipWithIndex.map { case (b, j) =>
        val t = dir.resolve(s".t$i-$j")
        Files.write(t, b.getBytes)
        t
      }
      val results = {
        val out = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
        val threads = tmps.map { t =>
          new Thread(() =>
            out.add(
              try { LogStore.Posix.publishNoHardlink(p, t); true }
              catch { case _: java.nio.file.FileAlreadyExistsException => false }))
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        import scala.jdk.CollectionConverters._
        out.asScala.toList
      }
      assert(results.count(identity) == 1, s"exactly one winner per version: $results")
      val body = new String(Files.readAllBytes(p))
      assert(bodies.contains(body), "the published body is one writer's COMPLETE body")
    }
  }
}
