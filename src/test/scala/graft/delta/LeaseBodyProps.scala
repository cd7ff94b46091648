package graft.delta

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pins for the CRC-framed lease body format
  * ([[LogStore.FileLease.leaseBody]] / `parseLease`) — the frame is what
  * makes the heartbeat's non-atomic truncating rewrite safe, so its
  * guarantees get pinned as algebra, independent of any timing:
  *
  *   1. round-trip: every (owner, expiry) survives encode→decode exactly;
  *   2. torn reads: every STRICT byte prefix of a valid body parses as
  *      None (truncation can never misparse as a smaller expiry — the
  *      pre-CRC format lost a full-suite race exactly that way);
  *   3. corruption: any single-byte substitution parses as None or the
  *      original value, never as a DIFFERENT (owner, expiry) — CRC32
  *      detects all bursts ≤ 32 bits, so an 8-bit substitution can only
  *      survive if it leaves the payload semantically identical (it
  *      can't: different digits are different numbers, structure damage
  *      fails the 3-part split).
  */
object LeaseBodyProps extends Properties("FileLease.leaseBody") {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  // whitespace-free owners, the constructor-enforced contract (tokens are
  // `<ownerId>:<hex nonce>` in practice, but any ws-free string must work)
  private val ownerGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(':', '-', '_')))
      .map(_.mkString).suchThat(s => !s.exists(_.isWhitespace))

  private val expiryGen: Gen[Long] = Gen.chooseNum(0L, Long.MaxValue)

  property("round-trip") = forAll(ownerGen, expiryGen) { (owner, expiry) =>
    val body = new String(LogStore.FileLease.leaseBody(owner, expiry), utf8)
    LogStore.FileLease.parseLease(body).contains((owner, expiry))
  }

  property("every strict prefix reads as torn") =
    forAll(ownerGen, expiryGen) { (owner, expiry) =>
      val bytes = LogStore.FileLease.leaseBody(owner, expiry)
      (0 until bytes.length).forall { n =>
        LogStore.FileLease.parseLease(new String(bytes.take(n), utf8)).isEmpty
      }
    }

  property("single-byte corruption never yields a different lease") =
    forAll(ownerGen, expiryGen, Gen.chooseNum(0, 255)) { (owner, expiry, sub) =>
      val bytes = LogStore.FileLease.leaseBody(owner, expiry)
      (0 until bytes.length).forall { i =>
        val corrupted = bytes.clone()
        corrupted(i) = sub.toByte
        if (corrupted(i) == bytes(i)) true // not a corruption
        else {
          val parsed =
            LogStore.FileLease.parseLease(new String(corrupted, utf8))
          parsed.isEmpty || parsed.contains((owner, expiry))
        }
      }
    }
}
