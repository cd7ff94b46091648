package graft.operators

import graft.delta.TestBase
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the as-of join: inclusive vs strict time
  * boundaries, no-prior-state NULLs, deterministic tie keeper, and the
  * plan shape (one exchange, zero join nodes). */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  private def fixtures = {
    import spark.implicits._
    val probes = Seq(
      ("a", 5L, 100L), ("a", 10L, 101L), ("a", 15L, 102L), ("a", 25L, 103L),
      ("b", 50L, 104L) // key with no states at all
    ).toDF("k", "t", "pid")
    val states = Seq(
      ("a", 10L, 1L, "s1"), ("a", 20L, 2L, "s2")
    ).toDF("k", "t", "sid", "sval")
    (probes, states)
  }

  test("inclusive as-of: equal timestamps match; earlier probes get NULL") {
    val (probes, states) = fixtures
    val out = AsofJoin.asofJoin(probes, states, Seq("k"), "t", "t", Seq("sid", "sval"))
      .select("pid", "asof_sid", "asof_sval").collect()
      .map(r => (r.getLong(0), (Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(100L) == (None, None))            // t=5: before all states
    assert(out(101L) == (Some(1L), Some("s1")))  // t=10: equal-time state visible
    assert(out(102L) == (Some(1L), Some("s1")))  // t=15: latest <= 15
    assert(out(103L) == (Some(2L), Some("s2")))  // t=25: latest overall
    assert(out(104L) == (None, None))            // key with no states
  }

  test("strict as-of: equal timestamps do NOT match") {
    val (probes, states) = fixtures
    val out = AsofJoin.asofJoin(probes, states, Seq("k"), "t", "t", Seq("sid"),
        inclusive = false)
      .select("pid", "asof_sid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out(101L).isEmpty)       // t=10 probe vs t=10 state: strict < excludes
    assert(out(102L) == Some(1L))
  }

  test("ties at one (key, time) pick the max state struct, deterministically") {
    import spark.implicits._
    val probes = Seq(("a", 10L, 1L)).toDF("k", "t", "pid")
    val states = Seq(("a", 10L, 7L), ("a", 10L, 9L), ("a", 10L, 3L))
      .toDF("k", "t", "sid")
    val out = AsofJoin.asofJoin(probes, states, Seq("k"), "t", "t", Seq("sid"))
      .select("asof_sid").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("forward as-of: earliest state at or after; matches brute force on random data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (probes, states) = fixtures
    val out = AsofJoin.asofJoin(probes, states, Seq("k"), "t", "t", Seq("sid"),
        direction = "forward")
      .select("pid", "asof_sid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out(100L) == Some(1L))  // t=5 → next state t=10
    assert(out(101L) == Some(1L))  // t=10 → equal-time state (inclusive)
    assert(out(102L) == Some(2L))  // t=15 → next state t=20
    assert(out(103L).isEmpty)      // t=25: nothing after
    assert(out(104L).isEmpty)      // key with no states

    // brute force on random corpora: per probe, min state time >= t
    val rnd = new scala.util.Random(41)
    val ps = (1 to 300).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i.toLong)).toDF("k", "t", "pid")
    val ss = (1 to 200).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i.toLong)).toDF("k", "t", "sid")
    val got = AsofJoin.asofJoin(ps, ss, Seq("k"), "t", "t", Seq("sid"),
        direction = "forward")
      .select("pid", "asof_sid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap
    val brute = ps.as("p").join(ss.as("s"),
        col("p.k") === col("s.k") && col("s.t") >= col("p.t"), "left")
      .groupBy(col("p.pid"))
      // nearest future state; ties at one time → min sid (min struct)
      .agg(min(when(col("s.t").isNotNull, struct(col("s.t"), col("s.sid")))).as("m"))
      .select(col("pid"), col("m.sid"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap
    assert(got == brute,
      s"first diff: ${got.find { case (k, v) => brute(k) != v }}")
  }

  test("plan is one exchange and zero joins") {
    val (probes, states) = fixtures
    val plan = AsofJoin.asofJoin(probes, states, Seq("k"), "t", "t", Seq("sid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$plan")
  }
}
