package graft.operators

import graft.delta.TestBase
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins for the binned range join: boundary inclusivity, bin-edge and
  * negative-coordinate correctness, exactly-once pair emission,
  * equivalence with the naive non-equi join, loud span guards, and the
  * plan shape (hash/sort-merge join, never nested-loop/cartesian). */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  test("point-in-interval matches both closed ends, across bins, at negative coords") {
    import spark.implicits._
    val pts = Seq(
      ("a", 10L, 1L), ("a", 20L, 2L), ("a", 21L, 3L),  // on-start, on-end, past-end
      ("a", 9L, 4L),                                    // before start
      ("a", -15L, 5L),                                  // negative, inside
      ("b", 15L, 6L)                                    // wrong key
    ).toDF("k", "p", "pid")
    val ivs = Seq(
      ("a", 10L, 20L, 100L),   // spans bins floor(10/8)=1..2 with w=8
      ("a", -20L, -10L, 101L)  // negative bins
    ).toDF("k", "s", "e", "iid")
    val got = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "s", "e", binWidth = 8L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 100L), (5L, 101L)))
  }

  test("point-in-interval equals the naive non-equi join on hash-generated data") {
    import spark.implicits._
    val pts = spark.range(500).select(
      (col("id") % 7).as("k"),
      (hash(col("id")).cast("long") % 1000).as("p"),
      col("id").as("pid"))
    val ivs = spark.range(80).select(
      (col("id") % 7).as("k"),
      (hash(col("id") + 9999).cast("long") % 1000).as("s"),
      col("id").as("iid"))
      .withColumn("e", col("s") + (abs(hash(col("iid"))) % 120))
    val binned = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "s", "e", binWidth = 50L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.join(ivs, Seq("k"))
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    assert(naive.nonEmpty, "degenerate fixture: naive join matched nothing")
  }

  test("interval overlap emits each pair exactly once, touching ends included") {
    import spark.implicits._
    val l = Seq(("a", 0L, 100L, 1L), ("a", 200L, 210L, 2L)).toDF("k", "ls", "le", "lid")
    val r = Seq(
      ("a", 50L, 400L, 10L),  // overlaps BOTH l intervals, across many shared bins
      ("a", 100L, 120L, 11L), // touches lid=1 at a single point
      ("a", 101L, 150L, 12L)  // gap: overlaps neither
    ).toDF("k", "rs", "re", "rid")
    val got = RangeJoin.intervalOverlap(l, r, Seq("k"), "ls", "le", "rs", "re",
        binWidth = 16L, maxBinsPerInterval = 64)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length == got.toSet.size, s"duplicate pairs emitted: ${got.toSeq}")
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (1L, 11L)))
  }

  test("inverted or over-wide intervals fail loudly") {
    import spark.implicits._
    val pts = Seq(("a", 5L, 1L)).toDF("k", "p", "pid")
    val inverted = Seq(("a", 20L, 10L, 1L)).toDF("k", "s", "e", "iid")
    val huge = Seq(("a", 0L, 1000000L, 1L)).toDF("k", "s", "e", "iid")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, inverted, Seq("k"), "p", "s", "e", 8L)
    }
    assert(e1.getMessage.contains("inverted or span"))
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, huge, Seq("k"), "p", "s", "e", 8L,
        maxBinsPerInterval = 16)
    }
  }

  test("plan is an equi hash/sort-merge join, never nested-loop or cartesian") {
    import spark.implicits._
    val pts = Seq(("a", 10L, 1L)).toDF("k", "p", "pid")
    val ivs = Seq(("a", 0L, 20L, 1L)).toDF("k", "s", "e", "iid")
    val plan = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "p", "s", "e", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join degenerated to a pair-explosion plan:\n$plan")
  }
}
