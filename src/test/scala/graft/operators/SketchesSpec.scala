package graft.operators

import graft.delta.TestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch invariants: registers/counters match a pure-Scala reference,
  * are repartition-invariant (deterministic hashes, order-free
  * aggregates), merge correctly across shards, and honor their error
  * contracts (HLL within its standard-error envelope; Count-Min never
  * underestimates and is exact when cells don't collide). */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  private val P1 = 1000000007L
  private val P2 = 998244353L
  private def poly60(s: String): Long = {
    var h1 = 0L; var h2 = 0L
    s.foreach { c =>
      h1 = (31L * h1 + c) % P1
      h2 = (131L * h2 + c) % P2
    }
    h2 * 1073741824L + h1
  }
  private def refRank(h: Long): Long = {
    val rest = h >> 8
    if (rest == 0) Sketches.HllZeroRank
    else java.lang.Long.numberOfTrailingZeros(rest) + 1L
  }

  test("hllGramRegisters matches a pure-Scala register build and is repartition-invariant") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Sketches.hllGramRegisters(docs, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: every word-3-gram string (whole text when < 3 words),
    // hashed with the polyhash60 pair, folded into 256 max-rank registers
    val regs = new Array[Long](256)
    docs.select("text").collect().map(_.getString(0)).foreach { t =>
      val ws = t.split(" ", -1)
      val grams = if (ws.length < 3) Seq(t)
        else (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" "))
      grams.foreach { g =>
        val h = poly60(g)
        val reg = (h & 255L).toInt
        regs(reg) = math.max(regs(reg), refRank(h))
      }
    }
    assert(got == regs.indices.map(i => i.toLong -> regs(i)).toMap)
    val re = Sketches.hllGramRegisters(docs.repartition(13), "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == got, "registers must not depend on partitioning")
  }

  test("HLL estimate lands inside the m=256 error envelope on planted cardinalities") {
    import spark.implicits._
    // text-like diverse items (random letter words): a polynomial hash
    // needs input entropy spread across positions — sequential-suffix
    // strings ("wordN") cluster h in a narrow window and legitimately
    // break ANY polynomial sketch, so the plant mirrors what the
    // operator hashes in production: natural-text grams
    val rnd = new scala.util.Random(3)
    def word() = (0 until 6 + rnd.nextInt(6))
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    for (n <- Seq(1000, 50000)) {
      val docs = (1 to n).map(_ => word()).distinct.toDF("text")
      val truth = docs.count()
      val regs = Sketches.hllGramRegisters(docs, "text", n = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val est = Sketches.hllEstimate(regs)
      assert(math.abs(est - truth) / truth <= 0.2,
        f"estimate $est%.0f for true $truth outside 20%% (sigma is ~6.5%%)")
    }
  }

  test("HLL registers merge across shards: max-per-register == whole-corpus registers") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val whole = Sketches.hllGramRegisters(docs, "text", 3)
    val a = Sketches.hllGramRegisters(docs.filter($"doc_id" % 2 === 0), "text", 3)
    val b = Sketches.hllGramRegisters(docs.filter($"doc_id" % 2 === 1), "text", 3)
    val merged = a.unionAll(b).groupBy("reg").agg(max("max_rho").as("max_rho"))
    val diff = merged.join(whole.withColumnRenamed("max_rho", "want"), "reg")
      .filter($"max_rho" =!= $"want").count()
    assert(diff == 0, "sharded registers must merge to the whole-corpus sketch")
  }

  test("Count-Min: exact when cells don't collide, one-sided under forced collisions") {
    import spark.implicits._
    val docs = Seq("x x x y", "y z", "x q").toDF("text")
    val counters = Sketches.countMinCounters(docs, "text")
    val est = Sketches.cmEstimates(counters,
        Seq("x", "y", "z", "q", "absent").toDF("term"), "term")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 4 distinct words in 4096 cells: no collisions, estimates exact
    assert(est == Map("x" -> 4L, "y" -> 2L, "z" -> 1L, "q" -> 1L, "absent" -> 0L))
    // forced-collision regime: vocabulary ~8x the width -> estimates may
    // only OVERcount, never undercount
    val big = (1 to 8192).map(i => s"w$i w$i").toDF("text")
    val bigCounters = Sketches.countMinCounters(big, "text")
    val probes = (1 to 200).map(i => s"w${i * 37 % 8192 + 1}").distinct.toDF("term")
    val under = Sketches.cmEstimates(bigCounters, probes, "term")
      .filter($"cms_est" < 2L).count()
    assert(under == 0, "Count-Min must never underestimate")
  }

  test("kmvSketches equals the naive per-source k-smallest; repartition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = 64
    val got = Sketches.kmvSketches(docs, "text", "source", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // naive reference: full distinct (source, h) then row_number <= k
    val b = org.apache.spark.sql.graft.VectorBridge
    val sh = docs.select($"source", explode(b.wordGramHash60($"text", 3)).as("h")).distinct()
    val w = Window.partitionBy("source").orderBy("h")
    val want = sh.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(1))).toSet
    assert(got == want)
    val re = Sketches.kmvSketches(docs.repartition(17), "text", "source", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(re == got, "sketches must not depend on partitioning")
  }

  test("kmvJaccard recovers a planted overlap fraction") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    def word() = (0 until 8).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val sharedW = (1 to 2000).map(_ => word())
    val onlyA = (1 to 2000).map(_ => word())
    val onlyB = (1 to 2000).map(_ => word())
    // single-word docs -> whole-text grams: J = |shared| / |union| = 2000/6000
    val docs = (sharedW ++ onlyA).map(("a", _)) ++ (sharedW ++ onlyB).map(("b", _))
    val df = docs.toDF("source", "text")
    val k = 256
    val est = Sketches.kmvJaccard(Sketches.kmvSketches(df, "text", "source", k), k)
      .collect()
    assert(est.length == 1)
    val pm = est.head.getLong(4)
    assert(math.abs(pm - 3333) <= 1000,
      s"planted J=1/3 estimated at $pm per-myriad (k=256 sigma ~300)")
  }

  test("Count-Min counters merge across shards by cell-wise addition") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val whole = Sketches.countMinCounters(docs, "text")
    val a = Sketches.countMinCounters(docs.filter($"doc_id" % 2 === 0), "text")
    val b = Sketches.countMinCounters(docs.filter($"doc_id" % 2 === 1), "text")
    val merged = a.unionAll(b).groupBy("row", "pos").agg(sum("n").as("n"))
    val diff = merged.join(whole.withColumnRenamed("n", "want"), Seq("row", "pos"), "full")
      .filter(coalesce($"n", lit(0L)) =!= coalesce($"want", lit(0L))).count()
    assert(diff == 0, "sharded counters must add to the whole-corpus sketch")
  }
}
