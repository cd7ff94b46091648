package graft.functions

import graft.delta.TestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface must bind the SAME kernels as the DataFrame
  * facade — same names, same values — and reject mis-shaped calls with
  * a clear error instead of mis-binding. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    // a derived session: install() registers into ITS registry only, so
    // the shared TestBase session stays pristine
    val s = TestBase.spark.newSession()
    org.apache.spark.sql.graft.GraftFunctions.install(s)
    s
  }

  test("kernel SQL functions run from plain spark.sql and match the facade") {
    val r = spark.sql(
      """SELECT
        |  word_grams('a b c d', 3)          AS grams,
        |  word_gram_xxhash64('a b c d', 3)  AS gh,
        |  minhash_sig(word_gram_xxhash64('a b c d', 3)) AS sig,
        |  fingerprint31('abc')              AS fp,
        |  alnum_run_count('a1 b,,c')        AS runs,
        |  polyhash31('abc')                 AS p31,
        |  sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS ic,
        |  dot_q(array(2L, 3L), array(4L, 5L)) AS dq
        |""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getLong(3) == 590L) // 97*1 + 98*2 + 99*3
    assert(r.getInt(4) == 3)     // a1 | b | c
    assert(r.getLong(6) == 2L)   // {3, 5}
    assert(r.getLong(7) == 23L)  // 2*4 + 3*5

    // values equal the DataFrame facade (the operators' own path)
    import spark.implicits._
    val df = Seq("the quick brown fox jumps over the dog").toDF("s")
    val sqlSide = df.selectExpr(
      "word_gram_xxhash64(s, 3) AS h", "minhash_sig(word_gram_xxhash64(s, 3)) AS sig",
      "fingerprint31(s) AS fp", "simhash64(word_gram_hash60(s, 3)) AS sh",
      "bpe_stats(s) AS bpe", "winnow_select(rolling_hash60(s, 10), 4) AS ws")
    val facadeSide = df.select(
      VectorFunctions.wordGramXxhash64($"s", 3).as("h"),
      { val (a, b, p) = graft.operators.Dedup.signatureParams
        VectorFunctions.minhashSigQ(VectorFunctions.wordGramXxhash64($"s", 3), a, b, p).as("sig") },
      VectorFunctions.fingerprint31($"s").as("fp"),
      VectorFunctions.simhash64(VectorFunctions.wordGramHash60($"s", 3)).as("sh"),
      VectorFunctions.bpeStatsQ($"s",
        graft.operators.TextAnalysis.BpeVocab.toIndexedSeq).as("bpe"),
      VectorFunctions.winnowSelect(
        org.apache.spark.sql.graft.VectorBridge.rollingHash60($"s", 10), 4).as("ws"))
    assert(sqlSide.head() == facadeSide.head())
  }

  test("winnow_select: nullable-TYPED inputs work when null-free; an actual null errors descriptively (ADVICE r16)") {
    // transform()/element_at-built arrays are nullable-typed even when
    // provably null-free — those must keep working (the r15 analysis
    // gate broke them)
    val viaTransform = spark.sql(
      "SELECT winnow_select(transform(array(3L, 1L, 2L), x -> x + 0L), 2) AS s").head()
    assert(viaTransform.getSeq[Long](0) == Seq(2L))
    // an ACTUAL null element raises the named runtime error (never the
    // kernel's bare NPE), pointing at the offending position
    val e = intercept[Exception] {
      spark.sql("SELECT winnow_select(array(1L, CAST(NULL AS BIGINT)), 3)").collect()
    }
    val rootMsg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(rootMsg.contains("null element at position 2"), rootMsg)
    assert(rootMsg.contains("null-free"), rootMsg)
    // non-nullable arrays keep working guard-free
    // windows [3,1] and [1,2] both select the 1 at position 2
    val ok = spark.sql("SELECT winnow_select(array(3L, 1L, 2L), 2) AS s").head()
    assert(ok.getSeq[Long](0) == Seq(2L))
  }

  test("config-time extensions hook registers without error; bad calls fail loudly") {
    new graft.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    val e1 = intercept[Exception](spark.sql("SELECT word_grams('a b c', id) FROM range(1)").head())
    assert(e1.getMessage.contains("INTEGER literal"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql("SELECT fingerprint31('a', 'b')").head())
    assert(e2.getMessage.contains("expects 1"), e2.getMessage)
    // the shared base session must NOT see the runtime-installed names
    val base = TestBase.spark
    val e3 = intercept[Exception](base.sql("SELECT fingerprint31('abc')").head())
    assert(e3.getMessage.toLowerCase.contains("unresolved") ||
      e3.getMessage.toLowerCase.contains("cannot be found"), e3.getMessage)
  }
}
