package graft.operators

import graft.delta.TestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting must never change the answer: the skew-safe join's output is
  * pinned row-for-row against the plain inner join, across hot/cold
  * splits, all-hot and no-hot edges, and repeated runs (salt assignment
  * is routing, not semantics). */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  private def fixture = {
    import spark.implicits._
    // key 7 owns half the fact table (hot); keys 0-99 share the rest
    val fact = ((1L to 5000L).map(i => (if (i % 2 == 0) 7L else i % 100, i)) :+
      ((101L, 0L))) // key with no dim match — must vanish in BOTH joins
      .toDF("k", "payload")
    val dim = (0L to 100L).map(i => (i, s"dim$i")).toDF("k", "attr")
    (fact, dim)
  }

  test("salted join equals the plain join exactly") {
    val (fact, dim) = fixture
    val plain = fact.join(dim, Seq("k")).orderBy("k", "payload").collect().toSeq
    val salted = SkewJoin.skewSafeJoin(fact, dim, Seq("k"),
        salts = 8, hotThreshold = 500L)
      .orderBy("k", "payload").collect().toSeq
    assert(salted == plain, s"salted join diverged (${salted.size} vs ${plain.size} rows)")
    // determinism across runs
    val again = SkewJoin.skewSafeJoin(fact, dim, Seq("k"),
        salts = 8, hotThreshold = 500L)
      .orderBy("k", "payload").collect().toSeq
    assert(again == salted)
  }

  test("all-hot and no-hot thresholds still produce the plain join") {
    val (fact, dim) = fixture
    val plain = fact.join(dim, Seq("k")).orderBy("k", "payload").collect().toSeq
    val allHot = SkewJoin.skewSafeJoin(fact, dim, Seq("k"),
        salts = 4, hotThreshold = 1L)
      .orderBy("k", "payload").collect().toSeq
    assert(allHot == plain, "threshold=1 (everything salted) diverged")
    val noHot = SkewJoin.skewSafeJoin(fact, dim, Seq("k"),
        salts = 4, hotThreshold = Long.MaxValue)
      .orderBy("k", "payload").collect().toSeq
    assert(noHot == plain, "threshold=MaxValue (nothing salted) diverged")
  }

  test("hot keys actually take the salted branch (plan has both arms)") {
    val (fact, dim) = fixture
    val df = SkewJoin.skewSafeJoin(fact, dim, Seq("k"), salts = 8, hotThreshold = 500L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Union"), s"expected a two-arm union plan:\n$plan")
    // the hot arm spreads key 7 across several salt sub-keys: with 2500
    // rows and 8 salts, every salt value should see some rows — verify
    // the salted fact side distributes (indirectly: result correct AND
    // the hot dim side replicated 8x = salts)
    import spark.implicits._
    val hotDimRows = dim.filter($"k" === 7L).count() * 8
    assert(hotDimRows == 8, "fixture: exactly one hot dim row, replicated 8x")
  }
}
