package graft.operators

import graft.delta.TestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for the operator layer: the sampling hash must agree
  * with an independent pure-Scala evaluation on ANY long id (the SQL
  * oracle mirrors the same arithmetic), and the two exact-dedup
  * implementations must be extensionally equal on random corpora. */
object OperatorProps extends Properties("Operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxSize(60)

  private lazy val spark = TestBase.spark

  /** Reference evaluation of Sampling.hashBucket in plain Scala. */
  private def refBucket(id: Long, buckets: Int): Long = {
    val x0 = (id & 0x7FFFFFFFL) ^ ((id >> 31) & 0x7FFFFFFFL)
    val x1 = (x0 * 1103515245L + 12345L) & 0x7FFFFFFFL
    val x2 = (x1 * 1103515245L + 12345L) & 0x7FFFFFFFL
    (x2 >> 11) % buckets
  }

  property("hashBucket equals the pure-Scala reference on any long id") =
    forAll(Gen.listOfN(50, Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))) { ids =>
      import spark.implicits._
      val got = ids.toDF("id")
        .select(col("id"), Sampling.hashBucket(col("id"), 10000).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      ids.forall(id => got(id) == refBucket(id, 10000))
    }

  private val corpusGen: Gen[List[(Long, String, Long)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0L, 10000L)
      key <- Gen.oneOf("a", "b", "c", "d")
      ord <- Gen.chooseNum(0L, 100L)
    } yield (id, key, ord)).map(_.zipWithIndex.map {
      // unique ord per row so both variants are deterministic
      case ((id, key, _), i) => (id, key, i.toLong)
    })

  property("exact dedup: min_by aggregation equals the window variant") =
    forAll(corpusGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("id", "key", "ord")
      val a = Dedup.exact(df, Seq("key"), "ord")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val b = Dedup.exactViaWindow(df, Seq("key"), "ord")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      a == b
    }
}
