package graft.operators

import graft.delta.TestBase
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality pins: the approximate paths must actually find
  * neighbors — measured as recall against the exact brute force on the
  * sf0.001 embeddings (deterministic: fixed seeds everywhere). */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark
  private val emb = "/root/testdata/sf0.001/embeddings.parquet"
  private val qids = Seq(0L, 1L, 2L, 3L, 4L)

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("IVF recall@10 vs brute force is high on clustered data") {
    val df = spark.read.parquet(emb)
    val exact = topkSet(Similarity.bruteForceTopK(df, "vec_id", "embedding", qids, 10))
    val ivf = topkSet(Similarity.ivfTopK(df, "vec_id", "embedding", qids, 10))
    val recalls = qids.map(q => ivf.getOrElse(q, Set.empty)
      .intersect(exact(q)).size / 10.0)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean IVF recall@10 = $mean ($recalls)")
  }

  test("hyperplane-LSH recall@10 vs brute force is nontrivial") {
    val df = spark.read.parquet(emb)
    val exact = topkSet(Similarity.bruteForceTopK(df, "vec_id", "embedding", qids, 10))
    val lsh = topkSet(Similarity.lshTopK(df, "vec_id", "embedding", qids, 10, dim = 64))
    val recalls = qids.map(q => lsh.getOrElse(q, Set.empty)
      .intersect(exact(q)).size / 10.0)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean LSH recall@10 = $mean ($recalls)")
  }
}
