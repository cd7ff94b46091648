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

  test("native dot_q equals the HOF formulation bit-for-bit (incl. nulls, length mismatch)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(emb).limit(200)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("v"))
    // pair each vector with a rotated partner, a truncated one, and null
    val paired = df.as("l").join(df.as("r"),
        col("l.vec_id") =!= col("r.vec_id") && col("r.vec_id") < 20)
      .select(
        col("l.v").as("a"),
        col("r.v").as("b"),
        slice(col("r.v"), 1, 17).as("b_short"),
        lit(null).cast("array<bigint>").as("b_null"))
    val checked = paired.select(
      (Similarity.dotQ(col("a"), col("b")) <=>
        Similarity.dotQViaHof(col("a"), col("b"))).as("full"),
      (Similarity.dotQ(col("a"), col("b_short")) <=>
        Similarity.dotQViaHof(col("a"), col("b_short"))).as("short"),
      (Similarity.dotQ(col("a"), col("b_null")) <=>
        Similarity.dotQViaHof(col("a"), col("b_null"))).as("nul"),
      Similarity.dotQ(col("a"), col("b_null")).isNull.as("null_prop"))
    val bad = checked.filter(!col("full") || !col("short") || !col("nul") || !col("null_prop"))
    assert(bad.count() == 0)
  }

  test("brute-force hot path plans the native dot_q, no interpreted HOFs") {
    val df = spark.read.parquet(emb)
    val plan = Similarity.bruteForceTopK(df, "vec_id", "embedding", qids, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dot_q"), "expected the native DotProductQ in the plan")
    assert(!plan.contains("zip_with") && !plan.contains("aggregate("),
      "interpreted higher-order functions leaked into the brute-force plan")
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
