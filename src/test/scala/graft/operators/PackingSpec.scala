package graft.operators

import graft.delta.TestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence-packing invariants: deterministic assignment, contiguous
  * packs in id order, budget respected up to the one straddling doc,
  * and group-parallel windows (no global sort). */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestBase.spark

  test("sequential fill packs in id order within each group") {
    import spark.implicits._
    // group a: tokens 1000×4, budget 2048. Docs 1-3 start before the
    // boundary (cum_before 0/1000/2000) -> pack 0 (doc 3 straddles, per
    // the sequential-fill contract); doc 4 starts at 3000 -> pack 1.
    // group b: a 5000-token doc fills packs alone; doc 2 starts at 5000 -> pack 2.
    val df = Seq(
      ("a", 1L, 1000L), ("a", 2L, 1000L), ("a", 3L, 1000L), ("a", 4L, 1000L),
      ("b", 1L, 5000L), ("b", 2L, 100L)
    ).toDF("grp", "doc_id", "n_tokens")
    val packed = Packing.sequentialPack(df, "grp", "doc_id", "n_tokens", 2048L)
      .select("grp", "doc_id", "pack_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(packed == Map(
      ("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 0L, ("a", 4L) -> 1L,
      ("b", 1L) -> 0L, ("b", 2L) -> 2L))
  }

  test("pack ids are monotone in doc order and every doc lands in a pack") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1L to 5000L).map(i => ("g" + (i % 7), i, 10L + rnd.nextInt(500)))
      .toDF("grp", "doc_id", "n_tokens")
    val packed = Packing.sequentialPack(df, "grp", "doc_id", "n_tokens", 2048L)
    assert(packed.count() == 5000)
    val viol = packed.as("x").join(packed.as("y"),
        col("x.grp") === col("y.grp") && col("x.doc_id") < col("y.doc_id") &&
          col("x.pack_id") > col("y.pack_id"))
      .count()
    assert(viol == 0, s"$viol monotonicity violations")
    // budget respected up to one straddling doc per pack
    val over = Packing.packManifest(df, "grp", "doc_id", "n_tokens", 2048L)
      .filter(col("tok_sum") >= 2048L + 510L).count()
    assert(over == 0, s"$over packs exceed budget + max doc size")
  }
}
