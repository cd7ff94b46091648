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

  test("chunkWithOverlap: hand-computed windows, tail clamp, short/empty docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens, chunk 4 stride 2 -> starts 0,2,4,6
      (2L, "a b c"),               // 3 tokens  -> one whole-doc chunk
      (3L, ""),                    // no tokens -> no rows
      (4L, "a  b   c d e")         // repeated spaces: 5 tokens after empty-filter
    ).toDF("doc_id", "text")
    val out = Packing.chunkWithOverlap(df, "doc_id", "text", chunkTokens = 4, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start_tok", "n_tok", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1L, 4L, "a b c d"), (1L, 1L, 3L, 4L, "c d e f"),
      (1L, 2L, 5L, 4L, "e f g h"), (1L, 3L, 7L, 4L, "g h i j"),
      (2L, 0L, 1L, 3L, "a b c"),
      (4L, 0L, 1L, 4L, "a b c d"), (4L, 1L, 3L, 3L, "c d e")))
  }

  test("chunkWithOverlap: every token covered, overlap = chunk - stride, no shuffle") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val df = (1L to 300L)
      .map(i => (i, (1 to (1 + rnd.nextInt(40))).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.chunkWithOverlap(df, "doc_id", "text", chunkTokens = 12, stride = 8)
    // coverage: per doc, max(start_tok + n_tok - 1) == token count, min start == 1,
    // and consecutive starts differ by exactly the stride
    val bad = out.groupBy("doc_id")
      .agg(max(col("start_tok") + col("n_tok") - 1).as("covered"),
        min(col("start_tok")).as("first"),
        max(col("start_tok")).as("last"),
        count(lit(1)).as("k"))
      .join(df.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n")), "doc_id")
      .filter(col("covered") =!= col("n") || col("first") =!= 1L ||
        col("last") =!= (col("k") - 1L) * 8L + 1L)
      .count()
    assert(bad == 0, s"$bad docs with coverage/stride violations")
    // scan-local: the physical plan must contain no exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
