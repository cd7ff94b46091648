package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget packs — the
  * step that turns a filtered corpus into training-context-sized units.
  *
  * Sequential fill in deterministic id order: pack_id = (running token
  * total BEFORE the doc) DIV budget. A doc straddling a boundary joins
  * the earlier pack (the simple sequential-fill contract; packs can
  * overflow by at most one document, which the trainer's truncation
  * handles — identical to the common greedy concat pipelines).
  *
  * Scale: the running sum windows over a GROUP column (shard/source/
  * date), not a global order — one window task per group, parallel
  * across groups, no global sort. Deterministic: pure function of
  * (group, id order, token counts), so re-runs and engines agree.
  */
object Packing {

  def sequentialPack(
      df: DataFrame, groupCol: String, idCol: String, nTokensCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(nTokensCol)).over(w))
      .withColumn("pack_id",
        ((col("__cum") - col(nTokensCol)).cast("long")
          .divide(lit(budgetTokens))).cast("long"))
      .drop("__cum")
  }

  /** Split long documents into fixed-size overlapping token windows —
    * the long-context/RAG counterpart of [[sequentialPack]] (packing
    * joins short docs; chunking cuts long ones). Chunk `i` starts at
    * token `i·stride + 1` (1-based) and takes up to `chunkTokens`
    * whitespace tokens; starts advance while the PREVIOUS chunk did not
    * already reach the end of the document, so every token lands in at
    * least one chunk, consecutive chunks overlap by `chunkTokens −
    * stride` tokens, and a doc with ≤ `chunkTokens` tokens yields exactly
    * one chunk. Docs with no tokens yield no rows. Returns
    * (id, chunk_id, start_tok, n_tok, chunk_text).
    *
    * Scale shape: the split, the start sequence, and the slices are all
    * scan-local expressions feeding one generator (posexplode) — ZERO
    * shuffles, output size corpus·(1/stride) rows, no per-doc state off
    * the scan. */
  def chunkWithOverlap(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens: chunkTokens=$chunkTokens stride=$stride")
    val words = filter(split(col(textCol), " "), w => length(w) > 0)
    val n = size(words)
    // last start index i satisfies i·stride + chunkTokens < n + stride,
    // i.e. maxI = ceil((n − chunkTokens) / stride) clamped at 0
    val maxI = greatest(lit(0),
      ceil((n - chunkTokens).cast("double") / stride).cast("int"))
    df.filter(n > 0)
      .select(col(idCol), words.as("__w"),
        posexplode(transform(sequence(lit(0), maxI), i => i * stride)))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_id"),
        (col("col") + 1).cast("long").as("start_tok"),
        least(lit(chunkTokens), size(col("__w")) - col("col")).cast("long").as("n_tok"),
        array_join(slice(col("__w"), col("col") + 1,
          least(lit(chunkTokens), size(col("__w")) - col("col"))), " ").as("chunk_text"))
  }

  /** Per-pack roll-up (doc count + token total) — the pack manifest a
    * downstream concat/tokenize job consumes. */
  def packManifest(
      df: DataFrame, groupCol: String, idCol: String, nTokensCol: String,
      budgetTokens: Long): DataFrame =
    sequentialPack(df, groupCol, idCol, nTokensCol, budgetTokens)
      .groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(nTokensCol)).as("tok_sum"))
}
