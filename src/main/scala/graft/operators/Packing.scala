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

  /** Per-pack roll-up (doc count + token total) — the pack manifest a
    * downstream concat/tokenize job consumes. */
  def packManifest(
      df: DataFrame, groupCol: String, idCol: String, nTokensCol: String,
      budgetTokens: Long): DataFrame =
    sequentialPack(df, groupCol, idCol, nTokensCol, budgetTokens)
      .groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(nTokensCol)).as("tok_sum"))
}
