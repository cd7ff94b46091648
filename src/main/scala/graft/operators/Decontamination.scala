package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination: flag training documents that share word
  * n-grams with benchmark/eval text — the standard n-gram-overlap
  * protocol (13-grams in the GPT-3/PaLM writeups; `n` is a parameter).
  *
  * Scale design: the eval side is tiny by contract (benchmarks), so its
  * exploded distinct grams BROADCAST; the corpus side is one explode →
  * broadcast-hash-join → per-doc count — a single scan of the corpus
  * with no shuffle of document text. Never a cross join; documents with
  * fewer than n words fall back to whole-text matching (the
  * shinglesOfWords contract), so short eval strings still flag exact
  * copies.
  */
object Decontamination {

  /** (doc_id, n_contaminated_grams) for every training doc sharing at
    * least one distinct word n-gram with any eval doc. */
  def flagContaminated(
      docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String, n: Int = 13): DataFrame = {
    val docGrams = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__w"))
      .select(col("doc_id"), explode(Dedup.shinglesOfWords(col("__w"), n)).as("gram"))
    val evalGrams = evalDocs
      .select(split(col(evalTextCol), " ").as("__w"))
      .select(explode(Dedup.shinglesOfWords(col("__w"), n)).as("gram"))
      .distinct()
    docGrams.join(broadcast(evalGrams), "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_grams"))
  }

  /** Drop contaminated docs (≥ minOverlaps shared n-grams) from the
    * corpus — flag + left_anti in one call. */
  def decontaminate(
      docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String, n: Int = 13,
      minOverlaps: Long = 1L): DataFrame = {
    val flagged = flagContaminated(docs, idCol, textCol, evalDocs, evalTextCol, n)
      .filter(col("n_contaminated_grams") >= minOverlaps)
      .select(col("doc_id").as(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }
}
