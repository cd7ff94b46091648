package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-function surface for the engine's native codegen kernels: every
  * kernel the Scala operators run (`graft.functions.VectorFunctions`)
  * becomes callable from plain `spark.sql(...)` — a SQL-first user gets
  * the same scan-speed text/similarity primitives without touching the
  * DataFrame API.
  *
  * Two installation paths, same builder table:
  *   - config-time: `--conf spark.sql.extensions=graft.GraftExtensions`
  *     (the standard `SparkSessionExtensions` route; applies to every
  *     session of the application)
  *   - runtime: `GraftFunctions.install(spark)` on a live session
  *     (registers into that session's function registry)
  *
  * Parameter kernels (`word_grams(text, n)`, `rolling_hash60(s, len)`)
  * take their width as an INTEGER LITERAL — it shapes the generated
  * loop, so a column-valued width is rejected at analysis with a clear
  * error rather than silently mis-binding. `minhash_sig(hs)` binds the
  * engine's fixed deterministic coefficient family
  * ([[graft.operators.Dedup.signatureParams]]), so SQL signatures are
  * bit-identical to `Dedup.minhashSignatures`. */
object GraftFunctions {

  private def intLit(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an INTEGER literal (it shapes the generated loop), " +
        s"got: ${other.sql}")
  }

  private def arity(args: Seq[Expression], fn: String, n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${args.length}")

  /** name → (usage, builder). One row per kernel. */
  val functions: Seq[(String, String, FunctionBuilder)] = Seq(
    ("word_grams", "word_grams(text, n) - distinct word n-gram strings, one byte pass",
      args => { arity(args, "word_grams", 2)
        WordGrams(args.head, intLit(args(1), "word_grams", 2)) }),
    ("word_gram_xxhash64", "word_gram_xxhash64(text, n) - distinct word n-gram xxhash64 values",
      args => { arity(args, "word_gram_xxhash64", 2)
        WordGramXxhash64(args.head, intLit(args(1), "word_gram_xxhash64", 2)) }),
    ("word_gram_hash31", "word_gram_hash31(text, n) - distinct word n-gram polyhash31 values",
      args => { arity(args, "word_gram_hash31", 2)
        WordGramHash31(args.head, intLit(args(1), "word_gram_hash31", 2)) }),
    ("word_gram_hash60", "word_gram_hash60(text, n) - distinct word n-gram polyhash60 values",
      args => { arity(args, "word_gram_hash60", 2)
        WordGramHash60(args.head, intLit(args(1), "word_gram_hash60", 2)) }),
    ("minhash_sig", "minhash_sig(hash_array) - 32-wide MinHash signature (engine coefficient family)",
      args => { arity(args, "minhash_sig", 1)
        val (as, bs, p) = graft.operators.Dedup.signatureParams
        MinhashSigQ(args.head, as, bs, p) }),
    ("simhash64", "simhash64(hash_array) - 64-bit SimHash of feature hashes",
      args => { arity(args, "simhash64", 1); SimHash64(args.head) }),
    ("polyhash31", "polyhash31(s) - polynomial code-point hash mod 1e9+7",
      args => { arity(args, "polyhash31", 1); PolyHash31(args.head) }),
    ("polyhash60", "polyhash60(s) - 60-bit double-prime polynomial code-point hash",
      args => { arity(args, "polyhash60", 1); PolyHash60(args.head) }),
    ("rolling_hash60", "rolling_hash60(s, span_len) - polyhash60 of every span_len-char window",
      args => { arity(args, "rolling_hash60", 2)
        RollingHash60(args.head, intLit(args(1), "rolling_hash60", 2)) }),
    ("winnow_select", "winnow_select(hash_array, window) - winnowing-selected positions (min per window, rightmost ties), 1-based",
      args => { arity(args, "winnow_select", 2)
        WinnowSelect(args.head, intLit(args(1), "winnow_select", 2)) }),
    ("fingerprint31", "fingerprint31(s) - position-weighted code-point checksum mod 1e9+7",
      args => { arity(args, "fingerprint31", 1); Fingerprint31(args.head) }),
    ("alnum_run_count", "alnum_run_count(s) - count of maximal ASCII-alnum runs",
      args => { arity(args, "alnum_run_count", 1); AlnumRunCount(args.head) }),
    ("sorted_intersect_count", "sorted_intersect_count(a, b) - distinct common values of two sorted BIGINT arrays",
      args => { arity(args, "sorted_intersect_count", 2)
        SortedIntersectCountQ(args.head, args(1)) }),
    ("bpe_stats", "bpe_stats(s) - [n_tokens, checksum] of the greedy longest-match walk over the engine BPE vocabulary",
      args => { arity(args, "bpe_stats", 1)
        BpeStatsQ(args.head, graft.operators.TextAnalysis.BpeVocab.toIndexedSeq) }),
    ("dot_q", "dot_q(a, b) - exact BIGINT dot product of two quantized vectors",
      args => { arity(args, "dot_q", 2); DotProductQ(args.head, args(1)) }))

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(GraftFunctions.getClass.getName, null, name, usage, "", "", "", "",
      "", "", "built-in")

  /** Register into a LIVE session's function registry. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name, usage), builder)
    }

  /** Register through the `SparkSessionExtensions` hook (config-time). */
  def register(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}
