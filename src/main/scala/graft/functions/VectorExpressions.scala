package graft.functions

import org.apache.spark.sql.Column

/** Column-level facade over the native codegen'd vector expressions
  * (`org.apache.spark.sql.graft.DotProductQ` — see that file for the
  * semantics/overflow contract). */
object VectorFunctions {

  /** Exact BIGINT dot product of two quantized vectors (fused codegen loop). */
  def dotQ(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.dotQ(a, b)

  /** 64-bit SimHash of an array of feature hashes (fused codegen loop). */
  def simhash64(hs: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.simhash64(hs)

  /** Polynomial rolling string hash mod 1e9+7 (fused codegen loop). */
  def polyhash31(s: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.polyhash31(s)

  /** Engine-portable 60-bit double-prime polynomial string hash (fused
    * codegen loop) — oracle-reproducible feature hash for SimHash. */
  def polyhash60(s: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.polyhash60(s)

  /** Per-doc DISTINCT word-n-gram polyhash31 values in one O(len) pass —
    * the fused form of gram-string materialization + array_distinct +
    * polyhash31 (distinct-by-string, bit-identical values). */
  def wordGramHash31(s: Column, n: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.wordGramHash31(s, n)

  /** 60-bit sibling: per-doc DISTINCT word-n-gram polyhash60 values (the
    * SimHash feature hashes) in one O(len) pass. */
  def wordGramHash60(s: Column, n: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.wordGramHash60(s, n)

  /** Fixed-weight hashed-linear score over word n-gram OCCURRENCES (the
    * fastText/DCLM filter dot product): [score, n_grams] as longs, the
    * weight table a codegen literal. */
  def hashedLinearScore(s: Column, weights: IndexedSeq[Int], n: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.hashedLinearScoreQ(s, weights, n)

  /** xxhash64 sibling: per-doc DISTINCT word-n-gram xxhash64 values (the
    * MinHash gram hashes — seed 42, the SQL `xxhash64`) in one byte-level
    * pass; distinct-by-string, first-occurrence order. */
  def wordGramXxhash64(s: Column, n: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.wordGramXxhash64(s, n)

  /** Fused k-wide MinHash signature over an array of gram hashes:
    * sig[j] = min over h of (a_j·pmod(h,p) + b_j) % p, one codegen loop. */
  def minhashSigQ(hs: Column, as: IndexedSeq[Long], bs: IndexedSeq[Long], p: Long): Column =
    org.apache.spark.sql.graft.VectorBridge.minhashSigQ(hs, as, bs, p)

  /** `size(array_intersect(a, b))` for ASCENDING-SORTED long arrays as
    * one allocation-free merge walk (duplicates count once). */
  def sortedIntersectCountQ(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.sortedIntersectCountQ(a, b)

  /** Per-doc DISTINCT word-n-gram STRINGS in one byte pass — the fused
    * form of the shingling expression itself (distinct-by-string,
    * first-occurrence order, bit-identical to the composed path). */
  def wordGrams(s: Column, n: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.wordGrams(s, n)

  /** Position-weighted rolling checksum fingerprint
    * (Σ cp_i·((i mod 64)+1) mod 1e9+7) as one codePointAt walk. */
  def fingerprint31(s: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.fingerprint31(s)

  /** Count of maximal ASCII-alphanumeric runs (the BPE-ish regex token
    * count) as one byte walk. */
  def alnumRunCount(s: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.alnumRunCount(s)

  /** Greedy longest-match BPE-vocabulary tokenization statistics
    * `[n_tokens, Σ idx·tokenLen]` in one codegen'd walk — tokenizer-
    * accurate counts for packing budgets (oracle-exact integers). */
  def bpeStatsQ(s: Column, vocab: IndexedSeq[String]): Column =
    org.apache.spark.sql.graft.VectorBridge.bpeStatsQ(s, vocab)

  /** Winnowing-selected positions (min hash per length-`window` window,
    * rightmost ties; 1-based) over a rolling-hash array — one codegen'd
    * O(m) monotonic-deque pass. */
  def winnowSelect(hs: Column, window: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.winnowSelect(hs, window)

  /** PQ encode: per-subspace nearest-codebook indices (fused codegen
    * loop over the literal codebook table). */
  def pqEncodeQ(v: Column, codebooks: IndexedSeq[Long],
      m: Int, codes: Int, w: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.pqEncodeQ(v, codebooks, m, codes, w)

  /** ADC lookup: sum of per-subspace LUT distances for a PQ-coded row. */
  def adcLookupQ(codes: Column, lut: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.adcLookupQ(codes, lut)
}
