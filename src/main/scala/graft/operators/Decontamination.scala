package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  // ---- Bloom-filter decontamination (sketch scale path) ------------------
  //
  // The exact path above broadcasts the eval grams THEMSELVES — fine for
  // benchmark-sized eval sets, unbounded when the "do not train on this"
  // list is itself huge (takedowns, customer opt-outs, web-scale eval
  // suites). The sketch path compresses the eval side to a fixed
  // `mBits`-bit Bloom filter; the corpus scan then tests each gram
  // against the broadcast bitset with pure codegen'd integer arithmetic —
  // no join, no shuffle of gram text at all. One-sided error by
  // construction: a member gram ALWAYS hits (no false negatives — nothing
  // contaminated slips through); a non-member hits with p ≈ (1−e^(−kn/m))^k
  // (extra docs conservatively flagged). Every ingredient — the
  // polynomial gram hash, the probe LCGs, the bit positions — is exact
  // BIGINT arithmetic, so an oracle engine reproduces the sketch (and its
  // false positives) bit-for-bit.

  /** Fingerprint modulus of the portable gram hash (see
    * [[TextAnalysis.fingerprintOfChars]]). */
  val BloomP = 1000000007L
  private val Mask31 = 0x7FFFFFFFL

  /** Fixed probe-LCG coefficients (a, c, shift) — k = 3 probes, part of
    * the operator's deterministic contract (mirrored literally in oracle
    * SQL). Each probe takes mBits-worth of bits at a DIFFERENT offset of
    * its product: without the shifts every probe is an affine bijection
    * of `gh mod mBits` — collectively 15 bits of entropy, a degenerate
    * hash-set with ~100× the design false-positive rate (observed
    * directly: 140 flagged docs vs 5 real at sf0.01). Distinct shifts
    * make the probes draw effectively independent bits. */
  val ProbeCoefs: Seq[(Long, Long, Int)] = Seq(
    (1103515245L, 12345L, 5), (1225086377L, 54321L, 9), (1664525L, 1013904223L, 13))

  /** Engine-portable per-gram hash in [0, BloomP): the classic
    * polynomial rolling hash h ← (31·h + code) mod P. Position-sensitive
    * and full-range — the additive fingerprint checksum
    * (TextAnalysis.fingerprint) concentrates grams of a shared
    * vocabulary into a ≈2¹⁸-wide band and collides wholesale (observed:
    * 126 of 500 docs false-flagged at sf0.01 vs ~5 expected). Every
    * intermediate < 31·P + 127 < 2³⁵ — ANSI-safe BIGINTs. */
  def gramHash(gram: Column): Column =
    graft.functions.VectorFunctions.polyhash31(gram)

  /** The portable HOF formulation of [[gramHash]] — semantics oracle for
    * the native expression (DecontaminationSpec pins bit-equality); not
    * on any hot path. The slice to exactly length(gram) chars matters:
    * split's trailing "" element (harmless in a SUM) would append a
    * spurious ×31 round. */
  private[operators] def gramHashViaHof(gram: Column): Column =
    aggregate(slice(split(gram, ""), lit(1), length(gram)), lit(0L),
      (acc, c) => (acc * 31L + ascii(c).cast("long")) % BloomP)

  /** The k probe bit-positions of a gram hash: p_j = (((a_j·h + c_j) &
    * (2³¹−1)) >> s_j) & (mBits−1). All intermediates < 2⁶² and
    * non-negative — ANSI-safe. */
  def probePositions(gh: Column, mBits: Int): Seq[Column] =
    ProbeCoefs.map { case (a, c, s) =>
      shiftright((lit(a) * gh + lit(c)).bitwiseAND(lit(Mask31)), s)
        .bitwiseAND(lit((mBits - 1).toLong))
    }

  /** SQL mirrors of the hash/probe arithmetic for oracle engines. */
  def gramHashSql(gramExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(ascii(($gramExpr)[i]) AS BIGINT) FOR i IN generate_series(1, length($gramExpr))]), " +
      s"(a, x) -> (a * 31 + x) % $BloomP)"
  def probeSql(ghExpr: String, j: Int, mBits: Int): String = {
    val (a, c, s) = ProbeCoefs(j)
    s"(((($a * ($ghExpr) + $c) & $Mask31) >> $s) & ${mBits - 1})"
  }

  /** Build the eval-side sketch: distinct eval grams → probe positions →
    * packed bit words. Runs as a (tiny) Spark job whose DISTINCT bit
    * positions — at most mBits values, a few KB — come back to the
    * driver; the corpus is never touched. */
  def bloomBits(evalDocs: DataFrame, evalTextCol: String, n: Int,
      mBits: Int): Array[Long] = {
    val gh = evalDocs
      .select(explode(Dedup.shinglesOfWords(split(col(evalTextCol), " "), n)).as("gram"))
      .distinct()
      .select(gramHash(col("gram")).as("gh"))
    val pos = gh.select(explode(array(probePositions(col("gh"), mBits): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    pos.foreach(p => words((p >> 6).toInt) |= (1L << (p & 63).toInt))
    words
  }

  /** (doc_id, n_flagged_grams) for every training doc with ≥1 gram the
    * sketch cannot rule out — a superset of [[flagContaminated]]'s exact
    * answer (one-sided error; DecontaminationSpec pins the no-false-
    * negative direction). `mBits` must be a power of two ≥ 64. */
  def bloomFlagContaminated(
      docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String, n: Int = 13,
      mBits: Int = 1 << 15): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64: $mBits")
    val words = bloomBits(evalDocs, evalTextCol, n, mBits)
    val wl = typedLit(words.toSeq)
    // Fused kernel: one O(len) pass per doc emits the distinct grams'
    // hashes directly (distinct-by-string, values bit-identical to
    // gramHash over the materialized gram strings — DecontaminationSpec
    // pins the equivalence). The composed shinglesOfWords path copied
    // ~n× the corpus text into gram strings before hashing; measured at
    // sf0.1 this was most of t32's cost.
    val docGrams = docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.VectorFunctions.wordGramHash31(col(textCol), n)).as("gh"))
    val mightContain = probePositions(col("gh"), mBits).map { p =>
      val word = element_at(wl, (p.divide(lit(64))).cast("int") + 1)
      val bit = pmod(p, lit(64L)).cast("int")
      call_function("shiftright", word, bit).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
    docGrams.filter(mightContain)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_flagged_grams"))
  }

  /** Between-SOURCES overlap matrix: for every unordered pair of corpus
    * sources, how many distinct word n-grams they share — the
    * contamination diagnostic BETWEEN subsets of one corpus
    * ([[flagContaminated]] is the eval-vs-train special case; this is
    * the all-pairs audit over the `source` partitioning a curation
    * pipeline runs before mixing subsets). Output one row per pair
    * (src_a < src_b): shared distinct grams, each side's distinct gram
    * total, and the integer-exact Jaccard permyriad
    * `shared·10000 DIV (a + b − shared)` — engine-portable arithmetic.
    *
    * Scale: the corpus collapses to DISTINCT (source, gramHash) rows in
    * one partial-aggregated pass (vocabulary-sized per source — document
    * text never shuffles); the pair join keys on the 8-byte gram hash,
    * so a gram shared by k sources contributes C(k,2) rows with
    * k = #sources, a handful — never a document-level pair blowup; the
    * matrix and the totals are each one more map-side-combined
    * aggregation. No driver state. */
  def sourceOverlap(
      df: DataFrame, srcCol: String, textCol: String, n: Int = 13): DataFrame = {
    val sg = df
      .select(col(srcCol).as("src"),
        explode(graft.functions.VectorFunctions.wordGramHash31(col(textCol), n)).as("g"))
      .distinct()
      .persist()
    val totals = sg.groupBy(col("src")).agg(count(lit(1)).as("n_grams"))
    val pairs = sg.as("a").join(sg.as("b"),
        col("a.g") === col("b.g") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
    val result = pairs
      .join(totals.select(col("src").as("src_a"), col("n_grams").as("grams_a")), Seq("src_a"))
      .join(totals.select(col("src").as("src_b"), col("n_grams").as("grams_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("shared_grams"),
        col("grams_a"), col("grams_b"),
        expr("shared_grams * 10000L DIV (grams_a + grams_b - shared_grams)")
          .as("jaccard_pm"))
    // small result (|sources|² rows), large upstream: materialize, free
    val out = result.persist()
    out.count()
    sg.unpersist(blocking = false)
    out
  }

  /** SPAN-level eval decontamination — the surgical form of
    * [[decontaminate]]: doc-level drops lose the WHOLE document when one
    * eval passage leaked into it; this cuts exactly the leaked spans
    * (every `spanLen`-char window of a corpus doc whose text appears
    * anywhere in the eval set) and reassembles each doc from the
    * surviving characters — the Lee et al. span-removal machinery (t48)
    * pointed at an eval corpus instead of at first occurrences.
    *
    * Output: (doc_id, orig_len, kept_len, text_kept). Docs shorter than
    * `spanLen` (and eval docs shorter than `spanLen`, which define no
    * spans) are untouched.
    *
    * Scale: the corpus explodes to (doc_id, s, k) span keys via the
    * codegen'd O(n) rolling hash and LEFT-SEMI joins the BROADCAST
    * distinct eval-span keys — corpus text never shuffles for the match
    * (the eval set is contract-small, like [[decontaminate]]'s grams);
    * the interval-union reassembly is one doc_id exchange. A hash
    * collision in hashed mode can only over-cut, never leak. */
  def removeEvalSpans(
      docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String,
      spanLen: Int = 40, hashedShingles: Boolean = true): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .filter(col("__t").isNotNull)
    val pos = Dedup.spanPositions(docs, idCol, textCol, spanLen, hashedShingles)
    val evalKeys = Dedup.spanPositions(
        evalDocs.select(lit(0L).as("__eid"), col(evalTextCol).as("__etext")),
        "__eid", "__etext", spanLen, hashedShingles)
      .select(col("k")).distinct()
    val cuts = pos.join(broadcast(evalKeys), Seq("k"), "left_semi")
      .select(col("doc_id"), col("s"), (col("s") + spanLen).as("e"))
    Dedup.reassembleAfterCuts(base, cuts)
  }
}
