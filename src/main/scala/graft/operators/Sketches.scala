package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable corpus sketches — the statistics a 100 TB curation run needs
  * WITHOUT the exact computation's shuffle:
  *
  *  - [[hllGramRegisters]]: HyperLogLog-style cardinality registers over
  *    word-n-gram hashes ("how many distinct 3-grams does the corpus
  *    hold?" — vocabulary growth, dedup-rate forecasting). An exact
  *    distinct is a corpus-wide exchange of every gram; the sketch
  *    partial-aggregates to 256 (register, max-rank) rows per partition
  *    before ONE tiny shuffle.
  *  - [[countMinCounters]]: Count-Min frequency sketch over word
  *    occurrences ("approximate term frequencies without materializing
  *    the vocabulary") — d×w integer counters, overestimate-only error,
  *    mergeable across shards by cell-wise addition.
  *
  * Both are DETERMINISTIC (fixed polynomial hashes, integer arithmetic
  * end to end) and engine-portable: a SQL oracle rebuilds registers and
  * counters bit-for-bit — unlike `approx_count_distinct`'s opaque HLL++
  * buffers. Hash family: the repo-standard polyhash60 pair
  * (h = h2·2³⁰ + h1 < 2⁶⁰, primes 1e9+7 / 998244353), already mirrored
  * in DuckDB throughout the oracle suite. */
object Sketches {

  /** m = 2⁸ registers: index = low 8 hash bits, rank over the top 52. */
  val HllRegisterBits = 8
  val HllRegisters: Int = 1 << HllRegisterBits

  /** rho when the shifted hash is zero (can't happen in practice; keeps
    * the estimate's geometric tail well-defined). A zero rest is MAXIMAL
    * evidence, so the sentinel sits one past the highest attainable rho —
    * trailing zeros of the 52-bit shifted hash give rho up to 52, so 53
    * can never be weakened by (or weaken) a real observation (ADVICE
    * r15: the old 45 was below the attainable maximum). */
  val HllZeroRank = 53L

  /** Register index / rank columns for a 60-bit hash column. Rank is
    * the Flajolet–Martin rho: TRAILING zeros of the shifted hash + 1 =
    * `length(bin(rest & -rest))`, exact in both engines (identical
    * `bin` builtin, no float log2). Trailing zeros, not leading: the
    * polyhash60 pair is uniform in its LOW bits but its top bits stop at
    * the primes' product (< the next power of two), which would bias a
    * leading-zero rank (measured +22% vs +5% error on the corpus). The
    * low 8 bits feed the register index, so rho reads bits 8+ —
    * independent of the register. */
  def hllReg(h: Column): Column = h.bitwiseAND(lit((HllRegisters - 1).toLong))
  def hllRank(h: Column): Column = {
    val rest = shiftright(h, HllRegisterBits)
    when(rest === 0, lit(HllZeroRank))
      .otherwise(length(bin(rest.bitwiseAND(-rest))).cast("long"))
  }

  /** HLL registers over the corpus's word-n-gram hashes: 256 rows
    * (reg, max_rho), max_rho = 0 for untouched registers. The gram
    * hashes come from the one-pass `WordGramHash60` kernel (per-doc
    * distinct — harmless: registers take a MAX, so occurrence
    * multiplicity never matters). The explode feeds a map-side-combined
    * max aggregate: each partition collapses to ≤ 256 rows before the
    * only (tiny) shuffle. */
  def hllGramRegisters(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    val b = org.apache.spark.sql.graft.VectorBridge
    val regs = df
      .select(explode(b.wordGramHash60(col(textCol), n)).as("h"))
      .select(hllReg(col("h")).as("reg"), hllRank(col("h")).as("rho"))
      .groupBy("reg").agg(max(col("rho")).as("max_rho"))
    df.sparkSession.range(HllRegisters).select(col("id").as("reg"))
      .join(regs, Seq("reg"), "left")
      .select(col("reg"), coalesce(col("max_rho"), lit(0L)).as("max_rho"))
  }

  /** Standard HLL estimate from a register→rank map (driver-side — the
    * registers are 256 values): harmonic mean with the small-range
    * linear-counting correction. */
  def hllEstimate(regs: Map[Long, Long]): Double = {
    val m = HllRegisters.toDouble
    val alpha = 0.7213 / (1 + 1.079 / m)
    val sum = (0 until HllRegisters)
      .map(r => math.pow(2.0, -regs.getOrElse(r.toLong, 0L).toDouble)).sum
    val e = alpha * m * m / sum
    val zeros = (0 until HllRegisters).count(r => regs.getOrElse(r.toLong, 0L) == 0L)
    if (e <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else e
  }

  // ---- KMV (bottom-k) per-source sketches --------------------------------

  /** K-minimum-values sketch per source: the k smallest DISTINCT
    * word-n-gram hashes of each source — rows (source, rank, h),
    * rank 1..k by ascending hash. Deterministic (a pure function of the
    * source's gram set), mergeable, and the basis for pairwise Jaccard
    * estimates ([[kmvJaccard]]) without ever joining full gram sets.
    *
    * Scale shape — the naive per-source `row_number() <= k` sorts EVERY
    * distinct hash of a source inside one window task; this runs two
    * bounded rounds instead: (1) a per-source power-of-two histogram of
    * hash bit-lengths (≤ 61 rows per source — control-plane) picks the
    * smallest threshold 2^B whose cumulative count ≥ k; (2) only hashes
    * below the broadcast per-source threshold — O(k) rows expected per
    * source for uniform hashes — reach the rank window. The result is
    * EXACTLY the k smallest (the threshold keeps ≥ k rows by
    * construction), never an all-hash sort. */
  def kmvSketches(df: DataFrame, textCol: String, sourceCol: String,
      k: Int, n: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val b = org.apache.spark.sql.graft.VectorBridge
    // The source key round-trips through the driver for the threshold
    // pick — cast to string so ANY source type survives the getString
    // (ADVICE r15); sketches are therefore keyed by the source's string
    // form. Materialized ONCE via eager localCheckpoint: both rounds
    // (histogram + ranked pass) read the blocks, and without it the
    // expensive distinct-gram explode runs twice (ADVICE r15).
    // localCheckpoint over a cache-manager persist (ADVICE r16): the
    // ContextCleaner reclaims the blocks once the returned sketch frame
    // is unreferenced, so repeated library calls don't accumulate
    // session-lifetime cache entries.
    val sh = df.select(col(sourceCol).cast("string").as("source"),
        explode(b.wordGramHash60(col(textCol), n)).as("h"))
      .distinct()
      .localCheckpoint(true)
    // round 1: bit-length histogram; h < 2^bitlength(h), bin(0) -> "0"
    // (length 1) lumps h = 0 into the first bucket harmlessly. The
    // collect is control-plane by construction: <= sources x 61 rows
    // (the source column is a corpus label — contract-low cardinality).
    val hist = sh.groupBy(col("source"), length(bin(col("h"))).as("bl"))
      .agg(count(lit(1)).as("c"))
      .limit((1 << 20) + 1)
      .collect()
    require(hist.length <= (1 << 20),
      "source column cardinality exceeds the KMV sketch design (> ~16k " +
        "sources): the per-source histogram must stay control-plane small")
    val thresholds = hist.groupBy(_.getString(0)).map { case (s, rows) =>
      val byBl = rows.map(r => r.getInt(1) -> r.getLong(2)).sortBy(_._1)
      // explicit prefix-sum scan, not a side-effecting pattern guard
      // (ADVICE r15: a guard mutating `cum` double-counts under any
      // isDefinedAt+apply evaluation order)
      val cut = byBl.zip(byBl.scanLeft(0L)(_ + _._2).tail).collectFirst {
        case ((bl, _), cum) if cum >= k => 1L << bl
      }
      s -> cut.getOrElse(Long.MaxValue) // fewer than k distinct: keep all
    }.toSeq
    val thrDf = df.sparkSession.createDataFrame(thresholds)
      .toDF("source", "__thr")
    val w = Window.partitionBy("source").orderBy("h")
    sh.join(broadcast(thrDf), Seq("source"))
      .filter(col("h") < col("__thr"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank").cast("long").as("rank"), col("h"))
  }

  /** Pairwise Jaccard estimates from KMV sketches: for each source pair,
    * the k smallest hashes of the sketch UNION are inspected and the
    * fraction present in BOTH sketches estimates J(A, B) — rows
    * (src_a, src_b, k_used, inter_k, jaccard_pm), jaccard_pm =
    * inter_k·10000 DIV k_used. Operates on sketch rows only (k per
    * source), so the pair computation costs O(pairs·k) regardless of
    * corpus size. */
  def kmvJaccard(sketches: DataFrame, k: Int): DataFrame = {
    val srcs = sketches.select("source").distinct()
    val prs = srcs.as("a").join(srcs.as("b"),
        col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
    val member = sketches.select(col("source"), col("h"))
    val sideA = prs.join(member.withColumnRenamed("source", "src_a"), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("h"))
    val sideB = prs.join(member.withColumnRenamed("source", "src_b"), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("h"))
    val uni = sideA.unionAll(sideB)
      .groupBy("src_a", "src_b", "h").agg(count(lit(1)).as("__both"))
    val w = Window.partitionBy("src_a", "src_b").orderBy("h")
    uni.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("k_used"),
        sum(when(col("__both") === 2, 1L).otherwise(0L)).as("inter_k"))
      .withColumn("jaccard_pm",
        (col("inter_k") * 10000L).divide(col("k_used")).cast("long"))
  }

  // ---- Count-Min ----------------------------------------------------------

  val CmDepth = 4
  val CmWidth = 1024
  private val CmP = 1000000007L
  /** Fixed row-hash coefficients: pos_j = ((h mod P)·a_j + b_j) mod P
    * mod width. All intermediates < 2³⁴ — ANSI-safe, SQL-mirrorable. */
  val CmCoefs: IndexedSeq[(Long, Long)] =
    IndexedSeq((3L, 17L), (5L, 29L), (7L, 43L), (11L, 61L))

  def cmPos(h: Column, j: Int): Column = {
    val (a, b) = CmCoefs(j)
    ((h % CmP) * a + b) % CmP % CmWidth
  }
  def cmPosSql(hExpr: String, j: Int): String = {
    val (a, b) = CmCoefs(j)
    s"(((($hExpr) % $CmP) * $a + $b) % $CmP) % $CmWidth"
  }

  /** The d×w counter table over word OCCURRENCES of `textCol`: rows
    * (row, pos, n) for non-zero cells only. Each word explodes to d
    * (row, pos) cells; the count partial-aggregates map-side, so every
    * partition collapses to ≤ d·w rows (4096 here) before the one tiny
    * shuffle — corpus text never shuffles. */
  def countMinCounters(df: DataFrame, textCol: String): DataFrame = {
    val b = org.apache.spark.sql.graft.VectorBridge
    val h = b.polyhash60(col("__w"))
    df.select(explode(filter(split(col(textCol), " "), w => length(w) > 0)).as("__w"))
      .select(posexplode(array(CmCoefs.indices.map(j => cmPos(h, j)): _*)))
      .select(col("pos").cast("long").as("row"), col("col").as("pos"))
      .groupBy("row", "pos").agg(count(lit(1)).as("n"))
  }

  /** Point-query estimates for `terms`: est(t) = min_j counter[j][pos_j
    * (t)] — the Count-Min guarantee is est ≥ true count, with
    * overestimate bounded by collisions. Returns (term, cms_est). The
    * terms frame is contract-small (a probe list) and broadcasts. */
  def cmEstimates(counters: DataFrame, terms: DataFrame, termCol: String): DataFrame = {
    val b = org.apache.spark.sql.graft.VectorBridge
    val h = b.polyhash60(col(termCol))
    val cells = terms.select(col(termCol).as("term"),
        posexplode(array(CmCoefs.indices.map(j => cmPos(h, j)): _*)))
      .select(col("term"), col("pos").cast("long").as("row"), col("col").as("pos"))
    cells.join(counters, Seq("row", "pos"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
  }
}
