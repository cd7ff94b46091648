package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join. Spark plans a bare non-equi range predicate as
  * BroadcastNestedLoopJoin (small side) or CartesianProduct — both are
  * O(|L|·|R|) at 100 TB. The scale shape is the classic binned range
  * join: slice the range dimension into fixed-width bins, explode each
  * interval onto the bins it overlaps (bounded by `maxBinsPerInterval`),
  * map each point to its single bin, and equi-join on (keys, bin) with
  * the exact predicate as a post-filter. The shuffle is then sized by
  * data volume, not by pair count, and Catalyst plans a hash/sort-merge
  * join.
  *
  * Interval×interval overlap joins dedup for free: a pair sharing k
  * bins is emitted only from the bin containing the LATER of the two
  * starts, so no distinct pass is needed.
  *
  * Bin width is the caller's tuning knob: ~the typical interval length
  * is right (each interval lands in 1-2 bins; points probe 1). An
  * interval spanning more than `maxBinsPerInterval` bins fails loudly —
  * a silent drop would corrupt results and a silent explosion (one
  * open-ended interval × 100 TB of points) would take the job down.
  *
  * Reference n/a (no range operator in the dask_deltalake surface);
  * the t25 oracle is DuckDB's own non-equi join over the same data.
  */
object RangeJoin {

  /** Floor division as a Column (bins must tile negative coordinates
    * too, and `/` on Columns is double division). `a - pmod(a, w)` is an
    * exact multiple of w, so the double divide is exact for coordinates
    * below 2^53 — the documented domain. */
  private def floorDiv(a: Column, w: Long): Column = {
    val al = a.cast("long")
    val m = (al % w + w) % w
    ((al - m) / lit(w)).cast("long")
  }

  private def binsOf(start: Column, end: Column, w: Long): Column =
    sequence(floorDiv(start, w), floorDiv(end, w))

  /** Fails the job if any interval overlaps more than `maxBins` bins. */
  private def guardSpans(
      intervals: DataFrame, startCol: String, endCol: String,
      w: Long, maxBins: Int, who: String): Unit = {
    val over = intervals
      .filter(col(endCol) < col(startCol) ||
        floorDiv(col(endCol), w) - floorDiv(col(startCol), w) >= maxBins)
      .count()
    require(over == 0,
      s"$who: $over interval(s) are inverted or span >= $maxBins bins of width $w — " +
        "widen binWidth, raise maxBinsPerInterval, or clean the intervals")
  }

  /** Point-in-interval join: rows of `points` paired with every row of
    * `intervals` (same `keys`) whose [startCol, endCol] contains
    * pointCol (inclusive both ends). Column names must be disjoint
    * across the two inputs apart from `keys`. Returns points.* ++
    * intervals.* (minus the duplicated keys). */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 256): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    guardSpans(intervals, startCol, endCol, binWidth, maxBinsPerInterval, "pointInInterval")
    val p = points.withColumn("_bin", floorDiv(col(pointCol), binWidth))
    val iv = intervals.withColumn("_bin",
      explode(binsOf(col(startCol), col(endCol), binWidth)))
    p.join(iv, keys :+ "_bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }

  /** Interval-overlap join: pairs (l, r) with the same `keys` whose
    * closed intervals intersect. Emitted exactly once per pair (from
    * the bin holding the later start). Column names must be disjoint
    * across the two inputs apart from `keys`. */
  def intervalOverlap(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long, maxBinsPerInterval: Int = 256): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    guardSpans(left, lStart, lEnd, binWidth, maxBinsPerInterval, "intervalOverlap(left)")
    guardSpans(right, rStart, rEnd, binWidth, maxBinsPerInterval, "intervalOverlap(right)")
    val l = left.withColumn("_bin", explode(binsOf(col(lStart), col(lEnd), binWidth)))
    val r = right.withColumn("_bin", explode(binsOf(col(rStart), col(rEnd), binWidth)))
    l.join(r, keys :+ "_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_bin") === floorDiv(greatest(col(lStart), col(rStart)), binWidth))
      .drop("_bin")
  }
}
