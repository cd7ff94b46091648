package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each probe row picks the most recent state row of the
  * same key at or before (inclusive, default) / strictly before
  * (strict) its time — the standard enrichment join for event streams
  * against slowly-changing state (prices, sessions, feature snapshots).
  *
  * Spark-first shape: NOT a join. Both sides are unioned, tagged, and
  * swept by one window (`last(state, ignoreNulls)` over rows up to the
  * current one) — a single shuffle on the key, zero join amplification,
  * and no per-probe range scan. At 100 TB this is one exchange of
  * (probes + states) with streaming window frames; contrast a range
  * join, which either explodes candidate pairs or degenerates to a
  * per-key sort-merge anyway. A pathologically hot key serializes into
  * one task — same caveat as any per-key ordered operator; AQE cannot
  * split an ordered window, so shard such keys upstream if they exist.
  *
  * Determinism: ties among state rows at the same (key, time) are
  * broken by the largest state struct (field order: time, then
  * `statePayload` in the given order) — callers that need a different
  * keeper dedup the state side first. Probe rows never see each other
  * (their state struct is NULL and `last` ignores nulls).
  *
  * Reference n/a (the dask_deltalake surface has no as-of operator);
  * semantics mirror the classic merge_asof/ASOF JOIN contract, which is
  * also the DuckDB oracle used by the t24 harness query.
  */
object AsofJoin {

  /** @param probes       left side; ALL its columns are returned
    * @param states       right side; `stateTime` + `statePayload` are
    *                     returned per match (NULL when no prior state)
    * @param keys         equi-join key columns (same names both sides)
    * @param probeTime    probe-side event-time column (same orderable
    *                     type as `stateTime` — caller aligns units)
    * @param stateTime    state-side event-time column
    * @param statePayload state columns to carry onto each probe
    * @param inclusive    true = a state AT the probe time matches;
    *                     false = strictly before/after only
    * @param direction    "backward" (default) = most recent state at or
    *                     before each probe; "forward" = earliest state
    *                     at or after it (next-event attribution). Tie
    *                     among states at one (key, time): backward keeps
    *                     the max state struct, forward the min — the one
    *                     nearest the probe in sweep order either way.
    * @param outPrefix    prefix for the carried state columns */
  def asofJoin(
      probes: DataFrame, states: DataFrame,
      keys: Seq[String], probeTime: String, stateTime: String,
      statePayload: Seq[String],
      inclusive: Boolean = true,
      direction: String = "backward",
      outPrefix: String = "asof_"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward': $direction")

    val stateCols = stateTime +: statePayload
    val sStruct = struct(stateCols.map(col): _*)
    val sType = states.select(sStruct.as("_s")).schema("_s").dataType
    val pStruct = struct(probes.columns.map(col).toIndexedSeq: _*)
    val pType = probes.select(pStruct.as("_p")).schema("_p").dataType

    val keyCols = keys.map(col)
    val probeU = probes.select(keyCols ++ Seq(
      col(probeTime).as("_t"), lit(1).as("_is_probe"),
      pStruct.as("_p"), lit(null).cast(sType).as("_s")): _*)
    val stateU = states.select(keyCols ++ Seq(
      col(stateTime).as("_t"), lit(0).as("_is_probe"),
      lit(null).cast(pType).as("_p"), sStruct.as("_s")): _*)

    // Backward sweeps time ascending; forward sweeps descending, so
    // "unbounded preceding .. current" holds exactly the states at or
    // after the probe. Inclusive: states sort before probes at equal
    // time (visible); strict: probes first (invisible). Third key = the
    // state struct, so the frame's LAST state at a tied time is the max
    // struct (backward) / min struct (forward) — nearest in sweep order.
    val forward = direction == "forward"
    val timeOrder = if (forward) col("_t").desc else col("_t").asc
    val tieOrder = if (inclusive) col("_is_probe").asc else col("_is_probe").desc
    val structOrder = if (forward) col("_s").desc else col("_s").asc
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(timeOrder, tieOrder, structOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val swept = probeU.unionByName(stateU)
      .withColumn("_match", last(col("_s"), ignoreNulls = true).over(w))
      .filter(col("_is_probe") === 1)

    val probeOut = probes.columns.map(c => col(s"_p.$c").as(c))
    val stateOut = stateCols.map(c => col(s"_match.$c").as(s"$outPrefix$c"))
    swept.select((probeOut ++ stateOut).toIndexedSeq: _*)
  }
}
