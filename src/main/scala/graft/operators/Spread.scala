package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism repair for unsplittable inputs
  * (optimization guide §2.5 "input skew": one huge unsplittable file, or
  * a single-row-group parquet file, plans as ONE scan task — every
  * narrow, CPU-heavy stage downstream of it then runs on one core while
  * the rest of the cluster idles).
  *
  * [[adaptive]] repartitions right after the read ONLY when the planned
  * scan has fewer partitions than the cluster's parallelism — the
  * production case (thousands of splits) is a provable no-op, so scan
  * pushdown/pruning and the zero-exchange plan shapes are untouched
  * exactly where they matter, while a one-split local input pays one
  * small exchange to light up every core. The decision derives from the
  * measured input (split count vs `defaultParallelism`), never from a
  * constant tuned to one machine. Round-robin placement is deterministic
  * under retry (Spark sorts before repartitioning, SPARK-23207), and
  * every operator in this engine is repartition-invariant by contract,
  * so results are unchanged on any layout. */
object Spread {

  /** `df` repartitioned to `defaultParallelism` iff its current plan
    * yields fewer partitions than that; `df` unchanged otherwise. */
  def adaptive(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
