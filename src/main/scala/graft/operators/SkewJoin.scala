package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe equi-join: the generic salting primitive for heavy-tailed
  * join keys (a handful of viral users/domains owning a double-digit
  * share of a 100 TB fact table). A plain shuffle join funnels every
  * hot key into ONE reducer task — the stage runs at the speed of its
  * hottest key no matter how many executors exist. Salting splits each
  * hot key's fact rows across `salts` sub-keys and replicates only the
  * hot DIM rows `salts`×, so hot-key work spreads over `salts` tasks
  * while cold keys pay nothing.
  *
  * The OUTPUT is exactly the plain inner join — salt assignment only
  * routes rows, it never changes the result set (oracle-checked against
  * the unsalted join).
  *
  * Scale shape:
  *   - hot-key detection: one partial-aggregated count of the fact keys
  *     (map-side combine keeps the shuffle vocabulary-sized), keeping
  *     only keys above `hotThreshold` — a tiny frame that broadcasts.
  *     AQE's skew handling splits oversized PARTITIONS of sort-merge
  *     joins; explicit salting also covers broadcast-ineligible dims and
  *     makes the mitigation deterministic and testable.
  *   - hot fact rows: salt = uniform int in [0, salts) (rand with fixed
  *     seed — per-partition deterministic, and the result is
  *     salt-invariant anyway).
  *   - hot dim rows: replicated `salts`× via one explode — bounded by
  *     |hot keys| · salts rows, never the full dim.
  *   - cold rows: the ordinary join, untouched.
  */
object SkewJoin {

  def skewSafeJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int = 16, hotThreshold: Long = 1000000L): DataFrame = {
    require(keys.nonEmpty, "skewSafeJoin needs at least one join key")
    require(salts > 1, s"salts must be > 1: $salts")
    require(hotThreshold > 0, s"hotThreshold must be positive: $hotThreshold")
    val keyCols = keys.map(col)
    val hot = fact.groupBy(keyCols: _*).count()
      .filter(col("count") > hotThreshold)
      .select(keyCols: _*)

    val factHot = fact.join(broadcast(hot), keys, "left_semi")
      .withColumn("__salt", (rand(42) * salts).cast("int"))
    val factCold = fact.join(broadcast(hot), keys, "left_anti")

    val dimHot = dim.join(broadcast(hot), keys, "left_semi")
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    val dimCold = dim.join(broadcast(hot), keys, "left_anti")

    factHot.join(dimHot, keys :+ "__salt").drop("__salt")
      .unionByName(factCold.join(dimCold, keys))
  }
}
