package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Type-adaptive reader for the `events` table.
  *
  * The test-data generator has emitted `events.ts` with different physical
  * parquet types across rounds: TIMESTAMP(NANOS) (which Spark's vectorized
  * reader only accepts as an epoch-nanos long via
  * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP_MICROS with
  * isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ). Every query
  * over events goes through this helper so a physical-type change never
  * breaks analysis again: downstream code sees one stable contract — an
  * epoch-microseconds `ts_us` long column, the exact value DuckDB's
  * `epoch_us(ts)` produces for the oracle.
  */
object EventsIO {

  /** Raw read, tolerant of the physical `ts` type. `nanosAsLong` is a
    * no-op for non-nanos files and required for nanos files, so it is
    * always set. */
  def raw(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Spread.adaptive: single-row-group testdata parquet plans as one
    // scan task (guide §2.5); no-op when splits ≥ defaultParallelism.
    graft.operators.Spread.adaptive(s.read.parquet(s"$dir/events.parquet"))
  }

  /** events with `ts` replaced by an epoch-microseconds long `ts_us`.
    *
    * NTZ values are interpreted as UTC — every entry point (Verify, Bench,
    * tests) pins `spark.sql.session.timeZone=UTC`, which makes the cast
    * below agree with DuckDB's naive-timestamp `epoch_us`.
    */
  def withTsUs(s: SparkSession, dir: String): DataFrame = {
    val df = raw(s, dir)
    val tsUs = df.schema("ts").dataType match {
      case LongType        => expr("ts DIV 1000") // epoch-nanos long
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case TimestampType   => unix_micros(col("ts"))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other; expected long (nanos), " +
          "timestamp, or timestamp_ntz")
    }
    df.withColumn("ts_us", tsUs).drop("ts")
  }
}
