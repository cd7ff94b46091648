package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface (SURVEY.md §2 ⑮): the reference inherits joins /
  * group-bys / windows / set ops from dask.dataframe; ours come from Spark
  * SQL. These queries are the machine-checked demonstration (DuckDB oracle
  * per driver harness) and the bench corpus.
  *
  * Determinism contract with the oracle: every aggregate over monetary /
  * fractional columns goes through exact integer cents
  * (`CAST(ROUND(x*100) AS BIGINT)`) so Spark and DuckDB produce bit-equal
  * results regardless of float summation order; every query ends in a
  * total ORDER BY.
  *
  * Scale notes: small dims (nation/part/customer) are broadcast — no
  * shuffle on the probe side; large aggregations are partial (map-side
  * combine) by construction of groupBy/agg; sorts are on already-reduced
  * outputs except topK, which Spark executes as TakeOrderedAndProject
  * (no global sort materialization).
  */
object Relational {

  // Spread.adaptive: single-row-group testdata parquet plans as one scan
  // task (guide §2.5); no-op when splits ≥ defaultParallelism.
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.operators.Spread.adaptive(s.read.parquet(s"$dir/$name.parquet"))

  /** events with `ts` normalized to an epoch-µs long `ts_us`, whatever
    * physical type the generator used this round (see [[EventsIO]]). */
  private def events(s: SparkSession, dir: String): DataFrame =
    EventsIO.withTsUs(s, dir)

  /** Exact integer cents from a 2-decimal double column. */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  private def milli(c: Column): Column = round(c * 1000).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style scan + partial agg: one shuffle of 6 grouped rows.
    "q01_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(cents($"l_quantity")).as("sum_qty_c"),
          sum(cents($"l_extendedprice")).as("sum_base_c"),
          sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")))
            .as("sum_disc_c4"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // 3-way join + agg; nation broadcast, customer/orders co-shuffled.
    "q02_join_agg" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").select($"l_orderkey",
        (cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))).as("rev_c4"))
      val o = t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      val c = t(s, dir, "customer").select($"c_custkey", $"c_nationkey")
      val n = broadcast(t(s, dir, "nation").select($"n_nationkey", $"n_name"))
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(n, $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sum($"rev_c4").as("revenue_c4"), count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    }),

    // Broadcast dim join: part is small at every SF; probe side never shuffles.
    "q03_broadcast_join" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(
          sum(cents($"l_quantity")).as("sum_qty_c"),
          max(cents($"p_retailprice")).as("max_retail_c"),
          count(lit(1)).as("n_items"))
        .orderBy($"p_brand")
    }),

    // Window: top-2 orders per customer by price (deterministic tiebreak).
    "q04_window" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          row_number().over(w).cast("long").as("rn"))
        .filter($"rn" <= 2)
        .orderBy($"o_custkey", $"rn")
    }),

    // Top-K: Spark plans TakeOrderedAndProject — no full sort at scale.
    "q05_topk" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(100)
        .select($"o_orderkey", cents($"o_totalprice").as("total_c"))
    }),

    // Selective filter + narrow projection: predicate & column pruning
    // must reach the parquet scan (verified via explain in tests).
    "q06_filter_proj" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1999-01-01").cast("timestamp") &&
          $"l_discount" > 0.05 && $"l_quantity" < 10)
        .select($"l_orderkey", $"l_linenumber",
          cents($"l_quantity").as("qty_c"), cents($"l_extendedprice").as("price_c"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Set op: distinct + except (parts sold in bulk but never in singles).
    "q07_setop" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      li.filter($"l_quantity" >= 49).select($"l_partkey").distinct()
        .except(li.filter($"l_quantity" <= 2).select($"l_partkey"))
        .orderBy($"l_partkey")
    }),

    // Time-bucketed agg over the event stream table.
    "q08_events_hourly" -> ((s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy($"event_type",
          (expr("ts_us DIV 3600000000") * 3600000L).as("hour_ms"))
        .agg(count(lit(1)).as("n"),
          milli(min($"value")).as("min_v3"),
          milli(max($"value")).as("max_v3"))
        .orderBy($"event_type", $"hour_ms")
    }),

    // Rollup-style two-level agg + having.
    "q09_having" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum(cents($"o_totalprice")).as("spend_c"))
        .filter($"n_orders" >= 15)
        .orderBy($"o_custkey")
    }),

    // ROLLUP: subtotals per (returnflag, linestatus), per returnflag, and
    // grand total in one pass — Expand + partial agg, no extra scans.
    "q10_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(sum(cents($"l_quantity")).as("sum_qty_c"), count(lit(1)).as("n"))
        .select(coalesce($"l_returnflag", lit("<all>")).as("rf"),
          coalesce($"l_linestatus", lit("<all>")).as("ls"),
          $"sum_qty_c", $"n")
        .orderBy($"rf", $"ls")
    }),

    // Correlated NOT EXISTS as a left-anti join: customers with no open
    // ('O') order — the anti-join plans one shuffle, no subquery re-scan
    // per row.
    "q11_anti_join" -> ((s, dir) => {
      import s.implicits._
      val open = t(s, dir, "orders").filter($"o_orderstatus" === "O")
        .select($"o_custkey".as("c_custkey"))
      t(s, dir, "customer")
        .join(open, Seq("c_custkey"), "left_anti")
        .select($"c_custkey", $"c_nationkey", cents($"c_acctbal").as("acctbal_c"))
        .orderBy($"c_custkey")
    }),

    // Running (cumulative) spend per customer over order-date order — an
    // unbounded-preceding window; per-customer groups parallel across the
    // one shuffle on o_custkey.
    "q12_running_window" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .filter($"o_custkey" < 100)
        .select($"o_custkey", $"o_orderkey",
          sum(cents($"o_totalprice")).over(w).as("running_spend_c"))
        .orderBy($"o_custkey", $"o_orderkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        | CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        | CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_c4,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join_agg" ->
      """SELECT n_name,
        | CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4,
        | COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q03_broadcast_join" ->
      """SELECT p_brand,
        | CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        | CAST(MAX(CAST(ROUND(p_retailprice*100) AS BIGINT)) AS BIGINT) AS max_retail_c,
        | COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q04_window" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        | SELECT o_custkey, o_orderkey,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        | FROM orders) sub
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
    "q05_topk" ->
      """SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q06_filter_proj" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(ROUND(l_quantity*100) AS BIGINT) AS qty_c,
        | CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q07_setop" ->
      """SELECT l_partkey FROM (
        | SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity >= 49
        | EXCEPT
        | SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity <= 2) sub
        |ORDER BY l_partkey""".stripMargin,
    "q08_events_hourly" ->
      """SELECT event_type,
        | CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS hour_ms,
        | COUNT(*) AS n,
        | CAST(ROUND(MIN(value)*1000) AS BIGINT) AS min_v3,
        | CAST(ROUND(MAX(value)*1000) AS BIGINT) AS max_v3
        |FROM events GROUP BY event_type, hour_ms
        |ORDER BY event_type, hour_ms""".stripMargin,
    "q09_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS spend_c
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin,
    "q10_rollup" ->
      """SELECT COALESCE(l_returnflag, '<all>') AS rf,
        | COALESCE(l_linestatus, '<all>') AS ls,
        | CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q11_anti_join" ->
      """SELECT c_custkey, c_nationkey,
        | CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q12_running_window" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS running_spend_c
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
