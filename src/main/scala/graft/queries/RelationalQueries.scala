package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator coverage (SURVEY.md §2.1-2.5, §2.11) over the TPC-H-ish
  * star schema: scan+filter+limit (S5), point lookup (S7), equi-joins
  * broadcast/shuffle (J1/J2), semi/anti joins (S10 rewrite), group-by
  * aggregation (A1-A9), top-k (T1), window last-N (T6), union+dedup (U1-U4).
  *
  * Determinism contract with the DuckDB oracle: every double aggregation is
  * computed as an exact DECIMAL(38,6) sum then cast back to double, so the
  * result is independent of partitioning / accumulation order — required both
  * for hash-stable verification and for reproducible results on a real
  * cluster where partition counts differ run to run.
  */
object RelationalQueries {

  /** Order-independent exact sum of a double column. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(38,6)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: the scan→filter→partial-agg→final-agg workhorse.
    // Filter + needed-columns-only reach the parquet scan (PushedFilters).
    "rel_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // Multi-way join: lineitem⋈orders⋈customer⋈nation(broadcast)⋈region(broadcast).
    // Small dims broadcast — no shuffle for them at any scale.
    "rel_revenue_by_nation" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = Tables.customer(s, dir)
      val n  = Tables.nation(s, dir)
      val r  = Tables.region(s, dir)
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
             count(lit(1)).as("n_items"))
    }),

    // Top-k: Catalyst plans TakeOrderedAndProject (no global sort of 100 TB).
    "rel_top_orders" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_orderkey")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey".asc)
        .limit(10)
    }),

    // Semi join: customers that have at least one order (EXISTS).
    "rel_customers_with_orders" -> ((s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).select($"o_custkey")
      c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
    }),

    // Anti join: the cascading-delete rewrite (SURVEY §2.1 S10) — rows NOT in
    // the key set survive, no driver-side loop. Against pending orders so the
    // survivor set is non-trivial on the fixture.
    "rel_customers_without_orders" -> ((s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter($"o_orderstatus" === "P").select($"o_custkey")
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
    }),

    // Window: per-supplier running revenue + row_number (T6 shape). Total
    // order inside each partition is unique via (shipdate, orderkey, linenumber).
    "rel_supplier_running_revenue" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc)
      Tables.lineitem(s, dir)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_shipdate",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(38,6)").as("rev"))
        .withColumn("rn", row_number().over(w))
        .withColumn("running_revenue",
          sum($"rev").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"rn", $"running_revenue")
    }),

    // Plain group-by counts (A6/A9 shape).
    "rel_order_priority_counts" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
    }),

    // Broadcast dim⋈dim join (J1 shape at its smallest).
    "rel_nation_region" -> ((s, dir) => {
      import s.implicits._
      Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name", $"r_name")
    }),

    // Filter + top-k on a scan (S5 + T1): pushdown visible in the plan.
    "rel_expensive_parts" -> ((s, dir) => {
      import s.implicits._
      Tables.part(s, dir)
        .filter($"p_size" >= 10)
        .orderBy($"p_retailprice".desc, $"p_partkey".asc)
        .limit(15)
        .select($"p_partkey", $"p_name", $"p_retailprice")
    }),

    // Union + dedup (U1/U3): two overlapping customer subsets.
    "rel_union_segments" -> ((s, dir) => {
      import s.implicits._
      val c    = Tables.customer(s, dir)
      val rich = c.filter($"c_acctbal" > 5000.0).select($"c_custkey")
      val bld  = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      rich.union(bld).distinct()
    }),

    // Ranking window: top-5 customers by balance within each segment.
    "rel_segment_top_customers" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey".asc)
      Tables.customer(s, dir)
        .withColumn("bal_rank", rank().over(w))
        .filter($"bal_rank" <= 5)
        .select($"c_mktsegment", $"bal_rank", $"c_custkey", $"c_acctbal")
    }),

    // Temporal rollup: orders per month with exact-decimal totals.
    "rel_orders_monthly" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy(date_trunc("month", $"o_orderdate").as("month"))
        .agg(count(lit(1)).as("n_orders"),
             dsum($"o_totalprice").as("total_price"))
    }),

    // ROLLUP: revenue at (region, nation), per-region, and grand-total
    // levels in one pass (partial aggregation handles all levels map-side).
    "rel_revenue_rollup" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("total_balance"))
    }),

    // CASE-pivot: order counts per status spread into columns per priority
    // (the A5 counts-by-type matrix shape, no PIVOT syntax dependency).
    "rel_status_pivot" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(
          count(when($"o_orderstatus" === "F", 1)).as("n_finished"),
          count(when($"o_orderstatus" === "O", 1)).as("n_open"),
          count(when($"o_orderstatus" === "P", 1)).as("n_pending"))
    }),

    // Skew-mitigated join: salted orders⋈customer aggregation — must equal
    // the plain join (the oracle IS the plain join).
    "rel_salted_join" -> ((s, dir) => {
      import s.implicits._
      val orders = Tables.orders(s, dir).withColumnRenamed("o_custkey", "custkey")
      val customer = Tables.customer(s, dir).withColumnRenamed("c_custkey", "custkey")
      graft.operators.Skew.saltedJoin(orders, customer, "custkey", saltBuckets = 8)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
    }),

    // Point lookup (S7): equality filter pushed to the parquet scan.
    "rel_order_lookup" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .filter($"o_orderkey" === 42L)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    }))

  val oracle: Map[String, String] = Map(
    "rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1.0e0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "rel_revenue_by_nation" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(l_extendedprice * (1.0e0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "rel_top_orders" ->
      """SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice * (1.0e0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
         FROM lineitem GROUP BY l_orderkey
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
    "rel_customers_with_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "rel_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""",
    "rel_supplier_running_revenue" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(ROW_NUMBER() OVER w AS INT) AS rn,
         CAST(SUM(CAST(l_extendedprice * (1.0e0 - l_discount) AS DECIMAL(38,6))) OVER w AS DOUBLE) AS running_revenue
         FROM lineitem
         WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "rel_order_priority_counts" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
         FROM orders GROUP BY o_orderpriority""",
    "rel_nation_region" ->
      """SELECT n_nationkey, n_name, r_name FROM nation
         JOIN region ON n_regionkey = r_regionkey""",
    "rel_expensive_parts" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
         WHERE p_size >= 10
         ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 15""",
    "rel_union_segments" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0e0
         UNION
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""",
    "rel_order_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         FROM orders WHERE o_orderkey = 42""",
    "rel_segment_top_customers" ->
      """SELECT c_mktsegment, CAST(bal_rank AS INT) AS bal_rank, c_custkey, c_acctbal FROM (
           SELECT c_mktsegment, c_custkey, c_acctbal,
                  RANK() OVER (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_rank
           FROM customer) WHERE bal_rank <= 5""",
    "rel_orders_monthly" ->
      """SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
         FROM orders GROUP BY date_trunc('month', o_orderdate)""",
    "rel_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "rel_revenue_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_balance
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)""",
    "rel_status_pivot" ->
      """SELECT o_orderpriority,
         COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
         COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
         COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
         FROM orders GROUP BY o_orderpriority""")
}
