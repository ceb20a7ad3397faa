package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dbt-style transformation layer the reference validates but runs
  * remotely (dbt Cloud trigger: pager-workflow.py:292-306). Contracts are
  * pinned by what the reference's validations read: `stg_territory`
  * exposes `region_name` (pager-workflow.py:213-215); staging tables are
  * non-empty projections of raw dims (pager-workflow.py:126-137 vs
  * :159-177); the mart aggregates sales facts per territory
  * (pager-workflow.py:187-199). Implemented natively as DataFrame
  * transforms over the testdata star schema.
  */
object Stages {

  /** T1 — staging model `raw dim_region → stg_territory`.
    * Rename/select + trim; broadcast-joins the 5-row region dim so the
    * plan stays a single narrow pass over nation. */
  def stgTerritory(nation: DataFrame, region: DataFrame): DataFrame =
    nation
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(
        col("n_nationkey").as("territory_key"),
        trim(col("n_name")).as("region_name"),
        trim(col("r_name")).as("zone_name"))

  /** T2 — staging model `raw dim_salesperson → stg_salesperson`
    * (keyed by EmployeeKey in the reference, pager-workflow.py:134;
    * supplier plays that role over the testdata). */
  def stgSalesperson(supplier: DataFrame): DataFrame =
    supplier.select(
      col("s_suppkey").cast("long").as("salesperson_key"),
      trim(col("s_name")).as("salesperson_name"),
      col("s_nationkey").cast("long").as("nation_key"),
      round(col("s_acctbal"), 2).as("acctbal"))

  /** T3 — mart model `mart_sales_perfromance_dashboard` [sic — typo from
    * pager-workflow.py:189]. Joins staging dims to the fact tables and
    * rolls revenue up per region/nation for the dashboard
    * ("sales_performance", pager-workflow.py:187-199; Redash README.md:3).
    *
    * Scale shape: the two fact tables join on their natural key
    * (l_orderkey = o_orderkey, both shuffle-partitioned by that key).
    * Only the genuinely tiny dims (nation: 25 rows, region: 5) carry an
    * explicit broadcast hint. Customer scales with the fact tables
    * (~1/1000th of lineitem ≈ 100 GB at the 100 TB design point), so it
    * must NOT be pinned broadcast: it joins via shuffle hash/sort-merge,
    * and AQE is free to pick broadcast at runtime when the actual size
    * is under threshold (as it is at test scale).
    */
  def martSalesPerformance(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val dims = customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(dims, orders("o_custkey") === dims("c_custkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(
        count(lit(1)).as("line_count"),
        // Money sums accumulate in DECIMAL: double summation is
        // order-dependent (partition order vs any other engine's order),
        // so a 2-dp round of a 13-digit double sum can flip its last
        // digit nondeterministically. Decimal addition is exact and
        // associative — same digits on every engine, every run.
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")), 2).cast("double").as("revenue"),
        round(sum(col("l_quantity").cast("decimal(18,4)")).cast("double") /
          count(lit(1)), 4).as("avg_qty"))
  }

  /** T3b — the dashboard's subtotal view: the same mart derivation under
    * `ROLLUP(region, nation)`, emitting per-nation rows, per-region
    * subtotals, and the grand total in ONE aggregate (SURVEY §2.8 had
    * declared grouping sets absent; a Redash-style dashboard needs the
    * subtotal rows, and ROLLUP computes all three levels in a single
    * shuffle where three UNIONed GROUP BYs would scan the fact join
    * three times).
    *
    * Engine-portability discipline: the level indicator is the explicit
    * `grouping(region)*2 + grouping(nation)` sum — Spark's `grouping_id`
    * and DuckDB's `GROUPING(a, b)` agree on this corpus, but the spelled
    * -out form makes the bit convention part of the query, not an engine
    * coincidence. Rolled-up key columns surface as the `(all)` sentinel
    * (no name collides with it) so the result carries no NULL keys into
    * the hash compare; money stays in the DECIMAL-accumulate /
    * round-in-decimal discipline of [[martSalesPerformance]].
    */
  def martSalesRollup(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val dims = customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(dims, orders("o_custkey") === dims("c_custkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        (grouping(col("r_name")) * lit(2) + grouping(col("n_name")))
          .cast("long").as("grouping_level"),
        count(lit(1)).as("line_count"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")), 2).cast("double").as("revenue"),
        round(sum(col("l_quantity").cast("decimal(18,4)")).cast("double") /
          count(lit(1)), 4).as("avg_qty"))
      .select(
        coalesce(col("r_name"), lit("(all)")).as("region_name"),
        coalesce(col("n_name"), lit("(all)")).as("nation_name"),
        col("grouping_level"), col("line_count"), col("revenue"),
        col("avg_qty"))
  }
}
