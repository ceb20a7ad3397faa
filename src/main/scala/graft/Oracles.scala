package graft

/** DuckDB-runnable ANSI SQL oracles, one per [[Queries]] entry (driver
  * contract: column names and rounding match the Spark side exactly). */
object Oracles {

  private def inList(vs: Seq[String]): String =
    vs.map(v => s"'$v'").mkString("(", ",", ")")

  val wl: String = inList(Queries.regionWhitelist)
  val segs: String = inList(Queries.marketSegments)

  val sql: Map[String, String] = Map(
    "d1_count" -> "SELECT count(*) AS cnt FROM lineitem",

    "d2_null_keys" ->
      "SELECT count(*) AS null_cnt FROM orders WHERE o_custkey IS NULL",

    "d3_distinct" ->
      "SELECT DISTINCT r_name AS region_name FROM region ORDER BY region_name",

    "d4_whitelist_violations" ->
      s"""SELECT DISTINCT n_name AS region_name
         |FROM nation JOIN region ON n_regionkey = r_regionkey
         |WHERE n_name NOT IN $wl
         |ORDER BY region_name""".stripMargin,

    "r1_region_whitelist" ->
      s"""SELECT DISTINCT coalesce(n_name, '') AS region
         |FROM nation
         |WHERE coalesce(n_name, '') NOT IN $wl
         |ORDER BY region""".stripMargin,

    "r2_nonempty" ->
      "SELECT count(*) AS record_count, count(*) > 0 AS passed FROM customer",

    "r3_schema_compliance" ->
      """SELECT count(*) AS element_count,
        |       count(CASE WHEN event_type IS NULL OR ts IS NULL OR value IS NULL THEN 1 END) AS noncompliant
        |FROM events""".stripMargin,

    "r4_business_rule" ->
      """SELECT count(*) AS element_count,
        |       count(CASE WHEN coalesce(value, 0) < 0 THEN 1 END) AS violations
        |FROM events""".stripMargin,

    "t1_stg_territory" ->
      """SELECT n_nationkey AS territory_key, trim(n_name) AS region_name, trim(r_name) AS zone_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY territory_key""".stripMargin,

    "t2_stg_salesperson" ->
      """SELECT s_suppkey AS salesperson_key, trim(s_name) AS salesperson_name,
        |       CAST(s_nationkey AS BIGINT) AS nation_key, round(s_acctbal, 2) AS acctbal
        |FROM supplier ORDER BY salesperson_key""".stripMargin,

    "t3_mart_sales" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |       count(*) AS line_count,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       round(avg(l_quantity), 4) AS avg_qty
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY 1, 2
        |ORDER BY region_name, nation_name""".stripMargin
  )
}
