package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Stages

/** Registry of the engine's query surface (SURVEY.md §2 inventory).
  * Each entry is a `(SparkSession, sfDir) => DataFrame` paired (in
  * [[Oracles]]) with ANSI SQL the driver replays in DuckDB over the same
  * parquet tables. Conventions, per SURVEY.md §7.4:
  *   - deterministic output: every row-returning query ends in orderBy on
  *     a unique key; aggregates are single-row or ordered;
  *   - float aggregates rounded (2–4 dp) in BOTH engines;
  *   - column names aliased identically in Spark and SQL (driver hashes
  *     after sorting columns by name).
  */
object Queries {

  /** The reference's 10-value region whitelist analog
    * (pager-workflow.py:205-209) over the testdata's NATION_* names:
    * NATION_20..24 are deliberately excluded so the flagship check has
    * real violations to surface (mirrors test-pager-action.py:186's
    * intentionally-excluded region). */
  val regionWhitelist: Seq[String] = (0 to 19).map(i => s"NATION_$i")

  val marketSegments: Seq[String] =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD") // MACHINERY deliberately excluded

  import Tables._

  // ---------------------------------------------------------------- D-series
  /** D1 — full-scan row count (pager-workflow.py:126). */
  def d1Count(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(count(lit(1)).as("cnt"))

  /** D2 — filtered null-key count (pager-workflow.py:127). Filter is
    * pushed to the parquet scan (IsNull pushdown). */
  def d2NullKeys(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_custkey").isNull)
      .agg(count(lit(1)).as("null_cnt"))

  /** D3 — distinct projection (pager-workflow.py:212-216). Column-pruned
    * scan of one column, hash-aggregate distinct. */
  def d3Distinct(s: SparkSession, d: String): DataFrame =
    region(s, d).select(col("r_name").as("region_name"))
      .distinct().orderBy("region_name")

  /** D4 — anti-membership whitelist over the staging model
    * (pager-workflow.py:205-221): DISTINCT region_name NOT IN (whitelist).
    * ANSI NOT-IN null semantics (null row silently dropped) — the
    * ''-default row-rule variant is [[r1RegionWhitelist]]. */
  def d4WhitelistViolations(s: SparkSession, d: String): DataFrame =
    Stages.stgTerritory(nation(s, d), region(s, d))
      .select("region_name").distinct()
      .filter(!col("region_name").isin(regionWhitelist: _*))
      .orderBy("region_name")

  // ---------------------------------------------------------------- R-series
  /** R1 — row-level whitelist rule (analysis.md:9,
    * `validate_region_whitelist`): missing region defaults to '' before
    * the membership test, then the sorted offender set is collected. */
  def r1RegionWhitelist(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .select(coalesce(col("n_name"), lit("")).as("region"))
      .filter(!coalesce(col("region"), lit("")).isin(regionWhitelist: _*))
      .distinct().orderBy("region")

  /** R2 — non-empty input rule (analysis.md:9, `validate_data_quality`). */
  def r2NonEmpty(s: SparkSession, d: String): DataFrame =
    customer(s, d).agg(
      count(lit(1)).as("record_count"),
      (count(lit(1)) > 0).as("passed"))

  /** R3 — schema-compliance rule (analysis.md:9,
    * `validate_schema_compliance`: required fields region/timestamp/value
    * → events' event_type/ts/value): rows with any required field null. */
  def r3SchemaCompliance(s: SparkSession, d: String): DataFrame =
    events(s, d).agg(
      count(lit(1)).as("element_count"),
      count(when(col("event_type").isNull || col("ts").isNull || col("value").isNull, lit(1)))
        .as("noncompliant"))

  /** R4 — business rule `value < 0` with missing-value default 0
    * (analysis.md:9, `validate_business_rules`). */
  def r4BusinessRule(s: SparkSession, d: String): DataFrame =
    events(s, d).agg(
      count(lit(1)).as("element_count"),
      count(when(coalesce(col("value"), lit(0.0)) < 0, lit(1))).as("violations"))

  // ---------------------------------------------------------------- T-series
  /** T1 — staging model stg_territory (SURVEY.md §2.4). */
  def t1StgTerritory(s: SparkSession, d: String): DataFrame =
    Stages.stgTerritory(nation(s, d), region(s, d)).orderBy("territory_key")

  /** T2 — staging model stg_salesperson. */
  def t2StgSalesperson(s: SparkSession, d: String): DataFrame =
    Stages.stgSalesperson(supplier(s, d)).orderBy("salesperson_key")

  /** T3 — mart model: one-shuffle fact join + broadcast dims. */
  def t3MartSales(s: SparkSession, d: String): DataFrame =
    Stages.martSalesPerformance(
      lineitem(s, d), orders(s, d), customer(s, d), nation(s, d), region(s, d))
      .orderBy("region_name", "nation_name")
}
