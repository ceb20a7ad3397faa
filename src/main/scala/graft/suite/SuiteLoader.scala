package graft.suite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.checks._

/** One table's expectations as declared in a suite file (unbound — no
  * DataFrame yet; [[SuiteLoader.bind]] attaches the testdata tables). */
final case class TableSpec(table: String, checks: Seq[Check])

/** A parsed expectation suite. */
final case class SuiteSpec(suiteName: String, tables: Seq[TableSpec])

/** Declarative expectation-suite loader — the authoring surface the
  * reference platform intends but never populated: its GE project config
  * declares an ExpectationsStore with an empty `expectations/` dir
  * (/root/reference/great_expectations/great_expectations.yml:6-10,
  * expectations/.gitkeep) and pins great-expectations 0.18.8
  * (airflow/requirements.txt:3). A DQ-platform user adds an expectation by
  * editing a JSON/YAML file, not by recompiling Scala; this loader
  * compiles such files to the engine's [[graft.checks.Check]] vocabulary
  * (G1–G15), which [[ValidationSuite]] then fuses to one scan per table.
  *
  * File shape (JSON or YAML — GE-0.18-style expectation names/kwargs):
  * {{{
  * { "suite_name": "core",
  *   "tables": [
  *     { "table": "orders",
  *       "expectations": [
  *         { "type": "expect_column_values_to_not_be_null",
  *           "kwargs": { "column": "o_custkey" } } ] } ] }
  * }}}
  *
  * GE-parity kwargs: `mostly` (tolerance — at least that fraction of rows
  * must conform; compiles to [[graft.checks.MostlyCheck]] around the
  * counting check) and the multi-quantile `quantile_ranges` form of
  * `expect_column_quantile_values_to_be_between` (unrolled to one
  * [[graft.checks.QuantileCheck]] per quantile; the single-`quantile`
  * shorthand also works). Cross-run drift is
  * `expect_row_count_within_pct_of_last_run` with a required
  * `max_pct_change` (GE's URN-based evaluation parameters reduce to this
  * one store-backed lookup here) — suites declaring it must bind through
  * [[bindWithHistory]].
  */
object SuiteLoader {

  /** Parse suite text. `yaml = true` for YAML; default JSON. */
  def parse(text: String, yaml: Boolean = false): SuiteSpec = {
    val mapper =
      if (yaml) new ObjectMapper(new YAMLFactory()) else new ObjectMapper()
    val root = mapper.readTree(text)
    val tables = root.path("tables").elements().asScala.map { t =>
      val name = reqText(t, "table")
      val checks = t.path("expectations").elements().asScala.flatMap { e =>
        toChecks(reqText(e, "type"), e.path("kwargs"))
      }.toSeq
      TableSpec(name, checks)
    }.toSeq
    require(tables.nonEmpty, "suite declares no tables")
    SuiteSpec(root.path("suite_name").asText("unnamed"), tables)
  }

  /** Load a suite from a filesystem path, or (fallback) the classpath —
    * checked-in suites ship as resources so Verify/Bench need no cwd
    * assumptions. Extension picks the format (.yaml/.yml vs .json). */
  def load(path: String): SuiteSpec = {
    val yaml = path.endsWith(".yaml") || path.endsWith(".yml")
    val p = Paths.get(path)
    val text =
      if (Files.exists(p)) Files.readString(p)
      else {
        val in = getClass.getClassLoader.getResourceAsStream(path)
        require(in != null, s"suite file not found on disk or classpath: $path")
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      }
    parse(text, yaml)
  }

  /** Bind a parsed suite to the testdata tables under `sfDir`. Rejects
    * suites containing cross-run expectations — those need a result-store
    * history, so use [[bindWithHistory]]. */
  def bind(spark: SparkSession, sfDir: String, spec: SuiteSpec): Seq[TableChecks] = {
    val unresolved = spec.tables
      .flatMap(t => t.checks.collect { case u: UnresolvedDriftCheck => s"${t.table}.${u.name}" })
    require(unresolved.isEmpty,
      s"suite has cross-run expectations ${unresolved.mkString(", ")} — " +
        "bind with bindWithHistory(storeDir) so baselines can be resolved")
    spec.tables.map(t =>
      TableChecks(t.table, Tables.load(spark, sfDir, t.table), t.checks))
  }

  /** Bind with a [[graft.sink.ResultStore]] history: each declared
    * cross-run expectation resolves its baseline from the store's latest
    * recorded run of the table's row-count check. On the FIRST run (no
    * history for the table yet) the drift check is omitted — the run
    * bootstraps the baseline the next one validates against.
    *
    * A drift-declaring table that lacks a row-count expectation gets a
    * `RowCountCheck(0)` injected — min 0, so the UNDECLARED check can
    * never itself fail the suite (an empty bootstrap table must not trip
    * a gate the user never wrote); its only job is recording the baseline
    * under `<table>.row_count_between`, without which the drift check
    * would be silently omitted on EVERY run — a regression detector that
    * never fires (ADVICE r3). A recorded baseline of 0 rows resolves like
    * a missing one (drift against an empty run is undefined — the next
    * non-empty run re-bootstraps). */
  def bindWithHistory(spark: SparkSession, sfDir: String, spec: SuiteSpec,
                      storeDir: String): Seq[TableChecks] =
    spec.tables.map { t =>
      val declared =
        if (t.checks.exists(_.isInstanceOf[UnresolvedDriftCheck]) &&
            !t.checks.exists(_.isInstanceOf[RowCountCheck]))
          t.checks :+ RowCountCheck(minRows = 0L)
        else t.checks
      val checks = declared.flatMap {
        case UnresolvedDriftCheck(pct) =>
          EvaluationParameters.lastRunElementCount(
              spark, storeDir, s"${t.table}.row_count_between")
            .filter { case (_, n) => n > 0 }
            .map { case (runId, n) => RowCountDriftCheck(runId, n, pct) }
            .toSeq
        case c => Seq(c)
      }
      TableChecks(t.table, Tables.load(spark, sfDir, t.table), checks)
    }

  // ------------------------------------------------------------ expectation map

  /** GE 0.18 expectation name → engine checks. Unknown names throw (a
    * silently-dropped expectation is a check that never runs). One
    * expectation usually yields one check; the multi-quantile
    * `quantile_ranges` form unrolls to several. A `row_condition` kwarg
    * (Spark SQL predicate; `condition_parser`, when present, must be
    * "spark") wraps each counting check in [[ConditionedCheck]]; a
    * `mostly` kwarg then wraps in [[MostlyCheck]] — so a conditioned
    * tolerance measures over condition rows, as GE does. Either kwarg on
    * an expectation type that doesn't support it throws (a tolerance or
    * condition that silently does nothing is worse than an error). */
  private[suite] def toChecks(expectationType: String, kw: JsonNode): Seq[Check] = {
    val base: Seq[Check] = expectationType match {
      case "expect_column_quantile_values_to_be_between"
          if kw.hasNonNull("quantile_ranges") =>
        quantileRanges(kw)
      case other => Seq(toCheck(other, kw))
    }
    val conditioned =
      if (!kw.hasNonNull("row_condition")) base
      else {
        val cond = reqText(kw, "row_condition")
        if (kw.hasNonNull("condition_parser")) {
          val p = kw.get("condition_parser").asText()
          require(p == "spark",
            s"unsupported condition_parser '$p' — row_condition here is a " +
              "Spark SQL predicate (declare 'spark' or omit)")
        }
        base.map {
          // GE's not-null keeps nulls in the basis (they ARE the
          // violations); the lifted ValueCheck variant preserves that
          // under the condition.
          case n: NotNullCheck => ConditionedCheck(NotNullWhereCheck(n.column), cond)
          case v: ValueCheck => ConditionedCheck(v, cond)
          case other => throw new IllegalArgumentException(
            s"row_condition is not supported for $expectationType " +
              s"(check ${other.name}) — it applies to column map expectations only")
        }
      }
    if (!kw.hasNonNull("mostly")) conditioned
    else conditioned.map {
      case a: AggCheck => MostlyCheck(a, kw.get("mostly").asDouble())
      case other => throw new IllegalArgumentException(
        s"'mostly' is not supported for $expectationType (check ${other.name})")
    }
  }

  /** GE's one-expectation-many-quantiles form:
    * `quantile_ranges: { quantiles: [..], value_ranges: [[lo,hi],..] }`
    * unrolled to per-quantile checks (null bound → unbounded, as GE). */
  private def quantileRanges(kw: JsonNode): Seq[Check] = {
    val column = reqText(kw, "column")
    val qr = kw.get("quantile_ranges")
    val qs = qr.path("quantiles").elements().asScala.map(_.asDouble()).toSeq
    val ranges = qr.path("value_ranges").elements().asScala.map { r =>
      require(r.isArray && r.size() == 2, s"value_range must be [lo, hi]: $r")
      def bound(i: Int, default: Double): Double =
        if (r.get(i).isNull) default else r.get(i).asDouble()
      (bound(0, Double.NegativeInfinity), bound(1, Double.PositiveInfinity))
    }.toSeq
    require(qs.nonEmpty && qs.size == ranges.size,
      s"quantile_ranges needs equal-length non-empty quantiles/value_ranges, " +
        s"got ${qs.size} quantiles and ${ranges.size} ranges")
    val approx = kw.path("approx").asBoolean(false)
    qs.zip(ranges).map { case (q, (lo, hi)) =>
      if (approx) ApproxQuantileCheck(column, q, lo, hi)
      else QuantileCheck(column, q, lo, hi)
    }
  }

  private def toCheck(expectationType: String, kw: JsonNode): Check =
    expectationType match {
      case "expect_table_row_count_to_be_between" =>
        RowCountCheck(optLong(kw, "min_value").getOrElse(1L),
          optLong(kw, "max_value").getOrElse(Long.MaxValue))
      case "expect_column_values_to_not_be_null" =>
        NotNullCheck(reqText(kw, "column"))
      case "expect_column_values_to_be_in_set" =>
        InSetCheck(reqText(kw, "column"), strings(kw, "value_set"))
      case "expect_column_values_to_not_be_in_set" =>
        NotInSetCheck(reqText(kw, "column"), strings(kw, "value_set"))
      case "expect_column_values_to_be_between" =>
        BetweenCheck(reqText(kw, "column"),
          optDouble(kw, "min_value"), optDouble(kw, "max_value"))
      case "expect_column_values_to_match_regex" =>
        RegexCheck(reqText(kw, "column"), reqText(kw, "regex"))
      case "expect_column_values_to_be_of_type" =>
        TypeCastCheck(reqText(kw, "column"), reqText(kw, "type_"))
      case "expect_column_values_to_be_null" =>
        NullCheck(reqText(kw, "column"))
      case "expect_column_pair_values_a_to_be_greater_than_b" =>
        PairGreaterCheck(reqText(kw, "column_A"), reqText(kw, "column_B"),
          kw.path("or_equal").asBoolean(false),
          optText(kw, "ignore_row_if").getOrElse("both_values_are_missing"))
      case "expect_column_pair_values_to_be_equal" =>
        PairEqualCheck(reqText(kw, "column_A"), reqText(kw, "column_B"),
          optText(kw, "ignore_row_if").getOrElse("both_values_are_missing"))
      case "expect_column_proportion_of_unique_values_to_be_between" =>
        ProportionUniqueCheck(reqText(kw, "column"),
          optDouble(kw, "min_value").getOrElse(0.0),
          optDouble(kw, "max_value").getOrElse(1.0))
      case "expect_column_median_to_be_between" =>
        // GE's median == interpolated p50 — the exact quantile check.
        QuantileCheck(reqText(kw, "column"), 0.5,
          optDouble(kw, "min_value").getOrElse(Double.NegativeInfinity),
          optDouble(kw, "max_value").getOrElse(Double.PositiveInfinity))
      case "expect_column_mean_to_be_between" =>
        aggBounds(kw, "mean")
      case "expect_column_min_to_be_between" =>
        aggBounds(kw, "min")
      case "expect_column_max_to_be_between" =>
        aggBounds(kw, "max")
      case "expect_column_sum_to_be_between" =>
        aggBounds(kw, "sum")
      case "expect_column_stdev_to_be_between" =>
        aggBounds(kw, "stddev")
      case "expect_column_values_to_be_increasing" |
           "expect_column_values_to_be_decreasing" =>
        // GE's implicit row order does not exist in a distributed
        // engine — the suite must DECLARE the order key. Required like
        // the quantile kwarg: silently defaulting would validate a
        // meaningless ordering.
        require(kw.hasNonNull("order_by"),
          s"missing 'order_by' in $kw — a distributed table has no row " +
            "order; declare the key the sequence is read in")
        MonotonicCheck(reqText(kw, "column"), reqText(kw, "order_by"),
          increasing = expectationType.endsWith("increasing"),
          strictly = kw.path("strictly").asBoolean(false))
      case "expect_column_most_common_value_to_be_in_set" =>
        MostCommonValueCheck(reqText(kw, "column"), strings(kw, "value_set"))
      case "expect_column_kl_divergence_to_be_less_than" =>
        // GE's categorical partition_object: {values, weights}. Weights
        // land as integer PPM (the check requires an exact 1,000,000
        // sum — a declaration two engines can replay bit-for-bit).
        // Rounding dust is apportioned by LARGEST REMAINDER (ADVICE
        // r16): naive per-weight math.round rejected valid GE
        // partitions like three equal thirds (3 × 333,333 = 999,999
        // ppm) even though the doubles sum to 1.0. Floor each exact
        // ppm, then give the residual (< size when the weights
        // genuinely sum to ~1.0) to the largest fractional remainders,
        // position-tie-broken for determinism. A weight vector that
        // does NOT sum to ~1.0 leaves a residual the apportionment
        // refuses to absorb, and the check's own exact-sum guard still
        // fails loudly.
        require(kw.hasNonNull("partition_object"),
          s"missing 'partition_object' in $kw — declare the expected " +
            "categorical distribution as {values, weights}")
        val po = kw.get("partition_object")
        val values = strings(po, "values")
        val ppm = weightsToPpm(po)
        require(kw.hasNonNull("threshold"),
          s"missing 'threshold' in $kw")
        KlDivergenceCheck(reqText(kw, "column"), values, ppm,
          kw.get("threshold").asDouble())
      case "expect_column_chisquare_test_p_value_to_be_greater_than" =>
        // GE's other distribution check (G24). Same partition_object →
        // PPM discipline as KL above; the p-value gate resolves to a
        // DECLARED critical value — either an explicit `critical_value`
        // kwarg, or the plan-constant table at df = |values| − 1 and
        // the declared significance `p_value` (GE's default 0.05).
        require(kw.hasNonNull("partition_object"),
          s"missing 'partition_object' in $kw — declare the expected " +
            "categorical distribution as {values, weights}")
        val po = kw.get("partition_object")
        val values = strings(po, "values")
        val ppm = weightsToPpm(po)
        val critical =
          if (kw.hasNonNull("critical_value"))
            kw.get("critical_value").asDouble()
          else ChiSquareCheck.criticalValue(values.size - 1,
            kw.path("p_value").asDouble(0.05))
        ChiSquareCheck(reqText(kw, "column"), values, ppm, critical)
      case "expect_column_values_to_be_unique" =>
        UniqueCheck(Seq(reqText(kw, "column")))
      case "expect_compound_columns_to_be_unique" =>
        UniqueCheck(strings(kw, "column_list"))
      case "expect_column_value_lengths_to_be_between" =>
        // Clamp instead of narrowing: .toInt of an out-of-Int-range bound
        // silently wraps negative and fails every value.
        def asLen(v: Long): Int =
          math.min(math.max(v, 0L), Int.MaxValue.toLong).toInt
        ValueLengthCheck(reqText(kw, "column"),
          asLen(optLong(kw, "min_value").getOrElse(0L)),
          asLen(optLong(kw, "max_value").getOrElse(Int.MaxValue.toLong)))
      case "expect_column_unique_value_count_to_be_between" =>
        // `approx: true` → the HLL sketch variant for very hot columns.
        // ORACLE NOTE: the estimate is not engine-portable, so a suite
        // declaring it must size bounds so the verdict, not the value, is
        // what both engines agree on (see ApproxDistinctCountCheck).
        val (lo14, hi14) = (optLong(kw, "min_value").getOrElse(0L),
          optLong(kw, "max_value").getOrElse(Long.MaxValue))
        if (kw.path("approx").asBoolean(false))
          ApproxDistinctCountCheck(reqText(kw, "column"), lo14, hi14)
        else DistinctCountCheck(reqText(kw, "column"), lo14, hi14)
      case "expect_column_quantile_values_to_be_between" =>
        // A defaulted quantile (missing/typoed kwarg → 0.0) would build a
        // p0 check that validates nothing — required, like other kwargs.
        require(kw.hasNonNull("quantile"), s"missing 'quantile' in $kw")
        val (lo15, hi15) = (optDouble(kw, "min_value").getOrElse(Double.NegativeInfinity),
          optDouble(kw, "max_value").getOrElse(Double.PositiveInfinity))
        if (kw.path("approx").asBoolean(false))
          ApproxQuantileCheck(reqText(kw, "column"),
            kw.path("quantile").asDouble(), lo15, hi15)
        else QuantileCheck(reqText(kw, "column"), kw.path("quantile").asDouble(),
          lo15, hi15)
      case "expect_table_columns_to_match_set" =>
        SchemaCheck(strings(kw, "column_set"),
          kw.path("exact_match").asBoolean(false))
      case "expect_row_count_within_pct_of_last_run" =>
        // Required like the quantile kwarg: a typo ('max_pct_chnage')
        // silently defaulting to 10% changes the declared tolerance.
        require(kw.hasNonNull("max_pct_change"),
          s"missing 'max_pct_change' in $kw")
        UnresolvedDriftCheck(kw.path("max_pct_change").asDouble())
      case other =>
        throw new IllegalArgumentException(s"unknown expectation type: $other")
    }

  private def aggBounds(kw: JsonNode, stat: String): AggBoundsCheck =
    AggBoundsCheck(reqText(kw, "column"), stat,
      optDouble(kw, "min_value").getOrElse(Double.NegativeInfinity),
      optDouble(kw, "max_value").getOrElse(Double.PositiveInfinity))

  private def reqText(n: JsonNode, field: String): String = {
    val v = n.path(field)
    require(v.isTextual && v.asText().nonEmpty, s"missing/non-string '$field' in $n")
    v.asText()
  }
  private def optDouble(n: JsonNode, field: String): Option[Double] =
    if (n.hasNonNull(field)) Some(n.get(field).asDouble()) else None
  private def optText(n: JsonNode, field: String): Option[String] =
    if (n.hasNonNull(field)) Some(n.get(field).asText()) else None
  private def optLong(n: JsonNode, field: String): Option[Long] =
    if (n.hasNonNull(field)) Some(n.get(field).asLong()) else None
  private def strings(n: JsonNode, field: String): Seq[String] = {
    val v = n.path(field)
    require(v.isArray && v.size() > 0, s"missing/empty array '$field' in $n")
    v.elements().asScala.map(_.asText()).toSeq
  }

  /** GE partition_object weights → integer PPM by LARGEST-REMAINDER
    * apportionment (ADVICE r16): floor each weight's exact ppm, then
    * hand the residual (< size when the weights genuinely sum to ~1.0)
    * to the largest fractional remainders, position-tie-broken. A
    * vector that does NOT sum to ~1.0 leaves a residual this refuses
    * to absorb — the checks' own exact-1,000,000 guard stays loud. */
  private def weightsToPpm(po: JsonNode): Seq[Long] = {
    val raw = po.path("weights").elements().asScala.map(_.asDouble()).toSeq
    val floors = raw.map(w => math.floor(w * 1e6).toLong)
    val residual = 1000000L - floors.sum
    if (residual <= 0L || residual > raw.size) floors
    else {
      val bumped = raw.indices
        .sortBy(i => (-(raw(i) * 1e6 - floors(i)), i))
        .take(residual.toInt).toSet
      floors.zipWithIndex.map { case (f, i) => if (bumped(i)) f + 1L else f }
    }
  }
}
