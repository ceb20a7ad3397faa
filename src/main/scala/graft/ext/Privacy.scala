package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X31 — k-anonymity suppression: the release gate that sits next to
  * X7's PII redaction in a data-platform pipeline. Redaction scrubs
  * DIRECT identifiers out of content; k-anonymity handles the
  * QUASI-identifiers — combinations of ordinary columns (user ×
  * event type, zip × age band) specific enough to re-identify someone
  * when a group contains fewer than k rows. The standard rule: a row
  * may only be released if at least k rows share its quasi-identifier
  * combination; smaller groups are suppressed.
  *
  * Annotate-don't-filter (the [[Curation]] discipline): [[kAnonymity]]
  * appends `group_size` and `is_kanon` so the release audit — how much
  * data the privacy gate costs, per segment — is one aggregate over
  * the same frame; [[suppress]] is the conjunction filter.
  *
  * Scale shape: ONE census aggregate over the quasi columns (map-side
  * partial combine — group rows collapse per partition before the
  * shuffle) + one join back co-partitioned on the same columns — the
  * [[Dedup.softDedupWeights]] cost model. The join is null-safe on
  * EVERY quasi column (`<=>`): NULL is a real quasi-value (all-null
  * rows form a group), never a silent row drop. No window — the naive
  * `count(*) OVER (PARTITION BY quasi)` ships every corpus row to its
  * group's reducer; the census shuffles only distinct combinations. */
object Privacy {

  /** Appends `group_size` (rows sharing this row's quasi combination)
    * and `is_kanon` (`group_size >= k`). Alias-safe: the census count
    * rides an internal name through the join, and a pre-existing
    * `group_size`/`is_kanon` on the input is OVERWRITTEN — re-running
    * the gate with a different quasi set replaces the previous
    * verdict instead of crashing on an ambiguous reference (rename
    * first if both audits must survive). */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 1L, s"k ($k) must be >= 1")
    val census = df
      .groupBy(quasiCols.map(c => col(c).as(s"__q_$c")): _*)
      .agg(count(lit(1)).as("__q_n"))
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.drop("group_size", "is_kanon")
      .join(census, cond)
      .drop(quasiCols.map(c => s"__q_$c"): _*)
      .withColumn("group_size", col("__q_n"))
      .withColumn("is_kanon", col("__q_n") >= lit(k))
      .drop("__q_n")
  }

  /** Only the releasable rows (groups of at least k). */
  def suppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    kAnonymity(df, quasiCols, k).filter(col("is_kanon"))
      .drop("group_size", "is_kanon")

  /** L-DIVERSITY (r17 — the homogeneity attack k-anonymity misses): a
    * quasi-identifier group of ANY size still discloses its sensitive
    * attribute if every member shares one value; distinct-l-diversity
    * requires ≥ `l` DISTINCT non-null sensitive values per group
    * (Machanavajjhala et al. 2007's simplest instantiation). Appends
    * `group_size`, `sensitive_diversity`, and `is_ldiverse` — the
    * annotate-don't-filter discipline, same census+null-safe-join
    * shape as [[kAnonymity]] (one partial-agg census over the quasi
    * columns, never a per-row window; NULL quasi values form a real
    * group via `<=>`). NULL sensitive values do NOT count toward
    * diversity (a null discloses nothing and protects nothing —
    * matching `count(DISTINCT …)`'s null semantics on both engines);
    * an all-null-sensitive group has diversity 0 and is suppressed. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column '$sensitiveCol' cannot also be a quasi column" +
        " — diversity within its own group is always 1")
    require(l >= 1L, s"l ($l) must be >= 1")
    val census = df
      .groupBy(quasiCols.map(c => col(c).as(s"__q_$c")): _*)
      .agg(count(lit(1)).as("__q_n"),
        countDistinct(col(sensitiveCol)).as("__q_div"))
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.drop("group_size", "sensitive_diversity", "is_ldiverse")
      .join(census, cond)
      .drop(quasiCols.map(c => s"__q_$c"): _*)
      .withColumn("group_size", col("__q_n"))
      .withColumn("sensitive_diversity", col("__q_div"))
      .withColumn("is_ldiverse", col("__q_div") >= lit(l))
      .drop("__q_n", "__q_div")
  }

  /** Only the rows in l-diverse groups. */
  def suppressNonDiverse(df: DataFrame, quasiCols: Seq[String],
                         sensitiveCol: String, l: Long): DataFrame =
    lDiversity(df, quasiCols, sensitiveCol, l).filter(col("is_ldiverse"))
      .drop("group_size", "sensitive_diversity", "is_ldiverse")
}
