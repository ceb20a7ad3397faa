package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X25 — corpus snapshot diff: what changed between two versions of a
  * corpus, keyed by document id — the nightly-ops primitive that sits
  * next to the X1h history index (what's NEW vs seen) and the T4 SCD-2
  * merge (attribute history): `added` / `removed` / `modified` /
  * `unchanged` per document, decided by a content fingerprint.
  *
  * Null-safety is deliberate: a null text fingerprints as the empty
  * string (two null-text versions of a doc are `unchanged`, a null →
  * real-text transition is `modified`) — `<=>` semantics through
  * `coalesce`, no three-valued-logic surprises in the status column.
  *
  * 100 TB shape: fingerprints are computed MAP-SIDE on each snapshot,
  * so the one co-partitioned full-outer join on the key carries
  * (key, fp) pairs only — document text never crosses the shuffle;
  * [[summary]] folds the statuses into a four-row census with one
  * partial aggregate on top. No collect, no window, no skew exposure
  * (the join key is the unique document id). */
object CorpusDiff {

  /** Per-document status frame: `(keyCol, status)` for every id
    * present in either snapshot. */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           keyCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def fp(df: DataFrame, as: String) =
      df.select(col(keyCol),
        md5(coalesce(col(textCol), lit("")).cast("binary")).as(as))
    fp(oldDf, "__old_fp")
      .join(fp(newDf, "__new_fp"), Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("__old_fp").isNull, lit("added"))
          .when(col("__new_fp").isNull, lit("removed"))
          .when(col("__old_fp") === col("__new_fp"), lit("unchanged"))
          .otherwise(lit("modified")))
      .drop("__old_fp", "__new_fp")
  }

  /** The diff census: per status, document count and key sum (the key
    * sum pins WHICH documents carry each status, not just how many —
    * a miscategorized pair cancels only if two errors collide). */
  def summary(oldDf: DataFrame, newDf: DataFrame,
              keyCol: String = "doc_id", textCol: String = "text"): DataFrame =
    diff(oldDf, newDf, keyCol, textCol)
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(keyCol)).as("key_sum"))
      .orderBy("status")
}
