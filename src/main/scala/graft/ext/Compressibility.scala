package graft.ext

import java.util.zip.Deflater

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X46 — compression-ratio quality signal: per-document
  * deflate(text)/|text| — the classic cheap junk detector the published
  * web-corpus pipelines run alongside the rule bundles (Gopher's
  * repetition family and Dolma's quality screens both chase the same
  * thing: machine-generated/repetitive pages compress far better than
  * prose). One number, no language model, catches keyword-stuffing,
  * template spam, and degenerate repetition that n-gram rules with
  * fixed sizes can miss.
  *
  * Determinism: the JDK Deflater at a PINNED level with a PINNED
  * strategy is deterministic for a given input — the ratio is an exact
  * integer ppm, stable across runs and partitionings (pinned in spec).
  * It is NOT replayable in SQL (DuckDB ships no deflate), so the
  * census query registers rows-only, twinned with an oracle-checked
  * planted query in the house LSH-lane style: a repeated-single-char
  * run of n ≥ 200 chars deflates to a few dozen bytes (< 8% with a
  * wide margin) under ANY correct deflate, so the planted rows' band
  * is a mathematical certainty the oracle can state without running
  * the compressor.
  *
  * Scale shape: mapPartitions with ONE reused Deflater per partition
  * (allocating per row would dominate at small docs); map-only, zero
  * shuffles before the census aggregate.
  */
object Compressibility {

  /** Band cut points in ppm of the raw size. Junk ceiling 80000 (8%)
    * sits far above any constant-run's ratio and far below prose's
    * (English text deflates to ~25–60%). */
  val JunkMaxPpm = 80000L
  val NormalMinPpm = 150000L

  /** Per-document (keyCol, n_raw, n_deflate, ratio_ppm, band) — band
    * ∈ empty / junk / mid / normal. Null/empty text bands `empty`
    * (0/0 is undefined). */
  def ratios(docs: DataFrame, textCol: String = "text",
             keyCol: String = "doc_id"): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    docs.select(col(keyCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        // One Deflater per partition, reset per row: BEST_SPEED +
        // DEFAULT_STRATEGY pinned — the ratio contract is tied to
        // these, not to "whatever the default was".
        val deflater = new Deflater(Deflater.BEST_SPEED, false)
        val buf = new Array[Byte](1 << 16)
        rows.map { r =>
          val key = r.getLong(0)
          val text = if (r.isNullAt(1)) null else r.getString(1)
          if (text == null || text.isEmpty) (key, 0L, 0L)
          else {
            val bytes = text.getBytes("UTF-8")
            deflater.reset()
            deflater.setInput(bytes)
            deflater.finish()
            var n = 0L
            while (!deflater.finished()) n += deflater.deflate(buf)
            (key, bytes.length.toLong, n)
          }
        }
      }
      .toDF(keyCol, "n_raw", "n_deflate")
      .withColumn("ratio_ppm",
        when(col("n_raw") === 0L, lit(null).cast("long"))
          .otherwise(expr("(n_deflate * 1000000) div n_raw")))
      .withColumn("band",
        when(col("n_raw") === 0L, lit("empty"))
          .when(col("ratio_ppm") < JunkMaxPpm, lit("junk"))
          .when(col("ratio_ppm") >= NormalMinPpm, lit("normal"))
          .otherwise(lit("mid")))
  }

  /** The registered census: per-(`groupCol`, band) doc count, raw
    * mass, and mean ratio — the recipe author's view. */
  def census(docs: DataFrame, textCol: String = "text",
             keyCol: String = "doc_id",
             groupCol: String = "lang"): DataFrame =
    ratios(docs.select(col(keyCol), col(textCol), col(groupCol)),
      textCol, keyCol)
      .join(docs.select(col(keyCol), col(groupCol)), keyCol)
      .groupBy(col(groupCol), col("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_raw")).as("raw_bytes"),
        expr("(sum(ratio_ppm) div count(1))").as("mean_ratio_ppm"))
      .orderBy(groupCol, "band")
}
