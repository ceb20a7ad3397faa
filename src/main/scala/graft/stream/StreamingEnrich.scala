package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S14 — STREAMING point-in-time dimension enrichment: the serve-time
  * form of [[graft.ext.AsofJoin.enrichAsOf]] — each arriving fact joins
  * the dimension VERSION valid at its event time. The batch asof
  * formulation (a window over a union) cannot run in append mode, but
  * the dimension history is dim-sized BY DEFINITION, so the streaming
  * shape is ONE stream-static LEFT join on the key carrying the
  * validity check (`valid_from <= t AND (valid_to IS NULL OR
  * t < valid_to)`) as its non-equi condition — the static side
  * broadcasts, no state store, no watermark, at most one match per
  * fact because SCD-2 versions never overlap.
  *
  * Result-identity with the batch asof formulation and live
  * MemoryStream ≡ batch are pinned in StreamingEnrichSpec; the
  * registered lane hash-matches the SAME oracle as `x42_scd2_enrich`.
  *
  * Index refresh follows the s2/s3 static-frame contract: a raw
  * DataFrame pins its snapshot at creation — dimension updates are a
  * planned query restart (or a catalog `REFRESH TABLE` read).
  */
object StreamingEnrich {

  /** Enrich `stream` with `attrs` from the valid `dim` version;
    * emitted as `prefix + name` plus `prefix + validFrom` (the matched
    * version's start — the audit column). Unmatched facts (gaps,
    * unknown keys, pre-history) carry NULLs. */
  def enrichStream(stream: DataFrame, dim: DataFrame, keyCol: String,
                   timeCol: String, attrs: Seq[String],
                   validFrom: String = "valid_from",
                   validTo: String = "valid_to",
                   prefix: String = "dim_"): DataFrame = {
    require(attrs.nonEmpty, "attrs must name at least one dimension column")
    val d = dim.select(
      (Seq(col(keyCol).as("__dk"), col(validFrom).as(s"$prefix$validFrom"),
        col(validTo).as("__vt")) ++
        attrs.map(c => col(c).as(s"$prefix$c"))): _*)
    stream
      .join(broadcast(d),
        stream(keyCol) === col("__dk") &&
          col(timeCol) >= col(s"$prefix$validFrom") &&
          (col("__vt").isNull || col(timeCol) < col("__vt")),
        "left_outer")
      .drop("__dk", "__vt")
  }
}
