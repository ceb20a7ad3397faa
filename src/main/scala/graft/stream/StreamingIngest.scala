package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S15 — STREAMING semi-structured ingestion: the X50 parse + flatten
  * on arriving records — crawl metadata and API payloads land as JSON
  * strings, and the pipeline wants COLUMNS before anything else keys
  * on them. `from_json` under an explicit schema, nested struct paths,
  * and the array explode are all stateless per-row operations, so the
  * lane is ONE projection + generator — no state store, no watermark;
  * corrupt records parse to a null struct and the explode DROPS them
  * (no silent half-parse; route the raw stream elsewhere for a DLQ —
  * the FAILFAST rationale in streaming form, where FAILFAST itself
  * would kill the query on one bad record).
  *
  * Micro-batch ≡ batch pinned in StreamingIngestSpec; the registered
  * lane is the batch replay, hash-matched against the SAME oracle as
  * `x50_nested_flatten` over the shared constructed-JSON plant.
  */
object StreamingIngest {

  /** Parse `jsonCol` under `schema`, surface `paths` (nested field
    * paths, aliased to their leaf name), and explode `arrayPath` to
    * one row per element (`elemName`). */
  def flattenStream(stream: DataFrame, jsonCol: String,
                    schema: StructType, paths: Seq[String],
                    arrayPath: String, elemName: String): DataFrame = {
    val parsed = stream.withColumn("__j", from_json(col(jsonCol), schema))
    val keep: Seq[Column] = stream.columns.filterNot(_ == jsonCol)
      .map(col).toIndexedSeq
    parsed.select(keep ++
      paths.map(p => col(s"__j.$p").as(p.split('.').last)) :+
      explode(col(s"__j.$arrayPath")).as(elemName): _*)
  }
}
