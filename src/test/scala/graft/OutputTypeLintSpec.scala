package graft

import org.apache.spark.sql.types._

/** Registered-output type lint — the r12 incident, made impossible to
  * repeat.
  *
  * In round 12 three queries shipped raw DECIMAL(38,0) columns
  * (HUGEINT-derived exact sums). They passed the local DuckDB string
  * compare (`tools/oracle_check.py`) yet failed the DRIVER's
  * hash_match — the two harnesses render wide decimals differently,
  * and the local gate could not see it (CORRECTNESS_r12:
  * g20_corr_stats, x2_centroid_outliers, x43_embed_drift — the only
  * red rows). The fix rendered those values as canonical integer
  * strings (the g19 bigint-to-string discipline); this spec pins the
  * class: no registered query may expose a decimal wider than 18
  * digits. Exact wide integers ship as strings (or two BIGINT limbs);
  * the proven-stable output vocabulary is BIGINT/INT, VARCHAR, DATE,
  * BOOLEAN, and once-rounded DOUBLE. Library functions keep their
  * DECIMAL(38,0) internals — mergeable sums are the engine's exactness
  * discipline — the ban is on the ORACLE-FACING boundary only. */
class OutputTypeLintSpec extends SparkSpec {

  private def wideDecimals(dt: DataType, path: String): Seq[String] =
    dt match {
      case d: DecimalType if d.precision > 18 => Seq(s"$path: $d")
      case s: StructType =>
        s.fields.flatMap(f => wideDecimals(f.dataType, s"$path.${f.name}")).toSeq
      case a: ArrayType => wideDecimals(a.elementType, s"$path[]")
      case m: MapType =>
        wideDecimals(m.keyType, s"$path<key>") ++
          wideDecimals(m.valueType, s"$path<val>")
      case _ => Nil
    }

  test("no registered query output carries a decimal wider than 18 digits " +
       "(r12 driver-hasher incident)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sfDir).schema.fields
          .flatMap(f => wideDecimals(f.dataType, f.name))
          .map(w => s"$name -> $w")
    }
    assert(offenders.isEmpty,
      "registered outputs with hash-unstable wide decimals (render as " +
        s"canonical strings or BIGINT limbs instead): ${offenders.mkString("; ")}")
  }
}
