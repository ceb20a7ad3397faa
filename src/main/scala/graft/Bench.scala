package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): runs every registered query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line (last stdout line) with
  * per-query seconds.
  *
  * Harness design (fixes the round-1 flaws called out in VERDICT.md):
  *  - one discarded warm-up pass absorbs JVM/codegen/broadcast-exchange
  *    startup so per-query numbers reflect steady state;
  *  - results materialize via a `noop` format write — exercises the full
  *    plan (projections + sort included) where `.count()` lets Catalyst
  *    prune most of the work;
  *  - a failed query is recorded in `"errors"` and excluded from the
  *    total, never silently timed as a pass;
  *  - the JSON line is also written to `SPARK_GRAFT_BENCH_OUT` (if set) so
  *    log-wrapper noise can't hide it from the driver.
  */
object Bench {

  private def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = Sessions.local(cpus)

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)

    // Warm-up: run the whole suite once, discarding timings (JIT, codegen
    // cache, parquet footer cache, broadcast thread pools).
    queries.foreach { case (_, fn) =>
      try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
    }

    var errors = List.empty[String]
    val results = queries.flatMap { case (name, fn) =>
      // Operators that persist() intermediates (e.g. fuzzy dedup) would
      // otherwise hit the warm-up pass's cache via plan-fragment matching
      // and report a fantasy number; each timed query starts cold.
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        materialize(fn(spark, sfDir))
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          errors ::= name
          None
      }
    }

    // Locale.ROOT: the default-locale `f` interpolator would print a
    // comma decimal separator on some machines — invalid JSON.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = num(results.map(_._2).sum)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""

    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
    }
    spark.stop()
    // Print last, after Spark shutdown noise, so the driver's "last JSON
    // line of stdout" parse finds it.
    println(line)
  }
}
