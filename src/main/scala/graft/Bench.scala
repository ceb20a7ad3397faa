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
  *  - each query is timed `SPARK_GRAFT_BENCH_REPS` times (default 2) and
  *    the BEST run is reported: a transient contention spike (another
  *    process stealing the box's cores mid-run — BENCH_r02 recorded a 4×
  *    uniformly-inflated total this way) has to hit every repetition of a
  *    query to corrupt its number;
  *  - the JSON line is always written to `target/bench.json` (and to
  *    `SPARK_GRAFT_BENCH_OUT` when set) so sbt log-wrapper noise can't
  *    hide it from the driver — both recorded rounds show
  *    `"parsed": null`, i.e. the stdout parse fails.
  */
object Bench {

  private def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = Sessions.local(cpus)

    // Optional args = subset of query names (focused measurement while
    // iterating on one operator); default = the full registry. Unknown
    // names fail fast — a typo must not silently time zero queries and
    // (with SPARK_GRAFT_BENCH_OUT set) overwrite the output with an
    // empty result.
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")} — known: " +
        SparkEntry.queries.keySet.toSeq.sorted.mkString(", "))
    val wanted: String => Boolean =
      if (args.isEmpty) _ => true else args.toSet
    val queries = SparkEntry.queries.toSeq.filter(q => wanted(q._1)).sortBy(_._1)

    // Warm-up: run the whole suite once, discarding timings (JIT, codegen
    // cache, parquet footer cache, broadcast thread pools).
    queries.foreach { case (_, fn) =>
      try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
    }

    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(2)
    var errors = List.empty[String]
    var flaky = List.empty[String] // some reps failed, some passed
    val results = queries.flatMap { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        // Operators that persist() intermediates (e.g. fuzzy dedup) would
        // otherwise hit a previous pass's cache via plan-fragment matching
        // and report a fantasy number; each timed run starts cold.
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          materialize(fn(spark, sfDir))
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      if (times.isEmpty) { errors ::= name; None }
      else {
        // An intermittent failure must not vanish into a clean pass.
        if (times.size < reps) flaky ::= name
        Some(name -> times.min)
      }
    }

    // Locale.ROOT: the default-locale `f` interpolator would print a
    // comma decimal separator on some machines — invalid JSON.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flakyJson = flaky.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = num(results.map(_._2).sum)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"flaky":$flakyJson,"sf":"$sfDir"}"""

    // Write the JSON unconditionally to a default file — the driver can
    // pick it up even when its stdout parse fails (see Scaladoc). Focused
    // subset runs (args non-empty) skip it: a 2-query file must never
    // masquerade as the round's full bench.
    val defaultOut = if (args.isEmpty) Seq("target/bench.json") else Nil
    val outs = defaultOut ++ sys.env.get("SPARK_GRAFT_BENCH_OUT")
    outs.foreach { p =>
      val path = java.nio.file.Paths.get(p)
      Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(path, line + "\n")
    }
    spark.stop()
    // Print last, after Spark shutdown noise, so the driver's "last JSON
    // line of stdout" parse finds it.
    println(line)
  }
}
