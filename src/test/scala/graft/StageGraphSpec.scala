package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.etl.{Stage, StageGraph, StageGraphException}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** P1–P4 stage-graph semantics (Glue-etl-pipeline.py:125-129 diamond). */
class StageGraphSpec extends SparkSpec {

  private def one(v: Int) = df(Seq(Row(v)), "v INT")

  test("diamond topological order respects the fan-in barrier") {
    val g = StageGraph(Seq(
      Stage("d", Seq("b", "c"))(up => up("b").union(up("c"))),
      Stage("a", Nil)(_ => one(1)),
      Stage("b", Seq("a"))(up => up("a")),
      Stage("c", Seq("a"))(up => up("a"))))
    val order = g.topoOrder
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("a") < order.indexOf("c"))
    assert(order.indexOf("b") < order.indexOf("d"))
    assert(order.indexOf("c") < order.indexOf("d"))
  }

  test("data flows through dependencies") {
    val g = StageGraph(Seq(
      Stage("src", Nil)(_ => one(5)),
      Stage("double", Seq("src"))(up => up("src").select((col("v") * 2).as("v")))))
    val out = g.run()
    assert(out("double").head().getInt(0) == 10)
  }

  test("cycles are rejected") {
    val ex = intercept[StageGraphException] {
      StageGraph(Seq(
        Stage("x", Seq("y"))(up => up("y")),
        Stage("y", Seq("x"))(up => up("x")))).topoOrder
    }
    assert(ex.getMessage.contains("cycle"))
  }

  test("unknown dependency is rejected at construction") {
    intercept[IllegalArgumentException] {
      StageGraph(Seq(Stage("x", Seq("ghost"))(up => up("ghost"))))
    }
  }

  test("retry re-runs a failing stage builder, bounded by the policy") {
    val attempts = new AtomicInteger(0)
    val flaky = Stage("flaky", Nil, retries = 1) { _ =>
      if (attempts.incrementAndGet() == 1) throw new RuntimeException("transient")
      one(7)
    }
    assert(StageGraph(Seq(flaky)).run()("flaky").head().getInt(0) == 7)
    assert(attempts.get() == 2)
  }

  test("retries = 0 (alert-emitter pinning) never re-runs") {
    val attempts = new AtomicInteger(0)
    val failing = Stage("f", Nil, retries = 0) { _ =>
      attempts.incrementAndGet(); throw new RuntimeException("boom")
    }
    intercept[StageGraphException] { StageGraph(Seq(failing)).run() }
    assert(attempts.get() == 1)
  }

  test("ranks group mutually independent stages for parallel eager execution") {
    val g = StageGraph(Seq(
      Stage("d", Seq("b", "c"))(up => up("b").union(up("c"))),
      Stage("a", Nil)(_ => one(1)),
      Stage("b", Seq("a"))(up => up("a")),
      Stage("c", Seq("a"))(up => up("a"))))
    assert(g.ranks == Seq(Seq("a"), Seq("b", "c"), Seq("d")))
  }

  test("eager diamond produces the same outputs as lazy") {
    def graph(eager: Boolean) = StageGraph(Seq(
      Stage("src", Nil)(_ => one(2)),
      Stage("x2", Seq("src"))(up => up("src").select((col("v") * 2).as("v"))),
      Stage("x3", Seq("src"))(up => up("src").select((col("v") * 3).as("v"))),
      Stage("sum", Seq("x2", "x3"))(up => up("x2").union(up("x3")))), eager)
    val lazyOut = graph(eager = false).run()("sum").collect().map(_.getInt(0)).sorted
    val eagerOut = graph(eager = true).run()("sum").collect().map(_.getInt(0)).sorted
    assert(lazyOut.toSeq == Seq(4, 6) && eagerOut.toSeq == Seq(4, 6))
  }

  test("eager mode retries runtime (action-time) failures, lazy mode cannot") {
    StageGraphSpec.runtimeFailures.set(0)
    val failOnce = udf { (v: Int) =>
      if (StageGraphSpec.runtimeFailures.incrementAndGet() == 1)
        throw new RuntimeException("runtime transient")
      v
    }
    def stage = Stage("s", Nil, retries = 1)(_ => one(3).select(failOnce(col("v")).as("v")))

    // Lazy: the builder succeeds (nothing runs), the failure surfaces later
    // at action time, outside any retry envelope.
    StageGraphSpec.runtimeFailures.set(0)
    val lazyOut = StageGraph(Seq(stage)).run()("s")
    intercept[Exception] { lazyOut.collect() }

    // Eager: localCheckpoint inside the envelope hits the failure on
    // attempt 1 and the retry succeeds.
    StageGraphSpec.runtimeFailures.set(0)
    val eagerOut = StageGraph(Seq(stage), eager = true).run()("s")
    assert(eagerOut.head().getInt(0) == 3)
  }
}

object StageGraphSpec {
  /** Shared with executor threads (local mode = same JVM). */
  val runtimeFailures = new AtomicInteger(0)
}
