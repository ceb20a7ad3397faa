package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.Perceptron

class PerceptronSpec extends SparkSpec {

  private val ddl = "y BIGINT, one BIGINT, f1 BIGINT, f2 BIGINT"

  /** Driver-side reference implementation: the same batch rule over a
    * local Seq — what the distributed aggregate must equal exactly. */
  private def reference(rows: Seq[(Long, Long, Long, Long)], epochs: Int)
      : Seq[(Long, Long, Seq[Long])] = {
    var w = Vector(0L, 0L, 0L)
    (1 to epochs).map { e =>
      val mis = rows.filter { case (y, one, f1, f2) =>
        y * (w(0) * one + w(1) * f1 + w(2) * f2) <= 0 }
      w = Vector(
        w(0) + mis.map(r => r._1 * r._2).sum,
        w(1) + mis.map(r => r._1 * r._3).sum,
        w(2) + mis.map(r => r._1 * r._4).sum)
      (e.toLong, mis.size.toLong, w)
    }
  }

  test("distributed fit equals the driver-side reference, at every " +
       "epoch, for every partitioning") {
    // Linearly separable by f1 (positives have f1 >= 10) plus noise
    // features; not trivially balanced.
    val data = (1L to 60L).map(i =>
      (if (i % 3 == 0) 1L else -1L, 1L,
        if (i % 3 == 0) 10L + i % 7 else i % 9, i % 5))
    val expected = reference(data, epochs = 4)
    for (p <- Seq(1, 7, 32)) {
      val d = df(data.map(t => Row(t._1, t._2, t._3, t._4)), ddl)
        .repartition(p)
      val got = Perceptron.fit(d, Seq("one", "f1", "f2"), "y", epochs = 4)
        .orderBy("epoch").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Seq(r.getLong(2), r.getLong(3), r.getLong(4))))
      assert(got.toSeq == expected, s"partitioning $p diverged")
    }
  }

  test("epoch 1 misclassifies everything (zero weights), and a " +
       "separable problem is learned: margins classify all rows") {
    val data = Seq[(Long, Long, Long, Long)](
      (1L, 1L, 8L, 0L), (1L, 1L, 9L, 1L), (1L, 1L, 10L, 0L),
      (-1L, 1L, 1L, 0L), (-1L, 1L, 2L, 1L), (-1L, 1L, 0L, 0L))
    val d = df(data.map(t => Row(t._1, t._2, t._3, t._4)), ddl)
    val audit = Perceptron.fit(d, Seq("one", "f1", "f2"), "y", epochs = 8)
      .orderBy("epoch").collect()
    assert(audit.head.getLong(1) == data.size, "epoch 1 must count all")
    val last = audit.last
    val w = Seq(last.getLong(2), last.getLong(3), last.getLong(4))
    val wrong = d.filter(
      col("y") * Perceptron.marginOf(w, Seq("one", "f1", "f2")) <= 0)
    assert(wrong.count() == 0, s"not separated by $w after 8 epochs")
    // And the audit says so: the last epoch's pre-update count is 0.
    assert(last.getLong(1) == 0L)
  }

  test("materialized-feature fit replays the text-path trajectory " +
       "bit for bit (the k-epoch re-parse fix is result-invisible)") {
    import graft.ext.QualityScore
    val fc = Seq("f_one", "q_stop_hits", "q_alpha_chars", "q_punct_chars",
      "q_tokens")
    val feats = QualityScore.scored(Tables.documents(spark, sfDir))
      .withColumn("f_one", lit(1L))
      .withColumn("y", when(col("lang") === "en", 1L).otherwise(-1L))
    val textPath = Perceptron.fit(feats, fc, "y", epochs = 3)
      .orderBy("epoch").collect().map(_.toSeq).toSeq
    val dir = java.nio.file.Files.createTempDirectory("perc_feats").toString
    Perceptron.materializeFeatures(feats, fc, "y", dir)
    val featPath = Perceptron.fit(
        Perceptron.loadFeatures(spark, dir, fc, "y"), fc, "y", epochs = 3)
      .orderBy("epoch").collect().map(_.toSeq).toSeq
    assert(textPath == featPath,
      "the parquet hop changed the weight trajectory")
    // The artifact is the integer frame the replay assumes: 6 longs.
    val schema = spark.read.parquet(dir).schema
    assert(schema.size == 6 &&
      schema.forall(_.dataType == org.apache.spark.sql.types.LongType))
  }

  test("registered x30_perceptron: three epochs, epoch 1 counts the " +
       "whole corpus, trajectory is integral and non-trivial") {
    val out = Queries.x30Perceptron(spark, sfDir).collect()
    assert(out.length == 3)
    val total = Tables.documents(spark, sfDir).count()
    assert(out.head.getLong(1) == total)
    // The en/non-en signal exists: later epochs misclassify fewer than
    // everything, and at least one weight moved.
    assert(out.last.getLong(1) < total)
    assert((2 to 6).exists(i => out.last.getLong(i) != 0L))
  }
}
