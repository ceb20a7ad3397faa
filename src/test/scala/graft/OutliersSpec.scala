package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.{Outliers, Quantize}

class OutliersSpec extends SparkSpec {

  private val ddl = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"

  test("a planted far vector is its group's rank-1 outlier; ties break " +
       "to min id; groups are independent") {
    val tight = (0 until 8).map(i =>
      Row(i.toLong, Array(1.0f + i * 0.01f, 1.0f, 0.0f, 0.0f), 0))
    val far = Seq(Row(100L, Array(-1.0f, -1.0f, 5.0f, 5.0f), 0))
    val other = (0 until 5).map(i =>
      Row(200L + i, Array(0.0f, 0.0f, 1.0f, 1.0f), 1))
    val out = Outliers.centroidOutliers(
        df(tight ++ far ++ other, ddl), topN = 3)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    assert(out.exists(t => t == ((0, 100L, 1L))),
      s"the planted far vector must be label 0's rank-1 outlier: " +
        out.mkString(", "))
    // Label 1's vectors are identical → dist_num 0 for all; ranks
    // break ties to min vec_id.
    val l1 = out.filter(_._1 == 1).sortBy(_._3).map(_._2)
    assert(l1.toSeq == Seq(200L, 201L, 202L),
      s"tie ranks must follow min vec_id: ${l1.mkString(",")}")
  }

  test("dist_num equals the brute-force n²·‖q − μ·n‖² on the quantized " +
       "integers") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = Quantize.quantize(emb, keep = Seq("label"))
      .select("vec_id", "label", "qvec").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Byte](2).map(_.toLong).toArray))
    val byLabel = q.groupBy(_._2)
    val expected = byLabel.iterator.flatMap { case (lbl, rows) =>
      val n = rows.length.toLong
      val dim = rows.head._3.length
      val s = Array.tabulate(dim)(i => rows.map(_._3(i)).sum)
      rows.map { case (id, _, v) =>
        val d = v.indices.map { i =>
          val dlt = BigInt(v(i)) * n - s(i); dlt * dlt
        }.sum
        (lbl, id) -> d
      }
    }.toMap
    val got = Outliers.centroidOutliers(emb, topN = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        BigInt(r.getDecimal(2).toBigInteger))
    assert(got.nonEmpty)
    got.foreach { case (k, d) =>
      assert(expected(k) == d, s"dist mismatch for $k: ${expected(k)} vs $d")
    }
  }

  test("CentroidDistNum: BigInteger fallback kicks in past long range " +
       "and is exact; long fast path agrees with BigInt; CODEGEN_ONLY ok") {
    import graft.functions.VectorFunctions.centroidDistNum
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s2.conf.set("spark.sql.codegen.fallback", "false")
    val n = 1000000000000000L // 10^15 rows/group: d² ≈ 10^34 ≫ 2^63
    val q = Seq(127, -127, 50).map(_.toByte)
    val s = Seq(3L, -5L, 7L)
    val want = q.zip(s).map { case (qi, si) =>
      val d = BigInt(qi.toLong) * n - si; d * d
    }.sum
    val d1 = s2.createDataFrame(
      s2.sparkContext.parallelize(Seq(Row(q.toArray, s.toArray, n)), 1),
      org.apache.spark.sql.types.StructType.fromDDL(
        "q ARRAY<TINYINT>, s ARRAY<BIGINT>, n BIGINT"))
    val got = d1.select(centroidDistNum(col("q"), col("s"), col("n")))
      .head().getDecimal(0)
    assert(BigInt(got.toBigInteger) == want,
      s"overflow fallback wrong: $got vs $want")
    // Small-n fast path, same formula.
    val d2 = d1.withColumn("n", lit(10L))
    val want2 = q.zip(s).map { case (qi, si) =>
      val d = BigInt(qi.toLong) * 10L - si; d * d
    }.sum
    assert(BigInt(d2.select(centroidDistNum(col("q"), col("s"), col("n")))
      .head().getDecimal(0).toBigInteger) == want2)
  }

  test("quantize keep-columns ride along; default call shape unchanged") {
    val emb = Tables.embeddings(spark, sfDir)
    assert(Quantize.quantize(emb).columns.toSeq ==
      Seq("vec_id", "qvec", "scale"))
    val kept = Quantize.quantize(emb, keep = Seq("label"))
    assert(kept.columns.toSeq == Seq("vec_id", "label", "qvec", "scale"))
    // The quantized vectors themselves are identical with and without.
    val a = Quantize.quantize(emb).select("vec_id", "qvec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val b = kept.select("vec_id", "qvec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(a == b)
  }
}
