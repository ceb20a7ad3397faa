package graft

import org.apache.spark.sql.functions._

import graft.sources.Compact

class CompactSpec extends SparkSpec {

  test("compaction reduces file count to the byte-sized target and is " +
       "content-identical row for row") {
    val docs = Tables.documents(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    docs.repartition(32, col("doc_id"))
      .write.mode("overwrite").parquet(s"$base/frag")
    val (before, after, bytes) =
      Compact.compact(spark, s"$base/frag", s"$base/out",
        targetFileBytes = 64L << 20)
    assert(before == 32, s"fixture should fragment to 32 files, got $before")
    assert(after == 1, s"500 tiny docs fit one 64 MB target file, got $after")
    assert(bytes > 0L)
    val got = spark.read.parquet(s"$base/out")
      .collect().map(_.toSeq.toString).sorted.toSeq
    val want = docs.collect().map(_.toSeq.toString).sorted.toSeq
    assert(got == want, "compaction changed content — it must be layout-only")
  }

  test("compacted row order is input-fragmentation-invariant (key-sorted " +
       "within each output file)") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft_compact3").toString
    docs.repartition(32, col("doc_id"))
      .write.mode("overwrite").parquet(s"$base/fragA")
    docs.repartition(7, col("doc_id"))
      .write.mode("overwrite").parquet(s"$base/fragB")
    Compact.compact(spark, s"$base/fragA", s"$base/outA")
    Compact.compact(spark, s"$base/fragB", s"$base/outB")
    val a = spark.read.parquet(s"$base/outA").collect().map(_.getLong(0)).toSeq
    val b = spark.read.parquet(s"$base/outB").collect().map(_.getLong(0)).toSeq
    assert(a == b,
      "same corpus, different fragmentation must compact to the same order")
    assert(a == a.sorted, "each output file must be key-sorted")
  }

  test("output file count tracks the byte target; in-place rejected; " +
       "empty dir rejected") {
    val docs = Tables.documents(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    docs.repartition(8, col("doc_id"))
      .write.mode("overwrite").parquet(s"$base/frag")
    // A tiny byte target forces multiple output files.
    val (_, after, bytes) =
      Compact.compact(spark, s"$base/frag", s"$base/out2",
        targetFileBytes = math.max(1L, bytesOf(base) / 4))
    assert(after >= 2 && after <= 8,
      s"a quarter-of-total target should yield a handful of files, got $after")
    intercept[IllegalArgumentException] {
      Compact.compact(spark, s"$base/frag", s"$base/frag")
    }
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$base/empty"))
    intercept[IllegalArgumentException] {
      Compact.compact(spark, s"$base/empty", s"$base/out3")
    }
  }

  private def bytesOf(base: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$base/frag")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }
}
