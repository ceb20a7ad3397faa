package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** X33 — small-file COMPACTION: rewrite a parquet leaf directory into
  * ~`targetFileBytes`-sized files. The small-files problem is the
  * steady-state operational failure of long-running ingestion at
  * scale: a streaming sink or an hourly batch lands thousands of
  * KB-sized files per day, and every downstream scan then pays a task
  * per file (scheduler pressure), a footer read per file (NameNode /
  * object-store metadata storm), and loses row-group-level pruning
  * and compression ratio. Nightly compaction is the standard remedy;
  * an engine whose writers promise "one file per leaf" needs the
  * repair tool for datasets that arrived WITHOUT that discipline.
  *
  * Shape: list the leaf's parquet files (driver-side metadata only —
  * file COUNT and BYTES, never rows), size the output file count as
  * `ceil(bytes / target)`, and rewrite via ONE hash repartition on
  * the key column — the [[Jsonl.write]] contract: a pure row router,
  * so output file CONTENTS are byte-stable for a given file count
  * regardless of input fragmentation or cluster size (round-robin
  * `repartition(n)` would balance better on skewed keys but makes
  * layout a function of task scheduling). Content is verified by the
  * registered read-back census, which must hash-match the SAME oracle
  * as the uncompacted data — compaction is layout-only by contract.
  *
  * A PARTITIONED dataset compacts per leaf directory (this operator
  * is the per-leaf primitive — callers iterate partition dirs so the
  * partitioning columns survive untouched); `out` must differ from
  * `dir` (read-while-overwrite), swap-in is the caller's atomic
  * rename. */
object Compact {

  /** Compact one parquet leaf `dir` into `out`; returns
    * (filesBefore, filesAfter, bytesBefore). */
  def compact(spark: SparkSession, dir: String, out: String,
              targetFileBytes: Long = 128L << 20,
              keyCol: String = "doc_id"): (Int, Int, Long) = {
    require(dir != out, s"compact must write to a NEW dir (in-place " +
      s"overwrite of $dir would corrupt the files mid-read)")
    require(targetFileBytes >= 1L, "targetFileBytes must be positive")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no parquet files under $dir")
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1L) / targetFileBytes)
      .min(Int.MaxValue.toLong).toInt
    spark.read.parquet(dir)
      .repartition(nOut, col(keyCol))
      // Sort within each output file: without this, intra-file row
      // order depends on the INPUT files' scan order and the
      // byte-stability claim above would only hold set-wise. Key-sorted
      // files also restore parquet min/max row-group pruning on the
      // key — fragmented ingest typically interleaves key ranges, so
      // compaction is the moment clustering is recoverable for free.
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(out)
    val outFiles = fs.listStatus(new Path(out))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.length, outFiles, bytes)
  }
}
