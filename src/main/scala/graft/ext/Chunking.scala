package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X23 — context-window chunking with overlap: split each document's
  * token stream into windows of `chunkTokens` advancing by
  * `chunkTokens − overlap` — the per-document splitter feeding RAG
  * indexes and long-doc training examples (contrast [[Packing]], which
  * concatenates ACROSS documents to a fixed length; chunking never
  * crosses a document boundary).
  *
  * Layout: chunk i covers tokens [i·stride, i·stride + chunk); the
  * last chunk is short rather than padded; a document with ≤ chunk
  * tokens yields exactly one chunk; empty/null documents yield none.
  * Chunk count = 1 + ⌈(n − chunk)/stride⌉ for n > chunk — computed as
  * `(n − chunk − 1) div stride + 2` on a NON-NEGATIVE numerator
  * (Spark's `div` truncates toward zero while DuckDB's `//` floors, so
  * a negative intermediate would silently diverge between the engines;
  * the n ≤ chunk branch never reaches the division).
  *
  * Scale shape: map-only — tokens materialize ONCE per row (the HOF
  * discipline), the chunk explode fans out by ~n/stride, and no
  * shuffle happens at all; hash/count per chunk are plain projections.
  */
object Chunking {

  def chunkTokens(docs: DataFrame, textCol: String = "text",
                  keyCol: String = "doc_id",
                  chunkTokens: Int = 128, overlap: Int = 32): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens ($chunkTokens) must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap ($overlap) must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    docs
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("__n",
        TextAnalysis.tokenCountFromToks(col(textCol), col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("__nchunks",
        when(col("__n") <= chunkTokens, lit(1L))
          .otherwise(expr(s"(__n - $chunkTokens - 1) div $stride") + lit(2L)))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), col("__nchunks") - 1)))
      .withColumn("__chunk",
        slice(col("__toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkTokens)))
      .select(col(keyCol), col("chunk_idx"),
        size(col("__chunk")).cast("long").as("n_tok_chunk"),
        md5(array_join(col("__chunk"), " ").cast("binary")).as("chunk_md5"))
  }
}
