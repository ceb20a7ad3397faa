package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** s25 — streaming BPE token counting under the SAVED vocab: the x53d
  * serving result as a STATELESS per-document projection, for the
  * ingest path where a token-budget meter must ride the stream (the
  * s8/s13 literal-model discipline — the k-row merge list folds into
  * the plan as nested replace literals, so there is no state store, no
  * watermark, and no per-batch join).
  *
  * Where the batch lane (x53_bpe_count) segments each DISTINCT word
  * once and joins documents by word (the vocab-table shape — right
  * when the corpus is at rest), the stream cannot wait for a
  * distinct-word census: each arriving document segments its OWN words
  * inside one expression — `aggregate(words, 0, acc +
  * size(segment(word)))` — trading per-word dedup for statelessness.
  * Both paths apply the IDENTICAL greedy fuse ([[graft.ext.BpeTrain
  * .segment]] — the surgery the tokenize oracle hash-pins), so the
  * counts cannot disagree: the registered batch replay binds to the
  * SAME DuckDB oracle as x53_bpe_count.
  *
  * Documents with no census-admissible word are dropped (matching the
  * batch lane's inner word join — a budget meter has nothing to meter
  * on them); the column form is bounded to a few-hundred-merge vocab
  * by expression-tree depth, exactly like `segment` itself (a 32k
  * production vocab serves through the batch vocab-table shape). */
object StreamingBpe {

  /** `(doc_id, n_words, bpe_tokens)` per arriving document — stateless,
    * works on batch AND streaming frames. */
  def tokenCounts(docs: DataFrame,
                  merges: Seq[(String, String)]): DataFrame = {
    val words = filter(
      graft.ext.TextAnalysis.tokens(lower(col("text"))),
      w => w.rlike("^[a-z]+$"))
    docs.select(col("doc_id"),
        size(words).cast("long").as("n_words"),
        aggregate(words, lit(0L),
          (acc, w) => acc + size(graft.ext.BpeTrain.segment(w, merges))
            .cast("long"))
          .as("bpe_tokens"))
      .filter(col("n_words") > 0)
  }
}
