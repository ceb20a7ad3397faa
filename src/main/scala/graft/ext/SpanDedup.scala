package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X1g — cross-corpus span-level deduplication (the C4 / RefinedWeb
  * "remove duplicated spans, keep one occurrence" rule): documents are
  * split into spans (newline-delimited lines, or fixed-width token
  * blocks for corpora without line structure), spans duplicated across
  * the corpus are dropped everywhere EXCEPT their first occurrence, and
  * the surviving spans are reassembled into rewritten documents.
  *
  * This is the granularity X1a–X1f cannot reach: document-level dedup
  * keeps two near-identical pages as distinct, while their shared
  * boilerplate paragraph (nav text, license header, quoted passage)
  * still floods the training mix. Span dedup removes the REPEATED PART
  * and keeps both documents.
  *
  * Scale shape (100 TB):
  *  - spanization is map-only (split + slice per row, no shuffle);
  *  - the duplicate census is `groupBy(span_hash)` — partial-aggregable
  *    (`count` + `min(struct)`), so map-side combine collapses hot spans
  *    before the shuffle, and per-task state is bounded by
  *    distinct-spans-per-partition, never a hot span's occurrence count
  *    (the [[Dedup.dropHotKeys]] lesson — no Window.partitionBy here);
  *  - the verdict join back to occurrences is co-keyed with the census
  *    shuffle (both sides hash-partition on the span hash);
  *  - reassembly is one `groupBy(doc)` whose per-group state is a single
  *    document's spans — bounded by max document size by construction.
  * Spanization is evaluated twice (census side + occurrence side) rather
  * than cached: at corpus scale a cache of the exploded spans cannot be
  * memory-resident, and a second map-only scan is cheaper than spilling
  * the cache through disk.
  */
object SpanDedup {

  /** Fixed-width token-block spans over the NORMALIZED text (case-folded,
    * whitespace-collapsed — span identity should not distinguish
    * "The  Quick" from "the quick"): span `pos` covers tokens
    * [pos·width, (pos+1)·width); the final block may be shorter.
    * Output: (keyCol, pos, span, span_key) — `span_key` is the dedup
    * identity, here the span itself (already normalized).
    *
    * The tokens array is materialized through its own projection first
    * (higher-order functions are interpreted; inlining `split` into the
    * lambda re-runs the regex per block — the [[Dedup.wordShingles]]
    * measurement). */
  def tokenSpans(docs: DataFrame, textCol: String = "text",
                 keyCol: String = "doc_id", width: Int = 8): DataFrame = {
    require(width >= 1, s"width ($width) must be >= 1")
    val toks = col("__toks")
    val lastPos = floor((size(toks) - 1) / lit(width)).cast("int")
    val blocks = transform(sequence(lit(0), lastPos),
      i => concat_ws(" ", slice(toks, i * width + 1, lit(width))))
    // coalesce: posexplode of a null array emits ZERO rows, which would
    // silently drop null-text documents from the rewritten corpus — the
    // contract is that every input doc survives (empty text at worst).
    docs.select(col(keyCol),
        split(Dedup.normText(coalesce(col(textCol), lit(""))), "\\s+").as("__toks"))
      .select(col(keyCol), posexplode(blocks).as(Seq("pos", "span")))
      .withColumn("span_key", col("span"))
  }

  /** Newline-delimited line spans — the natural granularity for corpora
    * with line structure (C4 dedupes lines). The ORIGINAL line text is
    * preserved for reassembly; dedup identity is the normalized form, so
    * "Home | About | Contact" and "home   | about | contact" collide.
    * Output: (keyCol, pos, span, span_key). */
  def lineSpans(docs: DataFrame, textCol: String = "text",
                keyCol: String = "doc_id"): DataFrame =
    docs.select(col(keyCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n")).as(Seq("pos", "span")))
      .withColumn("span_key", Dedup.normText(col("span")))

  /** Flag each span occurrence keep/drop: a span whose corpus-wide
    * occurrence count reaches `minCount` is kept ONLY at its first
    * occurrence — lexicographically smallest (keyCol, pos), the same
    * keep-lowest convention as [[Dedup.exactDedup]] / [[DedupResolve]].
    * Spans whose normalized identity is empty (blank lines) are always
    * kept: they carry document structure, not duplicated content.
    *
    * The census is `groupBy(hash).agg(count, min(struct(key, pos)))` —
    * both aggregates partial-combine map-side; the 64-bit `xxhash64`
    * identity keeps shuffle keys fixed-width (collision odds over a span
    * vocabulary are ~|V|²/2⁶⁴). Output: input columns + `keep`. */
  def flagSpans(occ: DataFrame, keyCol: String = "doc_id",
                minCount: Int = 2): DataFrame = {
    require(minCount >= 2, s"minCount ($minCount) must be >= 2 — a span " +
      "needs a second occurrence before dropping any makes sense")
    val withH = occ.withColumn("__h", xxhash64(col("span_key")))
    val census = withH.groupBy(col("__h"))
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col(keyCol), col("pos"))).as("__first"))
    withH.join(census, "__h")
      .withColumn("keep",
        col("__cnt") < minCount || length(col("span_key")) === 0 ||
          (col(keyCol) === col(s"__first.$keyCol") && col("pos") === col("__first.pos")))
      .drop("__h", "__cnt", "__first")
  }

  /** Reassemble rewritten documents from flagged occurrences: one
    * `groupBy(doc)`, surviving spans re-joined in position order.
    * `collect_list` drops the `when()` nulls of non-kept spans, and
    * `array_sort` over (pos, span) structs restores document order — no
    * window, no secondary shuffle. A document whose every span was
    * dropped survives with empty `text` (curation decides whether to
    * filter empties — annotate-don't-filter, as in [[Curation]]).
    * Output: (keyCol, n_spans, n_dropped, text). */
  def rebuildDocs(flagged: DataFrame, keyCol: String = "doc_id",
                  sep: String = " "): DataFrame =
    flagged.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_spans"),
      count(when(!col("keep"), lit(1))).as("n_dropped"),
      concat_ws(sep, transform(
        array_sort(collect_list(when(col("keep"), struct(col("pos"), col("span"))))),
        x => x("span"))).as("text"))

  /** Exact-substring dedup (the Lee et al. 2022 "Deduplicating Training
    * Data" shape, re-expressed for Spark): every repeated run of ≥
    * `width` normalized tokens is removed at all but its FIRST corpus
    * occurrence — detected by a census of OVERLAPPING, stride-1 token
    * windows. This closes the gap of [[tokenSpans]]' fixed blocks: the
    * same substring aligned differently in two documents (one extra
    * leading token shifts every block boundary) hashes into different
    * blocks and escapes block-mode dedup entirely, while at stride 1 a
    * repeated run of L ≥ width tokens shares L−width+1 exact windows
    * between its occurrences at ANY alignment. (Lee et al. detect the
    * same thing single-node with suffix arrays; the stride-1 window
    * census is the shuffle-native equivalent at a fixed minimum match
    * length.)
    *
    * Keep/drop: per distinct window, the lexicographically smallest
    * (keyCol, pos) occurrence is first ([[flagSpans]]' convention); a
    * token is dropped iff some covered (= repeated, non-first) window
    * contains it, so the earliest copy of a run survives intact and
    * every later copy vanishes wholesale.
    *
    * Scale shape: ONE fixed-width census row per token (64-bit window
    * hash + key + pos — the window text itself never shuffles; collision
    * odds over a window vocabulary are ~|V|²/2⁶⁴, the [[Dedup
    * .jaccardPairs]] trade); census + verdict join are the partial-agg
    * shapes of [[flagSpans]]; coverage resolution is one per-document
    * aggregate whose state is bounded by the document's covered-window
    * count, and the kept-token filter is an index HOF bounded by doc
    * length × covered windows. Spanization is evaluated twice (census
    * side + rebuild side) — the same two-scan trade documented on the
    * object. Output: (keyCol, n_tokens, n_dropped, text), text rebuilt
    * from the surviving NORMALIZED tokens (span identity is normalized,
    * like [[tokenSpans]]). Blank/null docs survive with empty text. */
  def dedupSubstrings(docs: DataFrame, textCol: String = "text",
                      keyCol: String = "doc_id", width: Int = 8,
                      minCount: Int = 2): DataFrame = {
    require(width >= 2, s"width ($width) must be >= 2 — width 1 would drop " +
      "every repeated TOKEN, which is vocabulary removal, not dedup")
    require(minCount >= 2, s"minCount ($minCount) must be >= 2")
    val w = width
    def toksed = docs.select(col(keyCol),
      split(Dedup.normText(coalesce(col(textCol), lit(""))), "\\s+").as("__toks"))
    // Native census input ([[graft.functions.NGramHashes]] — hash
    // parity with `xxhash64(concat_ws(" ", slice(toks, i+1, w)))` by
    // construction): one JIT'd traversal instead of three interpreted
    // lambdas allocating a window string per token.
    val windows = toksed
      .select(col(keyCol), posexplode(
        graft.functions.TextFunctions.ngramHashes(col("__toks"), w))
        .as(Seq("pos", "__h")))
    val census = windows.groupBy(col("__h"))
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col(keyCol), col("pos"))).as("__first"))
    val covered = windows.join(census, "__h")
      .filter(col("__cnt") >= minCount &&
        !(col(keyCol) === col(s"__first.$keyCol") &&
          col("pos") === col("__first.pos")))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("pos"))).as("__starts"))
    toksed.join(covered, Seq(keyCol), "left")
      .withColumn("__starts",
        coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__kept", filter(col("__toks"),
        (x, i) => !exists(col("__starts"), s0 => s0 <= i && i < s0 + w)))
      .select(col(keyCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_dropped"),
        concat_ws(" ", col("__kept")).as("text"))
  }

  /** The composed operator over token-block spans (corpora without line
    * structure): spanize → flag → rebuild. */
  def dedupTokenSpans(docs: DataFrame, textCol: String = "text",
                      keyCol: String = "doc_id", width: Int = 8,
                      minCount: Int = 2): DataFrame =
    rebuildDocs(flagSpans(tokenSpans(docs, textCol, keyCol, width), keyCol, minCount),
      keyCol, sep = " ")

  /** The composed operator over newline-delimited lines (C4's rule). */
  def dedupLines(docs: DataFrame, textCol: String = "text",
                 keyCol: String = "doc_id", minCount: Int = 2): DataFrame =
    rebuildDocs(flagSpans(lineSpans(docs, textCol, keyCol), keyCol, minCount),
      keyCol, sep = "\n")
}
