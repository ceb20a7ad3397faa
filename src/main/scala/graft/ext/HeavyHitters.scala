package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** X3j — corpus-wide heavy-hitter term census: the most frequent tokens
  * across the whole corpus. The operational uses in a training
  * pipeline: stopword-list discovery for quality rules, boilerplate
  * token detection (a navigation word in 90% of pages), and tokenizer
  * vocabulary planning.
  *
  * Two paths, one contract:
  *
  *  - [[exactTopTerms]]: explode → ONE term-count shuffle (partial
  *    counts combine map-side to |vocab| rows per task) → `sort+limit`,
  *    which Spark plans as TakeOrderedAndProject — per-partition top-k
  *    then a k-row driver merge, NEVER a global sort. Exact, and fine
  *    whenever |vocab| fits a shuffle (natural language does: vocab
  *    grows ~O(corpus^0.5), Heaps' law).
  *  - [[sketchTopTerms]]: a Misra–Gries summary as a typed
  *    [[Aggregator]] — FIXED memory (`capacity` counters) per
  *    partition, merged pairwise, no shuffle of the vocabulary at
  *    all. The classical guarantee survives distribution (MG
  *    summaries merge by count-add then global decrement): every term
  *    with true frequency > n/capacity is PRESENT in the result, and
  *    every reported count is an UNDER-estimate by at most
  *    n/capacity. The sketch is the 100 TB path when the vocabulary
  *    itself is adversarial (URLs, hashes, typo-explosions make
  *    |vocab| ~ corpus size and the exact shuffle stops fitting);
  *    guarantee-set equality with the exact path is pinned in
  *    HeavyHittersSpec.
  *
  * Tokenization is the house [[TextAnalysis.tokens]] definition
  * (whitespace split of trimmed text) — the same tokens every other
  * x3 census counts, so the oracle replay shares the split. */
object HeavyHitters {

  /** Exact global top-`k` terms by count: `(term, n)` ordered
    * (n DESC, term ASC). */
  def exactTopTerms(docs: DataFrame, k: Int,
                    textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(k)
  }

  /** The Misra–Gries state: at most `capacity` (term → count)
    * counters. */
  final case class MgState(capacity: Int,
                           counts: scala.collection.mutable.HashMap[String, Long])

  /** Misra–Gries heavy-hitter sketch over token arrays. Returns
    * `(term, n_min)` for the surviving counters, where `n_min` is the
    * sketch's (under-)estimate; callers wanting exact counts for the
    * survivors re-count them in one cheap `isin` pass. */
  final class MgAggregator(capacity: Int)
      extends Aggregator[Seq[String], MgState, Map[String, Long]] {
    require(capacity >= 1, s"capacity ($capacity) must be >= 1")

    def zero: MgState =
      MgState(capacity, scala.collection.mutable.HashMap.empty)

    /** The classical MG step: increment if present or room; otherwise
      * decrement EVERY counter (dropping zeros) — each decrement
      * "spends" capacity+1 occurrences, bounding the error by
      * n/(capacity+1). */
    def reduce(st: MgState, toks: Seq[String]): MgState = {
      val m = st.counts
      toks.foreach { t =>
        if (t != null && t.nonEmpty) {
          m.get(t) match {
            case Some(c) => m.update(t, c + 1L)
            case None if m.size < st.capacity => m.update(t, 1L)
            case None =>
              // decrement-all; in-place, collecting the zeros
              val dead = scala.collection.mutable.ArrayBuffer.empty[String]
              m.foreachEntry { (k, c) =>
                if (c == 1L) dead += k else m.update(k, c - 1L)
              }
              dead.foreach(m.remove)
          }
        }
      }
      st
    }

    /** MG merge (Agarwal et al.): add counts, then subtract the
      * (capacity+1)-th largest count from every counter and drop
      * non-positives — preserves the summary size bound AND the
      * frequency guarantee. */
    def merge(a: MgState, b: MgState): MgState = {
      val m = a.counts
      b.counts.foreachEntry { (k, c) =>
        m.update(k, m.getOrElse(k, 0L) + c)
      }
      if (m.size > a.capacity) {
        val cut = m.values.toArray.sorted(Ordering[Long].reverse)
          .apply(a.capacity) // (capacity+1)-th largest
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        m.foreachEntry { (k, c) =>
          if (c - cut <= 0L) dead += k else m.update(k, c - cut)
        }
        dead.foreach(m.remove)
      }
      a
    }

    def finish(st: MgState): Map[String, Long] = st.counts.toMap

    def bufferEncoder: org.apache.spark.sql.Encoder[MgState] =
      Encoders.kryo[MgState]
    // Kryo for both: the buffer is a mutable map (no product encoder),
    // and the output is collected straight to the driver.
    def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** Sketch-path top terms: `(term, n_min)` for every surviving
    * counter, ordered (n_min DESC, term ASC). Guarantee: contains
    * every term with true count > totalTokens/(capacity+1). */
  def sketchTopTerms(docs: DataFrame, capacity: Int,
                     textCol: String = "text"): DataFrame = {
    import docs.sparkSession.implicits._
    val toks = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(TextAnalysis.tokens(col(textCol)).as("toks"))
      .as[Seq[String]]
    val agg = new MgAggregator(capacity).toColumn
    val summary: Map[String, Long] = toks.select(agg).head()
    summary.toSeq.toDF("term", "n_min")
      .orderBy(col("n_min").desc, col("term").asc)
  }
}
