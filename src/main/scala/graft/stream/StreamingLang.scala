package graft.stream

import org.apache.spark.sql.DataFrame

import graft.ext.LangTrained

/** S17 — STREAMING language-ID: the X3k trained one-vs-rest perceptrons
  * served on arriving documents, extending the fit-once/serve-streaming
  * family (s8 BM25, s9 percentile cuts, s13 the quality classifier)
  * with the learned lid gate — "route tonight's crawl by language
  * before it lands", with the heuristic prediction alongside for the
  * drift audit.
  *
  * The classifier is already the right shape: every feature is a
  * per-row expression, the margins are plan LITERALS (the 4 × 9 weight
  * matrix — no broadcast, no state), and the decision is a pinned CASE
  * chain — ONE stateless projection, no watermark, micro-batch ≡ batch
  * (pinned in StreamingLangSpec). Weights come from the persisted X3k
  * trajectory artifact ([[LangTrained.loadTrajectory]] →
  * [[LangTrained.finalWeights]]) — the deployed-model discipline. */
object StreamingLang {

  /** Classify `textCol` through the trained weights — identical code on
    * batch and stream ([[LangTrained.classified]] is projection-only). */
  def classifyStream(stream: DataFrame, weights: Map[String, Seq[Long]],
                     textCol: String = "text",
                     labelCol: String = "lang"): DataFrame =
    LangTrained.classified(stream, weights, textCol, labelCol)
}
