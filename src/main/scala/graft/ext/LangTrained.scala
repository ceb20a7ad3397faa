package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X3k — LEARNED language-ID: one-vs-rest [[Perceptron]]s trained over
  * [[TextAnalysis]]'s script/stopword signals (VERDICT r12 missing #4 —
  * X3e ships the fixed heuristic; this closes the loop by TRAINING the
  * classifier on the labeled corpus with the engine's own X30
  * machinery, the fasttext-style lid model public pipelines actually
  * gate on).
  *
  * Every feature is an INTEGER count (stopword hits per profile
  * language, script character counts, token count, bias), so the
  * whole k-epoch × |langs| weight trajectory is exact integer math —
  * replayable bit-for-bit as chained SQL CTEs (the X30 discipline),
  * and the scoring margin is `w · x` over plan-literal weights (the
  * X13 posture: a 9-feature model needs no broadcast).
  *
  * Multi-class decision: a pinned first-wins CASE chain over the four
  * one-vs-rest margins in SORTED class order (de → en → es → fr,
  * requiring the winning margin positive; none positive → 'und') —
  * deterministic under ties and identical in both engines, unlike a
  * float softmax.
  *
  * Scale shape: feature extraction is ONE map-only pass (materialized
  * once, the X30 fit-from-parquet contract); training is
  * |langs|·epochs bounded aggregates (each one corpus scan of
  * 1+dim longs with map-side combine — the Lloyd's-iterations
  * posture); scoring is map-only. Nothing shuffles on text. */
object LangTrained {

  /** The one-vs-rest classes — [[TextAnalysis.langProfiles]]'s keys,
    * sorted (the decision chain's tie order). */
  val Langs: Seq[String] = TextAnalysis.langProfiles.keys.toSeq.sorted

  /** Integer feature columns, in weight order. */
  val FeatureCols: Seq[String] =
    "f_one" +: Langs.map(l => s"h_$l") ++:
      Seq("s_kana", "s_hangul", "s_han", "f_tok")

  private def scriptCount(t: Column, cls: String): Column =
    coalesce((length(t) - length(regexp_replace(t, cls, "")))
      .cast("long"), lit(0L))

  /** The feature expressions over the raw text column `t` and its
    * materialized lowercase token array `lt`, in [[FeatureCols]] order
    * — ONE definition shared by training ([[features]]) and serving
    * ([[classified]]), so an edit to either side cannot silently
    * desynchronize the trained-model contract (ADVICE r13). */
  private def featureExprs(t: Column, lt: Column): Seq[Column] = {
    val hitCols = TextAnalysis.langProfiles.toSeq.sortBy(_._1).map {
      case (l, words) =>
        val arr = array(words.map(lit): _*)
        coalesce(size(filter(lt, x => array_contains(arr, x)))
          .cast("long"), lit(0L)).as(s"h_$l")
    }
    lit(1L).as("f_one") +: hitCols ++: Seq(
      scriptCount(t, "[\\u3040-\\u30ff]").as("s_kana"),
      scriptCount(t, "[\\uac00-\\ud7a3]").as("s_hangul"),
      scriptCount(t, "[\\u4e00-\\u9fff]").as("s_han"),
      TextAnalysis.tokenCount(t).as("f_tok"))
  }

  /** The labeled integer feature frame: `lang` plus [[FeatureCols]].
    * Null text yields all-zero features (coalesce — the [[Perceptron]]
    * fit requires NULL-free inputs). One projection materializes the
    * lowercase token array so the four profile filters share one
    * split per row (the X3e HOF discipline). */
  def features(docs: DataFrame, textCol: String = "text",
               labelCol: String = "lang"): DataFrame = {
    val t = col(textCol)
    docs
      .select(col(labelCol).as("lang"), t.as("__t"),
        TextAnalysis.tokens(lower(t)).as("__lt"))
      .select(col("lang") +: featureExprs(col("__t"), col("__lt")): _*)
  }

  /** One-vs-rest trajectories: `(lang, epoch, n_misclassified, w_*)` —
    * |Langs|·epochs rows, each lang's fit the exact [[Perceptron.fit]]
    * batch update over the SAME feature frame with `y = ±1` on its
    * class. */
  def fitAll(feats: DataFrame, epochs: Int = 3): DataFrame =
    Langs.map { l =>
      Perceptron.fit(
          feats.withColumn("y",
            when(col("lang") === l, lit(1L)).otherwise(lit(-1L))),
          FeatureCols, "y", epochs)
        .withColumn("lang", lit(l))
    }.reduce(_.unionByName(_))
      .select(col("lang") +: col("epoch") +: col("n_misclassified") +:
        FeatureCols.map(f => col(s"w_$f")): _*)

  /** Final per-class weights from a [[fitAll]] trajectory frame —
    * a bounded |Langs|-row fetch (k×dim longs, never corpus rows). */
  def finalWeights(trajectory: DataFrame): Map[String, Seq[Long]] = {
    val maxEpoch = trajectory.agg(max(col("epoch"))).head.getLong(0)
    trajectory.filter(col("epoch") === maxEpoch)
      .collect()
      .map(r => r.getAs[String]("lang") ->
        FeatureCols.map(f => r.getAs[Long](s"w_$f")))
      .toMap
  }

  /** The pinned multi-class decision over the four margins: first
    * positive winner in [[Langs]] order ('und' when none positive).
    * `margins` must cover every lang in [[Langs]]. */
  def predictFromMargins(margins: Map[String, Column]): Column = {
    val chain = Langs.zipWithIndex.map { case (l, i) =>
      val rest = Langs.drop(i + 1)
      val cond = rest.foldLeft(margins(l) > 0L) {
        (acc, r) => acc && margins(l) >= margins(r)
      }
      (cond, l)
    }
    chain.foldRight(lit("und"): Column) {
      case ((cond, l), acc) => when(cond, lit(l)).otherwise(acc)
    }
  }

  /** Confusion census of the TRAINED model vs the X3e heuristic over
    * the labeled corpus: `(label, pred_trained, pred_heur, n)` — the
    * model-quality screen (a census, not a verdict — the g19 posture).
    * Map-only: features, margins, and the heuristic are all per-row
    * expressions; the census is one partial-agg shuffle. */
  /** Row-level classification — ONE stateless projection (features,
    * trained margins as plan literals, the pinned argmax, and the X3e
    * heuristic side by side; the token split materializes once and
    * feeds everything): `(label, pred_trained, pred_heur)` per input
    * row. Identical code on batch and stream — the s13 serve shape. */
  def classified(docs: DataFrame, weights: Map[String, Seq[Long]],
                 textCol: String = "text",
                 labelCol: String = "lang"): DataFrame = {
    require(Langs.forall(weights.contains),
      s"weights must cover every class in $Langs")
    val t = col(textCol)
    val scored = docs
      .select(col(labelCol).as("label"), t.as("__t"),
        TextAnalysis.tokens(lower(t)).as("__lt"))
      .withColumn("pred_heur",
        TextAnalysis.languageIdFromTokens(col("__t"), col("__lt")))
    val feats = scored.select(
      col("label") +: col("pred_heur") +:
        featureExprs(col("__t"), col("__lt")): _*)
    val margins = Langs.map(l =>
      l -> Perceptron.marginOf(weights(l), FeatureCols)).toMap
    feats
      .withColumn("pred_trained", predictFromMargins(margins))
      .select("label", "pred_trained", "pred_heur")
  }

  def confusionVsHeuristic(docs: DataFrame, weights: Map[String, Seq[Long]],
                           textCol: String = "text",
                           labelCol: String = "lang"): DataFrame =
    classified(docs, weights, textCol, labelCol)
      .groupBy("label", "pred_trained", "pred_heur")
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "pred_trained", "pred_heur")

  /** Persist a [[fitAll]] trajectory (the X15/X24 persisted-model
    * contract: fit once, probe cheaply). */
  def saveTrajectory(feats: DataFrame, dir: String, epochs: Int = 3): Unit =
    fitAll(feats, epochs).coalesce(1).write.mode("overwrite").parquet(dir)

  def loadTrajectory(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
