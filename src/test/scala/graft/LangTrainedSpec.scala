package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.LangTrained

class LangTrainedSpec extends SparkSpec {

  private val ddl = "lang STRING, text STRING"

  test("feature frame: integer counts, null text yields all-zero " +
       "features (the Perceptron NULL-free contract)") {
    val rows = Seq(
      Row("en", "the cat is on the mat"),
      Row("de", "der hund und die katze"),
      Row("zh", "中文文本"),
      Row("en", null))
    val out = LangTrained.features(df(rows, ddl)).collect()
    assert(out.length == 4)
    val en = out.find(r => r.getAs[Long]("h_en") > 0L).get
    assert(en.getAs[Long]("h_en") == 3L)   // the, is, the ('on'/'cat' not markers)
    assert(en.getAs[Long]("f_one") == 1L)
    val zh = out.find(r => r.getAs[Long]("s_han") > 0L).get
    assert(zh.getAs[Long]("s_han") == 4L)
    val nul = out.filter(r => LangTrained.FeatureCols
      .forall(f => r.getAs[Long](f) == (if (f == "f_one") 1L else 0L)))
    assert(nul.length == 1, "null text must feature as zeros (bias 1)")
  }

  test("epoch-1 weights are the hand-computed sum of y·x over all rows") {
    val rows = Seq(
      Row("en", "the cat"),    // h_en=1, f_tok=2
      Row("de", "der hund"))   // h_de=1, f_tok=2
    val traj = LangTrained.fitAll(
      LangTrained.features(df(rows, ddl)), epochs = 1).collect()
    assert(traj.length == LangTrained.Langs.size)
    val en = traj.find(_.getAs[String]("lang") == "en").get
    // y=+1 for the en row, −1 for de: w_h_en = +1, w_h_de = −1,
    // w_f_one = 0, w_f_tok = +2 − 2 = 0; every row misclassified at w=0.
    assert(en.getAs[Long]("n_misclassified") == 2L)
    assert(en.getAs[Long]("w_h_en") == 1L)
    assert(en.getAs[Long]("w_h_de") == -1L)
    assert(en.getAs[Long]("w_f_one") == 0L)
    assert(en.getAs[Long]("w_f_tok") == 0L)
  }

  test("the trajectory is partitioning-invariant (the integer batch " +
       "update's whole point)") {
    val docs = Tables.documents(spark, sfDir).select("lang", "text")
    val a = LangTrained.fitAll(LangTrained.features(docs), epochs = 2)
      .collect().map(_.toSeq).toSet
    val b = LangTrained.fitAll(
        LangTrained.features(docs.repartition(13)), epochs = 2)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("predictFromMargins: first-wins tie order is sorted Langs; " +
       "no positive margin → und") {
    val m0 = LangTrained.Langs.map(l => l -> (lit(5L): org.apache.spark.sql.Column)).toMap
    val one = spark.range(1)
    assert(one.select(LangTrained.predictFromMargins(m0)).head.getString(0) ==
      LangTrained.Langs.head, "all-tied positive margins pick the first class")
    val neg = LangTrained.Langs.map(l => l -> (lit(-1L): org.apache.spark.sql.Column)).toMap
    assert(one.select(LangTrained.predictFromMargins(neg)).head.getString(0) == "und")
  }

  test("registered pair: 12-row trajectory; the confusion census " +
       "covers the corpus exactly once") {
    val traj = Queries.x3LangTrain(spark, sfDir).collect()
    assert(traj.length == 3 * LangTrained.Langs.size)
    assert(traj.map(r => (r.getAs[String]("lang"), r.getAs[Long]("epoch")))
      .toSet.size == traj.length)
    val conf = Queries.x3LangTrained(spark, sfDir).collect()
    val n = conf.map(_.getAs[Long]("n")).sum
    assert(n == Tables.documents(spark, sfDir).count())
    // Final-epoch weights reproduce the census when scored directly.
    val w = LangTrained.finalWeights(
      spark.createDataFrame(spark.sparkContext.parallelize(traj.toSeq),
        Queries.x3LangTrain(spark, sfDir).schema))
    assert(w.size == LangTrained.Langs.size)
  }
}
