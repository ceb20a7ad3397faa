package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.unicodeNormalize

class UnicodeNormalizeSpec extends SparkSpec {

  private def norm(text: String, form: String): String = {
    val d = df(Seq(Row(text)), "t STRING")
    val r = d.select(unicodeNormalize(col("t"), form).as("n")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("NFC composes, NFD decomposes, NFKC folds compatibility forms, " +
       "null passes through") {
    val composed = "caf\u00e9"     // e-acute as one codepoint
    val decomposed = "cafe\u0301"  // e + combining acute
    assert(norm(decomposed, "NFC") == composed)
    assert(norm(composed, "NFD") == decomposed)
    assert(norm(composed, "NFC") == composed, "already-NFC is unchanged")
    assert(norm("\ufb01le", "NFKC") == "file",
      "the fi ligature folds under NFKC")
    assert(norm("\ufb01le", "NFC") == "\ufb01le",
      "NFC must NOT fold compatibility ligatures")
    val r = df(Seq(Row(null)), "t STRING")
      .select(unicodeNormalize(col("t")).as("n")).head()
    assert(r.isNullAt(0), "null in, null out")
  }

  test("NFC after NFD equals NFC — the invariant the x19_nfc_dedup " +
       "oracle stands on — for hostile mixed text") {
    val hostile = Seq(
      "caf\u00e9 r\u00e9sum\u00e9",
      "\u1e9b\u0323",      // long s + dot above + dot below
      "\ud55c\uad6d\uc5b4 \u212b \u00c5", // hangul + angstrom + ring A
      "plain ascii", "")
    hostile.foreach { t =>
      assert(norm(norm(t, "NFD"), "NFC") == norm(t, "NFC"), s"broken for: $t")
    }
  }

  test("registered x19_nfc_dedup: decomposed twins merge into their " +
       "composed twins and lose min-key") {
    val out = Queries.x19NfcDedup(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val planted = (0L until 10L)
    assert(planted.map(_ + 1000000L).count(out.contains) == 10,
      "composed twins must win their families")
    assert(!planted.map(_ + 2000000L).exists(out.contains),
      "a decomposed twin survived — NFC did not reach the dedup key")
  }
}
