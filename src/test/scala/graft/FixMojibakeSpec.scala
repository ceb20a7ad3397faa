package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fixMojibake

/** [[graft.functions.FixMojibake]] fixtures. All non-ASCII is written
  * as \u escapes \u2014 several mojibake sequences contain INVISIBLE chars
  * (NBSP, C1 controls) that a literal fixture would hide. */
class FixMojibakeSpec extends SparkSpec {

  private def fix(text: String): String = {
    val r = df(Seq(Row(text)), "t STRING")
      .select(fixMojibake(col("t")).as("f")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("classic Latin-1 damage repairs: caf\u00e9, stra\u00dfe, d\u00e9j\u00e0") {
    // \u00e9 \u2192 C3 A9 reads as \u00c3\u00a9
    assert(fix("caf\u00c3\u00a9") == "caf\u00e9")
    // \u00df \u2192 C3 9F; 0x9F has no cp1252 glyph \u2014 a Latin-1 decoder passes
    // it through as the (invisible) C1 control U+009F
    assert(fix("stra\u00c3\u009fe") == "stra\u00dfe")
    // \u00e0 \u2192 C3 A0; 0xA0 reads as NBSP \u2014 also invisible
    assert(fix("d\u00c3\u00a9j\u00c3\u00a0 vu") == "d\u00e9j\u00e0 vu")
  }

  test("Windows-1252 damage repairs: smart quotes, em-dash, ellipsis, euro") {
    // \u2019 \u2192 E2 80 99 reads as \u00e2 + \u20ac + \u2122 under cp1252
    assert(fix("don\u00e2\u20ac\u2122t") == "don\u2019t")
    // \u2014 \u2192 E2 80 94 reads as \u00e2 + \u20ac + \u201d
    assert(fix("a \u00e2\u20ac\u201d b") == "a \u2014 b")
    // \u2026 \u2192 E2 80 A6 reads as \u00e2 + \u20ac + \u00a6
    assert(fix("wait\u00e2\u20ac\u00a6") == "wait\u2026")
    // \u20ac \u2192 E2 82 AC reads as \u00e2 + \u201a + \u00ac
    assert(fix("5 \u00e2\u201a\u00ac") == "5 \u20ac")
  }

  test("double-encoded damage repairs in two rounds: caf\u00c3\u0192\u00c2\u00a9 \u2192 caf\u00e9") {
    // \u00e9 \u2192 C3 A9 \u2192 "\u00c3\u00a9" \u2192 re-encoded \u2192 C3 83 C2 A9 \u2192 reads as
    // \u00c3 + \u0192 + \u00c2 + \u00a9 \u2014 two decode rounds recover the original.
    assert(fix("caf\u00c3\u0192\u00c2\u00a9") == "caf\u00e9")
  }

  test("clean text passes through untouched: ASCII, real accents, CJK, " +
       "null, empty") {
    assert(fix("plain ascii text.") == "plain ascii text.")
    // A lone \u00e9 is a malformed continuation byte under the round trip \u2014
    // genuine accented text must NOT be 'repaired'.
    assert(fix("caf\u00e9 d\u00e9j\u00e0 vu") == "caf\u00e9 d\u00e9j\u00e0 vu")
    assert(fix("stra\u00dfe") == "stra\u00dfe")
    // Chars outside the single-byte image (CJK, emoji) disqualify the
    // whole string \u2014 passthrough by construction.
    assert(fix("\u6f22\u5b57 mixed caf\u00c3\u00a9") ==
      "\u6f22\u5b57 mixed caf\u00c3\u00a9")
    assert(fix("") == "")
    val r = df(Seq(Row(null)), "t STRING")
      .select(fixMojibake(col("t")).as("f")).head()
    assert(r.isNullAt(0), "null in, null out")
  }

  test("ASCII text with damaged islands repairs only the islands") {
    // cr\u00e8me \u2192 cr\u00c3\u00a8me; \u2013 \u2192 E2 80 93 (\u00e2 + \u20ac + \u201c)
    val in = "The menu said caf\u00c3\u00a9 cr\u00c3\u00a8me " +
      "\u00e2\u20ac\u201c 5 \u00e2\u201a\u00ac."
    assert(fix(in) ==
      "The menu said caf\u00e9 cr\u00e8me \u2013 5 \u20ac.")
  }
}
