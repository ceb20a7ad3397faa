package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._


import graft.functions.TextFunctions.blocklistHits

class BlocklistSpec extends SparkSpec {

  private val words = Seq("bad", "worse", "worst_case", "x9")

  private def hits(text: String): java.lang.Long = {
    val r = df(Seq(Row(text)), "t STRING")
      .select(blocklistHits(col("t"), words).as("h")).head()
    if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
  }

  test("token-exact matching: boundaries, case folding, digits and " +
       "underscore, repeats counted per occurrence") {
    assert(hits("a bad day") == 1L)
    assert(hits("BAD Bad bAd") == 3L, "ASCII case folds")
    assert(hits("badge embad notbad badly") == 0L,
      "substrings are not token hits")
    assert(hits("bad-worse,bad.worse") == 4L,
      "punctuation separates tokens")
    assert(hits("worst_case x9 x99 9x9") == 2L,
      "underscore is a token char; x99/9x9 are different tokens")
    assert(hits("") == 0L)
    assert(hits("bad") == 1L, "token closed by end-of-string")
  }

  test("multi-byte chars separate tokens (RE2 ASCII \\W semantics) and " +
       "over-long tokens skip the probe without desync") {
    assert(hits("bad\u6f22bad") == 2L,
      "a CJK char is a separator, not a token char")
    assert(hits("caf\u00e9bad") == 1L,
      "\u00e9 separates \u2014 the trailing 'bad' is its own token")
    assert(hits("supercalifragilisticexpialidocious bad") == 1L,
      "a token longer than every word skips the probe but must not " +
        "desync the scan")
  }

  test("null in, null out; empty/dup/malformed word lists rejected") {
    val r = df(Seq(Row(null)), "t STRING")
      .select(blocklistHits(col("t"), words).as("h")).head()
    assert(r.isNullAt(0))
    intercept[IllegalArgumentException] {
      blocklistHits(lit("x"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      blocklistHits(lit("x"), Seq("bad", "bad"))
    }
    intercept[IllegalArgumentException] {
      blocklistHits(lit("x"), Seq("Bad"))
    }
    intercept[IllegalArgumentException] {
      blocklistHits(lit("x"), Seq("two words"))
    }
  }

  test("both new expressions survive CODEGEN_ONLY with fallback disabled " +
       "(janino compiles the generated code \u2014 no silent interpreted path)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s2.conf.set("spark.sql.codegen.fallback", "false")
    val d = s2.createDataFrame(
      s2.sparkContext.parallelize(Seq(
        Row("a bad caf\u00c3\u00a9 day"), Row("BAD worse")), 1),
      org.apache.spark.sql.types.StructType.fromDDL("t STRING"))
    val r = d.select(
        blocklistHits(col("t"), words).as("h"),
        graft.functions.TextFunctions.fixMojibake(col("t")).as("f"))
      .collect().map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq((1L, "a bad caf\u00e9 day"), (2L, "BAD worse")))
  }

  test("matches the oracle's list_filter/regexp_split replay on corpus text") {
    val docs = Tables.documents(spark, sfDir).filter(col("text").isNotNull)
    val native = docs
      .select(sum(blocklistHits(col("text"), words)).as("h"))
      .head().getLong(0)
    val replay = docs
      .select(size(filter(
        split(lower(col("text")), "[^a-z0-9_]+"),
        t => t.isin(words: _*))).cast("long").as("h"))
      .agg(sum(col("h"))).head().getLong(0)
    assert(native == replay,
      s"native $native != split/filter replay $replay")
  }
}
