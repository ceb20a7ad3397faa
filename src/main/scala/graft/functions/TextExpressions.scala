package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram census of a token array — the hot per-row loop of the
  * Gopher structural rules in ONE expression node.
  *
  * The HOF formulation this replaces ran per row, per gram size:
  * `transform(sequence…, concat_ws(slice…))` to build the gram strings,
  * `array_sort` over them, then an `aggregate` fold with a struct
  * accumulator — four interpreted lambda passes allocating intermediate
  * arrays, and the dominant cost of `x3_gopher_rules` (measured ~3× the
  * rest of the bundle at sf0.1). Here one traversal builds each gram
  * with `UTF8String.concatWs` (byte-level, no per-token String
  * conversion) and counts occurrences in an open HashMap — no sort at
  * all, O(total gram bytes) per row.
  *
  * Output: `array<long>` of
  * `[n_grams, distinct_grams, top-gram coverage, dup-gram char mass]`:
  *  - coverage is the published Gopher quantity: characters contained
  *    in the MOST FREQUENTLY occurring n-gram — `maxCount ·
  *    numChars(gram)`, ties on count broken to the longest gram
  *    (deterministic, and the reading that catches the most
  *    boilerplate). NOT `max over grams of count·len`: that different
  *    quantity would reject a doc whose most common bigram is harmless
  *    just because one long phrase repeats twice.
  *  - dup-gram char mass = `Σ over grams occurring ≥ 2 times of
  *    count · numChars(gram)` — the numerator of the Gopher duplicate
  *    5–10-gram character-fraction rules. This is the CHAR-MASS reading
  *    (every occurrence's characters count, including where
  *    occurrences overlap in the text); the paper's phrasing dedups
  *    overlapping spans, which needs positional span-union bookkeeping
  *    for a quantity that is a reject-threshold heuristic — the mass
  *    reading is strictly ≥ the span reading, monotone in the same
  *    repetition, and exact to replay. Documented at the rule site.
  * Gram = tokens joined by single spaces; `length` = codepoint
  * count = `numChars` — the exact list formulation the DuckDB oracle
  * replays.
  *
  * Codegen: `doGenCode` emits a single static call, so the surrounding
  * projection stays inside WholeStageCodegen (the StaticInvoke pattern
  * of Spark's own builtins). Null tokens are treated as empty strings —
  * callers pass `split` output, which never contains nulls. */
case class NGramStats(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName: n ($n) must be >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    NGramStats.compute(v.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramStats.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ngram_stats"
}

object NGramStats {

  private val Space = UTF8String.fromString(" ")

  /** [total, distinct, mostFrequentCount·itsLength, dupGramCharMass]
    * for the n-grams of `toks`. The running (bestCount, bestLen) pair
    * is exact: every gram whose FINAL count equals the maximum passes
    * through that value at its last occurrence — a strictly greater
    * count resets bestLen (and clears any pollution from earlier lower
    * ties), an equal count widens it — so bestLen ends as the longest
    * gram among the most frequent. Dup char mass sums count·numChars
    * over the final counts map (grams with count ≥ 2 only). */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array(0L, 0L, 0L, 0L))
    val total = m - n + 1
    val counts = new java.util.HashMap[UTF8String, java.lang.Long](total * 2)
    val parts = new Array[UTF8String](n)
    var bestCount = 0L
    var bestLen = 0L
    var i = 0
    while (i < total) {
      var j = 0
      while (j < n) {
        parts(j) =
          if (toks.isNullAt(i + j)) UTF8String.EMPTY_UTF8
          else toks.getUTF8String(i + j)
        j += 1
      }
      val gram = UTF8String.concatWs(Space, parts: _*)
      val c: Long = {
        val prev = counts.get(gram)
        val next = if (prev == null) 1L else prev.longValue() + 1L
        counts.put(gram, java.lang.Long.valueOf(next))
        next
      }
      if (c > bestCount) { bestCount = c; bestLen = gram.numChars() }
      else if (c == bestCount && gram.numChars() > bestLen) bestLen = gram.numChars()
      i += 1
    }
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.longValue()
      if (c >= 2L) dupChars += c * e.getKey.numChars()
    }
    new GenericArrayData(
      Array(total.toLong, counts.size().toLong, bestCount * bestLen, dupChars))
  }
}

/** [[NGramStats]] for a contiguous RANGE of gram sizes in one fused
  * per-row pass — the Gopher rule bundle needs all of n = 2..10, and
  * nine separate `NGramStats` calls each re-extract every token and
  * re-concatenate every gram (VERDICT r9 top-next: `x3_gopher_rules`
  * was the #1 bench query at 4.7 s, nine traversals per document).
  *
  * Fusion does strictly less work than even ONE call per size:
  *  - the space-joined document bytes are materialized ONCE
  *    (`tok0 + ' ' + tok1 + …`); every gram of every size is then a
  *    ZERO-COPY `UTF8String.fromBytes` view into that buffer — no
  *    per-gram `concatWs` allocation at all;
  *  - gram codepoint lengths come from token char-length prefix sums
  *    (`chars(i,n) = prefChars(i+n) − prefChars(i) + (n−1)` — exact,
  *    because grams join with single ASCII spaces), so the hot loop
  *    never walks gram bytes to count chars;
  *  - token null-checks and byte extraction happen once, not once per
  *    size.
  * Counting semantics are bit-identical to [[NGramStats]] (same
  * HashMap census, same running best-count/longest-tie rule, same
  * dup-char mass over final counts) — NGramStatsMultiSpec pins
  * element-for-element parity.
  *
  * Output: flat `array<long>` of `4·(maxN−minN+1)` elements; size n
  * occupies `[4·(n−minN) … 4·(n−minN)+3]` = the same
  * `[n_grams, distinct, top-gram chars, dup-gram char mass]` quadruple
  * NGramStats returns (1-based `element_at` index: `4·(n−minN)+field`,
  * field ∈ 1..4). */
case class NGramStatsMulti(child: Expression, minN: Int, maxN: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if minN >= 1 && maxN >= minN =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: need 1 <= minN ($minN) <= maxN ($maxN)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    NGramStatsMulti.compute(v.asInstanceOf[ArrayData], minN, maxN)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NGramStatsMulti.compute($c, $minN, $maxN)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ngram_stats_multi"
}

object NGramStatsMulti {

  def compute(toks: ArrayData, minN: Int, maxN: Int): ArrayData = {
    val sizes = maxN - minN + 1
    val out = new Array[Long](4 * sizes)
    val m = toks.numElements()
    if (m < minN) return new GenericArrayData(out) // all-zero quadruples

    // One pass over the tokens: byte + codepoint prefix sums, then the
    // joined buffer (single spaces between tokens, empties included —
    // the exact concatWs layout NGramStats hashed). Token i's bytes sit
    // at joined[prefBytes(i) + i ..): i leading spaces precede it.
    val tokArr = new Array[UTF8String](m)
    val prefBytes = new Array[Int](m + 1)
    val prefChars = new Array[Long](m + 1)
    var i = 0
    while (i < m) {
      val tok =
        if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
      tokArr(i) = tok
      prefBytes(i + 1) = prefBytes(i) + tok.numBytes()
      prefChars(i + 1) = prefChars(i) + tok.numChars()
      i += 1
    }
    val joined = new Array[Byte](prefBytes(m) + (m - 1).max(0))
    i = 0
    while (i < m) {
      val off = prefBytes(i) + i
      tokArr(i).writeToMemory(joined, Platform.BYTE_ARRAY_OFFSET + off)
      if (i < m - 1) joined(off + tokArr(i).numBytes()) = ' '
      i += 1
    }

    var n = minN
    while (n <= maxN && n <= m) {
      val base = 4 * (n - minN)
      val total = m - n + 1
      val counts = new java.util.HashMap[UTF8String, java.lang.Long](total * 2)
      var bestCount = 0L
      var bestLen = 0L
      i = 0
      while (i < total) {
        val off = prefBytes(i) + i
        val len = prefBytes(i + n) - prefBytes(i) + (n - 1)
        val gram = UTF8String.fromBytes(joined, off, len)
        val c: Long = {
          val prev = counts.get(gram)
          val next = if (prev == null) 1L else prev.longValue() + 1L
          counts.put(gram, java.lang.Long.valueOf(next))
          next
        }
        val chars = prefChars(i + n) - prefChars(i) + (n - 1)
        if (c > bestCount) { bestCount = c; bestLen = chars }
        else if (c == bestCount && chars > bestLen) bestLen = chars
        i += 1
      }
      var dupChars = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.longValue()
        if (c >= 2L) dupChars += c * e.getKey.numChars()
      }
      out(base) = total.toLong
      out(base + 1) = counts.size().toLong
      out(base + 2) = bestCount * bestLen
      out(base + 3) = dupChars
      n += 1
    }
    new GenericArrayData(out)
  }
}

/** Native per-row MinHash signature of a token array: distinct word
  * n-grams → 64-bit gram hash → for each of `numHashes` salted hash
  * functions, the minimum over grams. One JIT'd traversal.
  *
  * This is the expression form of [[graft.ext.Dedup.minhashSignatures]]
  * (which aggregates over exploded shingles — the right shape when a
  * batch pipeline banks on the partial-agg scan it already pays). The
  * expression form exists because a STREAMING micro-batch must compute
  * signatures with NO aggregation (stateless, no watermark machinery),
  * and the HOF formulation of the same computation —
  * `transform(array_distinct(ngrams…), xxhash64)` under `numHashes`
  * `array_min(transform(…))` folds — is interpreted per lambda element
  * and measured ~4 s alone on the sf0.1 batch replay.
  *
  * Hash parity is a CONTRACT, not a convenience (signatures are
  * persisted and joined across builds — StreamingDedupSpec pins it):
  *  - gram hash = `xxhash64(gram)` = `XxHash64Function.hash(utf8, 42)`;
  *  - component i = `xxhash64(gramHash, seed, i)` = the 42-seeded fold
  *    `hashInt(i, hashLong(seed, hashLong(gramHash, 42)))` — children
  *    in declaration order, exactly what Spark's `xxhash64(h, lit(seed),
  *    lit(i))` evaluates.
  * Grams deduplicate by STRING value (the `array_distinct` of
  * [[graft.ext.Dedup.wordShingles]]); min is order-independent, so a
  * hash set suffices. Null when the document has fewer than `n`
  * tokens — matching the aggregate form, where such docs have no row. */
case class MinHashSig(child: Expression, n: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 && numHashes >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: n ($n) and numHashes ($numHashes) must be >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Null even for non-null input (documents shorter than n tokens).
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    MinHashSig.compute(v.asInstanceOf[ArrayData], n, numHashes, seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.compute($c, $n, $numHashes, ${seed}L);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  private val Space = UTF8String.fromString(" ")

  /** The signature array, or null when fewer than `n` tokens. Per
    * distinct gram: 2 hashLong + `numHashes` hashInt calls — the same
    * hash count the aggregate form pays, without boxing or lambdas. */
  def compute(toks: ArrayData, n: Int, numHashes: Int, seed: Long): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.{XXH64, XxHash64Function}
    val m = toks.numElements()
    if (m < n) return null
    val total = m - n + 1
    val seen = new java.util.HashSet[UTF8String](total * 2)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < total) {
      var j = 0
      while (j < n) {
        parts(j) =
          if (toks.isNullAt(i + j)) UTF8String.EMPTY_UTF8
          else toks.getUTF8String(i + j)
        j += 1
      }
      val gram = UTF8String.concatWs(Space, parts: _*)
      if (seen.add(gram)) {
        val gh = XxHash64Function.hash(gram, StringType, 42L)
        val h2 = XXH64.hashLong(seed, XXH64.hashLong(gh, 42L))
        var k = 0
        while (k < numHashes) {
          val v = XXH64.hashInt(k, h2)
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Native per-row 64-bit SimHash of a token array: per-bit majority
  * vote over the xxhash64 values of the DISTINCT word n-grams — the
  * expression form of [[graft.ext.Dedup.simhashSignatures]] (which
  * aggregates over exploded shingles), existing for the same reason as
  * [[MinHashSig]]: a streaming micro-batch must compute signatures with
  * no aggregation. Hash parity is the persisted-index contract
  * (gram hash = `xxhash64(gram)`, distinct by STRING value, vote +1
  * for a set bit and −1 otherwise, bit set iff the vote is strictly
  * positive — pinned by StreamingDedupSpec against the aggregate
  * form). Null when the document has fewer than `n` tokens. */
case class SimHashSig(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName: n ($n) must be >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  // Null even for non-null input (documents shorter than n tokens).
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    SimHashSig.compute(v.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName: two signatures in one projection (e.g. two shingle
    // widths) must not declare the same Java local — a collision is a
    // Janino failure and a silent whole-stage fallback to interpreted.
    val sh = ctx.freshName("sh")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $sh = graft.functions.SimHashSig.compute($c, $n);
      ${ev.isNull} = $sh == null;
      ${ev.value} = ${ev.isNull} ? 0L : $sh.longValue();
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig"
}

object SimHashSig {

  private val Space = UTF8String.fromString(" ")

  /** Boxed so "no signature" (fewer than n tokens) is representable. */
  def compute(toks: ArrayData, n: Int): java.lang.Long = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    val m = toks.numElements()
    if (m < n) return null
    val total = m - n + 1
    val seen = new java.util.HashSet[UTF8String](total * 2)
    val votes = new Array[Int](64)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < total) {
      var j = 0
      while (j < n) {
        parts(j) =
          if (toks.isNullAt(i + j)) UTF8String.EMPTY_UTF8
          else toks.getUTF8String(i + j)
        j += 1
      }
      val gram = UTF8String.concatWs(Space, parts: _*)
      if (seen.add(gram)) {
        val h = XxHash64Function.hash(gram, StringType, 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

/** Native per-window hash array: `xxhash64` of every stride-1 n-token
  * window of a token array, in window order — the census input of
  * [[graft.ext.SpanDedup.dedupSubstrings]] as ONE JIT'd traversal.
  *
  * The HOF form it replaces — `transform(sequence(0, n−w),
  * i => xxhash64(concat_ws(" ", slice(toks, i+1, w))))` — allocates a
  * window string per token through three interpreted lambdas; here the
  * same `UTF8String.concatWs` + `XxHash64Function.hash(utf8, 42)`
  * composition (hash parity with `xxhash64(string)` by construction)
  * runs in a tight loop. Empty array when fewer than `n` tokens. Null
  * tokens hash as empty strings (callers pass `split` output, which
  * never contains nulls). */
case class NGramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName: n ($n) must be >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    NGramHashes.compute(v.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ngram_hashes"
}

object NGramHashes {

  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val total = m - n + 1
    val out = new Array[Long](total)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < total) {
      var j = 0
      while (j < n) {
        parts(j) =
          if (toks.isNullAt(i + j)) UTF8String.EMPTY_UTF8
          else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = XxHash64Function.hash(
        UTF8String.concatWs(Space, parts: _*), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Within-document duplicate-line removal (the C4 "dedup lines in a
  * page" boilerplate strip): keep the FIRST occurrence of each exact
  * line, preserve order, rejoin with '\n' — ONE traversal per row over
  * the line bytes (split on the byte, LinkedHashSet membership — no
  * regex, no interpreted HOF accumulator, which would be O(lines²)
  * `array_contains` per row). Line identity is the EXACT byte content
  * (no trim/case-fold): normalization is X19's `cleanText`'s job and
  * runs before this in the pipeline. Null in → null out; a text with
  * no '\n' is returned unchanged. */
case class DedupLines(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    DedupLines.compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DedupLines.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "dedup_lines"
}

object DedupLines {

  private val Newline = UTF8String.fromString("\n")

  def compute(text: UTF8String): UTF8String = {
    // split with limit -1: trailing empty lines survive, matching the
    // SQL string_split / regexp replay exactly.
    val lines = text.split(Newline, -1)
    val seen = new java.util.LinkedHashSet[UTF8String](lines.length * 2)
    var i = 0
    while (i < lines.length) { seen.add(lines(i)); i += 1 }
    if (seen.size == lines.length) text // no dups — zero-copy passthrough
    else {
      val kept = new Array[UTF8String](seen.size)
      seen.toArray(kept)
      UTF8String.concatWs(Newline, kept: _*)
    }
  }
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — the stage-0 text-canonicalization step dedup needs:
  * "café" composed (U+00E9) and decomposed (e + U+0301) are DIFFERENT
  * BYTES but the same text, so byte-keyed dedup norms, fingerprints,
  * and shingles silently treat them as distinct documents. Normalizing
  * to NFC before any text-keyed stage closes that hole; NFD exists for
  * building test twins and for pipelines that strip combining marks.
  *
  * Implementation: `java.text.Normalizer` (the JDK's Unicode
  * normalizer — the same spec utf8proc/DuckDB's `nfc_normalize`
  * implements, so results replay cross-engine). Fast path: most real
  * text IS already normalized, so the common case is one UTF-16
  * materialization + an `isNormalized` scan and NO normalize pass or
  * second copy (the String bridge itself is unavoidable — the JDK
  * normalizer has no byte-level API). The form enum resolves ONCE per
  * expression-class load, never per row. Null in → null out; codegen
  * is one static call so the projection stays in WholeStageCodegen. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if UnicodeNormalize.Forms.contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: form ($form) must be one of NFC/NFD/NFKC/NFKD")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    UnicodeNormalize.compute(v.asInstanceOf[UTF8String], form)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.UnicodeNormalize.compute($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  // Resolved once at class load — the per-row path must not pay an
  // enum valueOf string lookup per document.
  private val Nfc = java.text.Normalizer.Form.NFC
  private val Nfd = java.text.Normalizer.Form.NFD
  private val Nfkc = java.text.Normalizer.Form.NFKC
  private val Nfkd = java.text.Normalizer.Form.NFKD

  private def formOf(form: String): java.text.Normalizer.Form =
    form match {
      case "NFC" => Nfc
      case "NFD" => Nfd
      case "NFKC" => Nfkc
      case "NFKD" => Nfkd
      case other =>
        throw new IllegalArgumentException(s"unknown form $other")
    }

  def compute(s: UTF8String, form: String): UTF8String = {
    val f = formOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

/** Per-term occurrence counts of a FIXED term set over a token array —
  * the hot loop of serve-time relevance scoring ([[graft.ext.TfIdf
  * .scoreAgainst]]) in ONE expression node.
  *
  * The HOF formulation this replaces ran `size(filter(toks, t = term))`
  * once PER QUERY TERM — |terms| interpreted traversals of the full
  * token array per row (VERDICT r11 next #5: quadratic in the wide-
  * query case). Here ONE traversal looks each token up in a hash map
  * built once per executor (`@transient lazy`, never per row) and
  * returns `array<long>` of counts in the constructor's term order —
  * O(tokens + terms) per row regardless of query width.
  *
  * `terms` must be distinct (a duplicate would silently alias two
  * output slots to one map entry), non-empty, and free of the empty
  * string (the split artifact every token consumer filters — counting
  * it would resurrect the [''] null-text ghost). Null in → null out;
  * codegen is one static call over a plan-referenced map, so the
  * projection stays in WholeStageCodegen. */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, s"$prettyName: terms must be non-empty")
  require(terms.distinct.size == terms.size,
    s"$prettyName: terms must be distinct, got $terms")
  require(terms.forall(_.nonEmpty),
    s"$prettyName: the empty-string term is a split artifact, not a term")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Rebuilt per deserialization site (executor), never per row; the
  // UTF8String keys are what the tokenizer emits, so the per-token
  // lookup is a byte-level hash probe with no String bridge.
  @transient private lazy val termIndex: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.size * 2)
    terms.zipWithIndex.foreach { case (t, i) =>
      m.put(UTF8String.fromString(t), Integer.valueOf(i))
    }
    m
  }

  override def nullSafeEval(v: Any): Any =
    TermCounts.compute(v.asInstanceOf[ArrayData], termIndex, terms.size)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("termIndex", termIndex,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, Integer>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TermCounts.compute($c, $mapRef, ${terms.size})")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "term_counts"
}

object TermCounts {

  def compute(toks: ArrayData, termIndex: java.util.HashMap[UTF8String, Integer],
              nTerms: Int): ArrayData = {
    val counts = new Array[Long](nTerms)
    val m = toks.numElements()
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) {
        val idx = termIndex.get(toks.getUTF8String(i))
        if (idx != null) counts(idx.intValue()) += 1L
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** Checksum-validated payment-card scan — candidates, Luhn-valid
  * count, and the conditionally-redacted text in ONE traversal (X7b).
  *
  * Why a native expression and not regex alone: a 13–19-digit run is
  * only a CANDIDATE — order numbers, tracking ids, and timestamps
  * match the same pattern, and a regex-only redactor destroys them
  * (over-redaction corrupts training text), while leaving real PANs
  * needs the ISO-7812 Luhn mod-10 check that regular expressions
  * cannot express. `regexp_replace` has no per-match predicate, so
  * conditional redaction requires per-match logic — here one
  * java.util.regex scan per row with a Luhn verify per candidate,
  * replacing only VALID matches with `<CARD>`.
  *
  * Output: struct(n_candidates, n_valid, redacted). Candidates are
  * contiguous 13–19-digit runs or the common 4-4-4-4 grouping with a
  * CONSISTENT space/hyphen separator (mixed separators are not a card
  * — the backreference is fine here because this pattern never needs
  * a SQL replay: the registered lane's oracle replays a deterministic
  * PLANT, and the Luhn logic itself is pinned against known-valid /
  * known-invalid PANs in PiiSpec). Null in → null out; one static
  * call, stays in WholeStageCodegen. */
case class CardScan(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_candidates", IntegerType, nullable = false),
    StructField("n_valid", IntegerType, nullable = false),
    StructField("redacted", StringType, nullable = true)))

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    CardScan.compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CardScan.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "card_scan"
}

object CardScan {

  // 13–19 contiguous digits, or 4-4-4-4 with ONE consistent separator.
  // \b guards keep a 20-digit run from yielding a 19-digit "card".
  private val Candidate = java.util.regex.Pattern.compile(
    "\\b(?:\\d{13,19}|\\d{4}([ -])\\d{4}\\1\\d{4}\\1\\d{4})\\b")

  /** ISO-7812 Luhn mod-10 over the digits of `s` (separators skipped). */
  def luhnValid(s: CharSequence): Boolean = {
    var sum = 0; var pos = 0; var i = s.length - 1
    while (i >= 0) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var d = c - '0'
        if (pos % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
        sum += d; pos += 1
      }
      i -= 1
    }
    pos > 0 && sum % 10 == 0
  }

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val m = Candidate.matcher(s)
    var nCand = 0; var nValid = 0
    var out: java.lang.StringBuilder = null
    var last = 0
    while (m.find()) {
      nCand += 1
      if (luhnValid(s.subSequence(m.start(), m.end()))) {
        nValid += 1
        if (out == null) out = new java.lang.StringBuilder(s.length)
        out.append(s, last, m.start()).append("<CARD>")
        last = m.end()
      }
    }
    val red =
      if (out == null) text // zero valid matches: zero-copy passthrough
      else { out.append(s, last, s.length)
        UTF8String.fromString(out.toString) }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nCand, nValid, red))
  }
}

/** Blocklist word-hit count over raw text — the C4 "bad words" page
  * gate's hot loop in ONE expression node (X3i).
  *
  * The published C4 pipeline drops any page containing a word from a
  * fixed blocklist (the "List of Dirty, Naughty …" filter); at corpus
  * scale that list is thousands of words, and the two obvious Spark
  * formulations both fail it: a `rlike` alternation of k words is a
  * backtracking Java-regex scan whose cost grows with k, and
  * `filter(split(text), t -> array_contains(...))` materializes the
  * token array and runs an interpreted lambda doing an O(k) array
  * probe per token. Here ONE byte-level traversal of the UTF8String
  * tokenizes in place (ASCII word chars `[A-Za-z0-9_]`, everything
  * else — including every byte of a multi-byte char — is a
  * separator, matching RE2's ASCII `\W`), lowercases ASCII into a
  * reusable scratch buffer, and probes a HashSet built once per
  * executor — O(text bytes) per row, independent of list size.
  *
  * Contract: `words` must be distinct, non-empty, and already in
  * canonical form (lowercase ASCII word chars only) — anything else
  * is unmatchable by construction and rejected eagerly. Tokens longer
  * than the longest word skip the probe but still consume. Returns
  * the TOTAL hit count (the page gate is `hits > 0`; the count is
  * free and feeds ratio heuristics). Null in → null out; codegen is
  * one static call, stays in WholeStageCodegen. The token semantics
  * replay exactly in the oracle as
  * `list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), …)`. */
case class BlocklistHits(child: Expression, words: Seq[String])
    extends UnaryExpression {
  require(words.nonEmpty, s"$prettyName: words must be non-empty")
  require(words.distinct.size == words.size,
    s"$prettyName: words must be distinct, got $words")
  require(words.forall(w => w.nonEmpty &&
      w.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_')),
    s"$prettyName: words must be lowercase ASCII word chars ([a-z0-9_]+); " +
      s"offenders: ${words.filterNot(w => w.nonEmpty && w.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'))}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  private val maxLen = words.map(_.length).max

  // Rebuilt per executor, never per row (the TermCounts discipline).
  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any =
    BlocklistHits.compute(v.asInstanceOf[UTF8String], wordSet, maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BlocklistHits.compute($c, $setRef, $maxLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "blocklist_hits"
}

object BlocklistHits {

  // Per-thread scratch, grown on demand: the hot loop must not
  // allocate per row (the doc's 'reusable scratch buffer' made true —
  // ADVICE-style review catch). UTF8String.fromBytes wraps without
  // copying, but HashSet.contains only READS the probe key, so reuse
  // across probes is safe.
  private val scratchTl = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64)
  }

  def compute(text: UTF8String,
              words: java.util.HashSet[UTF8String], maxLen: Int): Long = {
    val n = text.numBytes
    var scratch = scratchTl.get()
    if (scratch.length < maxLen) {
      scratch = new Array[Byte](maxLen)
      scratchTl.set(scratch)
    }
    var hits = 0L
    var tokLen = 0
    var i = 0
    // i == n is a virtual trailing separator closing the last token.
    while (i <= n) {
      val b = if (i < n) text.getByte(i) & 0xFF else 0
      val isWord = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9') || b == '_'
      if (isWord) {
        if (tokLen < maxLen) {
          scratch(tokLen) =
            (if (b >= 'A' && b <= 'Z') b + 32 else b).toByte
        }
        tokLen += 1 // true length — a too-long token overflows past maxLen
      } else if (tokLen > 0) {
        if (tokLen <= maxLen &&
            words.contains(UTF8String.fromBytes(scratch, 0, tokLen))) hits += 1L
        tokLen = 0
      }
      i += 1
    }
    hits
  }
}

/** Encoding-damage repair — UTF-8 text that was decoded as
  * Latin-1/Windows-1252 and re-encoded ("cafÃ©", "donâ€™t"), restored
  * in ONE whole-string round trip (X19e, the ftfy core heuristic).
  *
  * Crawl corpora are full of this damage: a page's UTF-8 bytes read
  * under the wrong single-byte charset turn every non-ASCII character
  * into 2–4 junk characters, and every text operator downstream
  * (dedup norms, token counts, LM scoring) then sees different
  * "words" for the same content. The repair condition is strict and
  * self-verifying: every char of the string must map back to a
  * single byte (chars ≤ 0xFF as themselves, plus the 27
  * Windows-1252 specials like €/™/’/— mapping back to 0x80–0x9F),
  * and the resulting byte string must STRICTLY decode as UTF-8 with
  * at least one multi-byte sequence. Real text almost never passes
  * by accident — a lone é is a malformed continuation byte — so
  * clean text (ASCII, CJK, properly-encoded accents) passes through
  * untouched, by construction rather than by heuristic confidence.
  * Up to 3 rounds handles the double-encoded case ("cafÃƒÂ©").
  *
  * Null in → null out; zero-copy passthrough when no repair applies;
  * one static call, stays in WholeStageCodegen. Not SQL-replayable in
  * general (the oracle's engine has no Latin-1 codec) — the
  * registered lane plants a FINITE damage vocabulary, which replays
  * as a literal replace chain, and FixMojibakeSpec pins the general
  * fixtures. */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    FixMojibake.compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixMojibake.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "fix_mojibake"
}

object FixMojibake {

  /** char → original byte for the Windows-1252 specials (0x80–0x9F).
    * U+0080–U+009F themselves also map (a Latin-1 decoder passes the
    * control range through); the two sets don't overlap. */
  private val Cp1252Inverse: java.util.HashMap[Character, java.lang.Byte] = {
    val pairs = Seq(
      0x20AC -> 0x80, 0x201A -> 0x82, 0x0192 -> 0x83, 0x201E -> 0x84,
      0x2026 -> 0x85, 0x2020 -> 0x86, 0x2021 -> 0x87, 0x02C6 -> 0x88,
      0x2030 -> 0x89, 0x0160 -> 0x8A, 0x2039 -> 0x8B, 0x0152 -> 0x8C,
      0x017D -> 0x8E, 0x2018 -> 0x91, 0x2019 -> 0x92, 0x201C -> 0x93,
      0x201D -> 0x94, 0x2022 -> 0x95, 0x2013 -> 0x96, 0x2014 -> 0x97,
      0x02DC -> 0x98, 0x2122 -> 0x99, 0x0161 -> 0x9A, 0x203A -> 0x9B,
      0x0153 -> 0x9C, 0x017E -> 0x9E, 0x0178 -> 0x9F)
    val m = new java.util.HashMap[Character, java.lang.Byte](64)
    pairs.foreach { case (c, b) =>
      m.put(Character.valueOf(c.toChar), java.lang.Byte.valueOf(b.toByte))
    }
    m
  }

  def compute(text: UTF8String): UTF8String = {
    // Byte-level ASCII fast path: the overwhelming majority of rows
    // are clean ASCII and must not pay a UTF-16 decode (toString)
    // just to discover there is nothing to repair. One branch per
    // byte, zero allocation, true zero-copy passthrough.
    val nb = text.numBytes
    var bi = 0
    var anyHigh = false
    while (bi < nb && !anyHigh) {
      if ((text.getByte(bi) & 0x80) != 0) anyHigh = true
      bi += 1
    }
    if (!anyHigh) return text
    var cur = text.toString
    var changed = false
    var rounds = 0
    var done = false
    while (!done && rounds < 3) {
      val fixed = repairOnce(cur)
      if (fixed == null) done = true
      else { cur = fixed; changed = true; rounds += 1 }
    }
    if (!changed) text else UTF8String.fromString(cur)
  }

  /** One repair round, or null when the string is not (or no longer)
    * repairable — pure ASCII, chars outside the single-byte image, or
    * bytes that don't strictly decode as UTF-8. */
  private def repairOnce(s: String): String = {
    val n = s.length
    var hasHigh = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c > 0xFF && !Cp1252Inverse.containsKey(Character.valueOf(c)))
        return null
      if (c >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return null
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val c = s.charAt(i)
      bytes(i) =
        if (c <= 0xFF) c.toByte
        else Cp1252Inverse.get(Character.valueOf(c)).byteValue()
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }
}

/** Column-API entry points for the text expressions. */
object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def ngramStats(toks: Column, n: Int): Column =
    column(NGramStats(expression(toks), n))

  def ngramStatsMulti(toks: Column, minN: Int, maxN: Int): Column =
    column(NGramStatsMulti(expression(toks), minN, maxN))

  def minhashSig(toks: Column, n: Int, numHashes: Int, seed: Long): Column =
    column(MinHashSig(expression(toks), n, numHashes, seed))

  def ngramHashes(toks: Column, n: Int): Column =
    column(NGramHashes(expression(toks), n))

  def simhashSig(toks: Column, n: Int): Column =
    column(SimHashSig(expression(toks), n))

  def dedupLines(text: Column): Column =
    column(DedupLines(expression(text)))

  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    column(UnicodeNormalize(expression(text), form))

  def termCounts(toks: Column, terms: Seq[String]): Column =
    column(TermCounts(expression(toks), terms))

  def cardScan(text: Column): Column =
    column(CardScan(expression(text)))

  def blocklistHits(text: Column, words: Seq[String]): Column =
    column(BlocklistHits(expression(text), words))

  def fixMojibake(text: Column): Column =
    column(FixMojibake(expression(text)))
}
