package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.BpeTrain

class BpeTrainSpec extends SparkSpec {

  private val wddl = "word STRING, cnt BIGINT"

  test("hand-computed trajectory: weighted pair argmax, greedy fuse, " +
       "deterministic tie-break") {
    // words: aaab ×3, ab ×2.
    // step 1 pairs: (a,a) = 2·3 = 6; (a,b) = 1·3 + 1·2 = 5 → merge (a,a).
    //   aaab → [aa, a, b] (GREEDY left-to-right), ab unchanged.
    // step 2 pairs: (aa,a) = 3; (a,b) = 3 + 2 = 5 → merge (a,b).
    // step 3 pairs: (aa,ab) = 3 → merge (aa,ab) → 'aaab' one symbol.
    val words = df(Seq(Row("aaab", 3L), Row("ab", 2L)), wddl)
    val got = BpeTrain.fitMerges(words, merges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "a", "b", "ab", 5L),
      (3L, "aa", "ab", "aaab", 3L)))
  }

  test("adjacent repeats fuse BOTH occurrences; odd runs fuse greedily " +
       "left-to-right (the wrap-encoding soundness cases)") {
    // abab: (a,b) appears twice ADJACENTLY — both must fuse in one step.
    val w1 = df(Seq(Row("abab", 1L)), wddl)
    val t1 = BpeTrain.fitMerges(w1, merges = 2).collect()
    assert((t1(0).getString(1), t1(0).getString(2), t1(0).getLong(4)) ==
      (("a", "b", 2L)))
    // After fusing (a,b) both pairs collapse → step 2 sees (ab,ab).
    assert((t1(1).getString(1), t1(1).getString(2)) == (("ab", "ab")))
    // aaa: two overlapping (a,a) pairs count 2, but the fuse is greedy →
    // [aa, a]; step 2's best is then (aa, a).
    val w2 = df(Seq(Row("aaa", 1L)), wddl)
    val t2 = BpeTrain.fitMerges(w2, merges = 2).collect()
    assert((t2(0).getString(3), t2(0).getLong(4)) == (("aa", 2L)))
    assert((t2(1).getString(1), t2(1).getString(2)) == (("aa", "a")))
  }

  test("multi-char symbols never false-match inside a neighbor") {
    // After merging (a,b), the word 'cab' contains symbol 'ab' next to
    // 'c'; a bare-string encoding would let pair (b,c) of some other
    // word fire inside it. Pin: segmenting 'cab' under merges
    // [(a,b)] yields [c, ab] — and under [(b,c)] stays [c, a, b].
    val one = spark.range(1).select(lit("cab").as("w"))
    val s1 = one.select(BpeTrain.segment(col("w"), Seq("a" -> "b")))
      .head.getSeq[String](0)
    assert(s1 == Seq("c", "ab"))
    val s2 = one.select(BpeTrain.segment(col("w"), Seq("b" -> "c")))
      .head.getSeq[String](0)
    assert(s2 == Seq("c", "a", "b"))
    // Line terminators wrap like any character (the (?s) contract):
    // without DOTALL a '\n' would slip through unwrapped and corrupt
    // the symbol boundaries of a public-API input.
    val s3 = spark.range(1).select(lit("a\nb").as("w"))
      .select(BpeTrain.segment(col("w"), Nil)).head.getSeq[String](0)
    assert(s3 == Seq("a", "\n", "b"))
  }

  test("early stop: a single-char vocabulary has no pairs") {
    val words = df(Seq(Row("a", 5L), Row("b", 2L)), wddl)
    assert(BpeTrain.fitMerges(words, merges = 4).count() == 0L)
  }

  test("word census: lowercase-alpha only, (cnt DESC, word) cut is " +
       "deterministic; trajectory is partitioning-invariant") {
    val docs = Tables.documents(spark, sfDir)
    val a = BpeTrain.wordCensus(docs, maxWords = 50)
    val n = a.count()
    assert(n > 10 && n <= 50,
      s"census must respect the cap and find real words (got $n)")
    val bad = a.filter(!col("word").rlike("^[a-z]+$")).count()
    assert(bad == 0L)
    val t1 = BpeTrain.fitMerges(
      BpeTrain.wordCensus(docs, 100), merges = 4).collect().map(_.toSeq)
    val t2 = BpeTrain.fitMerges(
      BpeTrain.wordCensus(docs.repartition(17), 100), merges = 4)
      .collect().map(_.toSeq)
    assert(t1.toSeq == t2.toSeq)
  }

  // Independent reference: recompute EVERY pair count from scratch
  // each step (the pre-r14 formulation), pure Scala — no shared code
  // with the delta path beyond the fuse rule it re-implements. Shared
  // by the alpha-census and full-alphabet pins (BMP-only: ASCII words
  // sort identically under UTF-16 and code-point collation).
  private def reference(words0: Seq[(String, Long)], merges: Int)
      : Seq[(Long, String, String, String, Long)] = {
      var ws = words0.map { case (w, c) => (w.map(_.toString).toArray, c) }
      val out = Seq.newBuilder[(Long, String, String, String, Long)]
      var step = 1
      var done = false
      while (step <= merges && !done) {
        val counts = scala.collection.mutable.LinkedHashMap
          .empty[(String, String), Long]
        ws.foreach { case (s, c) =>
          (0 until s.length - 1).foreach { i =>
            val p = (s(i), s(i + 1))
            counts(p) = counts.getOrElse(p, 0L) + c
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), pc) = counts.toSeq
            .sortBy { case ((l, r), pc) => (-pc, l, r) }.head
          out += ((step.toLong, l, r, l + r, pc))
          ws = ws.map { case (s, c) =>
            val b = Seq.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += s(i); i += 1 }
            }
            (b.result().toArray, c)
          }
          step += 1
        }
      }
      out.result()
    }

  test("delta-maintained training equals an independent full-census " +
       "reference at ~100 merges (the VERDICT r13 incremental proof)") {
    val docs = Tables.documents(spark, sfDir)
    val census = BpeTrain.wordCensus(docs, 300)
    val words = census.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = reference(words, merges = 100)
    val got = BpeTrain.fitMerges(census, merges = 100).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got.size == want.size, s"step counts differ: ${got.size} vs " +
      s"${want.size}")
    assert(got == want,
      "delta-maintained trajectory diverged from the full-census " +
        "reference")
  }

  test("full-alphabet census trains over punctuation/digits/case and " +
       "matches the recompute-everything reference (VERDICT r15 ask #4)") {
    // Dirty the documents so the full alphabet is genuinely present:
    // trailing punctuation, digit suffixes, mixed case, a unicode mark.
    val docs = Tables.documents(spark, sfDir).withColumn("text",
      concat_ws(" ", col("text"),
        lit("End-of-line! (v2.1) COSTS $3,000 — §7; 'quoted,' 42%")))
    val census = BpeTrain.wordCensus(docs, 300, fullAlphabet = true)
    val words = census.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // The alphabet is genuinely full: punctuation, digits, uppercase.
    assert(words.exists(_._1.exists(c => !c.isLetter)),
      "full census must admit non-alphabetic symbols")
    assert(words.exists(_._1.exists(_.isUpper)),
      "full census must preserve case")
    assert(words.forall(w => !w._1.contains('\u0001') &&
      !w._1.contains('\u0002')), "sentinel code points stay excluded")
    val want = reference(words, merges = 120)
    val got = BpeTrain.fitMerges(census, merges = 120).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == want,
      "full-alphabet trajectory diverged from the full-census reference")
    // Punctuation genuinely participates in learned merges on this
    // corpus (the sentence-final period rides the census words).
    assert(got.exists(m => (m._2 + m._3).exists(c => !c.isLetter)),
      s"expected a merge touching a non-letter symbol: ${got.take(10)}")
    // The alpha-mode census is unchanged by the new parameter (the
    // registered x53 oracle's shape).
    val alpha = BpeTrain.wordCensus(docs, 50)
    assert(alpha.filter(!col("word").rlike("^[a-z]+$")).count() == 0L)
  }

  test("a 1024-merge fit runs (the raised guard) and stays exact on " +
       "a synthetic long-tail vocabulary") {
    // 400 synthetic words over a 6-letter alphabet — enough pair
    // diversity that hundreds of merges exist; Zipf-ish counts give a
    // deterministic argmax path.
    val rows = (0 until 400).map { i =>
      val w = (0 until 3 + i % 7).map(j => ('a' + (i * (j + 3) + j) % 6)
        .toChar).mkString
      Row(w + i.toString.map(c => ('p' + (c - '0')).toChar).mkString,
        (1000 / (1 + i % 50)).toLong)
    }
    val words = df(rows, wddl)
    val traj = BpeTrain.fitMerges(words, merges = 1024).collect()
    assert(traj.length > 100, s"expected a deep trajectory, got " +
      s"${traj.length}")
    // Counts never increase along the greedy path within ties... they
    // CAN increase (a later merge may be more frequent than an earlier
    // symbol pair only if created by merging) — pin instead the
    // invariants that must hold: steps are 1..n dense and every
    // pair_count is positive.
    assert(traj.map(_.getLong(0)).toSeq ==
      (1L to traj.length.toLong).toSeq)
    assert(traj.forall(_.getLong(4) > 0L))
    // Replaying ALL learned merges over the vocabulary (in-memory —
    // the vocab-table serving shape; a 1024-deep nested-replace
    // COLUMN would overflow the expression tree, see segment's doc):
    // no adjacent pair learned as a merge may remain unfused anywhere
    // (exactness of the apply rule at depth).
    val merges = traj.sortBy(_.getLong(0))
      .map(r => r.getString(1) -> r.getString(2)).toSeq
    val learned = merges.toSet
    val leftover = rows.map(_.getString(0)).flatMap { w =>
      val syms = merges.foldLeft(w.map(_.toString).toArray) {
        case (s, (l, r)) => BpeTrain.fuseSyms(s, l, r)
      }
      syms.sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))
        .filter(learned.contains)
    }
    assert(leftover.isEmpty,
      s"learned merges left unfused pairs: ${leftover.take(5).toSeq}")
  }

  test("segment replays the fitted merges: symbols round-trip to the " +
       "word and compress monotonically with more merges") {
    val docs = Tables.documents(spark, sfDir)
    val words = BpeTrain.wordCensus(docs, 100)
    val traj = BpeTrain.fitMerges(words, merges = 6).collect()
    val merges = traj.sortBy(_.getLong(0))
      .map(r => r.getString(1) -> r.getString(2)).toSeq
    // Lossless: concatenating a word's symbols reproduces the word.
    val bad = words.select(col("word"),
        concat_ws("", BpeTrain.segment(col("word"), merges)).as("rt"))
      .filter(col("word") =!= col("rt")).count()
    assert(bad == 0L, "segmentation must concatenate back to the word")
    // Each additional merge can only shrink or keep a word's symbol
    // count — and the LAST learned merge must fire somewhere (its
    // pair_count came from these very words).
    val sizes = (0 to merges.size).map { k =>
      words.select(sum(size(BpeTrain.segment(col("word"),
        merges.take(k)))).cast("long")).head.getLong(0)
    }
    sizes.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"merge grew the symbol mass: $sizes")
    }
    assert(sizes.last < sizes(sizes.size - 2),
      "the last learned merge must reduce the symbol mass")
  }

  test("the registered x53_bpe_train_full lane learns a non-letter " +
       "AND an uppercase merge over the planted corpus") {
    val traj = Queries.x53BpeTrainFull(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(traj.length == 8, s"expected the 8-step trajectory: ${traj.toSeq}")
    assert(traj.exists { case (l, r) => (l + r).exists(c => !c.isLetter) },
      s"expected a non-letter merge: ${traj.toSeq}")
    assert(traj.exists { case (l, r) => (l + r).exists(_.isUpper) },
      s"expected an uppercase merge: ${traj.toSeq}")
  }

  test("byte-level mode: initial symbols are UTF-8 bytes under the " +
       "chr(0x100+b) bijection and merges cross a multi-byte " +
       "character's byte boundary") {
    // 'café' alone: bytes c a f 0xC3 0xA9 — char mode sees 4 symbols,
    // byte mode 5. Hand trajectory at cnt 1: every adjacent pair has
    // count 1, so the argmax is pure (l, r) byte order:
    // step 1 fuses the smallest pair (a=0x61, f=0x66); then
    // (af, 0xC3) vs (c, af) vs (0xC3, 0xA9): l order 'af'(0x161…)
    // vs 'c'(0x163) vs 0x1C3 → (af, 0xC3) first…
    val words = df(Seq(Row("café", 1L)), wddl)
    val got = BpeTrain.fitMerges(words, merges = 4, byteLevel = true)
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    def bytesOf(s: String): Seq[Int] = s.map(c => c.toInt - 0x100)
    // All symbols live in the mapped byte plane.
    got.foreach { case (l, r, m) =>
      (l + r + m).foreach(c =>
        assert(c >= 0x100 && c <= 0x1FF, f"unmapped symbol char ${c.toInt}%x"))
    }
    // The final merged symbol is the whole word's UTF-8 byte string —
    // including é's TWO bytes, fused across the character boundary.
    assert(bytesOf(got.last._3) == Seq(0x63, 0x61, 0x66, 0xC3, 0xA9),
      got.map { case (l, r, m) => bytesOf(m) }.toSeq.toString)
    // …and char-level mode on the same word needs only 3 merges and
    // keeps é atomic: the alphabets genuinely differ.
    val charTraj = BpeTrain.fitMerges(words, merges = 4).collect()
    assert(charTraj.length == 3, s"char mode: ${charTraj.length} merges")

    // The registered byte lane: 8 steps, and the trajectory carries a
    // merge whose RIGHT is é's continuation byte 0xA9 fused onto a
    // left ending in 0xC3 — the planted cross-byte-boundary merge.
    val lane = Queries.x53BpeBytes(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(lane.length == 8, s"expected the 8-step trajectory")
    assert(lane.exists { case (l, r) =>
      l.nonEmpty && (l.last.toInt - 0x100) == 0xC3 &&
        bytesOf(r) == Seq(0xA9)
    }, s"expected the é cross-byte merge: ${
      lane.map { case (l, r) => (bytesOf(l), bytesOf(r)) }.toSeq}")
  }
}
