package graft

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.checks._
import graft.model.{ValidationResult, ValidationSuiteResult}

/** ScalaCheck-generator-driven invariants over the check/suite algebra
  * (SURVEY.md §5.2-4). Raw scalacheck (no scalatestplus bridge in the
  * offline cache): fixed-seed sampling keeps runs deterministic, and
  * Spark actions are expensive per case, so sample counts are modest. */
class PropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val valueGen: Gen[List[Option[String]]] =
    Gen.choose(1, 30).flatMap(k => Gen.listOfN(k,
      Gen.oneOf(Gen.const(None), Gen.oneOf("x", "y", "z", "bad1", "bad2").map(Some(_)))))

  test("property: unexpected + passing == element_count for InSetCheck") {
    samples(valueGen, 8).foreach { values =>
      val data = df(values.map(v => Row(v.orNull)), "c STRING")
      val r = InSetCheck("c", Seq("x", "y", "z")).run(data)
      val nulls = values.count(_.isEmpty)
      val passing = values.count(v => v.exists(Set("x", "y", "z"))) + nulls
      assert(r.elementCount == values.size.toLong)
      assert(r.unexpectedCount + passing == values.size.toLong)
    }
  }

  test("property: fused multi-size n-gram census equals per-size NGramStats") {
    // Random token arrays over a small alphabet (forcing gram
    // collisions) with multibyte and empty tokens mixed in — the fused
    // path's byte-view + prefix-sum arithmetic must agree with the
    // per-size census on every quadruple of every size.
    import org.apache.spark.sql.functions.col
    val tokGen: Gen[List[String]] = Gen.choose(0, 25).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "bb", "ccc", "日本", "é", "", "x😀")))
    val rows = samples(tokGen, 40)
    val d = df(rows.map(ts => Row(ts)), "toks ARRAY<STRING>")
    val multi = graft.functions.TextFunctions
      .ngramStatsMulti(col("toks"), 2, 10).as("m")
    val singles = (2 to 10).map(n =>
      graft.functions.TextFunctions.ngramStats(col("toks"), n).as(s"g$n"))
    d.select(multi +: singles: _*).collect().foreach { r =>
      val m = r.getSeq[Long](0)
      (2 to 10).zipWithIndex.foreach { case (n, i) =>
        assert(m.slice(4 * i, 4 * i + 4) == r.getSeq[Long](1 + i),
          s"size $n diverged")
      }
    }
  }

  test("property: check verdicts are invariant under row permutation") {
    samples(valueGen, 5).foreach { values =>
      val shuffled = new scala.util.Random(7).shuffle(values)
      val a = df(values.map(v => Row(v.orNull)), "c STRING")
      val b = df(shuffled.map(v => Row(v.orNull)), "c STRING")
      val check = InSetCheck("c", Seq("x", "y"))
      val (ra, rb) = (check.run(a), check.run(b))
      assert(ra.status == rb.status)
      assert(ra.unexpectedCount == rb.unexpectedCount)
      assert(ra.partialUnexpectedList == rb.partialUnexpectedList) // sorted sample
    }
  }

  test("property: suite summary counts always sum and agree with details") {
    val resultGen: Gen[List[ValidationResult]] = Gen.listOf(for {
      name <- Gen.identifier.map(_.take(8))
      status <- Gen.oneOf("PASSED", "FAILED", "ERROR")
    } yield ValidationResult(name, status, "msg"))
    samples(resultGen, 40).foreach { results =>
      val s = ValidationSuiteResult.of(results)
      assert(s.passedCount + s.failedCount == s.totalCount)
      assert(s.totalCount == results.size.toLong)
      assert(s.passed == results.forall(_.passed))
      assert(s.failedValidations.size.toLong == s.failedCount)
    }
  }

  test("property: UniqueCheck dup_rows is rows covered by duplicated keys") {
    val keysGen = Gen.choose(1, 25).flatMap(k => Gen.listOfN(k, Gen.chooseNum(0, 5)))
    samples(keysGen, 8).foreach { keys =>
      val data = df(keys.map(k => Row(k.toLong)), "k BIGINT")
      val r = UniqueCheck(Seq("k")).run(data)
      val dupRows = keys.groupBy(identity).values.filter(_.size > 1).map(_.size).sum
      assert(r.unexpectedCount == dupRows.toLong)
      assert(r.passed == (dupRows == 0))
    }
  }

  test("property: packing spans tile every random corpus exactly") {
    // Random doc lengths (incl. empty) into random sequence budgets:
    // per-doc span lengths must sum to its token count, per-sequence
    // fills must equal seqLen except the last, and total tokens match.
    val corpusGen = for {
      n <- Gen.choose(1, 25)
      lens <- Gen.listOfN(n, Gen.chooseNum(0, 30))
      seqLen <- Gen.choose(3, 17)
    } yield (lens, seqLen)
    samples(corpusGen, 6).foreach { case (lens, seqLen) =>
      val data = df(lens.zipWithIndex.map { case (l, i) =>
        Row(i.toLong, Seq.fill(l)("w").mkString(" "))
      }, "doc_id BIGINT, text STRING")
      val spans = graft.ext.Packing
        .packSequences(data, seqLen = seqLen.toLong, blockSize = 4L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val perDoc = spans.groupBy(_._1).view.mapValues(_.map(s => s._4 - s._3).sum)
      lens.zipWithIndex.filter(_._1 > 0).foreach { case (l, i) =>
        assert(perDoc(i.toLong) == l.toLong, s"doc $i of $l tokens mistiled")
      }
      val total = lens.sum.toLong
      assert(spans.map(s => s._4 - s._3).sum == total)
      if (total > 0) {
        val fills = spans.groupBy(_._2).view.mapValues(_.map(s => s._4 - s._3).sum)
        val last = fills.keys.max
        fills.filter(_._1 != last).foreach { case (sid, fill) =>
          assert(fill == seqLen.toLong, s"sequence $sid underfilled: $fill")
        }
      }
    }
  }

  test("property: as-of join matches a per-row argmax reference on random timelines") {
    // Random left/right timelines over few keys (collisions guaranteed):
    // the union+window formulation must equal the naive per-left-row
    // "greatest right time at-or-before, same key" model, including
    // no-match lefts (nulls) and simultaneous rows (>= convention).
    val timelineGen = for {
      nl <- Gen.choose(1, 20)
      nr <- Gen.choose(0, 20)
      lefts <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 40L)))
      rights <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 40L)))
    } yield (lefts, rights)
    samples(timelineGen, 6).foreach { case (lefts, rights) =>
      val l = df(lefts.zipWithIndex.map { case ((k, t), i) =>
        Row(i.toLong, k, new java.sql.Timestamp(t * 1000L))
      }, "event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
      val r0 = df(rights.zipWithIndex.map { case ((k, t), i) =>
        Row(k, new java.sql.Timestamp(t * 1000L), 100L + i, (100 + i).toDouble)
      }, "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, value DOUBLE")
      val r = graft.ext.AsofJoin.dedupRight(r0, "user_id", "ts", "event_id")
      // Reference model over the SAME deduped right side.
      val rRows = r.collect().map(x =>
        (x.getLong(0), x.getTimestamp(1).getTime, x.getLong(2)))
      val expected = lefts.zipWithIndex.map { case ((k, t), i) =>
        val eligible = rRows.filter(x => x._1 == k && x._2 <= t * 1000L)
        i.toLong -> (if (eligible.isEmpty) None
                     else Some(eligible.maxBy(_._2)._3))
      }.toMap
      val out = graft.ext.AsofJoin
        .asofJoin(l, r, "user_id", "ts", "ts", Seq("event_id", "value"))
        .collect().map(x => x.getLong(0) ->
          (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
      assert(out == expected)
    }
  }

  test("property: chunking tiles every random document with the exact overlap") {
    val chunkGen = for {
      n <- Gen.choose(1, 120)
      chunk <- Gen.choose(2, 20)
      overlap <- Gen.choose(0, chunk - 1)
    } yield (n, chunk, overlap)
    samples(chunkGen, 8).foreach { case (n, chunk, overlap) =>
      val toks = (0 until n).map(i => s"w$i")
      val data = df(Seq(Row(1L, toks.mkString(" "))), "doc_id BIGINT, text STRING")
      val out = graft.ext.Chunking
        .chunkTokens(data, chunkTokens = chunk, overlap = overlap)
        .orderBy("chunk_idx")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      val stride = chunk - overlap
      val expChunks = if (n <= chunk) 1 else (n - chunk - 1) / stride + 2
      assert(out.length == expChunks, s"n=$n chunk=$chunk overlap=$overlap")
      out.foreach { case (idx, size, md5hex) =>
        val slice = toks.slice((idx * stride).toInt,
          math.min((idx * stride).toInt + chunk, n))
        assert(size == slice.length.toLong)
        val exp = java.security.MessageDigest.getInstance("MD5")
          .digest(slice.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(md5hex == exp, s"chunk $idx content drifted")
      }
      // Coverage: chunk starts tile [0, n) — the last chunk reaches n.
      assert((out.last._1 * stride + out.last._2) == n.toLong)
    }
  }

  test("property: span dedup matches an independent reference model on random corpora") {
    // Random low-vocabulary corpora (heavy block collisions by design),
    // checked occurrence-for-occurrence against a sequential model of the
    // rule: a duplicated span survives only at its smallest (doc, pos).
    val vocab = Vector("a", "b", "c", "d")
    val docGen = Gen.choose(1, 25).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, docGen))
    samples(corpusGen, 6).foreach { texts =>
      val width = 2
      def spansOf(t: String): Vector[String] =
        t.split("\\s+").toVector.grouped(width).map(_.mkString(" ")).toVector
      val occ = texts.zipWithIndex.flatMap { case (t, i) =>
        spansOf(t).zipWithIndex.map { case (sp, p) => (i.toLong, p, sp) }
      }
      val counts = occ.groupBy(_._3).view.mapValues(_.size).toMap
      val first = occ.groupBy(_._3).view.mapValues(_.minBy(o => (o._1, o._2))).toMap
      val expected = texts.indices.map { i =>
        val mine = occ.filter(_._1 == i.toLong)
        val kept = mine.filter(o => counts(o._3) < 2 || first(o._3) == o)
        (i.toLong, mine.size.toLong, (mine.size - kept.size).toLong,
          kept.sortBy(_._2).map(_._3).mkString(" "))
      }
      val data = df(texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) },
        "doc_id BIGINT, text STRING").repartition(3)
      val got = graft.ext.SpanDedup.dedupTokenSpans(data, width = width)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(got.toSeq == expected, s"corpus: $texts")
    }
  }

  test("property: token mix summary matches an independent reference model") {
    val docGen = for {
      src <- Gen.oneOf("s0", "s1", "s2")
      k <- Gen.choose(1, 12)
      toks <- Gen.listOfN(k, Gen.oneOf("w1", "w2", "w3"))
    } yield (src, toks.mkString(" "))
    val corpusGen = Gen.choose(5, 30).flatMap(n => Gen.listOfN(n, docGen))
    def refBucket(id: Long): Long =
      RefHash.bucket(id, 42L ^ graft.ext.Sampling.MixSalt)
    val weights = Map("s0" -> 0.6, "s1" -> 0.4) // s2 weight-0
    val budget = 40L
    samples(corpusGen, 6).foreach { rows =>
      val docs = rows.zipWithIndex.map { case ((src, t), i) => (i.toLong, src, t) }
      val supply = docs.groupBy(_._2).view
        .mapValues(_.map(_._3.split(" ").length.toLong).sum).toMap
      val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
        val target = math.round(weights.getOrElse(src, 0.0) * budget)
        val thr = math.floor(
          math.min(1.0, target.toDouble / supply(src)) * 10000 + 0.5).toLong
        val kept = ds.filter(d => refBucket(d._1) < thr)
        (src, ds.size.toLong, supply(src), target,
          kept.size.toLong, kept.map(_._3.split(" ").length.toLong).sum)
      }
      val data = df(docs.map { case (i, s, t) => Row(i, s, t) },
        "doc_id BIGINT, source STRING, text STRING").repartition(3)
      val got = graft.ext.Mixing.mixSummary(data, weights = weights,
          totalTokens = budget).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      assert(got.toSeq == expected, s"docs: $docs")
    }
  }

  test("property: Spark hash64 equals the reference restatement on arbitrary keys") {
    // The engine-replay contract of the sampling hash, over the FULL
    // non-negative key range (random 63-bit keys and random seeds) —
    // not just the fixed probe keys SamplingSpec pins.
    val caseGen = for {
      seed <- Gen.chooseNum(0L, Long.MaxValue)
      keys <- Gen.listOfN(60, Gen.chooseNum(0L, Long.MaxValue))
    } yield (seed, keys)
    samples(caseGen, 5).foreach { case (seed, keys) =>
      val data = df(keys.map(Row(_)), "k BIGINT")
      val got = data.select(org.apache.spark.sql.functions.col("k"),
          graft.ext.Sampling.hash64(
            org.apache.spark.sql.functions.col("k"), seed).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      keys.foreach(k => assert(got(k) == RefHash.hash64(k, seed),
        s"key $k seed $seed"))
    }
  }

  test("property: quantized values reconstruct within half a step on random vectors") {
    val vecGen = for {
      d <- Gen.choose(2, 24)
      xs <- Gen.listOfN(d, Gen.chooseNum(-100.0, 100.0))
    } yield xs
    val vecs = samples(vecGen, 12).zipWithIndex
      .map { case (xs, i) => Row(i.toLong, xs.map(_.toFloat)) }
    val data = df(vecs, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    val q = graft.ext.Quantize.quantize(data).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Byte](1), r.getFloat(2)))).toMap
    vecs.foreach { row =>
      val id = row.getLong(0)
      val orig = row.getSeq[Float](1)
      val (qv, scale) = q(id)
      assert(qv.forall(b => b >= -127 && b <= 127))
      orig.zip(qv).foreach { case (x, b) =>
        assert(math.abs(x - b * scale) <= scale * 0.51 + 1e-6,
          s"vec $id reconstructs outside half a quantization step")
      }
    }
  }

  test("property: keep-best dedup matches a reference model, any partitioning") {
    // Random corpora with heavy norm collisions (tiny text alphabet,
    // whitespace/case variants) and null quality rows: the one-aggregate
    // max_by(struct(quality, -key)) must pick exactly the plain-JVM
    // "max quality then min key" survivor per family, on 1 partition or
    // 7 — the partial-agg combine order can never leak into the result.
    import org.apache.spark.sql.functions.{col, length}
    import graft.ext.Dedup
    val rowGen: Gen[List[(Long, String)]] = Gen.choose(1, 20).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(
        "a b", " a  b ", "A B", "c", "  c", null, "dd ee", "DD  EE "))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))
    samples(rowGen, 10).foreach { rows =>
      val norm = (t: String) => Option(t)
        .map(_.replaceAll("\\s+", " ").trim.toLowerCase).orNull
      val expect = rows.groupBy(r => norm(r._2)).values.map(fam =>
        fam.minBy { case (id, t) =>
          // null quality sorts LAST (the engine's coalesced floor)
          (Option(t).map(s => -s.length.toLong).getOrElse(Long.MaxValue), id)
        }._1).toSet
      Seq(1, 7).foreach { parts =>
        val d = df(rows.map { case (id, t) => Row(id, t) },
          "doc_id BIGINT, text STRING").repartition(parts)
        val got = Dedup.exactDedupKeepBest(d, length(col("text")))
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(got == expect, s"parts=$parts rows=$rows")
      }
    }
  }

  test("property: fitted cuts == the percentile gate on random grouped " +
       "scores, at random cut points, for every partitioning") {
    // Random (group, score) data with nulls in both roles, duplicate
    // scores (peers must share percentiles), and cut points sweeping
    // the boundaries 0 / 10^6 plus interior values — the floor-division
    // edges where an off-by-one would move a whole peer group across
    // the cut. The shared-CDF refactor makes equivalence structural;
    // this pins it stays true for ANY data the generators produce.
    import graft.ext.Calibrate
    import org.apache.spark.sql.functions.col
    val rowGen: Gen[List[(String, Long, Option[Long])]] =
      Gen.choose(1, 40).flatMap(k => Gen.listOfN(k, for {
        g <- Gen.oneOf("a", "b", "c", null)
        s <- Gen.oneOf(Gen.const(None),
          Gen.choose(0L, 6L).map(v => Some(v)))
      } yield (g, 0L, s)).map(_.zipWithIndex.map {
        case ((g, _, sc), i) => (g, i.toLong, sc) }))
    val ppms = Seq(0L, 1L, 100000L, 333333L, 500000L, 999999L, 1000000L)
    samples(rowGen, 6).foreach { rows =>
      val d = df(rows.map { case (g, id, sc) =>
          Row(g, id, sc.map(Long.box).orNull) },
        "g STRING, doc_id BIGINT, s BIGINT")
      ppms.foreach { ppm =>
        val direct = Calibrate.percentileGate(d, "s", "g", ppm)
          .filter(col("is_kept")).select("doc_id")
          .collect().map(_.getLong(0)).toSet
        Seq(1, 5).foreach { parts =>
          val cuts = Calibrate.thresholds(d.repartition(parts), "s", "g", ppm)
          val via = Calibrate.gateAgainst(d, cuts, "s", "g")
            .filter(col("is_kept")).select("doc_id")
            .collect().map(_.getLong(0)).toSet
          assert(via == direct, s"ppm=$ppm parts=$parts rows=$rows")
        }
      }
    }
  }
}
