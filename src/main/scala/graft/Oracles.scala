package graft

/** DuckDB-runnable ANSI SQL oracles, one per [[Queries]] entry (driver
  * contract: column names and rounding match the Spark side exactly). */
object Oracles {

  private def inList(vs: Seq[String]): String =
    vs.map(v => s"'$v'").mkString("(", ",", ")")

  val wl: String = inList(Queries.regionWhitelist)
  val segs: String = inList(Queries.marketSegments)

  /** The suites/testdata_core.json expectations re-derived row-by-row —
    * shared by the g16 (suite summary) and v6 (checkpoint store
    * read-back) oracles. The c_mktsegment in-set check deliberately
    * FAILs (MACHINERY is outside the declared set, mirroring the
    * reference's intentionally-excluded whitelist). */
  private val testdataCoreSuiteRows: String =
    """  SELECT 'customer.agg_bounds:mean:c_acctbal' AS validation_name,
      |         CASE WHEN m >= 1000 AND m <= 8000 THEN 'PASSED' ELSE 'FAILED' END AS status,
      |         cnt AS element_count,
      |         CAST(CASE WHEN m >= 1000 AND m <= 8000 THEN 0 ELSE 1 END AS BIGINT) AS unexpected_count
      |  FROM (SELECT count(*) AS cnt, avg(c_acctbal) AS m FROM customer)
      |  UNION ALL
      |  SELECT 'customer.between:c_acctbal',
      |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END, cnt, bad
      |  FROM (SELECT count(*) AS cnt,
      |               count(CASE WHEN c_acctbal < -1000 OR c_acctbal > 10000 THEN 1 END) AS bad
      |        FROM customer)
      |  UNION ALL
      |  SELECT 'customer.distinct_count:c_mktsegment',
      |         CASE WHEN dc >= 1 AND dc <= 10 THEN 'PASSED' ELSE 'FAILED' END,
      |         cnt, CAST(CASE WHEN dc >= 1 AND dc <= 10 THEN 0 ELSE 1 END AS BIGINT)
      |  FROM (SELECT count(*) AS cnt, count(DISTINCT c_mktsegment) AS dc FROM customer)
      |  UNION ALL
      |  SELECT 'customer.distinct_count_approx:c_mktsegment',
      |         CASE WHEN dc >= 1 AND dc <= 10 THEN 'PASSED' ELSE 'FAILED' END,
      |         cnt, CAST(CASE WHEN dc >= 1 AND dc <= 10 THEN 0 ELSE 1 END AS BIGINT)
      |  -- Approx-check oracle contract: DuckDB computes the EXACT
      |  -- cardinality; the suite's bounds dominate the HLL rsd error, so
      |  -- the VERDICT (not the estimate) is what both engines agree on.
      |  FROM (SELECT count(*) AS cnt, count(DISTINCT c_mktsegment) AS dc FROM customer)
      |  UNION ALL
      |  SELECT 'customer.in_set:c_mktsegment',
      |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END, cnt, bad
      |  FROM (SELECT count(*) AS cnt,
      |               count(CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD') THEN 1 END) AS bad
      |        FROM customer)
      |  UNION ALL
      |  SELECT 'customer.not_null:c_custkey',
      |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END, cnt, bad
      |  FROM (SELECT count(*) AS cnt,
      |               count(CASE WHEN c_custkey IS NULL THEN 1 END) AS bad FROM customer)
      |  UNION ALL
      |  SELECT 'customer.proportion_unique:c_custkey',
      |         CASE WHEN dc * 1.0 / nn >= 0.99 AND dc * 1.0 / nn <= 1.0
      |              THEN 'PASSED' ELSE 'FAILED' END,
      |         cnt, CAST(CASE WHEN dc * 1.0 / nn >= 0.99 AND dc * 1.0 / nn <= 1.0
      |                        THEN 0 ELSE 1 END AS BIGINT)
      |  FROM (SELECT count(*) AS cnt, count(DISTINCT c_custkey) AS dc,
      |               count(c_custkey) AS nn FROM customer)
      |  UNION ALL
      |  SELECT 'customer.quantile:c_acctbal:0.5',
      |         CASE WHEN q >= 1000 AND q <= 8000 THEN 'PASSED' ELSE 'FAILED' END,
      |         cnt, CAST(CASE WHEN q >= 1000 AND q <= 8000 THEN 0 ELSE 1 END AS BIGINT)
      |  FROM (SELECT count(*) AS cnt,
      |               round(quantile_cont(c_acctbal, 0.5), 4) AS q FROM customer)
      |  UNION ALL
      |  SELECT 'customer.quantile:c_acctbal:0.95',
      |         CASE WHEN q >= 9000 THEN 'PASSED' ELSE 'FAILED' END,
      |         cnt, CAST(CASE WHEN q >= 9000 THEN 0 ELSE 1 END AS BIGINT)
      |  FROM (SELECT count(*) AS cnt,
      |               round(quantile_cont(c_acctbal, 0.95), 4) AS q FROM customer)
      |  UNION ALL
      |  SELECT 'customer.quantile_approx:c_acctbal:0.5',
      |         CASE WHEN q >= 1000 AND q <= 8000 THEN 'PASSED' ELSE 'FAILED' END,
      |         cnt, CAST(CASE WHEN q >= 1000 AND q <= 8000 THEN 0 ELSE 1 END AS BIGINT)
      |  -- Exact quantile on the oracle side; verdict-level agreement
      |  -- (bounds dominate the GK sketch's rank error).
      |  FROM (SELECT count(*) AS cnt,
      |               quantile_cont(c_acctbal, 0.5) AS q FROM customer)
      |  UNION ALL
      |  SELECT 'customer.value_length:c_name',
      |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END, cnt, bad
      |  FROM (SELECT count(*) AS cnt,
      |               count(CASE WHEN length(c_name) < 5 OR length(c_name) > 30 THEN 1 END) AS bad
      |        FROM customer)
      |  UNION ALL
      |  SELECT 'lineitem.between:l_discount',
      |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END, cnt, bad
      |  FROM (SELECT count(*) AS cnt,
      |               count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END) AS bad
      |        FROM lineitem)
      |  UNION ALL
      |  SELECT 'lineitem.pair_greater:l_extendedprice>l_quantity',
      |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END, cnt, bad
      |  FROM (SELECT count(*) AS cnt,
      |               count(CASE WHEN l_extendedprice <= l_quantity THEN 1 END) AS bad
      |        FROM lineitem)
      |  UNION ALL
      |  SELECT 'orders.between:o_totalprice',
      |         CASE WHEN bad * 100.0 / nn <= 50.0 THEN 'PASSED' ELSE 'FAILED' END,
      |         cnt, bad
      |  FROM (SELECT count(*) AS cnt, count(o_totalprice) AS nn,
      |               count(CASE WHEN o_totalprice < 0 OR o_totalprice > 300000 THEN 1 END) AS bad
      |        FROM orders)
      |  UNION ALL
      |  SELECT 'orders.between:o_totalprice:where:o_orderstatus = ''F''',
      |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END, cnt, bad
      |  -- row_condition folds into BOTH counters: element_count is the
      |  -- condition rows, unexpected only among them.
      |  FROM (SELECT count(*) AS cnt,
      |               count(CASE WHEN o_totalprice < 0 THEN 1 END) AS bad
      |        FROM orders WHERE o_orderstatus = 'F')
      |  UNION ALL
      |  SELECT 'orders.in_set:o_orderstatus',
      |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END, cnt, bad
      |  FROM (SELECT count(*) AS cnt,
      |               count(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS bad
      |        FROM orders)
      |  UNION ALL
      |  SELECT 'orders.not_null:o_custkey',
      |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END, cnt, bad
      |  FROM (SELECT count(*) AS cnt,
      |               count(CASE WHEN o_custkey IS NULL THEN 1 END) AS bad FROM orders)
      |  UNION ALL
      |  SELECT 'orders.regex:o_orderpriority',
      |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END, cnt, bad
      |  FROM (SELECT count(*) AS cnt,
      |               count(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$') THEN 1 END) AS bad
      |        FROM orders)
      |  UNION ALL
      |  SELECT 'orders.row_count_between',
      |         CASE WHEN cnt >= 1 THEN 'PASSED' ELSE 'FAILED' END,
      |         cnt, CAST(CASE WHEN cnt >= 1 THEN 0 ELSE 1 END AS BIGINT)
      |  FROM (SELECT count(*) AS cnt FROM orders)""".stripMargin

  /** The [[graft.ext.Sampling.hash64]] split-key mix as a DuckDB scalar
    * expression over `key` — each 31-bit half runs multiply → xor-shift,
    * then a combining multiply and final xor-shift; every intermediate
    * positive and below 2⁶³ for any non-negative key (so `%` = pmod and
    * `>>` is a logical shift). ONE definition shared by every oracle
    * that replays survivor selection (x6, x10, x12), so a hash change
    * cannot desynchronize them. Seeds carry the operator-purpose salts
    * ([[graft.ext.Sampling.SplitSalt]]/MixSalt/OrderSalt) exactly as the
    * Scala side applies them. */
  private def hash64Sql(key: String, seed: Long): String = {
    // The lane seeds come from the SAME Scala finalizer the engine uses
    // (Sampling.seedLanes — full 64-bit seed sensitivity); they reach
    // DuckDB as plain integer literals.
    val (sLo, sHi) = graft.ext.Sampling.seedLanes(seed)
    val k0 = s"(($key) & 2147483647)"
    val k1 = s"(($key) >> 31)"
    val h1 = s"((($k0 + $sLo) & 2147483647) * 2654435761)"
    val g1 = s"xor($h1, $h1 >> 31)" // unmasked: low lane stays injective
    val h2 = s"(($k1 + $sHi) * 486187739)"
    val g2 = s"(xor($h2, $h2 >> 31) & 2147483647)"
    val h3 = s"xor($g1, $g2 * 2654435761)"
    s"xor($h3, $h3 >> 29)"
  }

  private def bucketSql(key: String, seed: Long = 42L): String =
    s"(${hash64Sql(key, seed)} % 10000)"

  /** The [[graft.ext.Sampling.orderKey]] ORDER-grade finalizer over
    * [[hash64Sql]]: the low 31 bits through a WRAPPED odd multiply to
    * the high position (hash64's no-wrap low lane is order-preserving
    * in the key — sorting dense ids by it is a shuffle in name only),
    * hash bits 32..62 below. All intermediates < 2⁶³ (`a ≤ 2³¹−1` →
    * `a·2³¹ + 2³¹−1 < 2⁶²`), exact in BIGINT. ONE definition for every
    * oracle that replays a training-order key (x12, the layout audit) —
    * lockstep with the Scala side like [[hash64Sql]]. */
  private def orderKeySql(key: String, seed: Long): String = {
    val h = hash64Sql(key, seed)
    val a = s"((($h & 2147483647) * 2654435761) & 2147483647)"
    s"($a * 2147483648 + (($h >> 32) & 2147483647))"
  }

  /** Shared CTE blocks for the document-dedup family. ONE definition each
    * — x1_jaccard_pairs, x1_dedup_groups, x8_contamination, and
    * x10_curation_funnel interpolate these, so a threshold or
    * shingle-width change cannot desynchronize the oracles that
    * cross-check each other. */

  /** Normalized distinct 4-gram shingles per document → `grams`, from an
    * arbitrary source relation (default: the raw documents table; the
    * soft-funnel oracle feeds its planted union through the same body). */
  private def gram4CtesFrom(src: String): String =
    s"""norm AS (
      |  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
      |  FROM $src
      |), toks AS (
      |  SELECT doc_id, unnest(string_split_regex(t, '\\s+')) AS tok,
      |         generate_subscripts(string_split_regex(t, '\\s+'), 1) AS ord
      |  FROM norm
      |), grams AS (
      |  SELECT DISTINCT doc_id,
      |         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
      |             || ' ' || lead(tok, 3) OVER w AS gram
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
      |  QUALIFY lead(tok, 3) OVER w IS NOT NULL
      |)""".stripMargin

  private val gram4Ctes: String = gram4CtesFrom("documents")

  /** Exact-Jaccard pairs over `grams` → `jpair` (scored) and `jp`
    * (thresholded at 0.8, the registered queries' minSim). */
  private val jaccardPairCtes: String =
    """dc AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
      |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |jpair AS (
      |  SELECT doc_id_a, doc_id_b,
      |         round(i * 1.0 / (x.n + y.n - i), 4) AS jaccard
      |  FROM inter JOIN dc x ON doc_id_a = x.doc_id JOIN dc y ON doc_id_b = y.doc_id),
      |jp AS (SELECT doc_id_a, doc_id_b FROM jpair WHERE jaccard >= 0.8)""".stripMargin

  /** Connected components over ANY symmetric pair CTE — creach
    * accumulates, per vertex, the labels of everything that reaches it;
    * min(label) per vertex = the component's smallest id, exactly the
    * engine's min-label fixpoint. Shared by the text (x1_dedup_groups)
    * and image (x5_dhash_groups) resolutions. */
  private def componentCtesFrom(pairCte: String, aCol: String,
                                bCol: String): String =
    s"""cedges AS (
       |  SELECT $aCol AS src, $bCol AS dst FROM $pairCte
       |  UNION SELECT $bCol, $aCol FROM $pairCte),
       |creach(id, lbl) AS (
       |  SELECT src, src FROM cedges
       |  UNION
       |  SELECT e.dst, r.lbl FROM cedges e JOIN creach r ON e.src = r.id)""".stripMargin

  private val componentCtes: String =
    componentCtesFrom("jp", "doc_id_a", "doc_id_b")

  /** Benchmark 4-gram shingles and the containment CTE built from the
    * RAW documents 0–2 (benchmarks are clean, the crawl is not)
    * against whatever corpus `grams` CTE is in scope — ONE definition
    * shared by the funnels that REWRITE the corpus text before
    * shingling (x10_clean_funnel, x10_xdedup_funnel), so the bench
    * direction can never drift between them. */
  private val benchGramsRawCtes: String =
    raw"""bnorm AS (
      |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
      |  FROM documents WHERE doc_id < 3),
      |btoks AS (
      |  SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS tok,
      |         generate_subscripts(string_split_regex(t, '\s+'), 1) AS ord
      |  FROM bnorm),
      |bgrams AS (
      |  SELECT DISTINCT doc_id AS bench_id,
      |         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
      |             || ' ' || lead(tok, 3) OVER w AS gram
      |  FROM btoks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
      |  QUALIFY lead(tok, 3) OVER w IS NOT NULL),
      |bn AS (SELECT bench_id, count(*) AS n FROM bgrams GROUP BY 1),
      |contam AS (
      |  SELECT DISTINCT doc_id FROM (
      |    SELECT g.doc_id, b.bench_id, count(*) AS i
      |    FROM grams g JOIN bgrams b ON g.gram = b.gram
      |    GROUP BY 1, 2) JOIN bn USING (bench_id)
      |  WHERE round(i * 1.0 / n, 4) >= 0.8)""".stripMargin

  /** The C4 line-retention CTEs over a relation `src(doc_id, t)` —
    * whitespace-strip (full-whitespace, Python `.strip()` semantics),
    * terminal-punctuation tail, five-word floor, "javascript"
    * exclusion, ordered rewrite. ONE definition shared by x3_c4_rules
    * and x10_c4_funnel, so the line rules cannot drift between the
    * standalone bundle and the funnel gate. Emits `c4l` (split lines
    * with ordinals), `c4kept` (retained lines), `c4reb` (per-doc
    * rewrite `xt` + `n_kept`). */
  private def c4LineCtes(src: String): String =
    raw"""c4l AS (
      |  SELECT doc_id, unnest(string_split(t, chr(10))) AS line,
      |         generate_subscripts(string_split(t, chr(10)), 1) AS ord
      |  FROM ${src}),
      |c4k AS (
      |  SELECT doc_id, line, ord,
      |         regexp_replace(line, '^\s+|\s+$$', '', 'g') AS lt
      |  FROM c4l),
      |c4kept AS (
      |  SELECT doc_id, line, ord FROM c4k
      |  WHERE regexp_matches(lt, '[.!?"”]$$')
      |    AND len(string_split_regex(lt, '\s+')) >= 5
      |    AND NOT contains(lower(lt), 'javascript')),
      |c4reb AS (
      |  SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS xt,
      |         count(*) AS n_kept
      |  FROM c4kept GROUP BY doc_id)""".stripMargin

  /** The no-fuzzy funnel body — annotate flags, stage census, final
    * select with the url/history/fuzzy no-op aliases — over a REWRITTEN
    * corpus relation `src` (must expose doc_id, lang, text), expecting
    * `contam` in scope (from [[benchGramsRawCtes]]). ONE body shared by
    * x10_clean_funnel and x10_xdedup_funnel, so the rewritten-corpus
    * funnels can never drift from each other's stage replay. */
  /** `extraAnnCol` (leading comma included) adds a gate column to the
    * `ann` select (rtext/lang in scope); `qualExtra` (leading AND
    * included) extends the quality predicate in all four places. */
  private def noFuzzyFunnelBody(src: String, extraAnnCol: String = "",
                                qualExtra: String = "",
                                rtextBase: String = "text"): String =
    raw"""ann AS (
      |  SELECT doc_id, lang,
      |         doc_id = min(doc_id) OVER (
      |           PARTITION BY lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
      |           AS is_canonical,
      |         doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
      |         CASE WHEN len(trim(rtext)) = 0 THEN 0
      |              ELSE len(string_split_regex(trim(rtext), '\s+')) END AS n_tok,
      |         ${bucketSql("doc_id")} AS b,
      |         CASE lang WHEN 'en' THEN 4000 ELSE 10000 END AS thr${extraAnnCol}
      |  FROM (SELECT doc_id, lang, text,
      |               regexp_replace(regexp_replace(regexp_replace(${rtextBase},
      |                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |                 '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
      |                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
      |        FROM ${src})
      |), f AS (
      |  SELECT count(*) AS n_raw,
      |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_dedup,
      |         count(CASE WHEN is_canonical
      |                         AND NOT is_contaminated THEN 1 END)
      |           AS n_after_decontam,
      |         count(CASE WHEN is_canonical AND NOT is_contaminated
      |                         AND n_tok BETWEEN 25 AND 90${qualExtra} THEN 1 END)
      |           AS n_after_quality,
      |         count(CASE WHEN is_canonical AND NOT is_contaminated
      |                         AND n_tok BETWEEN 25 AND 90${qualExtra} AND b < thr THEN 1 END)
      |           AS n_after_sample,
      |         COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS tokens_raw,
      |         COALESCE(CAST(sum(CASE WHEN is_canonical
      |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_dedup,
      |         COALESCE(CAST(sum(CASE WHEN is_canonical
      |                         AND NOT is_contaminated
      |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_decontam,
      |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
      |                         AND n_tok BETWEEN 25 AND 90${qualExtra}
      |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_quality,
      |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
      |                         AND n_tok BETWEEN 25 AND 90${qualExtra} AND b < thr
      |                    THEN n_tok END) AS BIGINT), 0) AS n_tokens
      |  FROM ann)
      |SELECT n_raw, n_raw AS n_after_url, n_after_dedup,
      |       n_after_dedup AS n_after_history,
      |       n_after_dedup AS n_after_fuzzy,
      |       n_after_decontam, n_after_quality, n_after_sample,
      |       tokens_raw, tokens_raw AS tokens_after_url,
      |       tokens_after_dedup,
      |       tokens_after_dedup AS tokens_after_history,
      |       tokens_after_dedup AS tokens_after_fuzzy,
      |       tokens_after_decontam, tokens_after_quality, n_tokens,
      |       CASE WHEN n_tokens = 0 THEN 0
      |            ELSE (n_tokens - 1) // 512 + 1 END AS n_sequences
      |FROM f""".stripMargin

  /** The curation-funnel stage replay parameterized on the corpus
    * relation (`src` — raw `documents`, or a planted-union CTE supplied
    * through `prefix`) and the exact-dedup keeper window (`canonicalSql`,
    * the complete `is_canonical` select item) — ONE body shared by
    * x10_curation_funnel and x10_keepbest_funnel, so the stage replay
    * can never drift between keeper policies. */
  private def curationFunnelSql(prefix: String, src: String,
                                canonicalSql: String): String =
    "WITH RECURSIVE " + prefix + gram4CtesFrom(src) + ",\n" +
        """bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM grams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8
          |),""".stripMargin + "\n" +
        jaccardPairCtes + ",\n" + componentCtes + ",\n" +
      raw"""fdrop AS (SELECT id FROM creach GROUP BY id HAVING min(lbl) <> id),
        |ann AS (
        |  SELECT doc_id, lang,
        |         ${canonicalSql}
        |         doc_id NOT IN (SELECT id FROM fdrop) AS is_fuzzy,
        |         doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
        |         CASE WHEN len(trim(rtext)) = 0 THEN 0
        |              ELSE len(string_split_regex(trim(rtext), '\s+')) END AS n_tok,
        |         ${bucketSql("doc_id")} AS b,
        |         CASE lang WHEN 'en' THEN 4000 ELSE 10000 END AS thr
        |  FROM (SELECT doc_id, lang, text,
        |               regexp_replace(regexp_replace(regexp_replace(text,
        |                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |                 '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
        |                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
        |        FROM ${src})
        |), f AS (
        |  SELECT count(*) AS n_raw,
        |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_dedup,
        |         -- no history index in the registered funnel: the X1h
        |         -- stage is a no-op, so history == dedup on both sides
        |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_history,
        |         count(CASE WHEN is_canonical AND is_fuzzy THEN 1 END)
        |           AS n_after_fuzzy,
        |         count(CASE WHEN is_canonical AND is_fuzzy
        |                         AND NOT is_contaminated THEN 1 END)
        |           AS n_after_decontam,
        |         count(CASE WHEN is_canonical AND is_fuzzy AND NOT is_contaminated
        |                         AND n_tok BETWEEN 25 AND 90 THEN 1 END)
        |           AS n_after_quality,
        |         count(CASE WHEN is_canonical AND is_fuzzy AND NOT is_contaminated
        |                         AND n_tok BETWEEN 25 AND 90 AND b < thr THEN 1 END)
        |           AS n_after_sample,
        |         COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS tokens_raw,
        |         COALESCE(CAST(sum(CASE WHEN is_canonical
        |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_dedup,
        |         COALESCE(CAST(sum(CASE WHEN is_canonical
        |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_history,
        |         COALESCE(CAST(sum(CASE WHEN is_canonical AND is_fuzzy
        |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_fuzzy,
        |         COALESCE(CAST(sum(CASE WHEN is_canonical AND is_fuzzy
        |                         AND NOT is_contaminated
        |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_decontam,
        |         COALESCE(CAST(sum(CASE WHEN is_canonical AND is_fuzzy
        |                         AND NOT is_contaminated
        |                         AND n_tok BETWEEN 25 AND 90
        |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_quality,
        |         COALESCE(CAST(sum(CASE WHEN is_canonical AND is_fuzzy
        |                         AND NOT is_contaminated
        |                         AND n_tok BETWEEN 25 AND 90 AND b < thr
        |                    THEN n_tok END) AS BIGINT), 0) AS n_tokens
        |  FROM ann)
        |SELECT n_raw,
        |       -- no urlCol in the registered funnel: the URL stage is a
        |       -- no-op, so after_url == raw on both sides
        |       n_raw AS n_after_url,
        |       n_after_dedup, n_after_history, n_after_fuzzy,
        |       n_after_decontam, n_after_quality, n_after_sample,
        |       tokens_raw, tokens_raw AS tokens_after_url,
        |       tokens_after_dedup, tokens_after_history,
        |       tokens_after_fuzzy, tokens_after_decontam,
        |       tokens_after_quality, n_tokens,
        |       CASE WHEN n_tokens = 0 THEN 0
        |            ELSE (n_tokens - 1) // 512 + 1 END AS n_sequences
        |FROM f""".stripMargin

  /** The uniquified corpus replayed (see Queries.uniquifiedDocs): each
    * doc's text rebuilt as greatest(4, n_tok) repetitions of a
    * doc_id-unique token — so text equality below IS the detection
    * predicate (distinct docs share no shingles; copies are identical).
    * `trim(repeat(...))` mirrors the Spark expression token-for-token. */
  private val uniquifiedCte: String =
    raw"""WITH unt AS (
      |  SELECT doc_id,
      |         CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 0
      |              ELSE len(string_split_regex(trim(text), '\s+')) END AS nt
      |  FROM documents),
      |u AS (
      |  SELECT doc_id,
      |         trim(repeat('d' || CAST(doc_id AS VARCHAR) || 'x ',
      |                     greatest(4, nt))) AS utext
      |  FROM unt),
      |""".stripMargin

  /** history/shard split over `u` — the s3/s4 planted-stream structure
    * (copies of docs 0–9 re-keyed +10000 must drop against history). */
  private val plantedShardCte: String =
    """history AS (SELECT doc_id, utext FROM u WHERE doc_id < 300),
      |shard AS (
      |  SELECT doc_id, utext FROM u WHERE doc_id >= 300
      |  UNION ALL
      |  SELECT doc_id + 10000 AS doc_id, utext FROM u WHERE doc_id < 10)""".stripMargin

  /** corpus-with-planted-pairs over `u` — the x1 planted-pair structure
    * (copies of docs 0–4 re-keyed +20000 pair with their source). */
  private val plantedPairCte: String =
    """corpus AS (
      |  SELECT doc_id, utext FROM u
      |  UNION ALL
      |  SELECT doc_id + 20000 AS doc_id, utext FROM u WHERE doc_id < 5)""".stripMargin

  /** Gaps-and-islands sessionization replayed: strict > on the
    * integer-second gap (DuckDB epoch() is fractional DOUBLE — floor to
    * match Spark's unix_timestamp), session index = running count of
    * starts per user in (ts, event_id) total order, value sum in
    * DECIMAL. ONE definition bound to BOTH x18_sessionize (the window
    * formulation) and s5_stream_sessions (the flatMapGroupsWithState
    * fold, batch-replayed) — the two engines' session sets must be
    * identical. */
  /** The BM25 top-10 replay over `documents WHERE pred` — ONE SQL body
    * for the fresh rank, the persisted/merged probes (pred = TRUE) and
    * the post-removal probe (pred = the kept set): the engine paths all
    * share [[graft.ext.TfIdf]]'s `rankFromStats`, so their oracles must
    * share the scoring text too. */
  private def bm25RankSqlOn(pred: String): String =
    raw"""WITH l AS (
        |  SELECT doc_id,
        |         CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS dl
        |  FROM documents WHERE $pred),
        |tot AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS ltot FROM l),
        |tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents
        |  WHERE ($pred) AND text IS NOT NULL AND len(trim(text)) > 0),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN ('data', 'vector', 'merge') GROUP BY doc_id, term),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |c AS (
        |  SELECT f.doc_id,
        |         CAST(round(ln(1 + (t.n - d.df + 0.5) / (d.df + 0.5))
        |                    * 1000000) AS BIGINT)
        |           * f.tf * 2200 * 1000 AS num,
        |         f.tf * 1000000 + 1200 * 250 +
        |           ((1200 * 750 * l.dl * t.n) // t.ltot) AS den
        |  FROM tf f JOIN dfc d USING (term) JOIN l USING (doc_id), tot t),
        |s AS (
        |  SELECT doc_id, CAST(sum(num // den) AS BIGINT) AS bm25_micro,
        |         count(*) AS terms_hit
        |  FROM c GROUP BY doc_id),
        |r AS (
        |  SELECT doc_id, bm25_micro, terms_hit,
        |         row_number() OVER (ORDER BY bm25_micro DESC, doc_id ASC)
        |           AS rank
        |  FROM s)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, bm25_micro, terms_hit
        |FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin

  private val bm25RankSql: String = bm25RankSqlOn("TRUE")

  /** The round-trip / layout census replayed from the ORIGINAL
    * parquet: the engine censuses what it read back out of the
    * exported/rewritten files, the oracle censuses what was there
    * before — equality is the losslessness proof (the md5-prefix fp
    * sum makes any single escaped-byte divergence visible). NULL
    * text: md5(NULL) is NULL in both engines, so it drops from the fp
    * sum and is pinned by the explicit null count instead. ONE
    * definition bound to x29 (JSONL), x32 (CSV), and x33
    * (compaction). */
  private val docCensusSql: String =
    """SELECT source, lang, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS char_sum,
      |       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_null_text,
      |       CAST(sum(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
      |            % 1000000000) AS BIGINT) AS text_fp_sum
      |FROM documents GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin

  /** The X8 containment replay — same shared 4-gram CTE as the
    * x1_jaccard oracle; containment = |grams(doc) ∩ grams(bench)| /
    * |grams(bench)|, threshold on the ROUNDED value (matching the
    * Spark side). ONE definition bound to BOTH x8_contamination and
    * the persisted-index probe x8_contam_against. */
  private val contaminationSql: String =
    ("WITH " + gram4Ctes + ",\n" +
      """bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
        |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
        |binter AS (
        |  SELECT g.doc_id, b.bench_id, count(*) AS i
        |  FROM grams g JOIN bench b ON g.gram = b.gram
        |  GROUP BY 1, 2)
        |SELECT doc_id, bench_id, containment FROM (
        |  SELECT doc_id, bench_id, round(i * 1.0 / n, 4) AS containment
        |  FROM binter JOIN bn USING (bench_id))
        |WHERE containment >= 0.8 ORDER BY doc_id, bench_id""".stripMargin)

  private val sessionizeSql: String =
    """WITH a AS (
      |  SELECT user_id, ts, event_id, value,
      |         CAST(floor(epoch(ts)) AS BIGINT)
      |           - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |         sum(CASE WHEN gap_s IS NULL OR gap_s > 43200
      |                  THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           AS session_idx
      |  FROM a)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |       count(*) AS n_events,
      |       min(ts) AS start_ts, max(ts) AS end_ts,
      |       CAST(floor(epoch(max(ts))) AS BIGINT)
      |         - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s,
      |       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
      |         AS total_value
      |FROM s GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  /** The deterministically-dirtied documents (Queries.dirtiedDocs
    * mirrored token-for-token) → `dirty(doc_id, lang, t)`. ONE
    * definition bound to BOTH x19_text_clean and x10_clean_funnel. */
  /** [[dirtyCte]] under a caller-chosen CTE name — x10_clean_funnel
    * inserts the boiler plant + line-dedup chain between the dirtied
    * text and the clean chain, so its dirty lanes bind to `dirty0`
    * while `cleanCtes` keeps reading from `dirty`. */
  private def dirtyCteNamed(name: String): String =
    raw"""$name AS (
      |  SELECT doc_id, lang,
      |         CASE
      |           WHEN doc_id % 5 = 0 THEN
      |             '<p class="d' || CAST(doc_id AS VARCHAR) || '">'
      |               || coalesce(text, '')
      |               || '</p> <script type="text/javascript">var x = 1 < 2;</script>'
      |           WHEN doc_id % 5 = 1 THEN
      |             'A &amp;amp; B &lt;tag&gt; <BR>' || coalesce(text, '')
      |           WHEN doc_id % 5 = 2 THEN
      |             coalesce(text, '')
      |               || '&nbsp;&quot;q&quot;&#39;s <style>p{color:red}</style>'
      |           ELSE text END AS t
      |  FROM documents)""".stripMargin

  private val dirtyCte: String = dirtyCteNamed("dirty")

  /** The boiler plant + within-doc line-dedup chain from `dirty0` to
    * `dirty(doc_id, lang, t)` — x10_clean_funnel's
    * `dedupLinesFirst` stage replayed at the string level (the
    * x19_line_dedup formulation: first occurrence per exact line wins,
    * order preserved, -1-limit split semantics via string_split). The
    * plant suffixes EVERY document with the same three-copy footer, so
    * exact-dedup families survive; the dedup collapses it to one
    * `boiler` line BEFORE the clean chain destroys newlines. */
  private val lineDedupCtes: String =
    raw"""planted AS (
      |  SELECT doc_id, lang,
      |         coalesce(t, '') || chr(10) || 'boiler' || chr(10) || 'boiler'
      |           || chr(10) || 'boiler' AS t
      |  FROM dirty0),
      |plines AS (
      |  SELECT doc_id, lang, unnest(string_split(t, chr(10))) AS line,
      |         generate_subscripts(string_split(t, chr(10)), 1) AS ord
      |  FROM planted),
      |pfirsts AS (
      |  SELECT doc_id, lang, line, ord,
      |         row_number() OVER (PARTITION BY doc_id, line ORDER BY ord) AS rn
      |  FROM plines),
      |dirty AS (
      |  SELECT doc_id, lang, string_agg(line, chr(10) ORDER BY ord) AS t
      |  FROM pfirsts WHERE rn = 1 GROUP BY doc_id, lang)""".stripMargin

  /** The (source, doc_id)-residue URL plant + host parse shared by the
    * x14_url_stage and x14_domain_cap oracles — ONE definition,
    * mirroring the ONE Spark-side [[graft.Queries]] plantedUrl.
    * `h.nowww` = the lowercased, userinfo- and `www.`-stripped,
    * port-BEARING host; `h.pathq` = the path+query remainder. */
  private val urlPlantCtes: String =
    """u AS (
      |  SELECT doc_id,
      |         (CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'https' END)
      |         || '://'
      |         || (CASE WHEN doc_id % 23 = 0 THEN 'crawler@' ELSE '' END)
      |         || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
      |         || (CASE WHEN doc_id % 13 = 0 THEN 'cdn.' ELSE '' END)
      |         || source || '.example.org'
      |         || (CASE WHEN doc_id % 5 = 0 THEN
      |               (CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE ':443' END)
      |             WHEN doc_id % 19 = 0 THEN ':8080'
      |             ELSE '' END)
      |         || '/doc/' || (doc_id % 50)
      |         || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
      |         || (CASE WHEN doc_id % 11 = 0 THEN '?page=2' ELSE '' END)
      |         || (CASE WHEN doc_id % 7 = 0 THEN '#sec' || doc_id ELSE '' END)
      |           AS url
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, url,
      |         lower(regexp_replace(t, '://.*', '')) AS scheme,
      |         regexp_replace(t, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
      |  FROM (SELECT doc_id, url, regexp_replace(trim(url), '(?s)#.*', '') AS t
      |        FROM u)),
      |h AS (
      |  SELECT doc_id, url, scheme,
      |         regexp_replace(regexp_replace(
      |             lower(regexp_replace(rest, '[/?].*', '')),
      |             '^[^@/?]*@', ''),
      |           '^www\.', '') AS nowww,
      |         regexp_replace(rest, '^[^/?]+', '') AS pathq
      |  FROM p)""".stripMargin

  /** The TextClean chain over `dirty` → `c4(doc_id, lang, t, clean)`:
    * script/style element removal (explicit alternation — RE2 has no
    * backreferences), tag→space strip, single-pass entity replaces
    * (&amp; LAST), whitespace collapse. Shared like [[dirtyCte]]. */
  private val cleanCtes: String =
    raw"""c1 AS (SELECT doc_id, lang, t, regexp_replace(t,
      |         '(?is)<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>',
      |         ' ', 'g') AS s FROM dirty),
      |c2 AS (SELECT doc_id, lang, t, regexp_replace(s, '(?s)<[^>]*>', ' ', 'g') AS s
      |       FROM c1),
      |c3 AS (SELECT doc_id, lang, t,
      |         replace(replace(replace(replace(replace(replace(s,
      |           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |           '&apos;', ''''), '&#39;', ''''), '&nbsp;', ' ') AS s
      |       FROM c2),
      |c4 AS (SELECT doc_id, lang, t,
      |         trim(regexp_replace(replace(s, '&amp;', '&'), '\s+', ' ', 'g'))
      |           AS clean
      |       FROM c3)""".stripMargin

  /** The cross-shard plant replayed: history = docs < 300 (as a norm
    * set), shard = docs >= 300 plus re-keyed copies of docs < 10
    * (+10000) and docs < 5 (+20000). Intra-shard keep = min doc_id per
    * norm; history drop via NOT EXISTS on norm equality — the
    * null-safe analog of Spark's left_anti on the md5 fingerprint (md5
    * is injective up to collision, so norm equality = fp equality).
    * ONE definition bound to BOTH x1_incremental_dedup and
    * x1_bloom_dedup: the Bloom-gated path claims result-identity with
    * the plain anti join, so they must hash against the same replay. */
  private val incrementalDedupSql: String =
    """WITH hist AS (
      |  SELECT DISTINCT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
      |  FROM documents WHERE doc_id < 300),
      |shard AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id >= 300
      |  UNION ALL
      |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 10
      |  UNION ALL
      |  SELECT doc_id + 20000, text FROM documents WHERE doc_id < 5),
      |s AS (
      |  SELECT doc_id,
      |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
      |  FROM shard),
      |intra AS (
      |  SELECT doc_id, norm,
      |         min(doc_id) OVER (PARTITION BY norm) AS keep_id
      |  FROM s)
      |SELECT doc_id FROM intra i
      |WHERE doc_id = keep_id
      |  AND NOT EXISTS (SELECT 1 FROM hist h WHERE h.norm = i.norm)
      |ORDER BY doc_id""".stripMargin

  /** X17 soft dedup replayed INDEPENDENTLY: a window census (count per
    * normalized text — SQL windows and GROUP BY both put nulls in one
    * partition, matching Spark's groupBy-null semantics) instead of
    * the engine's aggregate + null-safe join, and the weight as
    * floor(10⁶/n) over the same exact-by-margin division (see
    * [[graft.ext.Dedup.softDedupWeights]]). Same planted universe as
    * [[incrementalDedupSql]] (+10000/+20000 re-keys). */
  private val softDedupSql: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 10
      |  UNION ALL
      |  SELECT doc_id + 20000, text FROM documents WHERE doc_id < 5),
      |n AS (
      |  SELECT doc_id,
      |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
      |  FROM all_docs)
      |SELECT doc_id,
      |       count(*) OVER (PARTITION BY norm) AS soft_dup_count,
      |       CAST(floor(1000000.0 / count(*) OVER (PARTITION BY norm))
      |            AS BIGINT) AS soft_weight_ppm
      |FROM n ORDER BY doc_id""".stripMargin

  /** The DSIR weight pipeline ([[graft.ext.Dsir]]) replayed: md5-prefix
    * bucket hash, unigram+bigram censuses of target (docs < 300) and raw
    * (docs ≥ 300), the JM-smoothed per-bucket log-ratio rounded ONCE to
    * integer micro-nats, per-doc sums. ONE definition shared by
    * x16_dsir_weights and x16_dsir_select — a smoothing or hashing
    * change cannot desynchronize them. The λ factor and the
    * pre-computed uniform floor (1−λ)/B interpolate from the Scala
    * constants (as does the bucket modulus), so both engines evaluate
    * the IDENTICAL doubles in the identical association.
    *
    * Residual cross-engine risk (here and x15): `ln` is the one
    * non-IEEE-exact op in any oracle — the JVM's and DuckDB's libm may
    * differ by ~1 ulp, which flips a micro-nat integer only if the
    * pre-round value sits within that ulp of a .5 boundary.
    * MicroNatSlackSpec measures that slack over the verify corpus and
    * pins it at ≥1e-6 (~250 ulps), so the hash compare is robust to
    * any faithfully-rounding libm pair. */
  /** Per-document Gopher rule replay under the DEFAULT English preset
    * (stopwords a/the/and/of, ASCII symbol class, 50..100000 tokens,
    * mean token length 3..10, ≥2 stopword hits) — from `gsrc(doc_id,
    * t)` (text pre-coalesced to '') to `gpass(doc_id, gpass)`. The
    * rule formulations mirror the x3_gopher_rules oracle's list
    * machinery (adjacency-built gram lists, count-tie-to-longest
    * top-gram coverage, dup char mass = total − count-1 mass), reduced
    * to the single-preset per-doc verdict the x10 gopher funnel joins
    * on. All CTE names are g-prefixed — the funnel oracle surrounds
    * this with norm/rdoc/contam CTEs of its own. */
  private def gopherPassCtes: String = gopherPassCtesImpl(byLang = false)

  /** [[gopherPassCtes]] with the per-language preset dispatch replayed
    * per document (`gsrc` must also carry `lang`): language-cased
    * tokenization (zh/ja/ko character tokens), stop lists and script
    * symbol classes interpolated from the SAME Scala preset catalog
    * the engine dispatches on (config data — the rule logic stays an
    * independent SQL restatement), and the CJK mean-token-length
    * floor of 1. */
  private def gopherPassByLangCtes: String = gopherPassCtesImpl(byLang = true)

  private def gopherPassCtesImpl(byLang: Boolean): String = {
    val gramLists = (5 to 10).map { k =>
      val cat = (0 until k).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
      s"""         CASE WHEN len(toks) >= $k THEN list_transform(range(1, len(toks) - ${k - 2}),
         |                i -> $cat)
         |              ELSE CAST([] AS VARCHAR[]) END AS g$k""".stripMargin
    }.mkString(",\n")
    val dupMasses = (5 to 10).map { k =>
      s"""         CAST(coalesce(list_sum(list_transform(g$k, x -> length(x))), 0) AS BIGINT)
         |           - CAST(coalesce(list_sum(list_transform(
         |               list_filter(list_distinct(g$k),
         |                 u -> len(list_filter(g$k, x -> x = u)) = 1),
         |               u -> length(u))), 0) AS BIGINT) AS dup$k""".stripMargin
    }.mkString(",\n")
    val thr = Map(5 -> (20, 3), 6 -> (50, 7), 7 -> (100, 13),
      8 -> (25, 3), 9 -> (100, 11), 10 -> (10, 1))
    val dupNotHeavy = (5 to 10).map { k =>
      val (a, b) = thr(k)
      s"NOT ($a * dup$k > $b * n_chars)"
    }.mkString("\n               AND ")
    // Language-dispatched pieces (byLang mode): tokenization, token
    // count, mean-token-length floor, stop list, and symbol class —
    // the x3_gopher_rules oracle's dispatch, per document.
    val langCol = if (byLang) "lang," else ""
    val toksExpr =
      if (byLang)
        raw"""CASE WHEN lang IN ('zh', 'ja', 'ko')
          |              THEN regexp_extract_all(t, '\S')
          |              ELSE string_split_regex(trim(t), '\s+') END""".stripMargin
      else raw"string_split_regex(trim(t), '\s+')"
    val nTokensExpr =
      if (byLang)
        """CASE WHEN lang IN ('zh', 'ja', 'ko') THEN len(toks)
          |              WHEN len(trim(t)) = 0 THEN 0 ELSE len(toks) END""".stripMargin
      else "CASE WHEN len(trim(t)) = 0 THEN 0 ELSE len(toks) END"
    val minMtlExpr =
      if (byLang) "CASE WHEN lang IN ('zh', 'ja', 'ko') THEN 1 ELSE 3 END"
      else "3"
    val stopExpr =
      if (byLang) "CASE lang " +
        graft.ext.TextAnalysis.gopherPresets.toSeq.sortBy(_._1).map {
          case (l, p) =>
            s"WHEN '$l' THEN [${p.stopwords.map(w => s"'$w'").mkString(", ")}]"
        }.mkString(" ") + " ELSE ['a', 'the', 'and', 'of'] END"
      else "['a', 'the', 'and', 'of']"
    val symExpr =
      if (byLang)
        raw"""CASE
          |           WHEN lang = 'zh' THEN length(t) - length(regexp_replace(t,
          |             '[^\x{4e00}-\x{9fff}0-9\s]', '', 'g'))
          |           WHEN lang = 'ja' THEN length(t) - length(regexp_replace(t,
          |             '[^\x{4e00}-\x{9fff}\x{3040}-\x{30ff}0-9\s]', '', 'g'))
          |           WHEN lang = 'ko' THEN length(t) - length(regexp_replace(t,
          |             '[^\x{ac00}-\x{d7a3}0-9\s]', '', 'g'))
          |           WHEN lang IN ('es', 'fr', 'de')
          |             THEN length(t) - length(regexp_replace(t,
          |               '[^A-Za-z\x{c0}-\x{d6}\x{d8}-\x{f6}\x{f8}-\x{ff}0-9\s]', '', 'g'))
          |           ELSE length(t) - length(regexp_replace(t,
          |             '[^A-Za-z0-9\s]', '', 'g')) END""".stripMargin
      else raw"length(t) - length(regexp_replace(t, '[^A-Za-z0-9\s]', '', 'g'))"
    raw"""gd AS (
      |  SELECT doc_id, $langCol t,
      |         $toksExpr AS toks
      |  FROM gsrc),
      |gg AS (
      |  SELECT doc_id, $langCol t, toks,
      |         CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
      |                i -> toks[i] || ' ' || toks[i + 1])
      |              ELSE CAST([] AS VARCHAR[]) END AS bg,
      |         CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
      |                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
      |              ELSE CAST([] AS VARCHAR[]) END AS tg,
      |         CASE WHEN len(toks) >= 4 THEN list_transform(range(1, len(toks) - 2),
      |                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
      |                       || ' ' || toks[i + 3])
      |              ELSE CAST([] AS VARCHAR[]) END AS qg,
      |$gramLists,
      |         list_filter(string_split_regex(t, '\n'),
      |                     l -> length(l) > 0) AS lns,
      |         list_filter(string_split_regex(t, '\n{2,}'),
      |                     q -> length(trim(q)) > 0) AS paras
      |  FROM gd),
      |ggm AS (
      |  SELECT *,
      |         coalesce(list_max(list_transform(list_distinct(bg),
      |           u -> len(list_filter(bg, x -> x = u)))), 0) AS mc2,
      |         coalesce(list_max(list_transform(list_distinct(tg),
      |           u -> len(list_filter(tg, x -> x = u)))), 0) AS mc3,
      |         coalesce(list_max(list_transform(list_distinct(qg),
      |           u -> len(list_filter(qg, x -> x = u)))), 0) AS mc4
      |  FROM gg),
      |gm AS (
      |  SELECT doc_id,
      |         $nTokensExpr AS n_tokens,
      |         $minMtlExpr AS min_mtl,
      |         CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
      |              AS BIGINT) AS sum_tok_len,
      |         length(t) AS n_chars,
      |         $symExpr
      |           AS n_symbols,
      |         len(list_filter($stopExpr,
      |                         s -> list_contains(toks, s))) AS stop_hits,
      |         len(bg) AS n_bigrams,
      |         len(bg) - len(list_distinct(bg)) AS dup_bigrams,
      |         len(lns) AS n_lines,
      |         len(lns) - len(list_distinct(lns)) AS dup_lines,
      |         len(paras) AS n_paras,
      |         len(paras) - len(list_distinct(paras)) AS dup_paras,
      |         CAST(coalesce(list_sum(list_transform(lns, l -> length(l))), 0) AS BIGINT)
      |           - CAST(coalesce(list_sum(list_transform(list_distinct(lns),
      |               l -> length(l))), 0) AS BIGINT) AS dup_line_chars,
      |         CAST(coalesce(list_sum(list_transform(paras, q -> length(q))), 0) AS BIGINT)
      |           - CAST(coalesce(list_sum(list_transform(list_distinct(paras),
      |               q -> length(q))), 0) AS BIGINT) AS dup_para_chars,
      |         CAST(mc2 AS BIGINT) * coalesce(list_max(list_transform(
      |           list_filter(list_distinct(bg),
      |             u -> len(list_filter(bg, x -> x = u)) = mc2),
      |           u -> length(u))), 0) AS c2,
      |         CAST(mc3 AS BIGINT) * coalesce(list_max(list_transform(
      |           list_filter(list_distinct(tg),
      |             u -> len(list_filter(tg, x -> x = u)) = mc3),
      |           u -> length(u))), 0) AS c3,
      |         CAST(mc4 AS BIGINT) * coalesce(list_max(list_transform(
      |           list_filter(list_distinct(qg),
      |             u -> len(list_filter(qg, x -> x = u)) = mc4),
      |           u -> length(u))), 0) AS c4,
      |$dupMasses
      |  FROM ggm),
      |gpass AS (
      |  SELECT doc_id,
      |         (n_tokens >= 50 AND n_tokens <= 100000
      |          AND min_mtl * n_tokens <= sum_tok_len AND sum_tok_len <= 10 * n_tokens
      |          AND NOT (10 * n_symbols > n_chars)
      |          AND stop_hits >= 2
      |          AND NOT (n_bigrams > 0 AND 5 * dup_bigrams >= n_bigrams)
      |          AND NOT (10 * dup_lines > 3 * n_lines)
      |          AND NOT (10 * dup_paras > 3 * n_paras)
      |          AND NOT (5 * dup_line_chars > n_chars)
      |          AND NOT (5 * dup_para_chars > n_chars)
      |          AND NOT (5 * c2 > n_chars)
      |          AND NOT (50 * c3 > 9 * n_chars)
      |          AND NOT (25 * c4 > 4 * n_chars)
      |          AND $dupNotHeavy) AS gpass
      |  FROM gm)""".stripMargin
  }

  /** The bigram stupid-backoff replay — ONE definition bound to BOTH
    * x15_lm_ppl (fresh train) and x15_lm_against (saved-model probe):
    * counts from docs < 300, each gram's log-prob rounded ONCE to
    * integer micro-nats (round(1e6·ln p); backoff ln 0.4 pre-rounded
    * and ADDED as an integer — the split the Scala side documents), so
    * the per-doc sum and the cross-multiplied band cut are exact
    * integer arithmetic. The backoff and band-cut integers interpolate
    * from NgramLm (one definition — they cannot drift from the
    * engine). lm_ppl re-derives from the integer sum at 3 dp. */
  private val lmPplSql: String =
    s"""WITH norm AS (
      |  SELECT doc_id,
      |         lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g'))) AS t
      |  FROM documents),
      |rtoks AS (
      |  SELECT doc_id, unnest(string_split(t, ' ')) AS tok,
      |         generate_subscripts(string_split(t, ' '), 1) AS ord
      |  FROM norm WHERE doc_id < 300 AND t <> ''),
      |uni AS (SELECT tok AS w, count(*) AS c1 FROM rtoks GROUP BY 1),
      |big AS (
      |  SELECT w1, w2, count(*) AS c2 FROM (
      |    SELECT tok AS w1,
      |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
      |    FROM rtoks) WHERE w2 IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS total_toks,
      |               count(*) AS vocab FROM uni),
      |ptoks AS (
      |  SELECT doc_id, unnest(string_split(t, ' ')) AS tok,
      |         generate_subscripts(string_split(t, ' '), 1) AS ord
      |  FROM norm WHERE doc_id >= 300 AND t <> ''),
      |probe AS (
      |  SELECT doc_id, w1, w2, count(*) AS m FROM (
      |    SELECT doc_id, tok AS w1,
      |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
      |    FROM ptoks) WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
      |g AS (
      |  SELECT p.doc_id, p.m, b.c2,
      |         CASE WHEN b.c2 IS NOT NULL THEN
      |           CAST(round(1000000 * ln(CAST(b.c2 AS DOUBLE) / u1.c1)) AS BIGINT)
      |         ELSE ${graft.ext.NgramLm.BackoffMicro} + CAST(round(1000000 * ln(
      |           CAST(coalesce(u2.c1, 0) + 1 AS DOUBLE)
      |             / (t.total_toks + t.vocab))) AS BIGINT)
      |         END AS micro
      |  FROM probe p
      |  LEFT JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
      |  LEFT JOIN uni u1 ON p.w1 = u1.w
      |  LEFT JOIN uni u2 ON p.w2 = u2.w
      |  CROSS JOIN tot t),
      |per AS (
      |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS lm_grams,
      |         CAST(sum(CASE WHEN c2 IS NOT NULL THEN m ELSE 0 END) AS BIGINT)
      |           AS lm_hits,
      |         CAST(sum(m * micro) AS BIGINT) AS lm_logp_micro
      |  FROM g GROUP BY 1)
      |SELECT d.doc_id,
      |       coalesce(lm_grams, 0) AS lm_grams,
      |       coalesce(lm_hits, 0) AS lm_hits,
      |       coalesce(lm_logp_micro, 0) AS lm_logp_micro,
      |       CASE WHEN coalesce(lm_grams, 0) > 0
      |            THEN round(exp(-CAST(lm_logp_micro AS DOUBLE) / 1000000
      |                           / lm_grams), 3) END AS lm_ppl,
      |       CASE WHEN coalesce(lm_grams, 0) = 0 THEN 'empty'
      |            WHEN lm_logp_micro >= ${graft.ext.NgramLm.HeadMicro} * lm_grams THEN 'head'
      |            WHEN lm_logp_micro >= ${graft.ext.NgramLm.TailMicro} * lm_grams THEN 'middle'
      |            ELSE 'tail' END AS lm_band
      |FROM (SELECT doc_id FROM documents WHERE doc_id >= 300) d
      |LEFT JOIN per USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** SCD-2 snapshot merge replay: same plants, branch-by-branch
    * unions; IS DISTINCT FROM mirrors the engine's null-safe change
    * test (a null acctbal +50 stays null → unchanged in BOTH engines).
    * ONE definition bound to BOTH t4_scd2_snapshot and s7_stream_scd2:
    * the streaming lane's key-partitioned micro-batch replay claims
    * composition to the one-shot merge, so it must hash against the
    * same replay (the x1_incremental/x1_bloom sharing rule). */
  /** The shared X42/S14 oracle: the validity join replayed as the
    * NAIVE key + BETWEEN left join (non-overlapping versions -> at
    * most one match, so the left join is row-preserving); the plant
    * -- keyed boundaries, the dropped silver version, the gap -- is
    * re-derived from scratch.  */
  /** The shared X50/S15 oracle — the parse+flatten replayed as pure
    * doc_id arithmetic (the JSON is constructed from doc_id): author/
    * tag/score derive directly, the two tag array slots become two
    * UNION ALL arms, pinning explode (not set) semantics. */
  private val nestedFlattenSql: String =
      // directly, the two tag array slots become two UNION ALL arms —
      // so a same-value collision (id ≡ v mod 3 AND mod 7) yields two
      // rows, pinning explode (not set) semantics.
      """WITH f AS (
        |  SELECT 'u' || (doc_id % 50) AS author,
        |         't' || (doc_id % 3) AS tag,
        |         doc_id % 100 AS score
        |  FROM documents
        |  UNION ALL
        |  SELECT 'u' || (doc_id % 50), 't' || (doc_id % 7),
        |         doc_id % 100
        |  FROM documents)
        |SELECT author, tag, count(*) AS n,
        |       CAST(sum(score) AS BIGINT) AS score_sum
        |FROM f GROUP BY 1, 2 ORDER BY author, tag""".stripMargin

  private val scd2EnrichSql: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v1 AS (SELECT user_id, 'bronze' AS tier,
        |              TIMESTAMP '2024-01-01 00:00:00' AS vf,
        |              CAST(DATE '2024-01-08' + (user_id % 7) * INTERVAL 1 DAY
        |                   AS TIMESTAMP) AS vt
        |       FROM u),
        |v2 AS (SELECT user_id, 'silver' AS tier,
        |              CAST(DATE '2024-01-08' + (user_id % 7) * INTERVAL 1 DAY
        |                   AS TIMESTAMP) AS vf,
        |              CAST(DATE '2024-01-18' + (user_id % 9) * INTERVAL 1 DAY
        |                   AS TIMESTAMP) AS vt
        |       FROM u WHERE user_id % 11 <> 0),
        |v3 AS (SELECT user_id, 'gold' AS tier,
        |              CAST(DATE '2024-01-18' + (user_id % 9) * INTERVAL 1 DAY
        |                   AS TIMESTAMP) AS vf,
        |              CAST(NULL AS TIMESTAMP) AS vt
        |       FROM u),
        |dim AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2
        |        UNION ALL SELECT * FROM v3)
        |SELECT e.event_id, e.user_id, d.tier AS dim_tier,
        |       d.vf AS dim_valid_from
        |FROM events e LEFT JOIN dim d
        |  ON e.user_id = d.user_id AND e.ts >= d.vf
        |     AND (d.vt IS NULL OR e.ts < d.vt)
        |ORDER BY event_id""".stripMargin

  private val scd2SnapshotSql: String =
      """WITH hist_closed AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal - 100 AS c_acctbal,
        |         DATE '2025-06-01' AS valid_from,
        |         DATE '2026-01-01' AS valid_to, FALSE AS is_current
        |  FROM customer WHERE c_custkey % 50 = 0
        |), open_rows AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |), upd AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 50
        |              ELSE c_acctbal END AS c_acctbal
        |  FROM customer
        |  WHERE NOT (c_custkey % 7 = 0 AND c_custkey % 10 <> 0)
        |  UNION ALL
        |  SELECT c_custkey + (SELECT (CAST(floor(max(c_custkey) / 100000.0)
        |                              AS BIGINT) + 1) * 100000 FROM customer),
        |         c_mktsegment, c_acctbal
        |  FROM customer WHERE c_custkey <= 5
        |), open_judged AS (
        |  SELECT o.c_custkey, o.c_mktsegment, o.c_acctbal,
        |         (u.c_custkey IS NOT NULL AND
        |          (o.c_mktsegment IS DISTINCT FROM u.c_mktsegment OR
        |           o.c_acctbal   IS DISTINCT FROM u.c_acctbal)) AS chg
        |  FROM open_rows o LEFT JOIN upd u ON o.c_custkey = u.c_custkey
        |)
        |SELECT c_custkey, c_mktsegment, c_acctbal, valid_from, valid_to,
        |       is_current
        |FROM (
        |  SELECT * FROM hist_closed
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |         DATE '2026-01-01' AS valid_from,
        |         CASE WHEN chg THEN DATE '2026-02-01' END AS valid_to,
        |         NOT chg AS is_current
        |  FROM open_judged
        |  UNION ALL
        |  SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
        |         DATE '2026-02-01', CAST(NULL AS DATE), TRUE
        |  FROM upd u LEFT JOIN open_rows o ON u.c_custkey = o.c_custkey
        |  WHERE o.c_custkey IS NULL
        |     OR o.c_mktsegment IS DISTINCT FROM u.c_mktsegment
        |     OR o.c_acctbal   IS DISTINCT FROM u.c_acctbal
        |) ORDER BY c_custkey, valid_from""".stripMargin

  /** Keeper-policy incremental dedup replay — ONE definition bound to
    * BOTH x1_keepbest_against and x1_keepbest_bloom (the Bloom-gated
    * path is result-identical by construction, the x1_bloom_dedup
    * sharing rule). */
  private val keepbestAgainstSql: String =
      """WITH hist AS (
        |  SELECT DISTINCT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
        |  FROM documents WHERE doc_id < 300),
        |shard AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 300
        |  UNION ALL
        |  SELECT doc_id + 10000, '  ' || text || '  '
        |  FROM documents WHERE doc_id >= 300 AND doc_id < 310
        |  UNION ALL
        |  SELECT doc_id + 30000, '  ' || text || '  '
        |  FROM documents WHERE doc_id < 10),
        |s AS (
        |  SELECT doc_id, text,
        |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
        |  FROM shard),
        |keep AS (
        |  SELECT doc_id, norm,
        |         row_number() OVER (
        |           PARTITION BY norm
        |           ORDER BY coalesce(length(text), -1) DESC, doc_id) AS rn
        |  FROM s)
        |SELECT doc_id FROM keep k
        |WHERE rn = 1
        |  AND NOT EXISTS (SELECT 1 FROM hist h WHERE h.norm = k.norm)
        |ORDER BY doc_id""".stripMargin

  /** The order-n stupid-backoff replay, generated for any n — the
    * x15_lm_ppl / x15_lm_ppl3 shape generalized exactly as the engine's
    * `NgramLm.scoredN` generalizes the scorers: per order-k census one
    * lead() CTE, per backoff level one hit join (order k on the LAST k
    * probe words) + one context join (order k−1 minus the final word),
    * each CASE arm `(n−k)·BackoffMicro` ADDED as an integer plus ONE
    * rounded ln — never the 0.4-power folded into the rounding. */
  private def lmPplSqlN(n: Int): String = {
    val b = graft.ext.NgramLm.BackoffMicro
    def ws(from: Int, to: Int) = (from to to).map(i => s"w$i")
    def leads(k: Int) = (2 to k).map(j =>
      s"lead(tok, ${j - 1}) OVER (PARTITION BY doc_id ORDER BY ord) AS w$j")
      .mkString(",\n         ")
    def gramCte(k: Int) =
      s"""g$k AS (
         |  SELECT ${ws(1, k).mkString(", ")}, count(*) AS c$k FROM (
         |    SELECT tok AS w1,
         |         ${leads(k)}
         |    FROM rtoks) WHERE w$k IS NOT NULL
         |  GROUP BY ${(1 to k).mkString(", ")})""".stripMargin
    val hitJoins = (n to 2 by -1).flatMap { k =>
      val off = n - k
      val hit = s"LEFT JOIN g$k h$k ON " +
        (1 to k).map(i => s"p.w${i + off} = h$k.w$i").mkString(" AND ")
      val ctx =
        if (k - 1 == 1) s"LEFT JOIN uni x$k ON p.w${n - 1} = x$k.w"
        else s"LEFT JOIN g${k - 1} x$k ON " +
          (1 to k - 1).map(i => s"p.w${i + off} = x$k.w$i").mkString(" AND ")
      Seq(hit, ctx)
    }.mkString("\n  ")
    val arms = (n to 2 by -1).map { k =>
      val ctxCnt = if (k - 1 == 1) s"x$k.c1" else s"x$k.c${k - 1}"
      val pre = if (k == n) "" else s"${(n - k).toLong * b} + "
      s"""WHEN h$k.c$k IS NOT NULL THEN
         |           ${pre}CAST(round(1000000 * ln(
         |             CAST(h$k.c$k AS DOUBLE) / $ctxCnt)) AS BIGINT)"""
        .stripMargin
    }.mkString("\n         ")
    s"""WITH norm AS (
       |  SELECT doc_id,
       |         lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g'))) AS t
       |  FROM documents),
       |rtoks AS (
       |  SELECT doc_id, unnest(string_split(t, ' ')) AS tok,
       |         generate_subscripts(string_split(t, ' '), 1) AS ord
       |  FROM norm WHERE doc_id < 300 AND t <> ''),
       |uni AS (SELECT tok AS w, count(*) AS c1 FROM rtoks GROUP BY 1),
       |${(2 to n).map(gramCte).mkString(",\n")},
       |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS total_toks,
       |               count(*) AS vocab FROM uni),
       |ptoks AS (
       |  SELECT doc_id, unnest(string_split(t, ' ')) AS tok,
       |         generate_subscripts(string_split(t, ' '), 1) AS ord
       |  FROM norm WHERE doc_id >= 300 AND t <> ''),
       |probe AS (
       |  SELECT doc_id, ${ws(1, n).mkString(", ")}, count(*) AS m FROM (
       |    SELECT doc_id, tok AS w1,
       |         ${leads(n)}
       |    FROM ptoks) WHERE w$n IS NOT NULL
       |  GROUP BY ${(1 to n + 1).mkString(", ")}),
       |g AS (
       |  SELECT p.doc_id, p.m, h$n.c$n,
       |         CASE $arms
       |         ELSE ${(n - 1).toLong * b} + CAST(round(1000000 * ln(
       |           CAST(coalesce(cu.c1, 0) + 1 AS DOUBLE)
       |             / (t.total_toks + t.vocab))) AS BIGINT)
       |         END AS micro
       |  FROM probe p
       |  $hitJoins
       |  LEFT JOIN uni cu ON p.w$n = cu.w
       |  CROSS JOIN tot t),
       |per AS (
       |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS lm_grams,
       |         CAST(sum(CASE WHEN c$n IS NOT NULL THEN m ELSE 0 END) AS BIGINT)
       |           AS lm_hits,
       |         CAST(sum(m * micro) AS BIGINT) AS lm_logp_micro
       |  FROM g GROUP BY 1)
       |SELECT d.doc_id,
       |       coalesce(lm_grams, 0) AS lm_grams,
       |       coalesce(lm_hits, 0) AS lm_hits,
       |       coalesce(lm_logp_micro, 0) AS lm_logp_micro,
       |       CASE WHEN coalesce(lm_grams, 0) > 0
       |            THEN round(exp(-CAST(lm_logp_micro AS DOUBLE) / 1000000
       |                           / lm_grams), 3) END AS lm_ppl,
       |       CASE WHEN coalesce(lm_grams, 0) = 0 THEN 'empty'
       |            WHEN lm_logp_micro >= ${graft.ext.NgramLm.HeadMicro} * lm_grams THEN 'head'
       |            WHEN lm_logp_micro >= ${graft.ext.NgramLm.TailMicro} * lm_grams THEN 'middle'
       |            ELSE 'tail' END AS lm_band
       |FROM (SELECT doc_id FROM documents WHERE doc_id >= 300) d
       |LEFT JOIN per USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  private val dsirWeightCtes: String = {
    val lam = graft.ext.Dsir.DefaultLambda
    val nb = graft.ext.Dsir.DefaultBuckets
    val unif = (1.0 - lam) / nb
    s"""norm AS (
       |  SELECT doc_id,
       |         lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g'))) AS t
       |  FROM documents),
       |ttoks AS (
       |  SELECT doc_id, unnest(string_split(t, ' ')) AS tok,
       |         generate_subscripts(string_split(t, ' '), 1) AS ord
       |  FROM norm WHERE doc_id < 300 AND t <> ''),
       |tgrams AS (
       |  SELECT tok AS g FROM ttoks
       |  UNION ALL
       |  SELECT w1 || ' ' || w2 FROM (
       |    SELECT tok AS w1,
       |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
       |    FROM ttoks) WHERE w2 IS NOT NULL),
       |tc AS (
       |  SELECT CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % $nb AS bucket,
       |         count(*) AS ct
       |  FROM tgrams GROUP BY 1),
       |rtoks AS (
       |  SELECT doc_id, unnest(string_split(t, ' ')) AS tok,
       |         generate_subscripts(string_split(t, ' '), 1) AS ord
       |  FROM norm WHERE doc_id >= 300 AND t <> ''),
       |rgrams AS (
       |  SELECT doc_id, tok AS g FROM rtoks
       |  UNION ALL
       |  SELECT doc_id, w1 || ' ' || w2 FROM (
       |    SELECT doc_id, tok AS w1,
       |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
       |    FROM rtoks) WHERE w2 IS NOT NULL),
       |probe AS (
       |  SELECT doc_id,
       |         CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % $nb AS bucket,
       |         count(*) AS m
       |  FROM rgrams GROUP BY 1, 2),
       |rc AS (SELECT bucket, CAST(sum(m) AS BIGINT) AS cr FROM probe GROUP BY 1),
       |tot AS (
       |  SELECT (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tc) AS nt,
       |         (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) FROM rc) AS nr),
       |gm AS (
       |  SELECT p.doc_id, p.m,
       |         CAST(round(1000000 * ln(
       |           ($lam * (CAST(coalesce(tc.ct, 0) AS DOUBLE) / greatest(t.nt, 1)) + $unif)
       |           / ($lam * (CAST(coalesce(rc.cr, 0) AS DOUBLE) / greatest(t.nr, 1)) + $unif)
       |         )) AS BIGINT) AS micro
       |  FROM probe p
       |  LEFT JOIN tc USING (bucket)
       |  LEFT JOIN rc USING (bucket)
       |  CROSS JOIN tot t),
       |per AS (
       |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS dsir_grams,
       |         CAST(sum(m * micro) AS BIGINT) AS dsir_logw_micro
       |  FROM gm GROUP BY 1),
       |w AS (
       |  SELECT d.doc_id,
       |         coalesce(dsir_grams, 0) AS dsir_grams,
       |         coalesce(dsir_logw_micro, 0) AS dsir_logw_micro
       |  FROM (SELECT doc_id FROM documents WHERE doc_id >= 300) d
       |  LEFT JOIN per USING (doc_id))""".stripMargin
  }

  /** X3k learned-language-ID replay pieces — generated FROM the Scala
    * constants ([[graft.ext.LangTrained.Langs]]/`langProfiles`) so a
    * profile or class change cannot desynchronize the oracle. Feature
    * expressions in [[graft.ext.LangTrained.FeatureCols]] order:
    * bias, per-language stopword hits, script char counts, token
    * count — every one an exact integer. */
  private val langFeatExprs: Seq[String] = {
    val hits = graft.ext.TextAnalysis.langProfiles.toSeq.sortBy(_._1)
      .map { case (_, ws) =>
        "COALESCE(len(list_filter(string_split_regex(trim(lower(text)), " +
          raw"'\s+'), x -> list_contains([" +
          ws.map(w => s"'$w'").mkString(",") + "], x))), 0)"
      }
    ("1" +: hits) ++ Seq(
      raw"COALESCE(length(text) - length(regexp_replace(text, '[\x{3040}-\x{30ff}]', '', 'g')), 0)",
      raw"COALESCE(length(text) - length(regexp_replace(text, '[\x{ac00}-\x{d7a3}]', '', 'g')), 0)",
      raw"COALESCE(length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')), 0)",
      raw"CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 0" +
        raw" ELSE len(string_split_regex(trim(text), '\s+')) END")
  }

  /** The labeled integer-feature CTE (`lf`): lang + x0..x8. */
  private val langFeatCte: String =
    "lf AS (SELECT lang,\n  " +
      langFeatExprs.zipWithIndex
        .map { case (e, i) => s"$e AS x$i" }.mkString(",\n  ") +
      "\n  FROM documents)"

  /** Per-class chained epoch CTEs (the x30 trajectory replay, one
    * chain per one-vs-rest class): e{k}_{lang} / w{k}_{lang}. */
  private def langTrajCtes(epochs: Int): String = {
    val dim = langFeatExprs.size
    graft.ext.LangTrained.Langs.map { l =>
      val y = s"(CASE WHEN lang = '$l' THEN 1 ELSE -1 END)"
      (1 to epochs).map { k =>
        val sums = (0 until dim).map(i =>
          s"COALESCE(CAST(sum($y * x$i) AS BIGINT), 0) AS d$i")
          .mkString(",\n         ")
        val (from, margin) =
          if (k == 1) ("lf", "0")
          else (s"lf, w${k - 1}_$l w",
            (0 until dim).map(i => s"w.a$i * x$i").mkString(" + "))
        val wSel = (0 until dim).map(i =>
          if (k == 1) s"e.d$i AS a$i" else s"w.a$i + e.d$i AS a$i")
          .mkString(", ")
        val wFrom =
          if (k == 1) s"e${k}_$l e" else s"e${k}_$l e, w${k - 1}_$l w"
        s"""e${k}_$l AS (
           |  SELECT count(*) AS mis,
           |         $sums
           |  FROM $from WHERE $y * ($margin) <= 0),
           |w${k}_$l AS (SELECT e.mis, $wSel FROM $wFrom)""".stripMargin
      }.mkString(",\n")
    }.mkString(",\n")
  }

  private val langWColNames: Seq[String] =
    graft.ext.LangTrained.FeatureCols.map(f => s"w_$f")

  /** The X3k SERVING replay (see the x3_lang_trained map comment). */
  private def langTrainedSql: String = {
    val dim = langFeatExprs.size
    val langs = graft.ext.LangTrained.Langs
    val ratio = Seq(
      raw"(length(text) - length(regexp_replace(text, '[\x{3040}-\x{30ff}]', '', 'g'))) * 1.0 / greatest(length(text), 1) AS kana",
      raw"(length(text) - length(regexp_replace(text, '[\x{ac00}-\x{d7a3}]', '', 'g'))) * 1.0 / greatest(length(text), 1) AS hang",
      raw"(length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g'))) * 1.0 / greatest(length(text), 1) AS cjk")
    val lf = "lf AS (SELECT lang,\n  " +
      (langFeatExprs.zipWithIndex
        .map { case (e, i) => s"$e AS x$i" } ++ ratio)
        .mkString(",\n  ") + "\n  FROM documents)"
    def xOf(l: String): String = s"x${1 + langs.indexOf(l)}"
    // Heuristic argmax ties to the lexicographically LARGEST language
    // (the engine's array_max over (score, lang) structs) — chain in
    // REVERSE sorted order, ELSE = smallest.
    val rev = langs.reverse
    val heurChain = rev.init.zipWithIndex.map { case (l, j) =>
      val conds = rev.drop(j + 1).map(r => s"${xOf(l)} >= ${xOf(r)}")
        .mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n            ")
    val margins = langs.map(l =>
      "(" + (0 until dim).map(i => s"w$l.a$i * x$i").mkString(" + ") +
        s") AS m_$l").mkString(",\n         ")
    val trainedChain = langs.zipWithIndex.map { case (l, i) =>
      val conds = (s"m_$l > 0" +:
        langs.drop(i + 1).map(r => s"m_$l >= m_$r")).mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n              ")
    "WITH " + lf + ",\n" + langTrajCtes(3) + ",\n" +
      s"""lh AS (
         |  SELECT *,
         |         CASE WHEN kana > 0.05 THEN 'ja'
         |              WHEN hang > 0.3 THEN 'ko'
         |              WHEN cjk > 0.3 THEN 'zh'
         |              WHEN greatest(${langs.map(xOf).mkString(", ")}) = 0 THEN 'und'
         |            $heurChain
         |              ELSE '${rev.last}' END AS pred_heur
         |  FROM lf),
         |sc AS (
         |  SELECT lang AS label, pred_heur,
         |         $margins
         |  FROM lh, ${langs.map(l => s"w3_$l w$l").mkString(", ")}),
         |p AS (
         |  SELECT label, pred_heur,
         |         CASE $trainedChain
         |              ELSE 'und' END AS pred_trained
         |  FROM sc)
         |SELECT label, pred_trained, pred_heur, count(*) AS n
         |FROM p GROUP BY 1, 2, 3
         |ORDER BY label, pred_trained, pred_heur""".stripMargin
  }

  /** X53 BPE-training replay: k chained merge steps over the SAME
    * wrapped-symbol string surgery the engine runs — build the top-W
    * word census, then per step: unwrap → adjacent-pair census →
    * (count DESC, l, r) argmax → non-rescanning `replace` fuse.
    * DuckDB's `replace` and Spark's `StringReplace` share the
    * left-to-right non-rescanning scan, so greedy fusion ([a,a,a] →
    * [aa,a]) and double fusion ([a,b,a,b] → [ab,ab]) agree exactly
    * (probed against DuckDB 1.0.0; pinned in BpeTrainSpec). */
  private def bpeTrajSelect(merges: Int): String = {
    val unions = (1 to merges).map(k =>
      s"""SELECT $k AS step, l AS "left", r AS "right", pc FROM b$k""")
      .mkString("\n  UNION ALL ")
    s"""SELECT CAST(step AS BIGINT) AS step, "left", "right",
       |       "left" || "right" AS merged, pc AS pair_count
       |FROM ($unions)
       |ORDER BY step""".stripMargin
  }

  private def bpeTrainSql(maxWords: Int, merges: Int,
                          fullAlphabet: Boolean = false): String =
    bpeWith(maxWords, merges, fullAlphabet) + "\n" + bpeTrajSelect(merges)

  /** X53-bytes: the byte-level trajectory replay. Census over the
    * café-planted corpus (full-alphabet word gate), then the initial
    * sequence DECOMPOSES each character into its UTF-8 bytes
    * arithmetically from the code point (the encoding rules are
    * closed-form — no blob machinery), each byte wrapped as the
    * mapped symbol chr(256 + b) (the engine's byte↔char bijection,
    * order-isomorphic to byte order so `ORDER BY pc DESC, l, r` IS
    * byte order), and the SAME chained per-step CTEs replay the
    * merges. */
  private def bpeBytesSql(maxWords: Int, merges: Int): String = {
    raw"""WITH t AS (
      |  SELECT text || ' café café café café café café' AS text
      |  FROM documents),
      |w0 AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
      |  FROM t),
      |wc AS MATERIALIZED (
      |  SELECT word, count(*) AS cnt FROM w0
      |  WHERE length(word) > 0
      |    AND NOT (word LIKE '%' || chr(1) || '%'
      |             OR word LIKE '%' || chr(2) || '%')
      |  GROUP BY 1 ORDER BY cnt DESC, word LIMIT $maxWords),
      |s1 AS MATERIALIZED (
      |  SELECT word, cnt,
      |         array_to_string(flatten(list_transform(
      |           string_split(word, ''), c ->
      |           CASE
      |             WHEN unicode(c) < 128 THEN
      |               [chr(1) || chr(256 + unicode(c)) || chr(2)]
      |             WHEN unicode(c) < 2048 THEN
      |               [chr(1) || chr(256 + 192 + unicode(c) // 64)
      |                  || chr(2),
      |                chr(1) || chr(256 + 128 + unicode(c) % 64)
      |                  || chr(2)]
      |             WHEN unicode(c) < 65536 THEN
      |               [chr(1) || chr(256 + 224 + unicode(c) // 4096)
      |                  || chr(2),
      |                chr(1) || chr(256 + 128 + (unicode(c) // 64) % 64)
      |                  || chr(2),
      |                chr(1) || chr(256 + 128 + unicode(c) % 64)
      |                  || chr(2)]
      |             ELSE
      |               [chr(1) || chr(256 + 240 + unicode(c) // 262144)
      |                  || chr(2),
      |                chr(1) || chr(256 + 128 + (unicode(c) // 4096) % 64)
      |                  || chr(2),
      |                chr(1) || chr(256 + 128 + (unicode(c) // 64) % 64)
      |                  || chr(2),
      |                chr(1) || chr(256 + 128 + unicode(c) % 64)
      |                  || chr(2)]
      |           END)), '') AS seq
      |  FROM wc),
      |""".stripMargin + bpeStepCtes(merges) + "\n" + bpeTrajSelect(merges)
  }

  /** X53b tokenize-apply replay: the SAME chained merge CTEs, then the
    * final sequence table s{merges+1} unwraps to the segmented census. */
  private def bpeTokenizeSql(maxWords: Int, merges: Int): String =
    bpeWith(maxWords, merges) + "\n" +
      s"""SELECT word, cnt,
         |       array_to_string(string_split(substr(seq, 2, length(seq) - 2),
         |                       chr(2) || chr(1)), ' ') AS segmented,
         |       CAST(len(string_split(substr(seq, 2, length(seq) - 2),
         |                 chr(2) || chr(1))) AS BIGINT) AS n_symbols
         |FROM s${merges + 1}
         |ORDER BY cnt DESC, word""".stripMargin

  /** The per-document BPE token-count replay: derive the merges from
    * the census chain ([[bpeWith]] — the SAME b$k argmax CTEs the
    * trajectory oracle verifies), then APPLY them to every distinct
    * document word through a second fuse chain (a1…a{k+1}, the same
    * CASE-guarded non-rescanning replace), and aggregate symbol counts
    * per document. Exercises the vocab-table serving shape: each
    * distinct word segments once, documents join by word. */
  /** The apply-chain CTEs a2…a{merges+1} — the trained merges replayed
    * over the distinct-word sequences (shared by the per-doc count and
    * the BPE-budget oracles). */
  private def bpeApplySteps(merges: Int): String =
    (1 to merges).map { k =>
      s"""a${k + 1} AS MATERIALIZED (
         |  SELECT word,
         |         CASE WHEN (SELECT count(*) FROM b$k) = 0 THEN seq
         |              ELSE replace(seq,
         |                chr(1) || (SELECT l FROM b$k) || chr(2) ||
         |                  chr(1) || (SELECT r FROM b$k) || chr(2),
         |                chr(1) || (SELECT l FROM b$k) ||
         |                  (SELECT r FROM b$k) || chr(2))
         |         END AS seq
         |  FROM a$k)""".stripMargin
    }.mkString(",\n")

  /** The shared per-document serving prelude: the word explode (dwf),
    * the distinct-word initial sequences (a1), the apply chain, and
    * the per-word symbol counts (useg). */
  private def bpeServeCtes(merges: Int): String =
    raw"""dwf AS (
      |  SELECT doc_id, word FROM (
      |    SELECT doc_id,
      |           unnest(string_split_regex(trim(lower(text)), '\s+'))
      |             AS word
      |    FROM documents)
      |  WHERE regexp_matches(word, '^[a-z]+${"$"}')),
      |a1 AS MATERIALIZED (
      |  SELECT word,
      |         array_to_string(list_transform(string_split(word, ''),
      |           c -> chr(1) || c || chr(2)), '') AS seq
      |  FROM (SELECT DISTINCT word FROM dwf)),
      |""".stripMargin + bpeApplySteps(merges) + ",\n" +
      s"""useg AS (
         |  SELECT word,
         |         CAST(len(string_split(substr(seq, 2, length(seq) - 2),
         |                   chr(2) || chr(1))) AS BIGINT) AS n_syms
         |  FROM a${merges + 1})""".stripMargin

  /** The X26-bpe budget cut: per-document BPE token counts (the serve
    * chain, LEFT-joined so wordless docs carry 0) cut by the naive
    * global window the staged band plan provably equals. */
  private def bpeBudgetSql(maxWords: Int, merges: Int,
                           budget: Long): String =
    bpeWith(maxWords, merges) + ",\n" + bpeServeCtes(merges) + ",\n" +
      s"""dtok AS (
         |  SELECT d.doc_id, d.source, d.n_chars,
         |         CAST(coalesce(t.bpe, 0) AS BIGINT) AS tokens
         |  FROM documents d LEFT JOIN (
         |    SELECT w.doc_id, sum(u.n_syms) AS bpe
         |    FROM dwf w JOIN useg u USING (word) GROUP BY 1) t
         |    USING (doc_id)),
         |ckum AS (
         |  SELECT doc_id, source, tokens,
         |         sum(tokens) OVER (ORDER BY n_chars DESC, doc_id ASC
         |                           ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM dtok)
         |SELECT source, CAST(count(*) AS BIGINT) AS kept_docs,
         |       CAST(sum(tokens) AS BIGINT) AS kept_tokens,
         |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM ckum WHERE cum <= $budget
         |GROUP BY source ORDER BY source""".stripMargin

  private def bpeCountSql(maxWords: Int, merges: Int): String = {
    val applySteps = bpeApplySteps(merges)
    bpeWith(maxWords, merges) + ",\n" +
      raw"""dwf AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id,
        |           unnest(string_split_regex(trim(lower(text)), '\s+'))
        |             AS word
        |    FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]+${"$"}')),
        |a1 AS MATERIALIZED (
        |  SELECT word,
        |         array_to_string(list_transform(string_split(word, ''),
        |           c -> chr(1) || c || chr(2)), '') AS seq
        |  FROM (SELECT DISTINCT word FROM dwf)),
        |""".stripMargin + applySteps + ",\n" +
      s"""useg AS (
         |  SELECT word,
         |         CAST(len(string_split(substr(seq, 2, length(seq) - 2),
         |                   chr(2) || chr(1))) AS BIGINT) AS n_syms
         |  FROM a${merges + 1})
         |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(u.n_syms) AS BIGINT) AS bpe_tokens
         |FROM dwf d JOIN useg u USING (word)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  /** The shared "WITH …" block: census, initial sequences, and the
    * chained per-step (pair census → argmax → fuse) CTEs through
    * s{merges+1}. An exhausted pair census (empty b$k on a degenerate
    * corpus) makes that step's fuse a NO-OP via the CASE guard —
    * matching the engine's early stop; without it the NULL scalar
    * subqueries would null EVERY sequence through replace(seq, NULL,
    * …) (ADVICE r13). */
  private def bpeWith(maxWords: Int, merges: Int,
                      fullAlphabet: Boolean = false): String = {
    // Two census alphabets, mirroring BpeTrain.wordCensus: the classic
    // case-folded lowercase-letters-only setting, and the full mode
    // over the x53_bpe_train_full lane's planted case/punctuation/digit
    // corpus (upper() a third of the docs, comma-attach a third, append
    // digit-bearing tokens to the rest — the synthetic documents are
    // pure lowercase letters, so the full alphabet must be planted to
    // be exercised). Full mode keeps every symbol except the two
    // sentinel code points the wrapped-symbol surgery reserves.
    val census =
      if (fullAlphabet)
        raw"""WITH w0 AS (
          |  SELECT unnest(string_split_regex(trim(
          |           CASE WHEN doc_id % 3 = 0 THEN upper(text)
          |                WHEN doc_id % 3 = 1 THEN replace(text, ' ', ', ')
          |                ELSE concat_ws(' ', text, 'v4.1 2024 100%')
          |           END), '\s+')) AS word
          |  FROM documents),
          |wc AS MATERIALIZED (
          |  SELECT word, count(*) AS cnt FROM w0
          |  WHERE length(word) > 0
          |    AND NOT (word LIKE '%' || chr(1) || '%'
          |             OR word LIKE '%' || chr(2) || '%')
          |  GROUP BY 1 ORDER BY cnt DESC, word LIMIT $maxWords),""".stripMargin
      else
        raw"""WITH w0 AS (
          |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
          |  FROM documents),
          |wc AS MATERIALIZED (
          |  SELECT word, count(*) AS cnt FROM w0
          |  WHERE regexp_matches(word, '^[a-z]+${"$"}')
          |  GROUP BY 1 ORDER BY cnt DESC, word LIMIT $maxWords),""".stripMargin
    census + "\n" +
      raw"""s1 AS MATERIALIZED (
      |  SELECT word, cnt,
      |         array_to_string(list_transform(string_split(word, ''),
      |           c -> chr(1) || c || chr(2)), '') AS seq
      |  FROM wc),
      |""".stripMargin + bpeStepCtes(merges)
  }

  /** The chained per-step (pair census → argmax → fuse) CTEs through
    * s{merges+1} — alphabet-agnostic (they operate on the wrapped
    * symbol sequences), shared by the char-level, full-alphabet, and
    * byte-level trajectory oracles. */
  private def bpeStepCtes(merges: Int): String =
    (1 to merges).map { k =>
      val sk = s"s$k"
      s"""p$k AS MATERIALIZED (
         |  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS pc FROM (
         |    SELECT word, cnt, sym AS l,
         |           lead(sym) OVER (PARTITION BY word ORDER BY ord) AS r
         |    FROM (
         |      SELECT word, cnt,
         |             unnest(string_split(substr(seq, 2, length(seq) - 2),
         |                    chr(2) || chr(1))) AS sym,
         |             generate_subscripts(
         |               string_split(substr(seq, 2, length(seq) - 2),
         |                    chr(2) || chr(1)), 1) AS ord
         |      FROM $sk))
         |  WHERE r IS NOT NULL GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT l, r, pc FROM p$k ORDER BY pc DESC, l, r LIMIT 1),
         |s${k + 1} AS MATERIALIZED (
         |  SELECT word, cnt,
         |         CASE WHEN (SELECT count(*) FROM b$k) = 0 THEN seq
         |              ELSE replace(seq,
         |                chr(1) || (SELECT l FROM b$k) || chr(2) ||
         |                  chr(1) || (SELECT r FROM b$k) || chr(2),
         |                chr(1) || (SELECT l FROM b$k) ||
         |                  (SELECT r FROM b$k) || chr(2))
         |         END AS seq
         |  FROM $sk)""".stripMargin
    }.mkString(",\n")

  /** The X5e dHash corpus + brute-force Hamming pairs as shared CTEs —
    * one definition for the pair lane and its drop-set projection. The
    * pixel formula mirrors `Multimodal.dhashLuma` verbatim (families
    * f = doc_id/21, variant cap vp, grid-row-0 ridge, byte-mix body);
    * the hash assembly mirrors `Multimodal.dhash64` (9×8 cells,
    * cross-multiplied mean comparison, bit gy·8+gx). */
  /** img → … → hash: every image-lane document's 64-bit dHash in
    * closed form. Shared by the pair, drop-set, against, and streaming
    * lanes (each appends its own pair/anti predicate). */
  private val dhashHashCtes: String =
    """img AS (
      |  SELECT doc_id, doc_id // 21 AS f,
      |         LEAST((doc_id % 21) // 3, 5) AS vp
      |  FROM documents WHERE doc_id % 3 = 0),
      |dim AS (
      |  SELECT doc_id, vp,
      |         CAST(9 * (1 + f % 3) AS BIGINT) AS w,
      |         CAST(8 * (1 + f % 2) AS BIGINT) AS h,
      |         xor(f % 1000000007, (f % 1000000007) // 65536) * 73244475 AS m
      |  FROM img),
      |xs AS (SELECT doc_id, vp, w, h, m, unnest(range(0, w)) AS x FROM dim),
      |px AS (SELECT doc_id, vp, w, h, m, x, unnest(range(0, h)) AS y FROM xs),
      |lum AS (
      |  SELECT doc_id, x * 9 // w AS gx, y * 8 // h AS gy,
      |         CASE WHEN y * 8 // h = 0 THEN
      |           100 + CASE WHEN x * 9 // w <= vp THEN 10 * (x * 9 // w)
      |                      ELSE 10 * vp - (x * 9 // w - vp) END
      |         ELSE xor(((m + 40503 * x + 48271 * y) // 256) % 256,
      |                  ((m + 40503 * x + 48271 * y) // 16777216) % 256)
      |         END AS l
      |  FROM px),
      |cell AS (SELECT doc_id, gy, gx, sum(l) AS s, count(*) AS cnt
      |         FROM lum GROUP BY 1, 2, 3),
      |bits AS (
      |  SELECT a.doc_id, CAST(a.gy * 8 + a.gx AS INTEGER) AS pos
      |  FROM cell a JOIN cell b
      |    ON a.doc_id = b.doc_id AND a.gy = b.gy AND b.gx = a.gx + 1
      |  WHERE a.gx < 8 AND a.s * b.cnt < b.s * a.cnt),
      |hash AS (
      |  SELECT i.doc_id,
      |         coalesce(bit_or(CASE WHEN b.pos = 63
      |                              THEN (-9223372036854775807 - 1)
      |                              ELSE 1::BIGINT << b.pos END),
      |                  0) AS dhash
      |  FROM img i LEFT JOIN bits b ON i.doc_id = b.doc_id
      |  GROUP BY i.doc_id)""".stripMargin

  private val dhashPairCtes: String = dhashHashCtes + ",\n" +
    """dpair AS (
      |  SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
      |         CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
      |  FROM hash a JOIN hash b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 3)""".stripMargin

  /** One G23 KL-divergence declaration block: census (c$k) + verdict
    * (v$k) CTEs over the shared `counts`/`tot` value census. The
    * micro-nat contribution mirrors KlDivergenceCheck.census VERBATIM
    * including the multiplication ASSOCIATION ((n/N)·ln(..)·1e6,
    * left-to-right) — double multiply is not associative, and the one
    * rounding per value must see bit-identical pre-round input on both
    * engines (boundary slack audited in MicroNatSlackSpec). */
  private def klCheckCtes(k: Int, parts: Seq[(String, Long)]): String = {
    val vals = parts.map { case (v, p) => s"('$v', $p)" }.mkString(", ")
    s"""p$k AS (SELECT v AS value, CAST(ppm AS BIGINT) AS ppm
       |        FROM (VALUES $vals) t(v, ppm)),
       |c$k AS (
       |  SELECT counts.value, counts.n, p$k.ppm,
       |         CASE WHEN p$k.ppm IS NOT NULL THEN
       |           CAST(round((counts.n / CAST(t.n_total AS DOUBLE))
       |                * ln((counts.n * 1e6)
       |                     / (CAST(t.n_total AS DOUBLE) * p$k.ppm))
       |                * 1e6) AS BIGINT)
       |         END AS contrib_micro
       |  FROM counts LEFT JOIN p$k USING (value), tot t),
       |v$k AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS element_count,
       |         CAST(coalesce(sum(CASE WHEN ppm IS NULL THEN n END), 0)
       |           AS BIGINT) AS unexpected_count,
       |         coalesce(sum(contrib_micro), 0) AS kl_micro
       |  FROM c$k)""".stripMargin
  }

  /** One G23 verdict+census projection (the engine repeats the verdict
    * columns on every census row). */
  private def klCheckSelect(k: Int, name: String, threshold: Double): String =
    s"""SELECT '$name' AS validation_name,
       |       CASE WHEN v$k.unexpected_count = 0
       |                 AND v$k.kl_micro / 1e6 < $threshold
       |            THEN 'PASSED' ELSE 'FAILED' END AS status,
       |       v$k.element_count, v$k.unexpected_count,
       |       c$k.value, c$k.n, c$k.ppm, c$k.contrib_micro
       |FROM c$k, v$k""".stripMargin

  /** One G24 chi-square declaration block over the shared
    * `counts`/`tot` census — mirrors ChiSquareCheck.census VERBATIM:
    * FULL coverage (declared-but-unobserved values enter at n = 0 with
    * their real expected-count mass), the per-value difference
    * D = n·10⁶ − N·ppm computed EXACTLY in integer arithmetic, one
    * rounding per value on D²/(N·ppm) in doubles (always ≥ 0, so both
    * engines' round conventions agree). */
  private def chiCheckCtes(k: Int, parts: Seq[(String, Long)]): String = {
    val vals = parts.map { case (v, p) => s"('$v', $p)" }.mkString(", ")
    s"""q$k AS (SELECT v AS value, CAST(ppm AS BIGINT) AS ppm
       |        FROM (VALUES $vals) t(v, ppm)),
       |cq$k AS (
       |  SELECT value, CAST(coalesce(n, 0) AS BIGINT) AS n, q$k.ppm,
       |         CASE WHEN q$k.ppm IS NOT NULL THEN
       |           CAST(round(
       |             CAST(coalesce(n, 0) * 1000000
       |                  - t.n_total * q$k.ppm AS DOUBLE)
       |             * CAST(coalesce(n, 0) * 1000000
       |                    - t.n_total * q$k.ppm AS DOUBLE)
       |             / CAST(t.n_total * q$k.ppm AS DOUBLE)) AS BIGINT)
       |         END AS contrib_micro
       |  FROM counts FULL JOIN q$k USING (value), tot t),
       |vq$k AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS element_count,
       |         CAST(coalesce(sum(CASE WHEN ppm IS NULL THEN n END), 0)
       |           AS BIGINT) AS unexpected_count,
       |         coalesce(sum(contrib_micro), 0) AS chi_micro
       |  FROM cq$k)""".stripMargin
  }

  /** One G24 verdict+census projection. */
  private def chiCheckSelect(k: Int, name: String, critical: Double): String =
    s"""SELECT '$name' AS validation_name,
       |       CASE WHEN vq$k.unexpected_count = 0
       |                 AND vq$k.chi_micro / 1e6 < $critical
       |            THEN 'PASSED' ELSE 'FAILED' END AS status,
       |       vq$k.element_count, vq$k.unexpected_count,
       |       cq$k.value, cq$k.n, cq$k.ppm, cq$k.contrib_micro
       |FROM cq$k, vq$k""".stripMargin

  /** The X5k video corpus in closed form — per (clip, frame) the
    * 32×32 indexed frame's palette pixels, exact integer luma, the
    * fixed-point DCT pHash, and per-clip frame counts (`vhash`,
    * `vcnt`). Shared by the frame-majority lane (x5_video_neardup)
    * and the frame-alignment lane (x5_video_align). */
  private lazy val videoHashCtes: String =
    """vdoc AS (
        |  SELECT doc_id, doc_id // 6 AS f, (doc_id % 6) // 3 AS m
        |  FROM documents WHERE doc_id % 3 = 0),
        |vfr AS (SELECT doc_id, m, f, unnest(range(0, 6)) AS k FROM vdoc),
        |vmix AS (
        |  SELECT doc_id, k,
        |         xor((f * 16 + 2 * m + k) % 1000000007,
        |             ((f * 16 + 2 * m + k) % 1000000007) // 65536)
        |           * 73244475 AS mm
        |  FROM vfr),
        |vxs AS (SELECT doc_id, k, mm, unnest(range(0, 32)) AS x
        |        FROM vmix),
        |vpx AS (SELECT doc_id, k, mm, x, unnest(range(0, 32)) AS y
        |        FROM vxs),
        |vlum AS (
        |  SELECT doc_id, k, cx, cy,
        |         (77 * ((3 * p) % 256) + 151 * ((5 * p) % 256)
        |          + 28 * ((7 * p) % 256)) // 256 AS l
        |  FROM (SELECT doc_id, k, x AS cx, y AS cy,
        |               xor(((mm + 40503 * x + 48271 * y) // 256) % 256,
        |                   ((mm + 40503 * x + 48271 * y) // 16777216)
        |                     % 256) % 64 AS p
        |        FROM vpx)),
        |vct(u, x, c) AS (VALUES """.stripMargin + phashCosValues +
        """),
        |vt1 AS (
        |  SELECT doc_id, k, cy AS y, t.u, sum(l * t.c) AS a
        |  FROM vlum JOIN vct t ON t.x = vlum.cx
        |  GROUP BY 1, 2, 3, 4),
        |vt2 AS (
        |  SELECT t1.doc_id, t1.k, t1.u AS u, t.u AS v,
        |         sum(t1.a * t.c) AS coef
        |  FROM vt1 t1 JOIN vct t ON t.x = t1.y
        |  GROUP BY 1, 2, 3, 4),
        |vmed AS (
        |  SELECT doc_id, k, coef AS med FROM (
        |    SELECT doc_id, k, coef,
        |           row_number() OVER (PARTITION BY doc_id, k
        |                              ORDER BY coef) AS rn
        |    FROM vt2 WHERE NOT (u = 0 AND v = 0))
        |  WHERE rn = 32),
        |vbits AS (
        |  SELECT t.doc_id, t.k, CAST(t.v * 8 + t.u AS INTEGER) AS pos
        |  FROM vt2 t JOIN vmed md
        |    ON md.doc_id = t.doc_id AND md.k = t.k
        |  WHERE NOT (t.u = 0 AND t.v = 0) AND t.coef > md.med),
        |vhash AS (
        |  SELECT vf.doc_id, vf.k,
        |         coalesce(bit_or(CASE WHEN b.pos = 63
        |                              THEN (-9223372036854775807 - 1)
        |                              ELSE 1::BIGINT << b.pos END),
        |                  0) AS h
        |  FROM vmix vf LEFT JOIN vbits b
        |    ON vf.doc_id = b.doc_id AND vf.k = b.k
        |  GROUP BY 1, 2),
        |vcnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS frames
        |         FROM vhash GROUP BY 1)""".stripMargin

  /** The X5j chunked-audio corpus in closed form — per (doc, segment)
    * the 512-sample planted content (byte-mix base keyed by content id
    * f·16 + 3m + seg, member 1 at 2× gain), 65-window pooling,
    * cross-multiplied boundary comparisons, and the hash-0 drop:
    * `ckeep` is the fingerprintable (doc, seg, h) signature set.
    * Shared by the batch containment pair lane (x5_ahash_chunks) and
    * the streaming containment drop (s24_stream_chunks). */
  private val ahashChunkCtes: String =
    """cdoc AS (
      |  SELECT doc_id, doc_id // 6 AS f, (doc_id % 6) // 3 AS m
      |  FROM documents WHERE doc_id % 3 = 2),
      |cseg AS (
      |  SELECT doc_id, m, f, unnest(range(0, 6)) AS seg FROM cdoc),
      |cmix AS (
      |  SELECT doc_id, m, seg,
      |         xor((f * 16 + 3 * m + seg) % 1000000007,
      |             ((f * 16 + 3 * m + seg) % 1000000007) // 65536)
      |           * 73244475 AS mm
      |  FROM cseg),
      |ct AS (SELECT doc_id, m, seg, mm, unnest(range(0, 512)) AS t
      |       FROM cmix),
      |csv AS (
      |  SELECT doc_id, seg, (t * 65) // 512 AS w,
      |         (m + 1) * 6 *
      |           (xor(((mm + 40503 * t) // 256) % 256,
      |                ((mm + 40503 * t) // 16777216) % 256) - 128) AS s
      |  FROM ct),
      |cw AS (SELECT doc_id, seg, w, sum(s * s) AS e, count(*) AS c
      |       FROM csv GROUP BY 1, 2, 3),
      |cbit AS (
      |  SELECT a.doc_id, a.seg, CAST(a.w AS INTEGER) AS pos
      |  FROM cw a JOIN cw b
      |    ON a.doc_id = b.doc_id AND a.seg = b.seg AND b.w = a.w + 1
      |  WHERE a.w < 64 AND a.e * b.c < b.e * a.c),
      |csegs AS (SELECT DISTINCT doc_id, seg FROM cw),
      |chash AS (
      |  SELECT cs.doc_id, cs.seg,
      |         coalesce(bit_or(CASE WHEN cb.pos = 63
      |                              THEN (-9223372036854775807 - 1)
      |                              ELSE 1::BIGINT << cb.pos END),
      |                  0) AS h
      |  FROM csegs cs LEFT JOIN cbit cb
      |    ON cs.doc_id = cb.doc_id AND cs.seg = cb.seg
      |  GROUP BY 1, 2),
      |ckeep AS (SELECT doc_id, seg, h FROM chash WHERE h <> 0)""".stripMargin

  /** The X5i aHash corpus in closed form — every audio-lane document's
    * 64-bit energy-profile hash: planted samples
    * (Multimodal.ahashSample mirrored verbatim — byte-mix base,
    * v-scaled perturbation, the v=6 exact 2× re-gain), floor-div
    * 65-window pooling, integer energy sums, cross-multiplied
    * boundary comparisons, bit 63 via the Long.MinValue literal. */
  private val ahashHashCtes: String =
    """aimg AS (
      |  SELECT doc_id, doc_id // 21 AS f, (doc_id % 21) // 3 AS v
      |  FROM documents WHERE doc_id % 3 = 1),
      |adim AS (
      |  SELECT doc_id, v,
      |         CAST(512 + 64 * (f % 4) AS BIGINT) AS n,
      |         xor(f % 1000000007, (f % 1000000007) // 65536)
      |           * 73244475 AS m
      |  FROM aimg),
      |asamp AS (SELECT doc_id, v, n, m, unnest(range(0, n)) AS t
      |          FROM adim),
      |asv AS (
      |  SELECT doc_id, n, t,
      |         CASE WHEN v = 6 THEN
      |           2 * (6 * (xor(((m + 40503 * t) // 256) % 256,
      |                         ((m + 40503 * t) // 16777216) % 256) - 128)
      |                + 320 * ((t % 5) - 2))
      |         ELSE
      |           6 * (xor(((m + 40503 * t) // 256) % 256,
      |                    ((m + 40503 * t) // 16777216) % 256) - 128)
      |           + v * 64 * ((t % 5) - 2)
      |         END AS s
      |  FROM asamp),
      |awin AS (SELECT doc_id, t * 65 // n AS w,
      |                CAST(sum(s * s) AS BIGINT) AS e,
      |                CAST(count(*) AS BIGINT) AS c
      |         FROM asv GROUP BY 1, 2),
      |abit AS (
      |  SELECT a.doc_id, CAST(a.w AS INTEGER) AS pos
      |  FROM awin a JOIN awin b
      |    ON a.doc_id = b.doc_id AND b.w = a.w + 1
      |  WHERE a.w < 64 AND a.e * b.c < b.e * a.c),
      |ahash AS (
      |  SELECT i.doc_id,
      |         coalesce(bit_or(CASE WHEN b.pos = 63
      |                              THEN (-9223372036854775807 - 1)
      |                              ELSE 1::BIGINT << b.pos END),
      |                  0) AS ahash
      |  FROM aimg i LEFT JOIN abit b ON i.doc_id = b.doc_id
      |  GROUP BY i.doc_id)""".stripMargin

  /** The public IMA step table as a VALUES list — spec DATA (not
    * decoder logic) deliberately taken from the same constant array the
    * engine uses, the GIF-palette-formula sharing class: the state
    * MACHINE is replayed independently in SQL. */
  private val imaStepValues: String =
    graft.ext.Multimodal.ImaStepTable.zipWithIndex
      .map { case (s, i) => s"($i, $s)" }.mkString(", ")

  /** The fixed-point pHash DCT basis as a VALUES list — rendered from
    * the engine's own table (the imaStepValues sharing class: basis
    * DATA shared, the DCT/median/bit MACHINE replayed independently in
    * SQL). (u, x, c) with c = round(2^14·cos((2x+1)uπ/64)), u < 8. */
  private val phashCosValues: String =
    graft.ext.Multimodal.phashCos.zipWithIndex.flatMap {
      case (row, u) => row.zipWithIndex.map {
        case (c, x) => s"($u, $x, $c)"
      }
    }.mkString(", ")

  /** Every pHash-lane document's 64-bit perceptual hash in CLOSED FORM:
    * planted luma (Multimodal.phashLuma mirrored verbatim) → floor-div
    * 32×32 cell means → two integer DCT passes over the shared
    * fixed-point basis → 32nd-order-statistic median of the 63 AC
    * coefficients → bit v·8+u strictly above median (DC bit never
    * set), bit 63 via the Long.MinValue literal (DuckDB refuses
    * 1<<63). */
  private lazy val phashHashCtes: String =
    """pimg AS (
      |  SELECT doc_id, doc_id // 24 AS f,
      |         LEAST((doc_id % 24) // 3, 6) AS vp
      |  FROM documents WHERE doc_id % 3 = 0),
      |pdim AS (
      |  SELECT doc_id, vp,
      |         CAST(32 * (1 + f % 2) AS BIGINT) AS w,
      |         CAST(32 AS BIGINT) AS h,
      |         xor(f % 1000000007, (f % 1000000007) // 65536)
      |           * 73244475 AS m
      |  FROM pimg),
      |pxs AS (SELECT doc_id, vp, w, h, m, unnest(range(0, w)) AS x
      |        FROM pdim),
      |ppx AS (SELECT doc_id, vp, w, h, m, x, unnest(range(0, h)) AS y
      |        FROM pxs),
      |plum AS (
      |  SELECT doc_id, x * 32 // w AS cx, y * 32 // h AS cy,
      |         (xor(((m + 40503 * x + 48271 * y) // 256) % 256,
      |              ((m + 40503 * x + 48271 * y) // 16777216) % 256)
      |          % 192) + vp * ((x + 2 * y) % 7) AS l
      |  FROM ppx),
      |pcell AS (SELECT doc_id, cy, cx,
      |                 CAST(sum(l) // count(*) AS BIGINT) AS cv
      |          FROM plum GROUP BY 1, 2, 3),
      |pct(u, x, c) AS (VALUES """.stripMargin + phashCosValues + """),
      |pt1 AS (
      |  SELECT p.doc_id, p.cy AS y, t.u, sum(p.cv * t.c) AS a
      |  FROM pcell p JOIN pct t ON t.x = p.cx
      |  GROUP BY 1, 2, 3),
      |pt2 AS (
      |  SELECT t1.doc_id, t1.u AS u, t.u AS v, sum(t1.a * t.c) AS coef
      |  FROM pt1 t1 JOIN pct t ON t.x = t1.y
      |  GROUP BY 1, 2, 3),
      |pmed AS (
      |  SELECT doc_id, coef AS med FROM (
      |    SELECT doc_id, coef,
      |           row_number() OVER (PARTITION BY doc_id ORDER BY coef)
      |             AS rn
      |    FROM pt2 WHERE NOT (u = 0 AND v = 0))
      |  WHERE rn = 32),
      |pbits AS (
      |  SELECT t.doc_id, CAST(t.v * 8 + t.u AS INTEGER) AS pos
      |  FROM pt2 t JOIN pmed md ON md.doc_id = t.doc_id
      |  WHERE NOT (t.u = 0 AND t.v = 0) AND t.coef > md.med),
      |phash AS (
      |  SELECT i.doc_id,
      |         coalesce(bit_or(CASE WHEN b.pos = 63
      |                              THEN (-9223372036854775807 - 1)
      |                              ELSE 1::BIGINT << b.pos END),
      |                  0) AS phash
      |  FROM pimg i LEFT JOIN pbits b ON i.doc_id = b.doc_id
      |  GROUP BY i.doc_id)""".stripMargin

  val sql: Map[String, String] = Map(
    "d1_count" -> "SELECT count(*) AS cnt FROM lineitem",

    "d2_null_keys" ->
      "SELECT count(*) AS null_cnt FROM orders WHERE o_custkey IS NULL",

    "d3_distinct" ->
      "SELECT DISTINCT r_name AS region_name FROM region ORDER BY region_name",

    "d4_whitelist_violations" ->
      s"""SELECT DISTINCT n_name AS region_name
         |FROM nation JOIN region ON n_regionkey = r_regionkey
         |WHERE n_name NOT IN $wl
         |ORDER BY region_name""".stripMargin,

    "r1_region_whitelist" ->
      s"""SELECT DISTINCT coalesce(n_name, '') AS region
         |FROM nation
         |WHERE coalesce(n_name, '') NOT IN $wl
         |ORDER BY region""".stripMargin,

    "r2_nonempty" ->
      "SELECT count(*) AS record_count, count(*) > 0 AS passed FROM customer",

    "r3_schema_compliance" ->
      """SELECT count(*) AS element_count,
        |       count(CASE WHEN event_type IS NULL OR ts IS NULL OR value IS NULL THEN 1 END) AS noncompliant
        |FROM events""".stripMargin,

    "r4_business_rule" ->
      """SELECT count(*) AS element_count,
        |       count(CASE WHEN coalesce(value, 0) < 0 THEN 1 END) AS violations
        |FROM events""".stripMargin,

    "t1_stg_territory" ->
      """SELECT n_nationkey AS territory_key, trim(n_name) AS region_name, trim(r_name) AS zone_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY territory_key""".stripMargin,

    "t2_stg_salesperson" ->
      """SELECT s_suppkey AS salesperson_key, trim(s_name) AS salesperson_name,
        |       CAST(s_nationkey AS BIGINT) AS nation_key, round(s_acctbal, 2) AS acctbal
        |FROM supplier ORDER BY salesperson_key""".stripMargin,

    "t3_mart_sales" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |       count(*) AS line_count,
        |       CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY 1, 2
        |ORDER BY region_name, nation_name""".stripMargin,

    "t3_mart_rollup" ->
      // The same mart derivation under GROUP BY ROLLUP; the level is
      // the explicit grouping(r)*2 + grouping(n) sum and rolled keys
      // coalesce to the '(all)' sentinel — both engines spell the
      // convention out rather than relying on GROUPING_ID bit layouts.
      """SELECT coalesce(r_name, '(all)') AS region_name,
        |       coalesce(n_name, '(all)') AS nation_name,
        |       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT)
        |         AS grouping_level,
        |       count(*) AS line_count,
        |       CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY grouping_level, region_name, nation_name""".stripMargin,

    "t4_scd2_snapshot" -> scd2SnapshotSql,

    "s7_stream_scd2" -> scd2SnapshotSql,

    "g1_row_counts" -> {
      val unions = graft.Tables.all.map(t =>
        s"SELECT '$t' AS table_name, count(*) AS cnt FROM $t")
      unions.mkString("SELECT table_name, cnt FROM (", " UNION ALL ", ") ORDER BY table_name")
    },

    "g2_not_null" ->
      """SELECT count(*) AS element_count,
        |       count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS null_orderkey,
        |       count(CASE WHEN o_custkey IS NULL THEN 1 END) AS null_custkey,
        |       count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS null_orderdate
        |FROM orders""".stripMargin,

    "g3_in_set" ->
      s"""SELECT c.element_count, c.unexpected_count,
         |       round(c.unexpected_count * 100.0 / c.element_count, 4) AS unexpected_percent,
         |       s.unexpected_sample
         |FROM (SELECT count(*) AS element_count,
         |             count(CASE WHEN c_mktsegment NOT IN $segs THEN 1 END) AS unexpected_count
         |      FROM customer) c,
         |     (SELECT coalesce(string_agg(seg, ','), '') AS unexpected_sample
         |      FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer
         |            WHERE c_mktsegment NOT IN $segs ORDER BY 1 LIMIT 20)) s""".stripMargin,

    "g4_not_in_set" ->
      """SELECT element_count, unexpected_count,
        |       round(unexpected_count * 100.0 / element_count, 4) AS unexpected_percent
        |FROM (SELECT count(*) AS element_count,
        |             count(CASE WHEN o_orderstatus IN ('P') THEN 1 END) AS unexpected_count
        |      FROM orders)""".stripMargin,

    "g5_between" ->
      """SELECT count(*) AS element_count,
        |       count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS qty_out_of_range,
        |       count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END) AS discount_out_of_range
        |FROM lineitem""".stripMargin,

    "g6_schema_columns" ->
      """SELECT column_name FROM (VALUES
        |  ('l_orderkey'), ('l_partkey'), ('l_suppkey'), ('l_linenumber'),
        |  ('l_quantity'), ('l_extendedprice'), ('l_discount'), ('l_tax'),
        |  ('l_returnflag'), ('l_linestatus'), ('l_shipdate')
        |) AS t(column_name) ORDER BY column_name""".stripMargin,

    "g7_unique" ->
      """SELECT count(CASE WHEN cnt > 1 THEN 1 END) AS dup_keys,
        |       CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT) AS dup_rows
        |FROM (SELECT o_orderkey, count(*) AS cnt FROM orders GROUP BY 1)""".stripMargin,

    "g8_compound_unique" ->
      """SELECT count(CASE WHEN cnt > 1 THEN 1 END) AS dup_keys,
        |       CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT) AS dup_rows
        |FROM (SELECT l_orderkey, l_linenumber, count(*) AS cnt FROM lineitem GROUP BY 1, 2)""".stripMargin,

    "g9_regex" ->
      """SELECT element_count, unexpected_count,
        |       round(unexpected_count * 100.0 / element_count, 4) AS unexpected_percent
        |FROM (SELECT count(*) AS element_count,
        |             count(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$') THEN 1 END) AS unexpected_count
        |      FROM orders)""".stripMargin,

    "g10_type_cast" ->
      """SELECT count(*) AS element_count,
        |       count(CASE WHEN props IS NOT NULL AND TRY_CAST(props AS DOUBLE) IS NULL THEN 1 END) AS props_non_numeric,
        |       count(CASE WHEN user_id IS NOT NULL AND TRY_CAST(user_id AS VARCHAR) IS NULL THEN 1 END) AS user_id_non_string
        |FROM events""".stripMargin,

    "g11_agg_bounds" ->
      """SELECT count(*) AS element_count,
        |       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(c_acctbal), 2) AS mean_acctbal,
        |       round(min(c_acctbal), 2) AS min_acctbal,
        |       round(max(c_acctbal), 2) AS max_acctbal
        |FROM customer""".stripMargin,

    "g12_pair_greater" ->
      """SELECT element_count, unexpected_count,
        |       round(unexpected_count * 100.0 / element_count, 4) AS unexpected_percent
        |FROM (SELECT count(*) AS element_count,
        |             count(CASE WHEN l_extendedprice <= l_quantity THEN 1 END) AS unexpected_count
        |      FROM lineitem)""".stripMargin,

    "v2_suite_summary" -> {
      // The suite summary re-derived declaratively: each row is one check's
      // (name, status, element_count, unexpected_count) over the T1–T3
      // model outputs, with the deliberately-incomplete whitelist.
      s"""SELECT * FROM (
         |  SELECT 'mart_sales_performance.row_count_between' AS validation_name,
         |         CASE WHEN cnt >= 1 THEN 'PASSED' ELSE 'FAILED' END AS status,
         |         cnt AS element_count,
         |         CAST(CASE WHEN cnt >= 1 THEN 0 ELSE 1 END AS BIGINT) AS unexpected_count
         |  FROM (SELECT count(*) AS cnt FROM (
         |          SELECT r_name, n_name FROM lineitem
         |          JOIN orders   ON l_orderkey = o_orderkey
         |          JOIN customer ON o_custkey = c_custkey
         |          JOIN nation   ON c_nationkey = n_nationkey
         |          JOIN region   ON n_regionkey = r_regionkey
         |          GROUP BY 1, 2))
         |  UNION ALL
         |  SELECT 'stg_salesperson.row_count_between',
         |         CASE WHEN cnt >= 1 THEN 'PASSED' ELSE 'FAILED' END,
         |         cnt, CAST(CASE WHEN cnt >= 1 THEN 0 ELSE 1 END AS BIGINT)
         |  FROM (SELECT count(*) AS cnt FROM supplier)
         |  UNION ALL
         |  SELECT 'stg_salesperson.not_null:salesperson_key',
         |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END,
         |         cnt, bad
         |  FROM (SELECT count(*) AS cnt,
         |               count(CASE WHEN s_suppkey IS NULL THEN 1 END) AS bad
         |        FROM supplier)
         |  UNION ALL
         |  SELECT 'stg_territory.row_count_between',
         |         CASE WHEN cnt >= 1 THEN 'PASSED' ELSE 'FAILED' END,
         |         cnt, CAST(CASE WHEN cnt >= 1 THEN 0 ELSE 1 END AS BIGINT)
         |  FROM (SELECT count(*) AS cnt FROM nation JOIN region ON n_regionkey = r_regionkey)
         |  UNION ALL
         |  SELECT 'stg_territory.in_set:region_name',
         |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END,
         |         cnt, bad
         |  FROM (SELECT count(*) AS cnt,
         |               count(CASE WHEN trim(n_name) NOT IN $wl THEN 1 END) AS bad
         |        FROM nation JOIN region ON n_regionkey = r_regionkey)
         |) ORDER BY validation_name""".stripMargin
    },

    "g13_g15_profile" ->
      """SELECT count(*) AS element_count,
        |       count(CASE WHEN length(c_name) < 5 OR length(c_name) > 30 THEN 1 END)
        |         AS name_length_out_of_range,
        |       count(DISTINCT c_mktsegment) AS distinct_segments,
        |       round(quantile_cont(c_acctbal, 0.5), 4) AS median_acctbal,
        |       round(quantile_cont(c_acctbal, 0.95), 4) AS p95_acctbal
        |FROM customer""".stripMargin,

    "v1_raw_gate" ->
      """SELECT * FROM (
        |  SELECT 'raw_nation.not_null:n_nationkey' AS validation_name,
        |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END AS status,
        |         cnt AS element_count, bad AS unexpected_count
        |  FROM (SELECT count(*) AS cnt,
        |               count(CASE WHEN n_nationkey IS NULL THEN 1 END) AS bad FROM nation)
        |  UNION ALL
        |  SELECT 'raw_nation.row_count_between',
        |         CASE WHEN cnt >= 1 THEN 'PASSED' ELSE 'FAILED' END,
        |         cnt, CAST(CASE WHEN cnt >= 1 THEN 0 ELSE 1 END AS BIGINT)
        |  FROM (SELECT count(*) AS cnt FROM nation)
        |  UNION ALL
        |  SELECT 'raw_region.not_null:r_regionkey',
        |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END,
        |         cnt, bad
        |  FROM (SELECT count(*) AS cnt,
        |               count(CASE WHEN r_regionkey IS NULL THEN 1 END) AS bad FROM region)
        |  UNION ALL
        |  SELECT 'raw_region.row_count_between',
        |         CASE WHEN cnt >= 1 THEN 'PASSED' ELSE 'FAILED' END,
        |         cnt, CAST(CASE WHEN cnt >= 1 THEN 0 ELSE 1 END AS BIGINT)
        |  FROM (SELECT count(*) AS cnt FROM region)
        |  UNION ALL
        |  SELECT 'raw_salesperson.not_null:s_suppkey',
        |         CASE WHEN bad = 0 THEN 'PASSED' ELSE 'FAILED' END,
        |         cnt, bad
        |  FROM (SELECT count(*) AS cnt,
        |               count(CASE WHEN s_suppkey IS NULL THEN 1 END) AS bad FROM supplier)
        |  UNION ALL
        |  SELECT 'raw_salesperson.row_count_between',
        |         CASE WHEN cnt >= 1 THEN 'PASSED' ELSE 'FAILED' END,
        |         cnt, CAST(CASE WHEN cnt >= 1 THEN 0 ELSE 1 END AS BIGINT)
        |  FROM (SELECT count(*) AS cnt FROM supplier)
        |) ORDER BY validation_name""".stripMargin,

    "x1_exact_dedup" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |         row_number() OVER (
        |           PARTITION BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |           ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // Keeper-policy exact dedup: max raw length then min doc_id,
    // replayed as a DESC/ASC window over the planted-padded corpus.
    // coalesce(length,-1) mirrors the Spark side's null-quality floor
    // (any value below every real length is equivalent ordering).
    "x1_dedup_keepbest" ->
      """WITH corpus AS (
        |  SELECT doc_id, lang, source, n_chars, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, lang, source,
        |         CAST(length('  ' || text || '  ') AS BIGINT),
        |         '  ' || text || '  '
        |  FROM documents WHERE doc_id < 10
        |)
        |SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |         row_number() OVER (
        |           PARTITION BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |           ORDER BY coalesce(length(text), -1) DESC, doc_id) AS rn
        |  FROM corpus) WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "x1_incremental_dedup" -> incrementalDedupSql,

    // Keeper-policy incremental dedup: the intra-shard keeper is the
    // DESC/ASC window (max raw length, ties min doc_id; coalesce(-1)
    // mirrors the null-quality floor), the history drop is the same
    // NOT-EXISTS-on-norm as x1_incremental_dedup — UNCONDITIONAL, so
    // the higher-quality +30000 plants of docs < 10 drop despite
    // winning their intra-shard family, while the +10000 padded
    // plants of docs 300–309 (absent from history) replace their
    // in-shard originals.
    "x1_keepbest_against" -> keepbestAgainstSql,

    // The Bloom-gated keeper lane claims result-identity with the plain
    // anti join (no false negatives, positives verified) — same replay.
    "x1_keepbest_bloom" -> keepbestAgainstSql,

    // Planted-copy variants of the randomized-family paths: the corpus
    // is rewritten so distinct docs share ZERO shingles (detection
    // impossible) and planted copies are byte-identical (detection
    // certain, est. Jaccard exactly 1.0 / Hamming exactly 0) — the
    // survivor/pair set is hash-family-invariant and replayed here from
    // the planted structure (see Queries.uniquifiedDocs).
    "s3_planted_neardup" ->
      (uniquifiedCte + plantedShardCte + "\n" +
        """SELECT s.doc_id FROM shard s
          |WHERE NOT EXISTS (SELECT 1 FROM history h WHERE h.utext = s.utext)
          |ORDER BY doc_id""".stripMargin),

    "s4_planted_simhash" ->
      (uniquifiedCte + plantedShardCte + "\n" +
        """SELECT s.doc_id FROM shard s
          |WHERE NOT EXISTS (SELECT 1 FROM history h WHERE h.utext = s.utext)
          |ORDER BY doc_id""".stripMargin),

    // Streaming embedding near-dup drop: fully replayable (no planted
    // twin needed) because identical vectors collide in every band
    // under ANY hyperplane family and verify at cosine exactly 1.0,
    // while the base corpus's pairwise maximum sits far below the 0.95
    // gate — the engine's drop set IS the NOT-EXISTS cosine predicate.
    "s6_stream_anndrop" ->
      """WITH hist AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 300),
        |shard AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id >= 300
        |  UNION ALL
        |  SELECT vec_id + 10000, CAST(embedding AS DOUBLE[])
        |  FROM embeddings WHERE vec_id < 10)
        |SELECT s.vec_id FROM shard s
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM hist h
        |  WHERE round(list_inner_product(s.v, h.v) /
        |              sqrt(list_inner_product(s.v, s.v)
        |                   * list_inner_product(h.v, h.v)), 4) >= 0.95)
        |ORDER BY vec_id""".stripMargin,

    "x1_minhash_planted" ->
      (uniquifiedCte + plantedPairCte + "\n" +
        """SELECT x.doc_id AS doc_id_a, y.doc_id AS doc_id_b,
          |       CAST(1.0 AS DOUBLE) AS est_jaccard
          |FROM corpus x JOIN corpus y
          |  ON x.utext = y.utext AND x.doc_id < y.doc_id
          |ORDER BY doc_id_a, doc_id_b""".stripMargin),

    "x1_simhash_planted" ->
      (uniquifiedCte + plantedPairCte + "\n" +
        """SELECT x.doc_id AS doc_id_a, y.doc_id AS doc_id_b,
          |       CAST(0 AS INTEGER) AS hamming
          |FROM corpus x JOIN corpus y
          |  ON x.utext = y.utext AND x.doc_id < y.doc_id
          |ORDER BY doc_id_a, doc_id_b""".stripMargin),

    // The Bloom-gated variant must be RESULT-IDENTICAL to the plain
    // anti join for any sketch (no false negatives; positives exactly
    // verified) — same oracle, same hash, by construction.
    "x1_bloom_dedup" -> incrementalDedupSql,
    "x17_soft_dedup" -> softDedupSql,

    // NOTE on the shared-CTE entries: the blocks are concatenated (never
    // interpolated into a string that later runs .stripMargin — the SQL
    // `||` operator at a line start would be eaten as a margin).
    "x1_jaccard_pairs" ->
      ("WITH " + gram4Ctes + ",\n" + jaccardPairCtes + "\n" +
        """SELECT doc_id_a, doc_id_b, jaccard FROM jpair
          |WHERE jaccard >= 0.8 ORDER BY doc_id_a, doc_id_b""".stripMargin),

    "x1_dedup_groups" ->
      // The x1_jaccard pair derivation, then connected components via the
      // recursive reachability CTE: creach accumulates, for every vertex,
      // the labels of all vertices that can reach it along the symmetric
      // edge set; min(label) per vertex = its component's smallest id —
      // exactly the Spark side's min-label propagation fixpoint.
      ("WITH RECURSIVE " + gram4Ctes + ",\n" + jaccardPairCtes + ",\n" +
        componentCtes + "\n" +
        """SELECT id AS doc_id, min(lbl) AS cluster_id, min(lbl) = id AS keep
          |FROM creach GROUP BY id ORDER BY doc_id""".stripMargin),

    "x1_span_dedup" ->
      // Token-block spans replayed: 0-based block pos = (ord-1)/8 over
      // the normalized token stream, span = the block's tokens re-joined.
      // keep iff the span is corpus-unique, OR this is its first
      // (doc_id, pos) occurrence, OR it is blank — exactly
      // SpanDedup.flagSpans (Spark groups by xxhash64(span); the oracle
      // groups by the span itself — identical absent 64-bit collisions).
      // coalesce('') matches Spark's concat_ws on a fully-dropped doc.
      """WITH norm AS (
        |  SELECT doc_id,
        |         lower(trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS tok,
        |         generate_subscripts(string_split_regex(t, '\s+'), 1) AS ord
        |  FROM norm),
        |spans AS (
        |  SELECT doc_id, CAST(floor((ord - 1) / 8.0) AS BIGINT) AS pos,
        |         string_agg(tok, ' ' ORDER BY ord) AS span
        |  FROM toks GROUP BY 1, 2),
        |flagged AS (
        |  SELECT doc_id, pos, span,
        |         (count(*) OVER (PARTITION BY span) < 2
        |          OR row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) = 1
        |          OR length(span) = 0) AS kept
        |  FROM spans)
        |SELECT doc_id, count(*) AS n_spans,
        |       count(CASE WHEN NOT kept THEN 1 END) AS n_dropped,
        |       md5(coalesce(string_agg(CASE WHEN kept THEN span END, ' ' ORDER BY pos),
        |                    '')) AS text_md5
        |FROM flagged GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "x1_substring_dedup" ->
      // Stride-1 overlapping 8-token windows over the normalized stream:
      // a window repeated corpus-wide keeps only its first (doc_id, pos)
      // occurrence; a TOKEN drops iff some covered (repeated, non-first)
      // window contains it. The oracle keys the census on the window
      // STRING where the engine keys on xxhash64 — identical absent
      // 64-bit collisions (the jaccard precedent). DuckDB list lambdas
      // are 1-indexed; the engine's 0-based coverage test shifts by one.
      """WITH pl AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 17 = 0 THEN text ||
        |                repeat(' off', doc_id % 3) ||
        |                ' the shared boilerplate sentence that repeats across many documents verbatim exactly once'
        |              ELSE text END AS text
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |         string_split_regex(lower(trim(regexp_replace(coalesce(text, ''),
        |           '\s+', ' ', 'g'))), '\s+') AS toks
        |  FROM pl),
        |w AS (
        |  SELECT doc_id, unnest(range(0, greatest(len(toks) - 8 + 1, 0))) AS pos, toks
        |  FROM d),
        |h AS (
        |  SELECT doc_id, pos,
        |         array_to_string(list_slice(toks, pos + 1, pos + 8), ' ') AS win
        |  FROM w),
        |o AS (
        |  SELECT doc_id, pos,
        |         count(*) OVER (PARTITION BY win) AS cnt,
        |         row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
        |  FROM h),
        |cov AS (
        |  SELECT doc_id, list_sort(list(pos)) AS starts
        |  FROM o WHERE cnt >= 2 AND rn > 1 GROUP BY doc_id),
        |r AS (
        |  SELECT d.doc_id, d.toks,
        |         coalesce(cov.starts, []) AS starts
        |  FROM d LEFT JOIN cov ON d.doc_id = cov.doc_id),
        |k AS (
        |  SELECT doc_id, toks,
        |         list_filter(toks, (x, i) ->
        |           len(list_filter(starts, s -> s <= i - 1 AND i - 1 < s + 8)) = 0)
        |           AS kept
        |  FROM r)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |       CAST(len(toks) - len(kept) AS BIGINT) AS n_dropped,
        |       -- coalesce: array_to_string of a fully-dropped doc's empty
        |       -- kept list is NULL; Spark's concat_ws is ''.
        |       md5(coalesce(array_to_string(kept, ' '), '')) AS text_md5
        |FROM k ORDER BY doc_id""".stripMargin,

    "x1_embed_neardup" ->
      """WITH corpus AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings),
        |         CAST(embedding AS DOUBLE[]) FROM embeddings
        |  WHERE vec_id < 5)
        |SELECT vec_id_a, vec_id_b, cosine_sim FROM (
        |  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
        |         round(list_inner_product(a.v, b.v) /
        |               sqrt(list_inner_product(a.v, a.v) * list_inner_product(b.v, b.v)), 4)
        |           AS cosine_sim
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
        |WHERE cosine_sim >= 0.95 ORDER BY vec_id_a, vec_id_b""".stripMargin,

    "x2_semdedup" ->
      // Brute-force pairs >= 0.95 over the planted-copy corpus (the
      // x1_embed_neardup derivation) + recursive component resolution.
      // Valid against the k-means path because identical vectors share a
      // cluster at any k and nothing else clears the threshold.
      """WITH RECURSIVE corpus AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings),
        |         CAST(embedding AS DOUBLE[]) FROM embeddings
        |  WHERE vec_id < 5),
        |ep AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |  WHERE round(list_inner_product(a.v, b.v) /
        |              sqrt(list_inner_product(a.v, a.v) * list_inner_product(b.v, b.v)),
        |              4) >= 0.95),
        |eedges AS (SELECT ia AS src, ib AS dst FROM ep
        |           UNION SELECT ib, ia FROM ep),
        |ereach AS (
        |  SELECT src AS id, src AS lbl FROM eedges
        |  UNION
        |  SELECT e.dst, r.lbl FROM ereach r JOIN eedges e ON e.src = r.id)
        |SELECT id, min(lbl) AS cluster_id, min(lbl) = id AS keep
        |FROM ereach GROUP BY id ORDER BY id""".stripMargin,

    "x2_quant_topk" ->
      // Symmetric int8 quantization replayed in SQL: scale = max|x|/127,
      // q = round(x/scale) — all double arithmetic in the same order as
      // the Spark side, so the quantized vectors and ranking match
      // bit-for-bit. Scales cancel in cosine (no dequantization).
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qz AS (
        |  SELECT vec_id,
        |         CASE WHEN m = 0 THEN list_transform(v, x -> 0.0)
        |              ELSE list_transform(v, x -> round(x / (m / 127))) END AS qv
        |  FROM (SELECT vec_id, v,
        |               list_max(list_transform(v, x -> abs(x))) AS m FROM base)),
        |q AS (SELECT vec_id AS query_id, qv AS qq FROM qz WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, qv AS qc FROM qz),
        |s AS (
        |  SELECT query_id, cand_id,
        |         round(list_inner_product(qq, qc) /
        |               sqrt(list_inner_product(qq, qq) * list_inner_product(qc, qc)), 6) AS sim
        |  FROM q JOIN c ON cand_id <> query_id)
        |SELECT query_id, rank, neighbor_id, cosine_sim FROM (
        |  SELECT query_id, cand_id AS neighbor_id, round(sim, 4) AS cosine_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id)
        |              AS BIGINT) AS rank
        |  FROM s) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "x2_centroid_outliers" ->
      // Quantization (the shared X2d double-arithmetic scheme), the
      // per-(label, dim) integer census, the rational-centroid
      // distance numerator, and ONE plain window over the same
      // (dist DESC, vec_id ASC) total order the staged top-N provably
      // preserves. All integer after the quantize step — sums ride
      // DuckDB's HUGEINT, shipped as a canonical integer STRING (r12:
      // raw DECIMAL(38,0) output diverged in the driver's hasher).
      """WITH base AS (SELECT vec_id, label,
        |                     CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qz AS (SELECT vec_id, label,
        |         CASE WHEN m = 0 THEN list_transform(v, x -> 0.0)
        |              ELSE list_transform(v, x -> round(x / (m / 127))) END AS qv
        |       FROM (SELECT vec_id, label, v,
        |                    list_max(list_transform(v, x -> abs(x))) AS m
        |             FROM base)),
        |e AS (SELECT vec_id, label, CAST(unnest(qv) AS BIGINT) AS q,
        |             generate_subscripts(qv, 1) AS pos FROM qz),
        |cen AS (SELECT label, pos, sum(q) AS s, count(*) AS n
        |        FROM e GROUP BY 1, 2),
        |dd AS (SELECT e.vec_id, e.label,
        |              sum((e.q * c.n - c.s) * (e.q * c.n - c.s)) AS dist
        |       FROM e JOIN cen c ON e.label = c.label AND e.pos = c.pos
        |       GROUP BY 1, 2)
        |SELECT label, vec_id, CAST(dist AS VARCHAR) AS dist_num,
        |       rank_in_group
        |FROM (SELECT label, vec_id, dist,
        |             CAST(row_number() OVER (PARTITION BY label
        |               ORDER BY dist DESC, vec_id ASC) AS BIGINT)
        |               AS rank_in_group
        |      FROM dd)
        |WHERE rank_in_group <= 5
        |ORDER BY label, rank_in_group""".stripMargin,

    // The PQ planted twin replayed in closed form: the constructed
    // corpus's sub-vector (vec_id + m) % 4 IS codeword p of an
    // explicit codebook with entry value ((p+1)·(m+j+1)) % 5 − 2, so
    // encode is reconstruction-exact and the ADC score equals this
    // integer dot product; top-5 under the (sim DESC, cand_id ASC)
    // total order, self excluded. The SAME oracle serves the IVF-PQ
    // planted lane: with nProbe = k every inverted list is probed, so
    // the composed path is mathematically the exhaustive ADC scan.
    "x2_pq_planted" ->
      """WITH ids AS (SELECT vec_id FROM embeddings),
        |q AS (SELECT vec_id AS query_id FROM ids WHERE vec_id < 5),
        |grid AS (SELECT m, j
        |         FROM unnest(range(0, 4)) t(m), unnest(range(0, 2)) u(j)),
        |sc AS (
        |  SELECT q.query_id, c.vec_id AS cand_id,
        |         CAST(sum(
        |           (((((q.query_id + m) % 4) + 1) * (m + j + 1)) % 5 - 2) *
        |           (((((c.vec_id + m) % 4) + 1) * (m + j + 1)) % 5 - 2))
        |           AS DOUBLE) AS sim
        |  FROM q, ids c, grid
        |  WHERE c.vec_id <> q.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, rank, neighbor_id, adc_score FROM (
        |  SELECT query_id, cand_id AS neighbor_id, round(sim, 4) AS adc_score,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |           ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
        |  FROM sc) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "x2_ivfpq_planted" ->
      // The x2_pq_planted replay with the IVFADC decomposition folded
      // back together: corpus vector = 100-hot coarse block (dims 0-3
      // for even ids, 4-7 for odd — cell i = 2m+j is in the low block
      // iff m < 2) + the pqPlanted residual, and the engine's
      // q·centroid + residual-ADC sum equals the plain dot of those
      // composed vectors exactly (zero-error residual codebook, all
      // integers). nProbe = 2 probes both lists = the exhaustive scan.
      """WITH ids AS (SELECT vec_id FROM embeddings),
        |q AS (SELECT vec_id AS query_id FROM ids WHERE vec_id < 5),
        |grid AS (SELECT m, j
        |         FROM unnest(range(0, 4)) t(m), unnest(range(0, 2)) u(j)),
        |sc AS (
        |  SELECT q.query_id, c.vec_id AS cand_id,
        |         CAST(sum(
        |           ((CASE WHEN (q.query_id % 2 = 0) = (m < 2)
        |                  THEN 100 ELSE 0 END) +
        |            (((((q.query_id + m) % 4) + 1) * (m + j + 1)) % 5 - 2)) *
        |           ((CASE WHEN (c.vec_id % 2 = 0) = (m < 2)
        |                  THEN 100 ELSE 0 END) +
        |            (((((c.vec_id + m) % 4) + 1) * (m + j + 1)) % 5 - 2)))
        |           AS DOUBLE) AS sim
        |  FROM q, ids c, grid
        |  WHERE c.vec_id <> q.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, rank, neighbor_id, adc_score FROM (
        |  SELECT query_id, cand_id AS neighbor_id, round(sim, 4) AS adc_score,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |           ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
        |  FROM sc) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "x2_topk_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (
        |  SELECT query_id, cand_id,
        |         round(list_inner_product(qv, cv) /
        |               sqrt(list_inner_product(qv, qv) * list_inner_product(cv, cv)), 6) AS sim
        |  FROM q JOIN c ON cand_id <> query_id)
        |SELECT query_id, rank, neighbor_id, cosine_sim FROM (
        |  SELECT query_id, cand_id AS neighbor_id, round(sim, 4) AS cosine_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id)
        |              AS BIGINT) AS rank
        |  FROM s) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "x2_hard_negatives" ->
      // The banded top-k replayed: same cosine/6-dp/tiebreak discipline
      // as x2_topk_cosine, with the [0, 0.95] band applied to the
      // ROUNDED sim before the window — the engine filters before its
      // bounded aggregate at exactly the same values.
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (
        |  SELECT query_id, cand_id,
        |         round(list_inner_product(qv, cv) /
        |               sqrt(list_inner_product(qv, qv) * list_inner_product(cv, cv)), 6) AS sim
        |  FROM q JOIN c ON cand_id <> query_id),
        |b AS (SELECT * FROM s WHERE sim >= 0.0 AND sim <= 0.95)
        |SELECT query_id, rank, neighbor_id, cosine_sim FROM (
        |  SELECT query_id, cand_id AS neighbor_id, round(sim, 4) AS cosine_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id)
        |              AS BIGINT) AS rank
        |  FROM b) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "x2_mrl_topk" ->
      // BOTH stages replayed: candidate ranking on the 16-component
      // prefix (6-dp rounded sim, id tiebreak — the engine's ranking
      // discipline), top-20 candidates per query, then the exact
      // full-dimension re-rank to top-5. Deterministic end to end —
      // no hyperplanes, no centroids — so this is a true hash oracle,
      // not a planted twin.
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s1 AS (
        |  SELECT query_id, cand_id,
        |         round(list_inner_product(qv[1:16], cv[1:16]) /
        |               sqrt(list_inner_product(qv[1:16], qv[1:16])
        |                    * list_inner_product(cv[1:16], cv[1:16])), 6) AS sim
        |  FROM q JOIN c ON cand_id <> query_id),
        |cand AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT query_id, cand_id,
        |           row_number() OVER (PARTITION BY query_id
        |                              ORDER BY sim DESC, cand_id) AS r
        |    FROM s1) WHERE r <= 20),
        |s2 AS (
        |  SELECT query_id, cand_id,
        |         round(list_inner_product(qv, cv) /
        |               sqrt(list_inner_product(qv, qv)
        |                    * list_inner_product(cv, cv)), 6) AS sim
        |  FROM cand JOIN q USING (query_id) JOIN c USING (cand_id))
        |SELECT query_id, rank, neighbor_id, cosine_sim FROM (
        |  SELECT query_id, cand_id AS neighbor_id, round(sim, 4) AS cosine_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id)
        |              AS BIGINT) AS rank
        |  FROM s2) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // Planted ANN/IVF twins: queries are byte-identical copies of corpus
    // vectors 0-9 re-keyed past max(vec_id), so the true top-1 (the
    // source vector at cosine exactly 1.0) survives ANY hyperplane
    // family / centroid seed and a brute-force replay is a real oracle.
    "x2_ann_planted" ->
      """WITH q AS (SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings) AS query_id,
        |                  CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (
        |  SELECT query_id, cand_id,
        |         round(list_inner_product(qv, cv) /
        |               sqrt(list_inner_product(qv, qv) * list_inner_product(cv, cv)), 6) AS sim
        |  FROM q JOIN c ON cand_id <> query_id)
        |SELECT query_id, rank, neighbor_id, cosine_sim FROM (
        |  SELECT query_id, cand_id AS neighbor_id, round(sim, 4) AS cosine_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id)
        |              AS BIGINT) AS rank
        |  FROM s) WHERE rank = 1 ORDER BY query_id""".stripMargin,

    // Same planted fixture probed through the SAVED LSH band index
    // (saveBands → annTopKAgainst): byte-identical vectors reproduce
    // the saved signatures, so the same brute-force rank-1 replay holds.
    "x2_ann_against" ->
      """WITH q AS (SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings) AS query_id,
        |                  CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (
        |  SELECT query_id, cand_id,
        |         round(list_inner_product(qv, cv) /
        |               sqrt(list_inner_product(qv, qv) * list_inner_product(cv, cv)), 6) AS sim
        |  FROM q JOIN c ON cand_id <> query_id)
        |SELECT query_id, rank, neighbor_id, cosine_sim FROM (
        |  SELECT query_id, cand_id AS neighbor_id, round(sim, 4) AS cosine_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id)
        |              AS BIGINT) AS rank
        |  FROM s) WHERE rank = 1 ORDER BY query_id""".stripMargin,

    // Same planted fixture probed through the SAVED index
    // (save → load → topKAgainst): byte-identical vectors make rank-1
    // invariant to the round trip, so the same brute-force replay holds.
    "x2_ivf_against" ->
      """WITH q AS (SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings) AS query_id,
        |                  CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (
        |  SELECT query_id, cand_id,
        |         round(list_inner_product(qv, cv) /
        |               sqrt(list_inner_product(qv, qv) * list_inner_product(cv, cv)), 6) AS sim
        |  FROM q JOIN c ON cand_id <> query_id)
        |SELECT query_id, rank, neighbor_id, cosine_sim FROM (
        |  SELECT query_id, cand_id AS neighbor_id, round(sim, 4) AS cosine_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id)
        |              AS BIGINT) AS rank
        |  FROM s) WHERE rank = 1 ORDER BY query_id""".stripMargin,

    "x2_ivf_planted" ->
      """WITH q AS (SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings) AS query_id,
        |                  CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (
        |  SELECT query_id, cand_id,
        |         round(list_inner_product(qv, cv) /
        |               sqrt(list_inner_product(qv, qv) * list_inner_product(cv, cv)), 6) AS sim
        |  FROM q JOIN c ON cand_id <> query_id)
        |SELECT query_id, rank, neighbor_id, cosine_sim FROM (
        |  SELECT query_id, cand_id AS neighbor_id, round(sim, 4) AS cosine_sim,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id)
        |              AS BIGINT) AS rank
        |  FROM s) WHERE rank = 1 ORDER BY query_id""".stripMargin,

    "x3_top_tokens" ->
      """SELECT tok AS token, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents)
        |GROUP BY 1 ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

    "x3_quality_by_lang" ->
      """WITH per_doc AS (
        |  SELECT lang, n_chars,
        |         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |         round(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
        |                                       x -> length(x))) * 1.0 /
        |               greatest(len(string_split_regex(trim(text), '\s+')), 1), 4)
        |           AS mean_token_len,
        |         round(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                               x -> x IN ('a', 'the'))) * 1.0 /
        |               greatest(len(string_split_regex(trim(text), '\s+')), 1), 4)
        |           AS stopword_ratio
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |       round(CAST(sum(n_chars) AS DOUBLE) / count(n_chars), 2) AS avg_chars,
        |       round(CAST(sum(n_tokens) AS DOUBLE) / count(n_tokens), 2) AS avg_tokens,
        |       round(CAST(sum(CAST(mean_token_len AS DECIMAL(24,8))) AS DOUBLE) / count(mean_token_len), 4) AS avg_token_len,
        |       round(CAST(sum(CAST(stopword_ratio AS DECIMAL(24,8))) AS DOUBLE) / count(stopword_ratio), 4) AS avg_stopword_ratio
        |FROM per_doc GROUP BY 1 ORDER BY lang""".stripMargin,

    "x3_c4_rules" ->
      // The C4 §2.2 recipe replayed at the string level: per line the
      // whitespace-strip, terminal-punctuation tail, five-word floor,
      // and "javascript" exclusion; per page the brace and blocked-
      // phrase gates on the ORIGINAL text and the >=3-sentence floor
      // counted over the RETAINED text; the ordered rewrite pinned by
      // an md5-prefix fingerprint sum.
      (raw"""WITH d AS (
        |  SELECT doc_id, source,
        |         CASE WHEN doc_id % 7 = 0 THEN '{ brace page' || chr(10)
        |              ELSE '' END ||
        |         CASE WHEN doc_id % 11 = 0
        |              THEN 'Lorem Ipsum dolor sit amet.' || chr(10)
        |              ELSE '' END ||
        |         coalesce(text, '') || chr(10)
        |           || 'this line has five good words.' || chr(10)
        |           || 'no terminal punctuation here' || chr(10)
        |           || 'tiny line.' || chr(10)
        |           || 'this javascript line is long enough.' AS t
        |  FROM documents),
        |""".stripMargin + c4LineCtes("d") + ",\n" +
      raw"""cnt AS (SELECT doc_id, count(*) AS n_in FROM c4l GROUP BY doc_id),
        |fl AS (
        |  SELECT d.doc_id, d.source, coalesce(r.xt, '') AS xt,
        |         coalesce(r.n_kept, 0) AS n_kept, c.n_in,
        |         len(regexp_extract_all(coalesce(r.xt, ''), '[.!?]'))
        |           AS n_sent,
        |         contains(d.t, '{') AS has_brace,
        |         contains(lower(d.t), 'lorem ipsum') AS blocked
        |  FROM d LEFT JOIN c4reb r USING (doc_id) JOIN cnt c USING (doc_id))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(CASE WHEN NOT has_brace AND NOT blocked
        |                        AND n_sent >= 3 THEN 1 END) AS BIGINT)
        |         AS n_pass,
        |       CAST(sum(n_in) AS BIGINT) AS lines_in,
        |       CAST(sum(n_kept) AS BIGINT) AS lines_kept,
        |       CAST(sum(n_sent) AS BIGINT) AS sentences,
        |       CAST(sum(CAST(('0x' || substr(md5(xt), 1, 15)) AS BIGINT)
        |         % 1000000000) AS BIGINT) AS c4_fp_sum
        |FROM fl GROUP BY source ORDER BY source""".stripMargin),

    "x3_gopher_rules" ->
      // Every rule replayed in integer cross-multiplied form (3·n ≤ Σlen,
      // 10·symbols > chars, 5·dup ≥ bigrams, 10·dup > 3·lines,
      // 5·c₂ > chars / 50·c₃ > 9·chars / 25·c₄ > 4·chars) — no float
      // division reaches a comparison, so the per-lang verdict counts
      // are exact. N-grams via range() 1-based adjacency, matching the
      // Spark slice; top-gram coverage = the published Gopher quantity:
      // count of the MOST FREQUENT gram × its length, count ties broken
      // to the longest gram (mc first, then max length among grams at
      // mc). The plant CASE replicates the Spark side's
      // structural-duplication fixtures.
      {
      // Duplicate-5..10-gram machinery, generated per size: the gram
      // list (1-based adjacency like bg/tg/qg), and dup char mass =
      // total mass − mass of count-1 grams (≡ Σ over repeated grams of
      // count·len — the same mass reading the engine's NGramStats
      // returns).
      val gramLists = (5 to 10).map { k =>
        val cat = (0 until k).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
        s"""         CASE WHEN len(toks) >= $k THEN list_transform(range(1, len(toks) - ${k - 2}),
           |                i -> $cat)
           |              ELSE CAST([] AS VARCHAR[]) END AS g$k""".stripMargin
      }.mkString(",\n")
      val dupMasses = (5 to 10).map { k =>
        s"""         CAST(coalesce(list_sum(list_transform(g$k, x -> length(x))), 0) AS BIGINT)
           |           - CAST(coalesce(list_sum(list_transform(
           |               list_filter(list_distinct(g$k),
           |                 u -> len(list_filter(g$k, x -> x = u)) = 1),
           |               u -> length(u))), 0) AS BIGINT) AS dup$k""".stripMargin
      }.mkString(",\n")
      // Published thresholds 0.15/0.14/0.13/0.12/0.11/0.10 in integer
      // cross-multiplied form (numerator multiplier, denominator
      // multiplier per size).
      val thr = Map(5 -> (20, 3), 6 -> (50, 7), 7 -> (100, 13),
        8 -> (25, 3), 9 -> (100, 11), 10 -> (10, 1))
      val dupFlags = (5 to 10).map { k =>
        val (a, b) = thr(k)
        s"         $a * dup$k > $b * n_chars AS dup_${k}gram_heavy"
      }.mkString(",\n")
      val dupCounts = (5 to 10).map { k =>
        s"       count(CASE WHEN dup_${k}gram_heavy THEN 1 END) AS n_dup_${k}gram_heavy"
      }.mkString(",\n")
      val dupNotPass = (5 to 10).map(k => s"NOT dup_${k}gram_heavy").mkString(" AND ")
      // Per-language preset dispatch, interpolated from the SAME Scala
      // catalog the query runs under (config data — stopword lists and
      // fixtures share one definition like jaKoFixtures; the RULE logic
      // below stays an independent SQL restatement). Script classes use
      // RE2 \x{…} escapes for the same BMP ranges the presets carry as
      // literal characters.
      val fixtureValues = Queries.gopherCjkFixtures
        .map { case (id, l, t) => s"(CAST($id AS BIGINT), '$l', '$t')" }
        .mkString(", ")
      val stopCase = "CASE lang " +
        graft.ext.TextAnalysis.gopherPresets.toSeq.sortBy(_._1).map {
          case (l, p) =>
            s"WHEN '$l' THEN [${p.stopwords.map(w => s"'$w'").mkString(", ")}]"
        }.mkString(" ") + " ELSE ['a', 'the', 'and', 'of'] END"
      val symCase = raw"""CASE
        |           WHEN lang = 'zh' THEN length(t) - length(regexp_replace(t,
        |             '[^\x{4e00}-\x{9fff}0-9\s]', '', 'g'))
        |           WHEN lang = 'ja' THEN length(t) - length(regexp_replace(t,
        |             '[^\x{4e00}-\x{9fff}\x{3040}-\x{30ff}0-9\s]', '', 'g'))
        |           WHEN lang = 'ko' THEN length(t) - length(regexp_replace(t,
        |             '[^\x{ac00}-\x{d7a3}0-9\s]', '', 'g'))
        |           WHEN lang IN ('es', 'fr', 'de')
        |             THEN length(t) - length(regexp_replace(t,
        |               '[^A-Za-z\x{c0}-\x{d6}\x{d8}-\x{f6}\x{f8}-\x{ff}0-9\s]', '', 'g'))
        |           ELSE length(t) - length(regexp_replace(t,
        |             '[^A-Za-z0-9\s]', '', 'g')) END""".stripMargin
      raw"""WITH uni AS (
        |  SELECT doc_id, lang, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES $fixtureValues) v(doc_id, lang, text)),
        |pl AS (
        |  SELECT lang,
        |         CASE WHEN doc_id % 13 = 0 THEN text ||
        |                e'\nrepeat line\nrepeat line\nrepeat line\n\nsame para\n\nsame para'
        |              WHEN doc_id % 29 = 0 THEN text ||
        |                repeat(' badger badger', length(text) // 10 + 5)
        |              ELSE text END AS text
        |  FROM uni),
        |d AS (
        |  SELECT lang, coalesce(text, '') AS t,
        |         CASE WHEN lang IN ('zh', 'ja', 'ko')
        |              THEN regexp_extract_all(coalesce(text, ''), '\S')
        |              ELSE string_split_regex(trim(coalesce(text, '')), '\s+')
        |         END AS toks
        |  FROM pl),
        |g AS (
        |  SELECT lang, t, toks,
        |         CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
        |                i -> toks[i] || ' ' || toks[i + 1])
        |              ELSE CAST([] AS VARCHAR[]) END AS bg,
        |         CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
        |                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
        |              ELSE CAST([] AS VARCHAR[]) END AS tg,
        |         CASE WHEN len(toks) >= 4 THEN list_transform(range(1, len(toks) - 2),
        |                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
        |                       || ' ' || toks[i + 3])
        |              ELSE CAST([] AS VARCHAR[]) END AS qg,
        |$gramLists,
        |         list_filter(string_split_regex(t, '\n'),
        |                     l -> length(l) > 0) AS lns,
        |         list_filter(string_split_regex(t, '\n{2,}'),
        |                     q -> length(trim(q)) > 0) AS paras
        |  FROM d),
        |gm AS (
        |  SELECT *,
        |         coalesce(list_max(list_transform(list_distinct(bg),
        |           u -> len(list_filter(bg, x -> x = u)))), 0) AS mc2,
        |         coalesce(list_max(list_transform(list_distinct(tg),
        |           u -> len(list_filter(tg, x -> x = u)))), 0) AS mc3,
        |         coalesce(list_max(list_transform(list_distinct(qg),
        |           u -> len(list_filter(qg, x -> x = u)))), 0) AS mc4
        |  FROM g),
        |m AS (
        |  SELECT lang,
        |         CASE WHEN lang IN ('zh', 'ja', 'ko') THEN len(toks)
        |              WHEN len(trim(t)) = 0 THEN 0 ELSE len(toks) END AS n_tokens,
        |         CASE WHEN lang IN ('zh', 'ja', 'ko') THEN 1 ELSE 3 END AS min_mtl,
        |         CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
        |              AS BIGINT) AS sum_tok_len,
        |         length(t) AS n_chars,
        |         $symCase
        |           AS n_symbols,
        |         len(list_filter($stopCase,
        |                         s -> list_contains(toks, s))) AS stop_hits,
        |         len(bg) AS n_bigrams,
        |         len(bg) - len(list_distinct(bg)) AS dup_bigrams,
        |         len(lns) AS n_lines,
        |         len(lns) - len(list_distinct(lns)) AS dup_lines,
        |         len(paras) AS n_paras,
        |         len(paras) - len(list_distinct(paras)) AS dup_paras,
        |         CAST(coalesce(list_sum(list_transform(lns, l -> length(l))), 0) AS BIGINT)
        |           - CAST(coalesce(list_sum(list_transform(list_distinct(lns),
        |               l -> length(l))), 0) AS BIGINT) AS dup_line_chars,
        |         CAST(coalesce(list_sum(list_transform(paras, q -> length(q))), 0) AS BIGINT)
        |           - CAST(coalesce(list_sum(list_transform(list_distinct(paras),
        |               q -> length(q))), 0) AS BIGINT) AS dup_para_chars,
        |         CAST(mc2 AS BIGINT) * coalesce(list_max(list_transform(
        |           list_filter(list_distinct(bg),
        |             u -> len(list_filter(bg, x -> x = u)) = mc2),
        |           u -> length(u))), 0) AS c2,
        |         CAST(mc3 AS BIGINT) * coalesce(list_max(list_transform(
        |           list_filter(list_distinct(tg),
        |             u -> len(list_filter(tg, x -> x = u)) = mc3),
        |           u -> length(u))), 0) AS c3,
        |         CAST(mc4 AS BIGINT) * coalesce(list_max(list_transform(
        |           list_filter(list_distinct(qg),
        |             u -> len(list_filter(qg, x -> x = u)) = mc4),
        |           u -> length(u))), 0) AS c4,
        |$dupMasses
        |  FROM gm),
        |f AS (
        |  SELECT lang,
        |         n_tokens < 50 AS too_short,
        |         n_tokens > 100000 AS too_long,
        |         NOT (min_mtl * n_tokens <= sum_tok_len
        |              AND sum_tok_len <= 10 * n_tokens) AS bad_tok_len,
        |         10 * n_symbols > n_chars AS symbol_heavy,
        |         stop_hits < 2 AS low_stopword,
        |         n_bigrams > 0 AND 5 * dup_bigrams >= n_bigrams AS repetitive,
        |         10 * dup_lines > 3 * n_lines AS dup_line_heavy,
        |         10 * dup_paras > 3 * n_paras AS dup_para_heavy,
        |         5 * dup_line_chars > n_chars AS dup_line_chars_heavy,
        |         5 * dup_para_chars > n_chars AS dup_para_chars_heavy,
        |         5 * c2 > n_chars AS top_2gram_heavy,
        |         50 * c3 > 9 * n_chars AS top_3gram_heavy,
        |         25 * c4 > 4 * n_chars AS top_4gram_heavy,
        |$dupFlags
        |  FROM m)
        |SELECT lang, count(*) AS n_docs,
        |       count(CASE WHEN too_short THEN 1 END) AS n_too_short,
        |       count(CASE WHEN too_long THEN 1 END) AS n_too_long,
        |       count(CASE WHEN bad_tok_len THEN 1 END) AS n_bad_tok_len,
        |       count(CASE WHEN symbol_heavy THEN 1 END) AS n_symbol_heavy,
        |       count(CASE WHEN low_stopword THEN 1 END) AS n_low_stopword,
        |       count(CASE WHEN repetitive THEN 1 END) AS n_repetitive,
        |       count(CASE WHEN dup_line_heavy THEN 1 END) AS n_dup_line_heavy,
        |       count(CASE WHEN dup_para_heavy THEN 1 END) AS n_dup_para_heavy,
        |       count(CASE WHEN dup_line_chars_heavy THEN 1 END) AS n_dup_line_chars_heavy,
        |       count(CASE WHEN dup_para_chars_heavy THEN 1 END) AS n_dup_para_chars_heavy,
        |       count(CASE WHEN top_2gram_heavy THEN 1 END) AS n_top_2gram_heavy,
        |       count(CASE WHEN top_3gram_heavy THEN 1 END) AS n_top_3gram_heavy,
        |       count(CASE WHEN top_4gram_heavy THEN 1 END) AS n_top_4gram_heavy,
        |$dupCounts,
        |       count(CASE WHEN NOT too_short AND NOT too_long AND NOT bad_tok_len
        |                   AND NOT symbol_heavy AND NOT low_stopword
        |                   AND NOT repetitive AND NOT dup_line_heavy
        |                   AND NOT dup_para_heavy AND NOT dup_line_chars_heavy
        |                   AND NOT dup_para_chars_heavy AND NOT top_2gram_heavy
        |                   AND NOT top_3gram_heavy AND NOT top_4gram_heavy
        |                   AND $dupNotPass
        |                   THEN 1 END) AS n_pass
        |FROM f GROUP BY 1 ORDER BY lang""".stripMargin
      },

    "x3_fingerprints" ->
      """SELECT source, count(*) AS n_docs,
        |       count(DISTINCT fp) AS distinct_fp,
        |       min(fp) AS min_fp, max(fp) AS max_fp
        |FROM (SELECT source,
        |             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |      FROM documents)
        |GROUP BY 1 ORDER BY source""".stripMargin,

    "x3_token_counts" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS ws_tokens,
        |       CAST(sum(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))) AS BIGINT) AS bpe_tokens,
        |       round(avg(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))), 2) AS avg_bpe_tokens
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    "x14_url_stage" ->
      // The URL stage re-derived: same (source, doc_id)-residue URL
      // construction, then an INDEPENDENT canonicalization restatement
      // (strpos/substr for the query split where the engine uses an
      // anchored regexp) — strip fragment, lowercase scheme+host, strip
      // www., strip the scheme's default port, strip trailing path
      // slashes, keep the query. Blocklist = src3/src7 with the
      // subdomain suffix rule; url-dedup = min doc_id per canonical.
      ("WITH " + urlPlantCtes + ",\n" +
      """c AS (
        |  SELECT doc_id, url,
        |         scheme || '://'
        |         || (CASE WHEN scheme = 'http'
        |                    THEN regexp_replace(nowww, ':80$', '')
        |                  WHEN scheme = 'https'
        |                    THEN regexp_replace(nowww, ':443$', '')
        |                  ELSE nowww END)
        |         || regexp_replace(regexp_replace(pathq, '\?.*', ''), '/+$', '')
        |         || (CASE WHEN strpos(pathq, '?') > 0
        |                  THEN substr(pathq, strpos(pathq, '?')) ELSE '' END)
        |           AS curl,
        |         -- blocklist key: ANY port strips (a non-default port must
        |         -- not bypass policy), unlike the canonical host above
        |         regexp_replace(nowww, ':[0-9]+$', '') AS dom
        |  FROM h)
        |SELECT doc_id, url, curl, dom,
        |       NOT (dom = 'src3.example.org' OR dom LIKE '%.src3.example.org'
        |            OR dom = 'src7.example.org' OR dom LIKE '%.src7.example.org')
        |         AS is_url_ok,
        |       doc_id = min(doc_id) OVER (PARTITION BY curl) AS is_url_canonical
        |FROM c ORDER BY doc_id""".stripMargin),

    "x14_domain_cap" ->
      // The per-domain cap replayed over the SAME shared URL-plant CTEs:
      // dom = nowww with ANY port stripped (the blocklist key), cap = a
      // plain window over the (n_chars DESC, doc_id ASC) total order —
      // the naive plan the staged TopK must equal exactly.
      ("WITH " + urlPlantCtes + ",\n" +
      """dom AS (
        |  SELECT doc_id, regexp_replace(nowww, ':[0-9]+$', '') AS dom
        |  FROM h),
        |r AS (
        |  SELECT d.dom, doc.doc_id, doc.n_chars,
        |         row_number() OVER (PARTITION BY d.dom
        |           ORDER BY doc.n_chars DESC, doc.doc_id ASC)
        |           AS rank_in_domain
        |  FROM dom d JOIN documents doc USING (doc_id))
        |SELECT dom, rank_in_domain, doc_id, n_chars FROM r
        |WHERE rank_in_domain <= 3
        |ORDER BY dom, rank_in_domain""".stripMargin),

    "s13_stream_quality" ->
      // The streaming scorer's batch replay with the FILE-LOADED
      // weights (recipes/quality_scorer.json: 1800·stop + 1200·alpha
      // − 900·punct + 120·sum_tok_len; hi/lo = 1670/1560) — the same
      // zero-float-division integer replay as x13, plus the score-sum
      // column so a single drifted weight breaks the hash.
      """WITH m AS (
        |  SELECT lang,
        |         CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS ntok,
        |         length(coalesce(text, '')) AS nchar,
        |         len(list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
        |             x -> list_contains(['a','the','and','of','is','to','in','that'], x)))
        |           AS stop_hits,
        |         length(regexp_replace(coalesce(text, ''), '[^A-Za-z]', '', 'g'))
        |           AS alpha_chars,
        |         length(coalesce(text, '')) -
        |           length(regexp_replace(coalesce(text, ''), '[.,!?;:]', '', 'g'))
        |           AS punct_chars,
        |         CAST(coalesce(list_sum(list_transform(
        |             string_split_regex(trim(coalesce(text, '')), '\s+'),
        |             x -> length(x))), 0) AS BIGINT) AS sum_tok_len
        |  FROM documents),
        |f AS (
        |  SELECT lang, ntok,
        |         1800 * stop_hits * nchar + 1200 * alpha_chars * ntok
        |           - 900 * punct_chars * ntok + 120 * sum_tok_len * nchar
        |           AS score_num,
        |         ntok * nchar AS den
        |  FROM m),
        |b AS (
        |  SELECT lang, ntok, score_num,
        |         CASE WHEN den = 0 THEN 'empty'
        |              WHEN score_num >= 1670 * den THEN 'high'
        |              WHEN score_num >= 1560 * den THEN 'medium'
        |              ELSE 'low' END AS q_band
        |  FROM f)
        |SELECT lang, q_band, count(*) AS n_docs,
        |       CAST(sum(ntok) AS BIGINT) AS tokens,
        |       CAST(sum(score_num) AS BIGINT) AS score_num_sum
        |FROM b GROUP BY 1, 2 ORDER BY lang, q_band""".stripMargin,

    "x13_quality_bands" ->
      // The linear scorer replayed with zero float division: band
      // decisions multiply through by the positive denominator
      // n_tokens·n_chars, so `score >= t` becomes the integer
      // comparison `score_num >= t·ntok·nchar` (milli-unit weights
      // 2000·stop + 1000·alpha − 1000·punct + 100·sum_tok_len; bias 0;
      // hi/lo = 1450/1300).
      """WITH m AS (
        |  SELECT lang,
        |         CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS ntok,
        |         length(coalesce(text, '')) AS nchar,
        |         len(list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
        |             x -> list_contains(['a','the','and','of','is','to','in','that'], x)))
        |           AS stop_hits,
        |         length(regexp_replace(coalesce(text, ''), '[^A-Za-z]', '', 'g'))
        |           AS alpha_chars,
        |         length(coalesce(text, '')) -
        |           length(regexp_replace(coalesce(text, ''), '[.,!?;:]', '', 'g'))
        |           AS punct_chars,
        |         CAST(coalesce(list_sum(list_transform(
        |             string_split_regex(trim(coalesce(text, '')), '\s+'),
        |             x -> length(x))), 0) AS BIGINT) AS sum_tok_len
        |  FROM documents),
        |f AS (
        |  SELECT lang, ntok,
        |         2000 * stop_hits * nchar + 1000 * alpha_chars * ntok
        |           - 1000 * punct_chars * ntok + 100 * sum_tok_len * nchar
        |           AS score_num,
        |         ntok * nchar AS den
        |  FROM m),
        |b AS (
        |  SELECT lang, ntok,
        |         CASE WHEN den = 0 THEN 'empty'
        |              WHEN score_num >= 1450 * den THEN 'high'
        |              WHEN score_num >= 1300 * den THEN 'medium'
        |              ELSE 'low' END AS band
        |  FROM f)
        |SELECT lang, band, count(*) AS n_docs,
        |       CAST(sum(ntok) AS BIGINT) AS tokens
        |FROM b GROUP BY 1, 2 ORDER BY lang, band""".stripMargin,

    "x30_perceptron" ->
      // Distributed TRAINING replayed bit-for-bit: the batch
      // perceptron's three epochs as chained CTEs over the x13 integer
      // feature definitions — per epoch, every misclassified document
      // (y·(w·x) ≤ 0; w starts at 0, so epoch 1 misclassifies ALL)
      // contributes y·x to ONE summed integer update. All-integer, so
      // the weight trajectory is exact in any engine.
      """WITH m AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
        |         CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS x4,
        |         len(list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
        |             x -> list_contains(['a','the','and','of','is','to','in','that'], x)))
        |           AS x1,
        |         length(regexp_replace(coalesce(text, ''), '[^A-Za-z]', '', 'g'))
        |           AS x2,
        |         length(coalesce(text, '')) -
        |           length(regexp_replace(coalesce(text, ''), '[.,!?;:]', '', 'g'))
        |           AS x3
        |  FROM documents),
        |e1 AS (
        |  SELECT count(*) AS mis,
        |         COALESCE(CAST(sum(y) AS BIGINT), 0) AS d0,
        |         COALESCE(CAST(sum(y * x1) AS BIGINT), 0) AS d1,
        |         COALESCE(CAST(sum(y * x2) AS BIGINT), 0) AS d2,
        |         COALESCE(CAST(sum(y * x3) AS BIGINT), 0) AS d3,
        |         COALESCE(CAST(sum(y * x4) AS BIGINT), 0) AS d4
        |  FROM m WHERE y * 0 <= 0),
        |w1 AS (SELECT mis, d0 AS a0, d1 AS a1, d2 AS a2, d3 AS a3, d4 AS a4
        |       FROM e1),
        |e2 AS (
        |  SELECT count(*) AS mis,
        |         COALESCE(CAST(sum(y) AS BIGINT), 0) AS d0,
        |         COALESCE(CAST(sum(y * x1) AS BIGINT), 0) AS d1,
        |         COALESCE(CAST(sum(y * x2) AS BIGINT), 0) AS d2,
        |         COALESCE(CAST(sum(y * x3) AS BIGINT), 0) AS d3,
        |         COALESCE(CAST(sum(y * x4) AS BIGINT), 0) AS d4
        |  FROM m, w1
        |  WHERE y * (a0 + a1 * x1 + a2 * x2 + a3 * x3 + a4 * x4) <= 0),
        |w2 AS (SELECT e2.mis, w1.a0 + e2.d0 AS a0, w1.a1 + e2.d1 AS a1,
        |              w1.a2 + e2.d2 AS a2, w1.a3 + e2.d3 AS a3,
        |              w1.a4 + e2.d4 AS a4
        |       FROM w1, e2),
        |e3 AS (
        |  SELECT count(*) AS mis,
        |         COALESCE(CAST(sum(y) AS BIGINT), 0) AS d0,
        |         COALESCE(CAST(sum(y * x1) AS BIGINT), 0) AS d1,
        |         COALESCE(CAST(sum(y * x2) AS BIGINT), 0) AS d2,
        |         COALESCE(CAST(sum(y * x3) AS BIGINT), 0) AS d3,
        |         COALESCE(CAST(sum(y * x4) AS BIGINT), 0) AS d4
        |  FROM m, w2
        |  WHERE y * (a0 + a1 * x1 + a2 * x2 + a3 * x3 + a4 * x4) <= 0),
        |w3 AS (SELECT e3.mis, w2.a0 + e3.d0 AS a0, w2.a1 + e3.d1 AS a1,
        |              w2.a2 + e3.d2 AS a2, w2.a3 + e3.d3 AS a3,
        |              w2.a4 + e3.d4 AS a4
        |       FROM w2, e3)
        |SELECT CAST(epoch AS BIGINT) AS epoch,
        |       CAST(mis AS BIGINT) AS n_misclassified,
        |       CAST(a0 AS BIGINT) AS w_f_one,
        |       CAST(a1 AS BIGINT) AS w_q_stop_hits,
        |       CAST(a2 AS BIGINT) AS w_q_alpha_chars,
        |       CAST(a3 AS BIGINT) AS w_q_punct_chars,
        |       CAST(a4 AS BIGINT) AS w_q_tokens
        |FROM (
        |  SELECT 1 AS epoch, * FROM w1
        |  UNION ALL SELECT 2 AS epoch, * FROM w2
        |  UNION ALL SELECT 3 AS epoch, * FROM w3)
        |ORDER BY epoch""".stripMargin,

    "x24_bm25_rank" ->
      // BM25 replayed: the ONE micro-nat idf rounding (non-negative
      // form), then pure integer arithmetic — both floor divisions
      // (`div` ≡ `//` for these non-negative operands), the rational
      // avgdl as (dl·n)//ltot inside the saturation denominator, the
      // per-doc contribution sum, and the (score desc, doc_id asc)
      // top-10 window.
      bm25RankSql,

    // The persisted-index probe scores the SAME exact integers (save ->
    // probe == fresh pinned in TfIdfSpec), so it replays the same SQL --
    // the x15_lm_against / x16_dsir_against precedent.
    "x24_bm25_against" -> bm25RankSql,

    // Merging two disjoint-shard indexes must be indistinguishable from
    // indexing the union fresh — same full-corpus replay again.
    "x24_bm25_merged" -> bm25RankSql,

    // Document removal must leave an artifact INDISTINGUISHABLE from
    // indexing the remainder fresh: the same replay, documents table
    // pre-filtered to the kept set — every idf (df AND N/L) must have
    // shifted exactly as if the removed docs never existed.
    "x24_bm25_removed" -> bm25RankSqlOn("NOT (doc_id % 7 = 3)"),

    "s8_stream_bm25" ->
      // The streaming relevance scorer batch-replayed: idf re-derived
      // from the FIT corpus (docs < 300 — df = distinct containing
      // docs, absent terms df 0), then the same integer per-term
      // contribution formula over every shard document; no-hit docs
      // score 0 via the LEFT JOIN + coalesce, mirroring the engine's
      // annotate-don't-drop.
      raw"""WITH fit AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |l0 AS (
        |  SELECT CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS dl
        |  FROM fit),
        |tot AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS ltot FROM l0),
        |ftok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM fit WHERE text IS NOT NULL AND len(trim(text)) > 0),
        |dfc AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM ftok
        |  WHERE term IN ('data', 'vector', 'merge') GROUP BY term),
        |q AS (
        |  SELECT t.term,
        |         CAST(round(ln(1 + (tot.n - coalesce(d.df, 0) + 0.5)
        |                        / (coalesce(d.df, 0) + 0.5)) * 1000000)
        |              AS BIGINT) AS idf
        |  FROM (VALUES ('data'), ('vector'), ('merge')) t(term)
        |  LEFT JOIN dfc d USING (term), tot),
        |shard AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 300),
        |sdl AS (
        |  SELECT doc_id,
        |         CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS dl
        |  FROM shard),
        |stok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM shard WHERE text IS NOT NULL AND len(trim(text)) > 0),
        |stf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM stok
        |  WHERE term IN ('data', 'vector', 'merge') GROUP BY doc_id, term),
        |c AS (
        |  SELECT s.doc_id,
        |         (q.idf * s.tf * 2200 * 1000)
        |           // (s.tf * 1000000 + 300000 +
        |               ((1200 * 750 * d.dl * t.n) // t.ltot)) AS contrib
        |  FROM stf s JOIN q USING (term) JOIN sdl d USING (doc_id), tot t),
        |agg AS (
        |  SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS bm25_micro,
        |         count(*) AS terms_hit
        |  FROM c GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.bm25_micro, 0) AS bm25_micro,
        |       CAST(coalesce(a.terms_hit, 0) AS BIGINT) AS terms_hit
        |FROM sdl d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "x19_nfc_dedup" ->
      // NFC-aware dedup replayed WITHOUT computing NFD: NFC(NFD(x)) =
      // NFC(x) is a Unicode invariant, so the decomposed twin (+2e6)
      // shares the composed twin's (+1e6) nfc_normalize family key and
      // loses min-key; every survivor's fingerprint is md5 of NFC text
      // both engines compute (JDK Normalizer and utf8proc implement
      // the same spec). The ' é café' literal guarantees the plant has
      // composable sequences even over ASCII-only documents.
      """WITH base AS (SELECT doc_id, text FROM documents),
        |tw AS (
        |  SELECT doc_id, coalesce(text, '') || ' é café' AS text
        |  FROM base WHERE doc_id < 10),
        |corpus AS (
        |  SELECT doc_id, nfc_normalize(text) AS ntext FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000, nfc_normalize(text) FROM tw
        |  UNION ALL
        |  SELECT doc_id + 2000000, nfc_normalize(text) FROM tw),
        |k AS (
        |  SELECT doc_id, ntext,
        |         lower(trim(regexp_replace(ntext, '\s+', ' ', 'g'))) AS kt
        |  FROM corpus),
        |s AS (
        |  SELECT doc_id, ntext,
        |         doc_id = min(doc_id) OVER (PARTITION BY kt) AS keep
        |  FROM k)
        |SELECT doc_id, md5(coalesce(ntext, '')) AS nfc_fp
        |FROM s WHERE keep ORDER BY doc_id""".stripMargin,

    "x31_kanon" ->
      // The k-anonymity audit replayed as the NAIVE per-group window
      // the census+join formulation avoids. NULL user_id: a real
      // group for counting (window partitions nulls together, like
      // the engine's <=> join) but excluded from the DISTINCT group
      // censuses in both engines.
      """WITH g AS (
        |  SELECT user_id, event_type,
        |         count(*) OVER (PARTITION BY user_id, event_type) AS gs
        |  FROM events)
        |SELECT event_type, count(*) AS rows_total,
        |       CAST(sum(CASE WHEN gs >= 10 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS rows_kept,
        |       count(DISTINCT user_id) AS groups_total,
        |       count(DISTINCT CASE WHEN gs < 10 THEN user_id END)
        |         AS groups_suppressed
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,

    "x31_ldiversity" ->
      // The l-diversity audit replayed: per-customer distinct-status
      // census, null-safe join back (NULL custkey is a real quasi
      // group for rows_total/rows_kept but excluded from the DISTINCT
      // group censuses in both engines — count(DISTINCT) drops
      // nulls), the l=3 verdict per row, per-status rollup.
      """WITH du AS (
        |  SELECT o_custkey,
        |         count(DISTINCT o_orderstatus) AS div
        |  FROM orders GROUP BY 1),
        |g AS (
        |  SELECT o.o_orderstatus, o.o_custkey, du.div
        |  FROM orders o JOIN du
        |    ON o.o_custkey IS NOT DISTINCT FROM du.o_custkey)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS rows_total,
        |       CAST(sum(CASE WHEN div >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS rows_kept,
        |       count(DISTINCT o_custkey) AS groups_total,
        |       count(DISTINCT CASE WHEN div < 3 THEN o_custkey END)
        |         AS groups_suppressed
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "x12_upsample" ->
      // The epoch expansion replayed copy for copy: per-source ppm
      // factor (when-chain restated as CASE), whole epochs by integer
      // division, the fractional-epoch keep draw by the SAME salted
      // hash64 mod 10⁶, the expansion as unnest(range(n)) — the
      // (doc_id, epoch_idx) fingerprint sum pins WHICH copies exist.
      (s"""WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |         CASE source WHEN 'src1' THEN 2300000
        |                     WHEN 'src2' THEN 500000
        |                     WHEN 'src3' THEN 0
        |                     ELSE 1000000 END AS f
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, source, n_chars,
        |         (f // 1000000) +
        |           (CASE WHEN (${hash64Sql("doc_id",
                      42L ^ graft.ext.Mixing.EpochSalt)} % 1000000)
        |                      < (f % 1000000)
        |                 THEN 1 ELSE 0 END) AS nc
        |  FROM d),
        |e AS (
        |  SELECT doc_id, source, n_chars,
        |         unnest(range(nc)) AS epoch_idx
        |  FROM n WHERE nc >= 1)
        |SELECT source, count(*) AS rows_out,
        |       CAST(max(epoch_idx) AS BIGINT) AS max_epoch,
        |       CAST(sum(n_chars) AS BIGINT) AS char_mass,
        |       CAST(sum((doc_id * 1031 + epoch_idx) % 1000000000)
        |            AS BIGINT) AS copy_fp_sum
        |FROM e GROUP BY source ORDER BY source""").stripMargin,

    "x16_dsir_weights" ->
      ("WITH " + dsirWeightCtes + "\n" +
        """SELECT doc_id, dsir_grams, dsir_logw_micro,
          |       round(CAST(dsir_logw_micro AS DOUBLE) / 1000000, 3) AS dsir_logw
          |FROM w ORDER BY doc_id""".stripMargin),

    // The persisted-model probe scores IDENTICALLY to the fresh fit
    // (integer micro-nat weights; save→load parity pinned by DsirSpec),
    // so the loaded-model query replays the SAME weight derivation.
    "x16_dsir_against" ->
      ("WITH " + dsirWeightCtes + "\n" +
        """SELECT doc_id, dsir_grams, dsir_logw_micro,
          |       round(CAST(dsir_logw_micro AS DOUBLE) / 1000000, 3) AS dsir_logw
          |FROM w ORDER BY doc_id""".stripMargin),

    "x16_dsir_select" ->
      // The Gumbel draw replayed: hash64 → (h + 0.5)/2⁶³ uniform →
      // round(1e6·(−ln(−ln u))) integer perturbation → top-100 by the
      // perturbed key (ties by doc_id) → re-sorted on doc_id.
      ("WITH " + dsirWeightCtes + ",\n" +
        s"""sel AS (
           |  SELECT doc_id, dsir_logw_micro,
           |         dsir_logw_micro + CAST(round(-1000000 * ln(-ln(
           |           (CAST(${hash64Sql("doc_id", 42L ^ graft.ext.Sampling.GumbelSalt)}
           |              AS DOUBLE) + 0.5) / 9223372036854775808.0)))
           |           AS BIGINT) AS dsir_key_micro
           |  FROM w),
           |top AS (
           |  SELECT * FROM sel ORDER BY dsir_key_micro DESC, doc_id LIMIT 100)
           |SELECT doc_id, dsir_logw_micro, dsir_key_micro
           |FROM top ORDER BY doc_id""".stripMargin),

    "x15_lm_ppl" -> lmPplSql,

    // The persisted-model probe scores IDENTICALLY to the fresh train
    // (integer micro-nats; save→load parity pinned by NgramLmSpec), so
    // the loaded-model query replays the SAME bigram derivation.
    "x15_lm_against" -> lmPplSql,

    // The 5-gram KenLM shape (VERDICT r10 next #5): the generated
    // order-n replay with all four backoff levels.
    "x15_lm_ppl5" -> lmPplSqlN(5),

    "x15_lm_ppl3" ->
      // The trigram stupid-backoff replay: same counts-from-docs<300 /
      // probe-from-docs>=300 shape as x15_lm_ppl one order up, with the
      // TWO-level backoff CASE — trigram hit over its (w1,w2) context
      // count, else BackoffMicro + bigram(w2,w3) over c(w2), else
      // 2·BackoffMicro + the Laplace unigram of w3. Each level adds the
      // pre-rounded integer constant; exactly one ln is rounded per arm.
      s"""WITH norm AS (
        |  SELECT doc_id,
        |         lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |rtoks AS (
        |  SELECT doc_id, unnest(string_split(t, ' ')) AS tok,
        |         generate_subscripts(string_split(t, ' '), 1) AS ord
        |  FROM norm WHERE doc_id < 300 AND t <> ''),
        |uni AS (SELECT tok AS w, count(*) AS c1 FROM rtoks GROUP BY 1),
        |big AS (
        |  SELECT w1, w2, count(*) AS c2 FROM (
        |    SELECT tok AS w1,
        |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
        |    FROM rtoks) WHERE w2 IS NOT NULL GROUP BY 1, 2),
        |tri AS (
        |  SELECT w1, w2, w3, count(*) AS c3 FROM (
        |    SELECT tok AS w1,
        |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w2,
        |           lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS w3
        |    FROM rtoks) WHERE w3 IS NOT NULL GROUP BY 1, 2, 3),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS total_toks,
        |               count(*) AS vocab FROM uni),
        |ptoks AS (
        |  SELECT doc_id, unnest(string_split(t, ' ')) AS tok,
        |         generate_subscripts(string_split(t, ' '), 1) AS ord
        |  FROM norm WHERE doc_id >= 300 AND t <> ''),
        |probe AS (
        |  SELECT doc_id, w1, w2, w3, count(*) AS m FROM (
        |    SELECT doc_id, tok AS w1,
        |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w2,
        |           lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS w3
        |    FROM ptoks) WHERE w3 IS NOT NULL GROUP BY 1, 2, 3, 4),
        |g AS (
        |  SELECT p.doc_id, p.m, t3.c3,
        |         CASE WHEN t3.c3 IS NOT NULL THEN
        |           CAST(round(1000000 * ln(CAST(t3.c3 AS DOUBLE) / bc.c2)) AS BIGINT)
        |         WHEN bb.c2 IS NOT NULL THEN
        |           ${graft.ext.NgramLm.BackoffMicro} + CAST(round(1000000 * ln(
        |             CAST(bb.c2 AS DOUBLE) / u2.c1)) AS BIGINT)
        |         ELSE ${2L * graft.ext.NgramLm.BackoffMicro} + CAST(round(1000000 * ln(
        |           CAST(coalesce(u3.c1, 0) + 1 AS DOUBLE)
        |             / (t.total_toks + t.vocab))) AS BIGINT)
        |         END AS micro
        |  FROM probe p
        |  LEFT JOIN tri t3 ON p.w1 = t3.w1 AND p.w2 = t3.w2 AND p.w3 = t3.w3
        |  LEFT JOIN big bc ON p.w1 = bc.w1 AND p.w2 = bc.w2
        |  LEFT JOIN big bb ON p.w2 = bb.w1 AND p.w3 = bb.w2
        |  LEFT JOIN uni u2 ON p.w2 = u2.w
        |  LEFT JOIN uni u3 ON p.w3 = u3.w
        |  CROSS JOIN tot t),
        |per AS (
        |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS lm_grams,
        |         CAST(sum(CASE WHEN c3 IS NOT NULL THEN m ELSE 0 END) AS BIGINT)
        |           AS lm_hits,
        |         CAST(sum(m * micro) AS BIGINT) AS lm_logp_micro
        |  FROM g GROUP BY 1)
        |SELECT d.doc_id,
        |       coalesce(lm_grams, 0) AS lm_grams,
        |       coalesce(lm_hits, 0) AS lm_hits,
        |       coalesce(lm_logp_micro, 0) AS lm_logp_micro,
        |       CASE WHEN coalesce(lm_grams, 0) > 0
        |            THEN round(exp(-CAST(lm_logp_micro AS DOUBLE) / 1000000
        |                           / lm_grams), 3) END AS lm_ppl,
        |       CASE WHEN coalesce(lm_grams, 0) = 0 THEN 'empty'
        |            WHEN lm_logp_micro >= ${graft.ext.NgramLm.HeadMicro} * lm_grams THEN 'head'
        |            WHEN lm_logp_micro >= ${graft.ext.NgramLm.TailMicro} * lm_grams THEN 'middle'
        |            ELSE 'tail' END AS lm_band
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 300) d
        |LEFT JOIN per USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "x4_zscore_flags" ->
      """WITH stats AS (
        |  SELECT event_type,
        |         CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(value) AS m,
        |         sqrt((CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
        |               - CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |                 * CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(value))
        |              / (count(value) - 1)) AS sd
        |  FROM events GROUP BY 1)
        |SELECT event_id, event_type, value, z FROM (
        |  SELECT event_id, e.event_type, value,
        |         round((value - m) / sd, 4) AS z
        |  FROM events e JOIN stats USING (event_type))
        |WHERE abs(z) > 3.0 ORDER BY event_id""".stripMargin,

    "s1_windowed_checks" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |       count(*) AS n_rows,
        |       count(CASE WHEN user_id IS NULL THEN 1 END) AS null_user_id,
        |       count(CASE WHEN value < 0 THEN 1 END) AS value_below_zero
        |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin,

    "v5_drift_check" ->
      // The drift loop re-derived: baseline run = orders minus keys
      // ≡ 0 mod 10 (~10% shrink → ~11.1% drift vs the full table), so the
      // ±15% check passes and the ±5% check fails. Status compares the
      // UNROUNDED drift; only the emitted pct_change is rounded (4 dp),
      // matching the Spark side.
      """WITH b AS (SELECT count(*) AS base FROM orders WHERE o_orderkey % 10 <> 0),
        |     c AS (SELECT count(*) AS cur FROM orders),
        |     p AS (SELECT base, cur, abs(cur - base) * 100.0 / base AS pct FROM b, c)
        |SELECT * FROM (
        |  SELECT 'orders.row_count_drift:15.0pct' AS validation_name,
        |         CASE WHEN pct <= 15.0 THEN 'PASSED' ELSE 'FAILED' END AS status,
        |         cur AS element_count,
        |         CAST(CASE WHEN pct <= 15.0 THEN 0 ELSE 1 END AS BIGINT) AS unexpected_count,
        |         round(pct, 4) AS pct_change
        |  FROM p
        |  UNION ALL
        |  SELECT 'orders.row_count_drift:5.0pct',
        |         CASE WHEN pct <= 5.0 THEN 'PASSED' ELSE 'FAILED' END,
        |         cur, CAST(CASE WHEN pct <= 5.0 THEN 0 ELSE 1 END AS BIGINT),
        |         round(pct, 4)
        |  FROM p
        |) ORDER BY validation_name""".stripMargin,

    "x5_frame_sample" ->
      // Frame refs = one per second of duration; duration_ms = n_chars*10,
      // so frames per video doc = max(n_chars // 100 - 1, 0) + 1
      // (sequence(0, greatest(dur/1000 - 1, 0)) inclusive on the Spark
      // side). Video docs are doc_id % 3 == 2 (see syntheticMediaFromDocuments).
      """SELECT media_id, frame_idx, CAST(frame_idx * 1000 AS BIGINT) AS frame_ms
        |FROM (
        |  SELECT doc_id AS media_id,
        |         unnest(range(0, greatest(CAST(n_chars AS BIGINT) // 100 - 1, 0) + 1)) AS frame_idx
        |  FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY media_id, frame_idx""".stripMargin,

    "g16_declarative_suite" ->
      // The checked-in suites/testdata_core.json re-derived declaratively:
      // one row per expectation — (qualified name, status, element_count,
      // unexpected_count) — exactly the suite summary the loader+runner
      // emit. The c_mktsegment in-set check deliberately FAILs (MACHINERY
      // is outside the declared set, mirroring the reference's
      // intentionally-excluded whitelist).
      s"""SELECT * FROM ($testdataCoreSuiteRows) ORDER BY validation_name""",

    "v6_checkpoint_run" ->
      // The checkpoint persists the same suite results into the store
      // under a fixed run id; the query reads the store back, so the
      // oracle is the g16 derivation plus the run_id column.
      s"""SELECT '2026-01-01T00:00:00Z' AS run_id, *
         |FROM ($testdataCoreSuiteRows)
         |ORDER BY validation_name""".stripMargin,

    "x3_lang_confusion" ->
      // The language-ID heuristic replayed in SQL: script-ratio gates
      // (kana → ja at 5%, hangul → ko and han → zh at 30% — most
      // specific first, since ja/ko text contains han), then per-language
      // stopword hit counts over whitespace tokens of the lowercased
      // text, then the argmax with ties breaking to the lexicographically
      // LARGEST language — exactly the Spark side's array_max over
      // (score, lang) structs (fr > es > en > de). The ja/ko fixture
      // rows interpolate from the SAME Scala constant the query unions
      // in ([[Queries.jaKoFixtures]]), so both engines see identical
      // text.
      s"""WITH corpus AS (
        |  SELECT lang, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES ${Queries.jaKoFixtures
             .map { case (l, t) => s"('$l', '$t')" }.mkString(", ")}) v(lang, text)),
        |t AS (
        |  SELECT lang AS label, text,
        |         string_split_regex(trim(lower(text)), '\\s+') AS toks,
        |         (length(text) - length(regexp_replace(text, '[\\x{3040}-\\x{30ff}]', '', 'g'))) * 1.0
        |           / greatest(length(text), 1) AS kana,
        |         (length(text) - length(regexp_replace(text, '[\\x{ac00}-\\x{d7a3}]', '', 'g'))) * 1.0
        |           / greatest(length(text), 1) AS hang,
        |         (length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g'))) * 1.0
        |           / greatest(length(text), 1) AS cjk
        |  FROM corpus),
        |s AS (
        |  SELECT label, kana, hang, cjk,
        |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit'], x))) AS s_de,
        |    len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in','that'], x))) AS s_en,
        |    len(list_filter(toks, x -> list_contains(['el','la','de','que','los','una','por','con'], x))) AS s_es,
        |    len(list_filter(toks, x -> list_contains(['le','la','les','et','des','une','est','dans'], x))) AS s_fr
        |  FROM t),
        |p AS (
        |  SELECT label,
        |    CASE WHEN kana > 0.05 THEN 'ja'
        |         WHEN hang > 0.3 THEN 'ko'
        |         WHEN cjk > 0.3 THEN 'zh'
        |         WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
        |         WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
        |         WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
        |         WHEN s_en >= s_de THEN 'en'
        |         ELSE 'de' END AS predicted
        |  FROM s)
        |SELECT label, predicted, count(*) AS n
        |FROM p GROUP BY 1, 2 ORDER BY label, predicted""".stripMargin,

    "x3_lang_train" -> {
      // The 4-class one-vs-rest TRAINING replayed bit-for-bit: the
      // shared integer feature CTE, then per class the x30 chained
      // epoch CTEs (w starts at 0 → epoch 1 misclassifies ALL; each
      // epoch's update is one summed integer aggregate), unioned into
      // the (lang, epoch) trajectory frame.
      val dim = langFeatExprs.size
      val unions = graft.ext.LangTrained.Langs.map { l =>
        (1 to 3).map { k =>
          s"SELECT '$l' AS lang, $k AS epoch, mis, " +
            (0 until dim).map(i => s"a$i").mkString(", ") + s" FROM w${k}_$l"
        }.mkString("\n  UNION ALL ")
      }.mkString("\n  UNION ALL ")
      "WITH " + langFeatCte + ",\n" + langTrajCtes(3) + "\n" +
        s"""SELECT lang, CAST(epoch AS BIGINT) AS epoch,
           |       CAST(mis AS BIGINT) AS n_misclassified,
           |       ${(0 until dim).map(i =>
                    s"CAST(a$i AS BIGINT) AS ${langWColNames(i)}")
                    .mkString(",\n       ")}
           |FROM ($unions)
           |ORDER BY lang, epoch""".stripMargin
    },

    // The trained model SERVING replayed: the same trajectory CTEs
    // yield the final weights, margins are pure integer dot products
    // against the feature columns, the multi-class decision is the
    // SAME pinned first-wins chain (class order = sorted Langs, a
    // winner must be positive, none → 'und'), and the X3e heuristic
    // re-derives alongside (the x3_lang_confusion formulation) — the
    // census compares both against the corpus label. ONE definition
    // serves x3_lang_trained AND its streaming batch replay
    // s17_stream_lang (the s14/x42 shared-oracle contract).
    "x3_lang_trained" -> langTrainedSql,

    "s17_stream_lang" -> langTrainedSql,

    "x11_skew_profile" ->
      // Top-10 heaviest l_suppkey values with their row share; ties at
      // the cut break by key ascending on both sides.
      """SELECT l_suppkey, cnt, share FROM (
        |  SELECT l_suppkey, count(*) AS cnt,
        |         round(count(*) * 100.0 / (SELECT count(*) FROM lineitem), 3) AS share
        |  FROM lineitem GROUP BY 1)
        |ORDER BY cnt DESC, l_suppkey LIMIT 10""".stripMargin,

    "x11_salted_join" ->
      // The PLAIN inner join: equality with the Spark side's salted
      // spray+replicate layout proves salting is result-invisible.
      """SELECT l_suppkey AS s_suppkey, count(*) AS n_lines,
        |       max(s_nationkey) AS nation_key
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY s_suppkey""".stripMargin,

    "x12_token_mix" ->
      // The recipe replayed: per-source token supply, literal targets
      // (budget 3000 × weights .5/.3/.2 on src0/1/2, else 0), keep
      // threshold = floor(least(1, target/supply)·10⁴ + 0.5) — the same
      // explicit half-up rounding as Mixing.rateFrame — and survivor
      // selection via the shared Sampling.bucket replay (bucketSql).
      // Every sum/coalesce cast to BIGINT to match Spark's long
      // aggregates (DuckDB sum(int) widens to HUGEINT).
      raw"""WITH tc AS (
        |  SELECT doc_id, source,
        |         CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS nt
        |  FROM documents),
        |tot AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(nt) AS BIGINT) AS tokens_in
        |  FROM tc GROUP BY 1),
        |rates AS (
        |  SELECT source, n_docs, tokens_in,
        |         CAST(CASE source WHEN 'src0' THEN 1500 WHEN 'src1' THEN 900
        |                          WHEN 'src2' THEN 600 ELSE 0 END AS BIGINT)
        |           AS target_tokens,
        |         CASE WHEN tokens_in = 0 THEN 0
        |              ELSE CAST(floor(least(1.0,
        |                CAST(CASE source WHEN 'src0' THEN 1500 WHEN 'src1' THEN 900
        |                                 WHEN 'src2' THEN 600 ELSE 0 END AS BIGINT)
        |                * 1.0 / tokens_in) * 10000 + 0.5) AS BIGINT) END AS thr
        |  FROM tot),
        |kept AS (
        |  SELECT t.source, count(*) AS docs_kept,
        |         CAST(sum(t.nt) AS BIGINT) AS tokens_kept
        |  FROM tc t JOIN rates r USING (source)
        |  WHERE ${bucketSql("t.doc_id", 42L ^ graft.ext.Sampling.MixSalt)} < r.thr
        |  GROUP BY 1)
        |SELECT r.source, r.n_docs, r.tokens_in, r.target_tokens,
        |       CAST(coalesce(k.docs_kept, 0) AS BIGINT) AS docs_kept,
        |       CAST(coalesce(k.tokens_kept, 0) AS BIGINT) AS tokens_kept
        |FROM rates r LEFT JOIN kept k USING (source)
        |ORDER BY source""".stripMargin,

    "x12_weighted_mix" ->
      // Weight-aware mixing replayed end-to-end: the soft-dedup census
      // (window count over the normalized text, floor(10⁶/n) ppm — same
      // planted-shard union as x17_soft_dedup), the micro-token supply
      // census sum(nt·wppm), the threshold floor(least(1, target·10⁶ /
      // utokens_in)·10⁴ + 0.5), and the all-integer keep predicate
      // bucket·10⁶ < thr·wppm. Sums cast to BIGINT (DuckDB widens to
      // HUGEINT) to match Spark's DECIMAL(38,0)→long audit columns.
      raw"""WITH all_docs AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text, source FROM documents WHERE doc_id < 10
        |  UNION ALL
        |  SELECT doc_id + 20000, text, source FROM documents WHERE doc_id < 5),
        |w AS (
        |  SELECT doc_id, source,
        |         CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS nt,
        |         CAST(floor(1000000.0 / count(*) OVER (PARTITION BY
        |              lower(trim(regexp_replace(text, '\s+', ' ', 'g')))))
        |              AS BIGINT) AS wppm
        |  FROM all_docs),
        |tot AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(nt * wppm) AS BIGINT) AS utokens_in
        |  FROM w GROUP BY 1),
        |rates AS (
        |  SELECT source, n_docs, utokens_in,
        |         CAST(CASE source WHEN 'src0' THEN 1500 WHEN 'src1' THEN 900
        |                          WHEN 'src2' THEN 600 ELSE 0 END AS BIGINT)
        |           AS target_tokens,
        |         CASE WHEN utokens_in = 0 THEN 0
        |              ELSE CAST(floor(least(1.0,
        |                CAST(CASE source WHEN 'src0' THEN 1500 WHEN 'src1' THEN 900
        |                                 WHEN 'src2' THEN 600 ELSE 0 END AS BIGINT)
        |                * 1000000.0 / utokens_in) * 10000 + 0.5) AS BIGINT) END AS thr
        |  FROM tot),
        |kept AS (
        |  SELECT t.source, count(*) AS docs_kept,
        |         CAST(sum(t.nt * t.wppm) AS BIGINT) AS utokens_kept
        |  FROM w t JOIN rates r USING (source)
        |  WHERE ${bucketSql("t.doc_id", 42L ^ graft.ext.Sampling.MixSalt)}
        |          * 1000000 < r.thr * t.wppm
        |  GROUP BY 1)
        |SELECT r.source, r.n_docs, r.utokens_in, r.target_tokens,
        |       CAST(coalesce(k.docs_kept, 0) AS BIGINT) AS docs_kept,
        |       CAST(coalesce(k.utokens_kept, 0) AS BIGINT) AS utokens_kept
        |FROM rates r LEFT JOIN kept k USING (source)
        |ORDER BY source""".stripMargin,

    "x10_soft_funnel" ->
      // The SOFT-dedup funnel replayed over the planted union: no stage
      // drops documents for exact duplication; instead each doc carries
      // wppm = floor(10⁶ / family size) and the tokens_weighted_* sums
      // show the effective (deduplicated) mass per stage. No fuzzy
      // stage; no url/history stage (both no-ops → copied columns).
      ("WITH all_docs AS (\n" +
        """  SELECT doc_id, text, lang FROM documents
          |  UNION ALL
          |  SELECT doc_id + 10000, text, lang FROM documents WHERE doc_id < 10
          |  UNION ALL
          |  SELECT doc_id + 20000, text, lang FROM documents WHERE doc_id < 5),
          |""".stripMargin +
        gram4CtesFrom("all_docs") + ",\n" +
        raw"""bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM grams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8
          |),
          |ann AS (
          |  SELECT doc_id, lang,
          |         CAST(floor(1000000.0 / count(*) OVER (
          |           PARTITION BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))))
          |           AS BIGINT) AS wppm,
          |         doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
          |         CASE WHEN len(trim(rtext)) = 0 THEN 0
          |              ELSE len(string_split_regex(trim(rtext), '\s+')) END AS n_tok,
          |         ${bucketSql("doc_id")} AS b,
          |         CASE lang WHEN 'en' THEN 4000 ELSE 10000 END AS thr
          |  FROM (SELECT doc_id, lang, text,
          |               regexp_replace(regexp_replace(regexp_replace(text,
          |                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |                 '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
          |                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
          |        FROM all_docs)
          |), f AS (
          |  SELECT count(*) AS n_raw,
          |         count(CASE WHEN NOT is_contaminated THEN 1 END) AS n_after_decontam,
          |         count(CASE WHEN NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90 THEN 1 END)
          |           AS n_after_quality,
          |         count(CASE WHEN NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90 AND b < thr THEN 1 END)
          |           AS n_after_sample,
          |         COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS tokens_raw,
          |         COALESCE(CAST(sum(CASE WHEN NOT is_contaminated
          |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_decontam,
          |         COALESCE(CAST(sum(CASE WHEN NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90
          |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_quality,
          |         COALESCE(CAST(sum(CASE WHEN NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90 AND b < thr
          |                    THEN n_tok END) AS BIGINT), 0) AS n_tokens,
          |         COALESCE(CAST(sum(n_tok * wppm) AS BIGINT), 0)
          |           AS tokens_weighted_raw,
          |         COALESCE(CAST(sum(CASE WHEN NOT is_contaminated
          |                    THEN n_tok * wppm END) AS BIGINT), 0)
          |           AS tokens_weighted_after_decontam,
          |         COALESCE(CAST(sum(CASE WHEN NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90
          |                    THEN n_tok * wppm END) AS BIGINT), 0)
          |           AS tokens_weighted_after_quality,
          |         COALESCE(CAST(sum(CASE WHEN NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90 AND b < thr
          |                    THEN n_tok * wppm END) AS BIGINT), 0)
          |           AS tokens_weighted_sampled
          |  FROM ann)
          |SELECT n_raw, n_raw AS n_after_url, n_raw AS n_after_dedup,
          |       n_raw AS n_after_history, n_raw AS n_after_fuzzy,
          |       n_after_decontam, n_after_quality, n_after_sample,
          |       tokens_raw, tokens_raw AS tokens_after_url,
          |       tokens_raw AS tokens_after_dedup,
          |       tokens_raw AS tokens_after_history,
          |       tokens_raw AS tokens_after_fuzzy,
          |       tokens_after_decontam, tokens_after_quality, n_tokens,
          |       tokens_weighted_raw,
          |       tokens_weighted_raw AS tokens_weighted_after_url,
          |       tokens_weighted_raw AS tokens_weighted_after_dedup,
          |       tokens_weighted_raw AS tokens_weighted_after_history,
          |       tokens_weighted_raw AS tokens_weighted_after_fuzzy,
          |       tokens_weighted_after_decontam, tokens_weighted_after_quality,
          |       tokens_weighted_sampled,
          |       CASE WHEN n_tokens = 0 THEN 0
          |            ELSE (n_tokens - 1) // 512 + 1 END AS n_sequences
          |FROM f""".stripMargin),

    "x12_temperature_mix" ->
      // Temperature-0.5 targets replayed exactly: sqrt is IEEE-754
      // correctly rounded in BOTH engines (general pow is not — that is
      // why the registered recipe uses α = 0.5), weights quantize to
      // integer milli-units before the integer-sum normalization, and
      // every remaining op is integer or exact-double arithmetic.
      raw"""WITH tc AS (
        |  SELECT doc_id, source,
        |         CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS nt
        |  FROM documents),
        |tot AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(nt) AS BIGINT) AS tokens_in
        |  FROM tc GROUP BY 1),
        |wq AS (
        |  SELECT source, n_docs, tokens_in,
        |         CAST(floor(sqrt(tokens_in) * 1000 + 0.5) AS BIGINT) AS w
        |  FROM tot),
        |rates AS (
        |  SELECT source, n_docs, tokens_in,
        |         CAST(floor((10000 * w) * 1.0 / (SELECT sum(w) FROM wq) + 0.5)
        |              AS BIGINT) AS target_tokens,
        |         CASE WHEN tokens_in = 0 THEN 0
        |              ELSE CAST(floor(least(1.0,
        |                CAST(floor((10000 * w) * 1.0 / (SELECT sum(w) FROM wq) + 0.5)
        |                     AS BIGINT) * 1.0 / tokens_in) * 10000 + 0.5)
        |              AS BIGINT) END AS thr
        |  FROM wq),
        |kept AS (
        |  SELECT t.source, count(*) AS docs_kept,
        |         CAST(sum(t.nt) AS BIGINT) AS tokens_kept
        |  FROM tc t JOIN rates r USING (source)
        |  WHERE ${bucketSql("t.doc_id", 42L ^ graft.ext.Sampling.MixSalt)} < r.thr
        |  GROUP BY 1)
        |SELECT r.source, r.n_docs, r.tokens_in, r.target_tokens,
        |       CAST(coalesce(k.docs_kept, 0) AS BIGINT) AS docs_kept,
        |       CAST(coalesce(k.tokens_kept, 0) AS BIGINT) AS tokens_kept
        |FROM rates r LEFT JOIN kept k USING (source)
        |ORDER BY source""".stripMargin,

    "x12_training_order" ->
      // The keyed-hash global order replayed (the shared FULL-WIDTH
      // ORDER-grade wrap-mix, order-salted), doc_id tiebreak, first 50.
      s"""SELECT doc_id,
        |       ${orderKeySql("doc_id", 42L ^ graft.ext.Sampling.OrderSalt)} AS shuffle_key
        |FROM documents
        |ORDER BY shuffle_key, doc_id LIMIT 50""".stripMargin,

    "s2_stream_dedup" ->
      // The batch replay of the streaming dedup: corpus = documents + 5
      // planted exact copies; unique = distinct normalized text (the md5
      // fingerprint is injective up to collision, so counts agree).
      // count(DISTINCT) ignores NULLs while Spark's dropDuplicates keeps
      // one row for the null-norm group — the CASE term counts that group
      // so the oracle stays correct if fixtures ever gain null texts.
      """WITH corpus AS (
        |  SELECT text FROM documents
        |  UNION ALL
        |  SELECT text FROM documents WHERE doc_id < 5),
        |n AS (SELECT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
        |      FROM corpus),
        |u AS (SELECT count(*) AS n_docs,
        |             count(DISTINCT norm)
        |               + CASE WHEN count(*) > count(norm) THEN 1 ELSE 0 END AS n_unique
        |      FROM n)
        |SELECT n_docs, n_unique, n_docs - n_unique AS n_dups FROM u""".stripMargin,

    "x6_stratified_sample" ->
      // The keyed hash replayed exactly (shared bucketSql — split-key
      // per-half multiply + xor-shift, combining multiply, mod); keep
      // iff bucket < rate*10000 (en 4000, zh 5000, else 10000).
      s"""SELECT lang AS stratum,
        |       count(*) AS n_in,
        |       count(CASE WHEN b < t THEN 1 END) AS n_kept,
        |       round(count(CASE WHEN b < t THEN 1 END) * 1.0 / count(*), 4) AS kept_rate
        |FROM (SELECT lang,
        |             ${bucketSql("doc_id")} AS b,
        |             CASE lang WHEN 'en' THEN 4000
        |                       WHEN 'zh' THEN 5000
        |                       ELSE 10000 END AS t
        |      FROM documents)
        |GROUP BY 1 ORDER BY stratum""".stripMargin,

    "x6_splits" ->
      // The split when-chain replayed over the shared bucket formula
      // (split-salted seed): cumulative half-up bounds 9800/9900/10000
      // for 98/1/1.
      s"""SELECT split, count(*) AS n_docs
        |FROM (SELECT CASE WHEN b < 9800 THEN 'train'
        |                  WHEN b < 9900 THEN 'val'
        |                  WHEN b < 10000 THEN 'test'
        |                  ELSE 'holdout' END AS split
        |      FROM (SELECT ${bucketSql("doc_id", 42L ^ graft.ext.Sampling.SplitSalt)} AS b
        |            FROM documents))
        |GROUP BY 1 ORDER BY split""".stripMargin,

    "x6_sample_then_split" ->
      // Both hashes replayed: the sample keeps bucket(seed 42) < 5000,
      // the split then bands the SURVIVORS by the split-salted hash —
      // cumulative half-up bounds 8000/9000/10000 for 80/10/10. With one
      // unsalted hash every survivor would satisfy b < 5000 < 8000 and
      // land in 'train'; the salted census proves decorrelation.
      s"""SELECT split, count(*) AS n_docs
        |FROM (SELECT CASE WHEN b < 8000 THEN 'train'
        |                  WHEN b < 9000 THEN 'val'
        |                  WHEN b < 10000 THEN 'test'
        |                  ELSE 'holdout' END AS split
        |      FROM (SELECT ${bucketSql("doc_id", 42L ^ graft.ext.Sampling.SplitSalt)} AS b
        |            FROM documents
        |            WHERE ${bucketSql("doc_id")} < 5000))
        |GROUP BY 1 ORDER BY split""".stripMargin,

    "x6_top_per_stratum" ->
      // The staged skew-safe top-N proven EXACT: the oracle selects
      // with one plain window over the same TOTAL order (n_chars DESC,
      // doc_id ASC — the unique key makes ties deterministic), so any
      // row the two-stage plan picked differently breaks the hash.
      """SELECT lang, rank_in_group, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY n_chars DESC, doc_id ASC) AS rank_in_group
        |  FROM documents)
        |WHERE rank_in_group <= 5
        |ORDER BY lang, rank_in_group""".stripMargin,

    "x6_quota_sample" ->
      // The exact-quota draw replayed: the ORDER-grade key (hash64 +
      // wrapped-multiply finalizer, the x12 orderKeySql definition)
      // and one plain window over the same (draw DESC, doc_id ASC)
      // total order the staged top-N provably preserves.
      s"""SELECT lang, rank_in_group, doc_id, draw FROM (
        |  SELECT lang, doc_id, draw,
        |         CAST(row_number() OVER (PARTITION BY lang
        |           ORDER BY draw DESC, doc_id ASC) AS BIGINT)
        |           AS rank_in_group
        |  FROM (SELECT lang, doc_id,
        |               ${orderKeySql("doc_id", 77L)} AS draw
        |        FROM documents))
        |WHERE rank_in_group <= 20
        |ORDER BY lang, rank_in_group""".stripMargin,

    "x8_contamination" -> contaminationSql,

    // The persisted-benchmark-index probe shares contaminationPairs'
    // scoring tail by construction (ONE containmentFromGrams), so it
    // hash-matches the SAME full replay — index ≡ fresh.
    "x8_contam_against" -> contaminationSql,

    // The streaming gate batch-replayed: survivors = the COMPLEMENT of
    // the same containment CTE (a doc with >= 0.8 of any benchmark's
    // 4-grams drops; null/short docs have no grams and survive).
    "s10_stream_decontam" ->
      ("WITH " + gram4Ctes + ",\n" + benchGramsRawCtes + "\n" +
        """SELECT doc_id FROM documents
          |WHERE doc_id NOT IN (SELECT doc_id FROM contam)
          |ORDER BY doc_id""".stripMargin),

    "x3_repetition" ->
      // Bigram repetition per language: same normalization + lead-window
      // gram construction as the x1_jaccard oracle (n=2); docs with no
      // bigrams drop out of both sides.
      """WITH norm AS (
        |  SELECT doc_id, lang, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, lang, unnest(string_split_regex(t, '\s+')) AS tok,
        |         generate_subscripts(string_split_regex(t, '\s+'), 1) AS ord
        |  FROM norm
        |), grams AS (
        |  SELECT doc_id, lang, tok || ' ' || lead(tok, 1) OVER w AS gram
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
        |  QUALIFY lead(tok, 1) OVER w IS NOT NULL
        |), per AS (
        |  SELECT doc_id, any_value(lang) AS lang,
        |         count(*) AS total, count(DISTINCT gram) AS dist
        |  FROM grams GROUP BY doc_id)
        |SELECT lang, count(*) AS n_docs,
        |       CAST(sum(total) AS BIGINT) AS grams_total,
        |       CAST(sum(total - dist) AS BIGINT) AS dup_grams,
        |       round(sum(total - dist) * 1.0 / sum(total), 4) AS dup_frac
        |FROM per GROUP BY 1 ORDER BY lang""".stripMargin,

    "x10_funnel_by_source" ->
      // The per-source audit: x10's annotate replay minus the fuzzy
      // stage (no pair frame in the registered config → the flag is
      // constant true and after_fuzzy == after_history), grouped by
      // source. Stage flags are corpus-global (the dedup window
      // partitions on the normalized text across ALL sources); only
      // the counting groups.
      ("WITH " + gram4Ctes + ",\n" +
        """bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM grams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8
          |),""".stripMargin + "\n" +
      raw"""ann AS (
        |  SELECT doc_id, lang, source,
        |         doc_id = min(doc_id) OVER (
        |           PARTITION BY lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
        |           AS is_canonical,
        |         doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
        |         CASE WHEN len(trim(rtext)) = 0 THEN 0
        |              ELSE len(string_split_regex(trim(rtext), '\s+')) END AS n_tok,
        |         ${bucketSql("doc_id")} AS b,
        |         CASE lang WHEN 'en' THEN 4000 ELSE 10000 END AS thr
        |  FROM (SELECT doc_id, lang, source, text,
        |               regexp_replace(regexp_replace(regexp_replace(text,
        |                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |                 '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
        |                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
        |        FROM documents)
        |), f AS (
        |  SELECT source,
        |         count(*) AS n_raw,
        |         count(*) AS n_after_url,
        |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_dedup,
        |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_history,
        |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_fuzzy,
        |         count(CASE WHEN is_canonical AND NOT is_contaminated THEN 1 END)
        |           AS n_after_decontam,
        |         count(CASE WHEN is_canonical AND NOT is_contaminated
        |                         AND n_tok BETWEEN 25 AND 90 THEN 1 END)
        |           AS n_after_quality,
        |         count(CASE WHEN is_canonical AND NOT is_contaminated
        |                         AND n_tok BETWEEN 25 AND 90 AND b < thr THEN 1 END)
        |           AS n_after_sample,
        |         COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS tokens_raw,
        |         COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS tokens_after_url,
        |         COALESCE(CAST(sum(CASE WHEN is_canonical
        |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_dedup,
        |         COALESCE(CAST(sum(CASE WHEN is_canonical
        |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_history,
        |         COALESCE(CAST(sum(CASE WHEN is_canonical
        |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_fuzzy,
        |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
        |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_decontam,
        |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
        |                         AND n_tok BETWEEN 25 AND 90
        |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_quality,
        |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
        |                         AND n_tok BETWEEN 25 AND 90 AND b < thr
        |                    THEN n_tok END) AS BIGINT), 0) AS n_tokens
        |  FROM ann GROUP BY source)
        |SELECT source, n_raw, n_after_url, n_after_dedup, n_after_history,
        |       n_after_fuzzy, n_after_decontam, n_after_quality,
        |       n_after_sample, tokens_raw, tokens_after_url,
        |       tokens_after_dedup, tokens_after_history, tokens_after_fuzzy,
        |       tokens_after_decontam, tokens_after_quality, n_tokens,
        |       CASE WHEN n_tokens = 0 THEN 0
        |            ELSE (n_tokens - 1) // 512 + 1 END AS n_sequences
        |FROM f ORDER BY source""".stripMargin),

    "x10_curation_funnel" ->
      // The annotate-don't-filter funnel replayed: dedup flag = min id
      // per normalized text; fuzzy flag = NOT a non-canonical member of
      // the jaccard-pair components (x1_dedup_groups' recursive CTE);
      // contamination = the x8 containment CTE vs docs 0-2; quality =
      // whitespace tokens of the PII-REDACTED text in [25, 90]; sampling
      // = the x6 hash bucket with en→0.4; sequences = ceil(survivor
      // tokens / 512).
      curationFunnelSql("", "documents",
        raw"""doc_id = min(doc_id) OVER (
             |           PARTITION BY lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
             |           AS is_canonical,""".stripMargin),

    "x10_keepbest_funnel" ->
      // The same funnel replay over the padded keeper plant
      // (x1_dedup_keepbest's corpus) with the dedup flag switched to
      // the raw-longest keeper window. The fuzzy component resolution
      // stays min-label — a planted family's dedup canonical (+10000)
      // is never its component min, so those families survive dedup
      // but not fuzzy, the census signature only this policy produces.
      curationFunnelSql(
        """corpus AS (
          |  SELECT doc_id, lang, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 10000, lang, '  ' || text || '  '
          |  FROM documents WHERE doc_id < 10
          |),
          |""".stripMargin, "corpus",
        raw"""doc_id = first_value(doc_id) OVER (
             |           PARTITION BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
             |           ORDER BY coalesce(length(text), -1) DESC, doc_id)
             |           AS is_canonical,""".stripMargin),

    "x10_dsir_funnel" ->
      // The funnel with the X16 Gumbel top-100 replacing the hash
      // sampler: DSIR weights + the deterministic Gumbel draw replayed
      // from dsirWeightCtes (x16_dsir_select's exact CTEs), the
      // contamination grams inlined under c-prefixed names (dsir's CTE
      // set already owns `norm`), dedup key from the NON-coalesced
      // norm (nulls group together like the engine's <=> join, apart
      // from empty strings), quality = token band of the redacted
      // text, sampling = membership in the top-100.
      ("WITH " + dsirWeightCtes + ",\n" +
        s"""sel AS (
           |  SELECT doc_id,
           |         dsir_logw_micro + CAST(round(-1000000 * ln(-ln(
           |           (CAST(${hash64Sql("doc_id", 42L ^ graft.ext.Sampling.GumbelSalt)}
           |              AS DOUBLE) + 0.5) / 9223372036854775808.0)))
           |           AS BIGINT) AS dsir_key_micro
           |  FROM w),
           |top AS (
           |  SELECT doc_id FROM sel ORDER BY dsir_key_micro DESC, doc_id LIMIT 100),
           |""".stripMargin +
        raw"""ctoks AS (
          |  SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS tok,
          |         generate_subscripts(string_split_regex(t, '\s+'), 1) AS ord
          |  FROM norm),
          |cgrams AS (
          |  SELECT DISTINCT doc_id,
          |         tok || ' ' || lead(tok, 1) OVER cw || ' ' || lead(tok, 2) OVER cw
          |             || ' ' || lead(tok, 3) OVER cw AS gram
          |  FROM ctoks WINDOW cw AS (PARTITION BY doc_id ORDER BY ord)
          |  QUALIFY lead(tok, 3) OVER cw IS NOT NULL),
          |bench AS (SELECT doc_id AS bench_id, gram FROM cgrams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM cgrams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8),
          |knorm AS (
          |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS kt
          |  FROM documents),
          |rdoc AS (
          |  SELECT doc_id,
          |         regexp_replace(regexp_replace(regexp_replace(text,
          |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
          |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
          |  FROM documents),
          |ann AS (
          |  SELECT doc_id,
          |         doc_id = min(doc_id) OVER (PARTITION BY k.kt) AS is_canonical,
          |         doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
          |         CASE WHEN len(trim(r.rtext)) = 0 THEN 0
          |              ELSE len(string_split_regex(trim(r.rtext), '\s+')) END AS n_tok,
          |         doc_id IN (SELECT doc_id FROM top) AS in_sel
          |  FROM rdoc r JOIN knorm k USING (doc_id)
          |), f AS (
          |  SELECT count(*) AS n_raw,
          |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_dedup,
          |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_history,
          |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_fuzzy,
          |         count(CASE WHEN is_canonical AND NOT is_contaminated THEN 1 END)
          |           AS n_after_decontam,
          |         count(CASE WHEN is_canonical AND NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90 THEN 1 END)
          |           AS n_after_quality,
          |         count(CASE WHEN is_canonical AND NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90 AND in_sel THEN 1 END)
          |           AS n_after_sample,
          |         COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS tokens_raw,
          |         COALESCE(CAST(sum(CASE WHEN is_canonical
          |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_dedup,
          |         COALESCE(CAST(sum(CASE WHEN is_canonical
          |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_history,
          |         COALESCE(CAST(sum(CASE WHEN is_canonical
          |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_fuzzy,
          |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
          |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_decontam,
          |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90
          |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_quality,
          |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90 AND in_sel
          |                    THEN n_tok END) AS BIGINT), 0) AS n_tokens
          |  FROM ann)
          |SELECT n_raw, n_raw AS n_after_url,
          |       n_after_dedup, n_after_history, n_after_fuzzy,
          |       n_after_decontam, n_after_quality, n_after_sample,
          |       tokens_raw, tokens_raw AS tokens_after_url,
          |       tokens_after_dedup, tokens_after_history,
          |       tokens_after_fuzzy, tokens_after_decontam,
          |       tokens_after_quality, n_tokens,
          |       CASE WHEN n_tokens = 0 THEN 0
          |            ELSE (n_tokens - 1) // 512 + 1 END AS n_sequences
          |FROM f""".stripMargin),

    "x10_ppl_funnel" ->
      // The ppl-gated funnel (CCNet recipe) replayed end-to-end: the x10
      // stages (no fuzzy pairs, no URL/history — those legs are no-ops
      // here) plus the full x15 LM arithmetic — training counts from RAW
      // docs < 300 (the shared `norm` CTE), probe grams from the
      // REDACTED text of EVERY document (what the engine's quality gate
      // scores), quality = token band AND lm_band = 'head'.
      ("WITH " + gram4Ctes + ",\n" +
        raw"""bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM grams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8),
          |rdoc AS (
          |  SELECT doc_id, lang,
          |         regexp_replace(regexp_replace(regexp_replace(text,
          |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
          |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
          |  FROM documents),
          |rtoks AS (
          |  SELECT doc_id, unnest(string_split(t, ' ')) AS tok,
          |         generate_subscripts(string_split(t, ' '), 1) AS ord
          |  FROM norm WHERE doc_id < 300 AND t <> ''),
          |uni AS (SELECT tok AS w, count(*) AS c1 FROM rtoks GROUP BY 1),
          |big AS (
          |  SELECT w1, w2, count(*) AS c2 FROM (
          |    SELECT tok AS w1,
          |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
          |    FROM rtoks) WHERE w2 IS NOT NULL GROUP BY 1, 2),
          |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS total_toks,
          |               count(*) AS vocab FROM uni),
          |rnorm AS (
          |  SELECT doc_id,
          |         lower(trim(regexp_replace(rtext, '\s+', ' ', 'g'))) AS t
          |  FROM rdoc),
          |ptoks AS (
          |  SELECT doc_id, unnest(string_split(t, ' ')) AS tok,
          |         generate_subscripts(string_split(t, ' '), 1) AS ord
          |  FROM rnorm WHERE t <> ''),
          |probe AS (
          |  SELECT doc_id, w1, w2, count(*) AS m FROM (
          |    SELECT doc_id, tok AS w1,
          |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
          |    FROM ptoks) WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
          |g AS (
          |  SELECT p.doc_id, p.m, b.c2,
          |         CASE WHEN b.c2 IS NOT NULL THEN
          |           CAST(round(1000000 * ln(CAST(b.c2 AS DOUBLE) / u1.c1)) AS BIGINT)
          |         ELSE ${graft.ext.NgramLm.BackoffMicro} + CAST(round(1000000 * ln(
          |           CAST(coalesce(u2.c1, 0) + 1 AS DOUBLE)
          |             / (t.total_toks + t.vocab))) AS BIGINT)
          |         END AS micro
          |  FROM probe p
          |  LEFT JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
          |  LEFT JOIN uni u1 ON p.w1 = u1.w
          |  LEFT JOIN uni u2 ON p.w2 = u2.w
          |  CROSS JOIN tot t),
          |per AS (
          |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS lm_grams,
          |         CAST(sum(m * micro) AS BIGINT) AS lm_logp_micro
          |  FROM g GROUP BY 1),
          |ann AS (
          |  SELECT doc_id, r.lang,
          |         doc_id = min(doc_id) OVER (PARTITION BY n.t) AS is_canonical,
          |         doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
          |         CASE WHEN len(trim(r.rtext)) = 0 THEN 0
          |              ELSE len(string_split_regex(trim(r.rtext), '\s+')) END AS n_tok,
          |         coalesce(p.lm_grams, 0) > 0
          |           AND p.lm_logp_micro >= ${graft.ext.NgramLm.HeadMicro} * p.lm_grams
          |           AS is_head,
          |         ${bucketSql("doc_id")} AS b,
          |         CASE r.lang WHEN 'en' THEN 4000 ELSE 10000 END AS thr
          |  FROM rdoc r JOIN norm n USING (doc_id) LEFT JOIN per p USING (doc_id)
          |), f AS (
          |  SELECT count(*) AS n_raw,
          |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_dedup,
          |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_history,
          |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_fuzzy,
          |         count(CASE WHEN is_canonical AND NOT is_contaminated THEN 1 END)
          |           AS n_after_decontam,
          |         count(CASE WHEN is_canonical AND NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90 AND is_head THEN 1 END)
          |           AS n_after_quality,
          |         count(CASE WHEN is_canonical AND NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90 AND is_head
          |                         AND b < thr THEN 1 END)
          |           AS n_after_sample,
          |         COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS tokens_raw,
          |         COALESCE(CAST(sum(CASE WHEN is_canonical
          |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_dedup,
          |         COALESCE(CAST(sum(CASE WHEN is_canonical
          |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_history,
          |         COALESCE(CAST(sum(CASE WHEN is_canonical
          |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_fuzzy,
          |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
          |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_decontam,
          |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90 AND is_head
          |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_quality,
          |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
          |                         AND n_tok BETWEEN 25 AND 90 AND is_head AND b < thr
          |                    THEN n_tok END) AS BIGINT), 0) AS n_tokens
          |  FROM ann)
          |SELECT n_raw, n_raw AS n_after_url,
          |       n_after_dedup, n_after_history, n_after_fuzzy,
          |       n_after_decontam, n_after_quality, n_after_sample,
          |       tokens_raw, tokens_raw AS tokens_after_url,
          |       tokens_after_dedup, tokens_after_history,
          |       tokens_after_fuzzy, tokens_after_decontam,
          |       tokens_after_quality, n_tokens,
          |       CASE WHEN n_tokens = 0 THEN 0
          |            ELSE (n_tokens - 1) // 512 + 1 END AS n_sequences
          |FROM f""".stripMargin),

    "x9_pack_sequences" ->
      // The two-level prefix sum degenerates to ONE ordered window
      // single-node: start = exclusive cumsum of token counts in doc_id
      // order; spans = the 512-token chunks [start, start+n_tok) crosses.
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |                   ELSE len(string_split_regex(trim(text), '\s+')) END
        |              AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tok,
        |         COALESCE(CAST(sum(n_tok) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start
        |  FROM t WHERE n_tok > 0),
        |spans AS (
        |  SELECT doc_id, n_tok, start,
        |         unnest(range(start // 512, (start + n_tok - 1) // 512 + 1)) AS seq_id
        |  FROM c)
        |SELECT doc_id, seq_id,
        |       greatest(seq_id * 512, start) - start AS begin_tok,
        |       least((seq_id + 1) * 512, start + n_tok) - start AS end_tok,
        |       n_tok
        |FROM spans ORDER BY doc_id, seq_id""".stripMargin,

    "x9_materialize" ->
      // The pack layout replayed (same CTEs as x9_pack_sequences) and
      // then MATERIALIZED: each span slices its 1-based-inclusive
      // token range, sequences reassemble by string_agg in doc_id
      // order (chunks internally space-joined, chunks joined by one
      // space — the exact flatten-join string), md5 per sequence.
      """WITH t AS (
        |  SELECT doc_id,
        |         string_split_regex(trim(text), '\s+') AS toks,
        |         CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |                   ELSE len(string_split_regex(trim(text), '\s+')) END
        |              AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, n_tok,
        |         COALESCE(CAST(sum(n_tok) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start
        |  FROM t WHERE n_tok > 0),
        |spans AS (
        |  SELECT doc_id, toks, n_tok, start,
        |         unnest(range(start // 512, (start + n_tok - 1) // 512 + 1)) AS seq_id
        |  FROM c),
        |sl AS (
        |  SELECT seq_id, doc_id, e - b AS ntk,
        |         array_to_string(list_slice(toks, b + 1, e), ' ') AS chunk
        |  FROM (SELECT seq_id, doc_id, toks,
        |               greatest(seq_id * 512, start) - start AS b,
        |               least((seq_id + 1) * 512, start + n_tok) - start AS e
        |        FROM spans))
        |SELECT seq_id, CAST(sum(ntk) AS BIGINT) AS seq_tok,
        |       md5(string_agg(chunk, ' ' ORDER BY doc_id)) AS seq_md5
        |FROM sl GROUP BY seq_id ORDER BY seq_id""".stripMargin,

    "x9_pack_padded" ->
      // Pad-to-boundary variant: the advance summed by the window is the
      // token count ceil-rounded to whole 512-token sequences, so every
      // document starts on a boundary; spans still cover actual tokens
      // only (the rounded tail is implicit padding).
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |                   ELSE len(string_split_regex(trim(text), '\s+')) END
        |              AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tok,
        |         COALESCE(CAST(sum(((n_tok - 1) // 512 + 1) * 512) OVER (
        |           ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start
        |  FROM t WHERE n_tok > 0),
        |spans AS (
        |  SELECT doc_id, n_tok, start,
        |         unnest(range(start // 512, (start + n_tok - 1) // 512 + 1)) AS seq_id
        |  FROM c)
        |SELECT doc_id, seq_id,
        |       greatest(seq_id * 512, start) - start AS begin_tok,
        |       least((seq_id + 1) * 512, start + n_tok) - start AS end_tok,
        |       n_tok
        |FROM spans ORDER BY doc_id, seq_id""".stripMargin,

    "x7_pii_scan" ->
      // Synthetic PII planted on every 17th doc, replicated verbatim;
      // the same RE2-safe patterns replayed via regexp_extract_all.
      """WITH planted AS (
        |  SELECT source,
        |         CASE WHEN doc_id % 17 = 0
        |              THEN text || ' contact user' || doc_id ||
        |                   '@example.com or 555-867-5309 at 10.0.0.' || (doc_id % 256)
        |              ELSE text END AS text
        |  FROM documents),
        |counted AS (
        |  SELECT source,
        |         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |         len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phone,
        |         len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4
        |  FROM planted)
        |SELECT source,
        |       count(*) AS n_docs,
        |       count(CASE WHEN n_email > 0 OR n_phone > 0 OR n_ipv4 > 0 THEN 1 END) AS docs_with_pii,
        |       CAST(sum(n_email) AS BIGINT) AS n_email,
        |       CAST(sum(n_phone) AS BIGINT) AS n_phone,
        |       CAST(sum(n_ipv4) AS BIGINT) AS n_ipv4
        |FROM counted GROUP BY 1 ORDER BY source""".stripMargin,

    "x7_card_scan" ->
      // The card plants replayed arithmetically — the corpus has no
      // digits (engine-checked by the zero candidate count off the
      // plants), so candidates/valid per doc are pure functions of
      // doc_id, and the redacted text is constructed directly: valid
      // cards become <CARD>, invalid candidates survive byte-for-byte.
      // %17 wins over %19 like the engine's when-chain. NULL text
      // null-propagates through the plant in both engines.
      """WITH planted AS (
        |  SELECT source, doc_id,
        |         CASE WHEN doc_id % 17 = 0 THEN
        |                text || ' pay 4111111111111111 or 4539 5787 6362 1486 now'
        |              WHEN doc_id % 19 = 0 THEN
        |                text || ' order 4111111111111112 ref 1234567890123 end'
        |              ELSE text END AS text
        |  FROM documents),
        |scanned AS (
        |  SELECT source,
        |         CASE WHEN text IS NULL THEN NULL
        |              WHEN doc_id % 17 = 0 THEN 2
        |              WHEN doc_id % 19 = 0 THEN 2 ELSE 0 END AS n_cand,
        |         CASE WHEN text IS NULL THEN NULL
        |              WHEN doc_id % 17 = 0 THEN 2 ELSE 0 END AS n_valid,
        |         CASE WHEN doc_id % 17 = 0 AND text IS NOT NULL THEN
        |                replace(replace(text, '4111111111111111', '<CARD>'),
        |                        '4539 5787 6362 1486', '<CARD>')
        |              ELSE text END AS redacted
        |  FROM planted)
        |SELECT source, count(*) AS n_docs,
        |       count(CASE WHEN n_valid > 0 THEN 1 END) AS docs_with_card,
        |       COALESCE(CAST(sum(n_cand) AS BIGINT), 0) AS n_candidates,
        |       COALESCE(CAST(sum(n_valid) AS BIGINT), 0) AS n_valid,
        |       CAST(sum(CAST(('0x' || substr(md5(redacted), 1, 15)) AS BIGINT)
        |            % 1000000000) AS BIGINT) AS redacted_fp_sum
        |FROM scanned GROUP BY 1 ORDER BY source""".stripMargin,

    "s11_stream_scrub" ->
      // The scrub replayed arithmetically (the x7_card_scan
      // discipline): the corpus has no digits or '@', so every match
      // is a plant — valid cards and the email redact, the invalid
      // candidates survive, the phone redacts. %17 wins over %19 like
      // the engine's when-chain; NULL text null-propagates.
      """WITH planted AS (
        |  SELECT source, doc_id,
        |         CASE WHEN doc_id % 17 = 0 THEN
        |                text || ' pay 4111111111111111 or 4539 5787 6362 1486' ||
        |                ' now mail user' || doc_id || '@example.com'
        |              WHEN doc_id % 19 = 0 THEN
        |                text || ' order 4111111111111112 ref 1234567890123' ||
        |                ' call 555-867-5309'
        |              ELSE text END AS text
        |  FROM documents),
        |scrub AS (
        |  SELECT source,
        |         CASE WHEN text IS NULL THEN NULL
        |              WHEN doc_id % 17 = 0 THEN 2 ELSE 0 END AS n_valid,
        |         CASE WHEN text IS NULL THEN NULL
        |              WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END AS n_email,
        |         CASE WHEN text IS NULL THEN NULL
        |              WHEN doc_id % 17 = 0 THEN 0
        |              WHEN doc_id % 19 = 0 THEN 1 ELSE 0 END AS n_phone,
        |         CASE WHEN text IS NULL THEN text
        |              WHEN doc_id % 17 = 0 THEN
        |                replace(replace(replace(text,
        |                  '4111111111111111', '<CARD>'),
        |                  '4539 5787 6362 1486', '<CARD>'),
        |                  'user' || doc_id || '@example.com', '<EMAIL>')
        |              WHEN doc_id % 19 = 0 THEN
        |                replace(text, '555-867-5309', '<PHONE>')
        |              ELSE text END AS scrubbed
        |  FROM planted)
        |SELECT source, count(*) AS n_docs,
        |       count(CASE WHEN n_valid > 0 OR n_email > 0 OR n_phone > 0
        |                  THEN 1 END) AS docs_scrubbed,
        |       COALESCE(CAST(sum(n_valid) AS BIGINT), 0) AS n_valid,
        |       COALESCE(CAST(sum(n_email) AS BIGINT), 0) AS n_email,
        |       COALESCE(CAST(sum(n_phone) AS BIGINT), 0) AS n_phone,
        |       CAST(sum(CAST(('0x' || substr(md5(scrubbed), 1, 15)) AS BIGINT)
        |            % 1000000000) AS BIGINT) AS scrubbed_fp_sum
        |FROM scrub GROUP BY 1 ORDER BY source""".stripMargin,

    "s18_stream_join" ->
      // The stream-stream interval join replayed as the plain BETWEEN
      // self-join it equals on complete in-order data (closed bounds,
      // the X22 convention); lag in whole seconds via date_diff —
      // exact integer arithmetic in both engines.
      """SELECT i.event_id AS imp_id, c.event_id AS conv_id,
        |       i.user_id AS user_id,
        |       CAST(date_diff('second', i.ts, c.ts) AS BIGINT) AS lag_sec
        |FROM events i JOIN events c ON i.user_id = c.user_id
        |WHERE i.event_type = 'view' AND c.event_type = 'purchase'
        |  AND c.ts >= i.ts AND c.ts <= i.ts + INTERVAL 12 HOUR
        |ORDER BY imp_id, conv_id""".stripMargin,

    "s20_stream_outer_join" ->
      // The left-outer interval join replayed as the plain LEFT JOIN
      // BETWEEN it equals on complete in-order data: unmatched
      // impressions null-extended. Within an imp_id a null conv_id
      // exists only when no match does, so (imp_id, conv_id) ordering
      // never compares null vs non-null — the Spark (NULLS FIRST) /
      // DuckDB (NULLS LAST) ASC divergence is unreachable.
      """SELECT i.event_id AS imp_id, c.event_id AS conv_id,
        |       i.user_id AS user_id,
        |       CAST(date_diff('second', i.ts, c.ts) AS BIGINT) AS lag_sec
        |FROM (SELECT * FROM events WHERE event_type = 'view') i
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') c
        |  ON i.user_id = c.user_id
        | AND c.ts >= i.ts AND c.ts <= i.ts + INTERVAL 12 HOUR
        |ORDER BY imp_id, conv_id""".stripMargin,

    "s22_stream_full_outer" ->
      // The full-outer interval join replayed as the plain FULL JOIN
      // BETWEEN it equals on complete in-order data: unmatched
      // impressions AND unmatched conversions null-extended, the key
      // coalesced across sides. Conversion-only rows carry a NULL
      // imp_id into the ORDER BY — DuckDB's ASC default is NULLS
      // LAST, which the engine pins explicitly with asc_nulls_last.
      """SELECT i.event_id AS imp_id, c.event_id AS conv_id,
        |       coalesce(i.user_id, c.user_id) AS user_id,
        |       CAST(date_diff('second', i.ts, c.ts) AS BIGINT) AS lag_sec
        |FROM (SELECT * FROM events WHERE event_type = 'view') i
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') c
        |  ON i.user_id = c.user_id
        | AND c.ts >= i.ts AND c.ts <= i.ts + INTERVAL 12 HOUR
        |ORDER BY imp_id, conv_id""".stripMargin,

    "s16_stream_madgate" ->
      // The serve-time gate replayed end to end: cuts re-derived from
      // the even half (the twice-median trick), the odd half gated by
      // the all-integer comparison, per-(type, flag) census with a
      // dev2 sum so one wrong flag breaks the hash.
      """WITH sc AS (
        |  SELECT event_id, event_type,
        |         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |           AS scaled
        |  FROM events),
        |med AS (
        |  SELECT event_type,
        |         CAST(round(2 * quantile_cont(scaled, 0.5)) AS BIGINT)
        |           AS med2
        |  FROM sc WHERE event_id % 2 = 0 GROUP BY 1),
        |dev AS (
        |  SELECT s.event_type, abs(s.scaled * 2 - m.med2) AS dev2
        |  FROM sc s JOIN med m USING (event_type)
        |  WHERE s.event_id % 2 = 0),
        |mad AS (
        |  SELECT event_type,
        |         CAST(round(2 * quantile_cont(dev2, 0.5)) AS BIGINT)
        |           AS mad2
        |  FROM dev GROUP BY 1),
        |serve AS (
        |  SELECT s.event_type,
        |         abs(s.scaled * 2 - m.med2) AS dev2,
        |         abs(s.scaled * 2 - m.med2) * 2 > 3 * d.mad2 AS is_outlier
        |  FROM sc s JOIN med m USING (event_type)
        |            JOIN mad d USING (event_type)
        |  WHERE s.event_id % 2 = 1)
        |SELECT event_type, is_outlier, count(*) AS n,
        |       CAST(sum(dev2) AS BIGINT) AS dev2_sum
        |FROM serve GROUP BY 1, 2 ORDER BY event_type, is_outlier""".stripMargin,

    "g20_corr_stats" ->
      // The five sufficient sums replayed in HUGEINT (DuckDB promotes
      // over-width DECIMAL products to DOUBLE, so the 128-bit integer
      // lane is the exact path here), shipped as canonical integer
      // STRINGS (r12: raw DECIMAL(38,0) output diverged in the
      // driver's hasher), and the SAME pinned-association Pearson over
      // the exact values.
      """WITH t AS (
        |  SELECT l_returnflag,
        |         CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000
        |              AS HUGEINT) AS x,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
        |              AS HUGEINT) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |a AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
        |         sum(y * y) AS syy, sum(x * y) AS sxy
        |  FROM t GROUP BY 1)
        |SELECT l_returnflag, n,
        |       CAST(sx AS VARCHAR) AS sx,
        |       CAST(sy AS VARCHAR) AS sy,
        |       CAST(sxx AS VARCHAR) AS sxx,
        |       CAST(syy AS VARCHAR) AS syy,
        |       CAST(sxy AS VARCHAR) AS sxy,
        |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |             sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |                  CAST(n * syy - sy * sy AS DOUBLE)), 6)
        |         AS corr6
        |FROM a ORDER BY l_returnflag""".stripMargin,

    "g23_kl_divergence" -> {
      // The three KL screens replayed per value AND per verdict: shared
      // non-null value census, per-declaration LEFT JOIN against the
      // PPM grid, ONE micro-nat rounding per value (association matched
      // to the engine — see klCheckCtes), integer sums, the same
      // infinite-divergence (out-of-partition) and threshold rules.
      val types = Seq("click", "error", "purchase", "signup", "view")
      val uniform = types.map(_ -> 200000L)
      val skewed = types.map(t => t -> (if (t == "click") 600000L else 100000L))
      val missing = types.filterNot(_ == "error").map(_ -> 250000L)
      """WITH counts AS (
        |  SELECT event_type AS value, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM counts),
        |""".stripMargin +
        klCheckCtes(1, uniform) + ",\n" +
        klCheckCtes(2, skewed) + ",\n" +
        klCheckCtes(3, missing) + "\n" +
        "SELECT * FROM (\n" +
        klCheckSelect(1, "kl_divergence:event_type:lt:0.05", 0.05) +
        "\nUNION ALL\n" +
        klCheckSelect(2, "kl_divergence:event_type:lt:0.25", 0.25) +
        "\nUNION ALL\n" +
        klCheckSelect(3, "kl_divergence:event_type:lt:10.0", 10.0) +
        ")\nORDER BY validation_name, value"
    },

    "g24_chi_square" -> {
      // The three chi-square screens replayed per value AND per
      // verdict: shared non-null value census, per-declaration FULL
      // JOIN against the PPM grid (declared-but-unobserved values
      // carry their expected-count mass at n = 0), exact-integer
      // difference, ONE rounding per value, integer sums, the declared
      // critical-value gate and the out-of-partition infinity rule.
      val types = Seq("click", "error", "purchase", "signup", "view")
      val uniform = types.map(_ -> 200000L)
      val skewed = types.map(t => t -> (if (t == "click") 600000L else 100000L))
      val refund = Seq("click", "purchase", "refund", "signup", "view")
        .map(_ -> 200000L)
      """WITH counts AS (
        |  SELECT event_type AS value, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM counts),
        |""".stripMargin +
        chiCheckCtes(1, uniform) + ",\n" +
        chiCheckCtes(2, skewed) + ",\n" +
        chiCheckCtes(3, refund) + "\n" +
        "SELECT * FROM (\n" +
        chiCheckSelect(1, "chi_square:event_type:lt:13.277", 13.277) +
        "\nUNION ALL\n" +
        chiCheckSelect(2, "chi_square:event_type:lt:9.488", 9.488) +
        "\nUNION ALL\n" +
        chiCheckSelect(3, "chi_square:event_type:lt:15.086", 15.086) +
        ")\nORDER BY validation_name, value"
    },

    "g21_rowcount_parity" ->
      // GE's expect_table_row_count_to_equal_other_table replayed:
      // the staged side re-derived (inner join / projection), one
      // count per side. CAST to BIGINT — DuckDB count(*) is BIGINT
      // already, pinned explicitly per the HUGEINT discipline.
      """WITH pairs AS (
        |  SELECT 'stg_territory' AS table_a, 'nation' AS table_b,
        |         (SELECT count(*) FROM nation JOIN region
        |            ON n_regionkey = r_regionkey) AS n_a,
        |         (SELECT count(*) FROM nation) AS n_b
        |  UNION ALL
        |  SELECT 'stg_salesperson', 'supplier',
        |         (SELECT count(*) FROM supplier),
        |         (SELECT count(*) FROM supplier))
        |SELECT table_a, table_b,
        |       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |       n_a = n_b AS passed
        |FROM pairs ORDER BY table_a""".stripMargin,

    "g22_ge_tail" ->
      // The GE-tail verdicts replayed: monotonic violations via lag
      // windows over the SAME per-check non-null basis (the engine
      // filters each check's columns independently; event_id is unique,
      // so the engine's lenient-on-ties secondary sort never engages
      // and lag adjacency IS partition-stitched adjacency), the mode
      // duel as best-allowed vs best-disallowed counts, and the
      // sum/stdev bounds as verdicts only (floats stay off the hash).
      """WITH lagts AS (
        |  SELECT ts, lag(ts) OVER (ORDER BY event_id) AS pts
        |  FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
        |lagv AS (
        |  SELECT value, lag(value) OVER (ORDER BY event_id) AS pv
        |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
        |mts AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(CASE WHEN ts <= pts THEN 1 END) AS BIGINT)
        |           AS viol
        |  FROM lagts),
        |mv AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(CASE WHEN value < pv THEN 1 END) AS BIGINT)
        |           AS viol_incr,
        |         CAST(count(CASE WHEN value > pv THEN 1 END) AS BIGINT)
        |           AS viol_decr
        |  FROM lagv),
        |md AS (
        |  SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n_rows,
        |         max(CASE WHEN v NOT IN ('signup', 'view') THEN c END)
        |           AS max_out,
        |         max(c) AS max_all
        |  FROM (SELECT event_type AS v, count(*) AS c FROM events
        |        WHERE event_type IS NOT NULL GROUP BY 1)),
        |ag AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(value) AS sv,
        |         stddev_samp(value) AS sd
        |  FROM events)
        |SELECT * FROM (
        |  SELECT 'monotonic:incr_strict:ts:by:event_id'
        |           AS validation_name,
        |         CASE WHEN viol = 0 THEN 'PASSED' ELSE 'FAILED' END
        |           AS status,
        |         n AS element_count, viol AS unexpected_count
        |  FROM mts
        |  UNION ALL
        |  SELECT 'monotonic:incr:value:by:event_id',
        |         CASE WHEN viol_incr = 0 THEN 'PASSED' ELSE 'FAILED' END,
        |         n, viol_incr
        |  FROM mv
        |  UNION ALL
        |  SELECT 'monotonic:decr:value:by:event_id',
        |         CASE WHEN viol_decr = 0 THEN 'PASSED' ELSE 'FAILED' END,
        |         n, viol_decr
        |  FROM mv
        |  UNION ALL
        |  SELECT 'most_common_in_set:event_type',
        |         CASE WHEN n_rows = 0 OR max_out IS NULL
        |                   OR max_out < max_all
        |              THEN 'PASSED' ELSE 'FAILED' END,
        |         n_rows,
        |         CAST(CASE WHEN n_rows = 0 OR max_out IS NULL
        |                        OR max_out < max_all
        |                   THEN 0 ELSE 1 END AS BIGINT)
        |  FROM md
        |  UNION ALL
        |  SELECT 'agg_bounds:sum:value',
        |         CASE WHEN sv IS NOT NULL AND sv >= 0.0
        |                   AND sv <= 1000000000000.0
        |              THEN 'PASSED' ELSE 'FAILED' END,
        |         n,
        |         CAST(CASE WHEN sv IS NOT NULL AND sv >= 0.0
        |                        AND sv <= 1000000000000.0
        |                   THEN 0 ELSE 1 END AS BIGINT)
        |  FROM ag
        |  UNION ALL
        |  SELECT 'agg_bounds:stddev:value',
        |         CASE WHEN sd IS NOT NULL AND sd >= 1000000.0
        |                   AND sd <= 2000000.0
        |              THEN 'PASSED' ELSE 'FAILED' END,
        |         n,
        |         CAST(CASE WHEN sd IS NOT NULL AND sd >= 1000000.0
        |                        AND sd <= 2000000.0
        |                   THEN 0 ELSE 1 END AS BIGINT)
        |  FROM ag)
        |ORDER BY validation_name""".stripMargin,

    "g19_benford" ->
      // The digit census replayed: the 4-dp scaled long's decimal
      // rendering gives the first significant digit (no float log10
      // binning), floor-ppm shares, and the SAME Benford literals the
      // engine carries.
      """WITH sc AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
        |              AS BIGINT) AS v
        |  FROM orders),
        |d AS (
        |  SELECT substr(CAST(v AS VARCHAR), 1, 1) AS digit
        |  FROM sc WHERE v > 0),
        |c AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS total FROM c)
        |SELECT digit, n_obs,
        |       CAST((n_obs * 1000000) // t.total AS BIGINT) AS obs_ppm,
        |       CASE digit WHEN '1' THEN 301030 WHEN '2' THEN 176091
        |                  WHEN '3' THEN 124939 WHEN '4' THEN 96910
        |                  WHEN '5' THEN 79181 WHEN '6' THEN 66947
        |                  WHEN '7' THEN 57992 WHEN '8' THEN 51153
        |                  WHEN '9' THEN 45757 END AS benford_ppm,
        |       abs(CAST((n_obs * 1000000) // t.total AS BIGINT) -
        |           CASE digit WHEN '1' THEN 301030 WHEN '2' THEN 176091
        |                      WHEN '3' THEN 124939 WHEN '4' THEN 96910
        |                      WHEN '5' THEN 79181 WHEN '6' THEN 66947
        |                      WHEN '7' THEN 57992 WHEN '8' THEN 51153
        |                      WHEN '9' THEN 45757 END) AS abs_dev_ppm
        |FROM c CROSS JOIN t ORDER BY digit""".stripMargin,

    "g18_fd_check" ->
      // The FD census replayed over the same staged model + plant:
      // trimmed names (the t1 contract), the ZONE_X second mapping for
      // NATION_0's region, count(DISTINCT) skipping nulls.
      """WITH stg AS (
        |  SELECT n_nationkey AS territory_key, trim(n_name) AS region_name,
        |         trim(r_name) AS zone_name
        |  FROM nation JOIN region ON n_regionkey = r_regionkey),
        |f AS (
        |  SELECT * FROM stg
        |  UNION ALL
        |  SELECT territory_key + 1000, region_name, 'ZONE_X'
        |  FROM stg WHERE territory_key = 0)
        |SELECT region_name, count(*) AS n_rows,
        |       count(DISTINCT zone_name) AS n_dep_values,
        |       count(DISTINCT zone_name) <= 1 AS fd_holds
        |FROM f GROUP BY 1 ORDER BY region_name""".stripMargin,

    "x52_group_split" ->
      // The group-keyed split replayed: author from the plant, the
      // md5-prefix group key, the split-salted bucket, the 80/10/10
      // bands, per-split doc/group censuses, and the straddle count
      // re-derived from scratch (its zero IS the leakage guarantee).
      s"""WITH t AS (
        |  SELECT doc_id, 'u' || (doc_id % 50) AS author FROM documents),
        |k AS (
        |  SELECT doc_id, author,
        |         CAST(('0x' || substr(md5(author), 1, 15)) AS BIGINT)
        |           AS gk
        |  FROM t),
        |sp AS (
        |  SELECT doc_id, author,
        |         CASE WHEN b < 8000 THEN 'train'
        |              WHEN b < 9000 THEN 'val'
        |              WHEN b < 10000 THEN 'test'
        |              ELSE 'holdout' END AS split
        |  FROM (SELECT doc_id, author,
        |               ${bucketSql("gk", 42L ^ graft.ext.Sampling.SplitSalt)}
        |                 AS b
        |        FROM k)),
        |straddle AS (
        |  SELECT count(*) AS n_straddling_groups FROM (
        |    SELECT author FROM sp GROUP BY 1
        |    HAVING count(DISTINCT split) > 1))
        |SELECT split, count(*) AS n_docs,
        |       count(DISTINCT author) AS n_groups,
        |       (SELECT n_straddling_groups FROM straddle)
        |         AS n_straddling_groups
        |FROM sp GROUP BY 1 ORDER BY split""".stripMargin,

    "x10_split_cards" ->
      // The E2E capstone replayed end to end: the default-config curate
      // survivor set (min-id keeper over normalized text, the x8
      // containment CTE vs docs 0-2, PII-redacted token count >= 1),
      // the SOURCE-keyed group split (md5-prefix group key, split-
      // salted bucket, 80/20 bands — the x52 replay), every x40 card
      // signal re-derived over the REDACTED text under ROLLUP(split),
      // and the straddle count re-derived from scratch — its zero IS
      // the leakage guarantee.
      ("WITH " + gram4Ctes + ",\n" +
        raw"""bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM grams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8
          |),
          |ann AS (
          |  SELECT doc_id, lang, source, rtext,
          |         doc_id = min(doc_id) OVER (
          |           PARTITION BY lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
          |           AS is_canonical,
          |         doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
          |         CASE WHEN rtext IS NULL OR len(trim(rtext)) = 0 THEN 0
          |              ELSE len(string_split_regex(trim(rtext), '\s+')) END AS n_tok
          |  FROM (SELECT doc_id, lang, source, text,
          |               regexp_replace(regexp_replace(regexp_replace(text,
          |                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |                 '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
          |                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
          |        FROM documents)),
          |surv AS (
          |  SELECT doc_id, lang, source, rtext, n_tok FROM ann
          |  WHERE is_canonical AND NOT is_contaminated AND n_tok >= 1),
          |""".stripMargin +
        s"""sp AS (
          |  SELECT *, CASE WHEN b < 8000 THEN 'train' ELSE 'val' END AS split
          |  FROM (SELECT *,
          |          ${bucketSql("gk", 42L ^ graft.ext.Sampling.SplitSalt)} AS b
          |        FROM (SELECT *,
          |                CAST(('0x' || substr(md5(source), 1, 15)) AS BIGINT)
          |                  AS gk
          |              FROM surv))),
          |straddle AS (
          |  SELECT count(*) AS n_straddling_sources FROM (
          |    SELECT source FROM sp GROUP BY 1
          |    HAVING count(DISTINCT split) > 1)),
          |""".stripMargin +
        raw"""sig AS (
          |  SELECT split, lang,
          |         n_tok,
          |         coalesce(length(rtext), 0) AS n_ch,
          |         coalesce(lower(trim(regexp_replace(rtext, '\s+', ' ', 'g'))), '') AS cnorm,
          |         (rtext IS NULL OR length(trim(rtext)) = 0) AS blank,
          |         len(regexp_extract_all(rtext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
          |         len(regexp_extract_all(rtext, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS np,
          |         len(regexp_extract_all(rtext, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ni
          |  FROM sp)
          |SELECT coalesce(split, '(all)') AS split,
          |       CAST(GROUPING(split) AS BIGINT) AS grouping_level,
          |       count(*) AS n_docs,
          |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
          |       CAST(sum(n_ch) AS BIGINT) AS n_chars,
          |       count(CASE WHEN blank THEN 1 END) AS n_empty,
          |       count(DISTINCT cnorm) AS n_distinct_text,
          |       CAST(((count(*) - count(DISTINCT cnorm)) * 1000000) //
          |            count(*) AS BIGINT) AS dup_ppm,
          |       count(DISTINCT lang) AS n_langs,
          |       count(CASE WHEN ne > 0 OR np > 0 OR ni > 0 THEN 1 END)
          |         AS docs_with_pii,
          |       round(CAST(sum(n_tok) AS DOUBLE) / count(*), 4) AS mean_tok,
          |       round(quantile_cont(n_tok, 0.5), 4) AS p50_tok,
          |       (SELECT n_straddling_sources FROM straddle)
          |         AS n_straddling_sources
          |FROM sig GROUP BY ROLLUP (split)
          |ORDER BY grouping_level, split""".stripMargin),

    "x53_bpe_train" -> bpeTrainSql(maxWords = 300, merges = 8),

    "x53_bpe_train_full" ->
      // The FULL-ALPHABET merge trajectory (VERDICT r15 next #2):
      // the same 8 chained merge CTEs over the case/punctuation/digit
      // plant — at sf0.01 the trajectory carries a comma merge
      // ('e', ',') and an uppercase merge ('E', 'R'), proving the
      // non-letter path under the oracle, not just in spec.
      bpeTrainSql(maxWords = 300, merges = 8, fullAlphabet = true),

    "x53_bpe_bytes" ->
      // The BYTE-LEVEL merge trajectory (VERDICT r16 next #6): the
      // same 8 chained merge CTEs with the initial sequence
      // decomposed to UTF-8 bytes (arithmetic from the code point)
      // under the chr(256+b) bijection; the café plant puts the
      // cross-byte-boundary merge (caf·0xC3, 0xA9) — fusing é's two
      // bytes — in the oracle-matched trajectory at every shipped SF.
      bpeBytesSql(maxWords = 300, merges = 8),

    "x53_bpe_tokenize" -> bpeTokenizeSql(maxWords = 300, merges = 8),

    // The STREAMING per-document counter (stateless projection, merge
    // list as plan literals) must produce the identical counts as the
    // batch vocab-table serving shape — ONE oracle bound to both, so
    // the two formulations can never drift (the s5/x18 discipline).
    "s25_stream_bpe" -> bpeCountSql(maxWords = 300, merges = 8),

    "x53_bpe_count" -> bpeCountSql(maxWords = 300, merges = 8),

    "s15_stream_ingest" -> nestedFlattenSql,

    "x50_nested_flatten" -> nestedFlattenSql,



    "x51_pivot_crosstab" ->
      // The pivot replayed as explicit CASE sums — one column per
      // event type, absent cells 0.
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS dt,
        |       count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |         AS purchase,
        |       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |       count(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY 1 ORDER BY dt""".stripMargin,

    "x49_rendezvous" -> {
      // Rendezvous replayed: the nine per-shard ORDER-grade weights (same
      // Scala-side seed lanes), argmax via greatest + first-match CASE
      // (ties to the lowest shard, as the engine's when-chain), both
      // ring sizes, and the moved/moved-elsewhere censuses — the
      // minimal-disruption theorem shows up as an all-zero column the
      // hash compare pins.
      val ws = (0 to 8).map(s => orderKeySql("doc_id", 42L + s))
      val wCols = ws.zipWithIndex
        .map { case (w, s) => s"$w AS w$s" }.mkString(",\n         ")
      def argmax(n: Int, m: String): String =
        (0 until n).map(s => s"WHEN w$s = $m THEN $s")
          .mkString("CASE ", " ", " END")
      s"""WITH w AS (
         |  SELECT doc_id,
         |         $wCols
         |  FROM documents),
         |g AS (
         |  SELECT *, greatest(${(0 to 7).map("w" + _).mkString(", ")}) AS m8,
         |         greatest(${(0 to 8).map("w" + _).mkString(", ")}) AS m9
         |  FROM w),
         |a AS (
         |  SELECT doc_id,
         |         CAST(${argmax(8, "m8")} AS BIGINT) AS shard,
         |         CAST(${argmax(9, "m9")} AS BIGINT) AS shard_next
         |  FROM g)
         |SELECT shard, count(*) AS n_docs,
         |       CAST(sum(doc_id) AS BIGINT) AS key_sum,
         |       count(CASE WHEN shard_next <> shard THEN 1 END) AS n_moved,
         |       count(CASE WHEN shard_next <> shard AND shard_next <> 8
         |                  THEN 1 END) AS n_moved_elsewhere
         |FROM a GROUP BY 1 ORDER BY shard""".stripMargin
    },

    "x48_concurrency" ->
      // The staged two-level sweep replayed as ONE plain per-day
      // window over the same (ts, +1-before-−1) order: sessions from
      // the x18 derivation, exploded to the days they touch, clipped,
      // swept. Any peak the staged plan computes differently breaks
      // the hash.
      """WITH a AS (
        |  SELECT user_id, ts, event_id,
        |         CAST(floor(epoch(ts)) AS BIGINT)
        |           - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |         sum(CASE WHEN gap_s IS NULL OR gap_s > 43200
        |                  THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           AS session_idx
        |  FROM a),
        |sess AS (
        |  SELECT user_id, session_idx, min(ts) AS start_ts,
        |         max(ts) AS end_ts
        |  FROM s GROUP BY 1, 2),
        |bd AS (
        |  SELECT user_id, session_idx, start_ts, end_ts,
        |         CAST(d.day AS DATE) AS day
        |  FROM sess, LATERAL (SELECT unnest(generate_series(
        |         CAST(CAST(start_ts AS DATE) AS TIMESTAMP),
        |         CAST(CAST(end_ts AS DATE) AS TIMESTAMP),
        |         INTERVAL 1 DAY)) AS day) d),
        |clipped AS (
        |  SELECT user_id, session_idx, day,
        |         greatest(start_ts, CAST(day AS TIMESTAMP)) AS cs,
        |         least(end_ts, CAST(day + 1 AS TIMESTAMP)) AS ce
        |  FROM bd),
        |pts AS (
        |  SELECT day, cs AS ts, CAST(1 AS BIGINT) AS d,
        |         user_id, session_idx FROM clipped
        |  UNION ALL
        |  SELECT day, ce, -1, user_id, session_idx FROM clipped),
        |run AS (
        |  SELECT day, sum(d) OVER (PARTITION BY day
        |           ORDER BY ts, d DESC, user_id, session_idx
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS r
        |  FROM pts)
        |SELECT strftime(day, '%Y-%m-%d') AS dt,
        |       CAST(count(*) / 2 AS BIGINT) AS n_sessions,
        |       CAST(max(r) AS BIGINT) AS max_concurrent
        |FROM run GROUP BY 1 ORDER BY dt""".stripMargin,

    "x47_rolling_metrics" ->
      // The daily census + RANGE-framed trailing window replayed;
      // DECIMAL through the window sum, one round at the edge (the
      // d-series discipline), integer epoch-day ordering so gap
      // handling is identical.
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS dt,
        |         count(*) AS n_events,
        |         sum(CAST(value AS DECIMAL(18,4))) AS vsum,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, strftime(dt, '%Y-%m-%d') AS dt, n_events,
        |       CAST(round(vsum, 2) AS DOUBLE) AS value_sum,
        |       CAST(sum(n_events) OVER w AS BIGINT) AS n_7d,
        |       CAST(round(sum(vsum) OVER w, 2) AS DOUBLE)
        |         AS value_sum_7d,
        |       CAST(count(*) OVER w AS BIGINT) AS n_days_7d
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, dt""".stripMargin,

    "x46_planted_ratio" ->
      // No compressor needed: the plant's band is a certainty (a
      // constant run of >= 200 bytes deflates under 8% in any correct
      // deflate implementation), and n_raw is pure doc_id arithmetic.
      // The band cut itself is engine-side; what the oracle pins is
      // that every planted row lands in it — a broken Deflater loop,
      // a ratio off by a factor, or a band boundary drift all break
      // this.
      """SELECT doc_id, CAST(200 + doc_id % 500 AS BIGINT) AS n_raw,
        |       'junk' AS band
        |FROM documents WHERE doc_id % 13 = 0
        |ORDER BY doc_id""".stripMargin,

    "x45_session_funnel" ->
      // The x18 session assignment (4-hour gap) composed under the x37
      // correlated-min funnel, keyed on the user:session composite;
      // strict > and floor division as in both parents.
      """WITH a AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT)
        |           - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, event_type,
        |         concat(CAST(user_id AS VARCHAR), ':',
        |                CAST(sum(CASE WHEN gap_s IS NULL OR gap_s > 14400
        |                         THEN 1 ELSE 0 END)
        |                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                  AS VARCHAR)) AS sk
        |  FROM a),
        |s1 AS (SELECT sk, min(ts) AS t1 FROM sess
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT s.sk, min(ts) AS t2
        |       FROM sess s JOIN s1 USING (sk)
        |       WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
        |s3 AS (SELECT s.sk, min(ts) AS t3
        |       FROM sess s JOIN s2 USING (sk)
        |       WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1),
        |c AS (SELECT 1 AS step_idx, 'view' AS step,
        |             CAST(count(*) AS BIGINT) AS n_users FROM s1
        |      UNION ALL SELECT 2, 'click', count(*) FROM s2
        |      UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT CAST(step_idx AS BIGINT) AS step_idx, step, n_users,
        |       CAST((n_users * 1000000) //
        |            (SELECT n_users FROM c WHERE step_idx = 1) AS BIGINT)
        |         AS conv_ppm
        |FROM c ORDER BY step_idx""".stripMargin,

    "g17_referential" ->
      // Each edge re-derived as a NOT-EXISTS census (null fks counted
      // separately, never as orphans — SQL FK semantics), with the
      // lineitem %97 plant replayed.
      """WITH li AS (
        |  SELECT CASE WHEN l_orderkey % 97 = 13
        |              THEN l_orderkey + 1000000000
        |              ELSE l_orderkey END AS fk
        |  FROM lineitem),
        |edges AS (
        |  SELECT 'lineitem' AS child_table, 'l_orderkey' AS fk_column,
        |         'orders' AS parent_table,
        |         count(fk) AS n_child,
        |         count(CASE WHEN fk IS NULL THEN 1 END) AS n_null_fk,
        |         count(CASE WHEN fk IS NOT NULL AND NOT EXISTS
        |           (SELECT 1 FROM orders WHERE o_orderkey = fk)
        |           THEN 1 END) AS n_orphans
        |  FROM li
        |  UNION ALL
        |  SELECT 'orders', 'o_custkey', 'customer', count(o_custkey),
        |         count(CASE WHEN o_custkey IS NULL THEN 1 END),
        |         count(CASE WHEN o_custkey IS NOT NULL AND NOT EXISTS
        |           (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |           THEN 1 END)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'customer', 'c_nationkey', 'nation', count(c_nationkey),
        |         count(CASE WHEN c_nationkey IS NULL THEN 1 END),
        |         count(CASE WHEN c_nationkey IS NOT NULL AND NOT EXISTS
        |           (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
        |           THEN 1 END)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'supplier', 's_nationkey', 'nation', count(s_nationkey),
        |         count(CASE WHEN s_nationkey IS NULL THEN 1 END),
        |         count(CASE WHEN s_nationkey IS NOT NULL AND NOT EXISTS
        |           (SELECT 1 FROM nation WHERE n_nationkey = s_nationkey)
        |           THEN 1 END)
        |  FROM supplier
        |  UNION ALL
        |  SELECT 'nation', 'n_regionkey', 'region', count(n_regionkey),
        |         count(CASE WHEN n_regionkey IS NULL THEN 1 END),
        |         count(CASE WHEN n_regionkey IS NOT NULL AND NOT EXISTS
        |           (SELECT 1 FROM region WHERE r_regionkey = n_regionkey)
        |           THEN 1 END)
        |  FROM nation)
        |SELECT child_table, fk_column, parent_table, n_child, n_null_fk,
        |       n_orphans, n_orphans = 0 AS passed
        |FROM edges ORDER BY child_table, fk_column""".stripMargin,

    "x44_mad_outliers" ->
      // The twice-median trick replayed: 4-dp scaled longs, med2 =
      // round(2·quantile_cont) — an EXACT .0/.5 double over integer
      // inputs in both engines, so no interpolation ulp exposure —
      // then the all-integer outlier test 2·D > 3·mad2.
      """WITH s AS (
        |  SELECT event_type,
        |         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |           AS scaled
        |  FROM events),
        |med AS (
        |  SELECT event_type,
        |         CAST(round(2 * quantile_cont(scaled, 0.5)) AS BIGINT)
        |           AS med2
        |  FROM s GROUP BY 1),
        |dev AS (
        |  SELECT s.event_type, abs(s.scaled * 2 - med.med2) AS dev2,
        |         med.med2
        |  FROM s JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type,
        |         CAST(round(2 * quantile_cont(dev2, 0.5)) AS BIGINT)
        |           AS mad2
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, count(*) AS n,
        |       max(d.med2) AS med2, max(m.mad2) AS mad2,
        |       count(CASE WHEN d.dev2 * 2 > 3 * m.mad2 THEN 1 END)
        |         AS n_outliers
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "x43_embed_drift" ->
      // The whole drift pipeline replayed: the shared int8 quantization
      // (widen-then-shift for the label-3 plant, same IEEE op order as
      // the engine), per-(label, dim) integer sums per snapshot half,
      // FLOOR micro-means (// floors; the engine spells floor via
      // pmod), and the squared-diff rollup shipped as a canonical
      // integer STRING (r12: raw DECIMAL(38,0) diverged in the
      // driver's hasher).
      """WITH base AS (
        |  SELECT vec_id, label,
        |         CASE WHEN vec_id % 2 = 1 AND label = 3
        |              THEN list_transform(CAST(embedding AS DOUBLE[]),
        |                                  x -> x + 0.25)
        |              ELSE CAST(embedding AS DOUBLE[]) END AS v
        |  FROM embeddings),
        |qz AS (
        |  SELECT vec_id, label,
        |         CASE WHEN m = 0 THEN list_transform(v, x -> 0.0)
        |              ELSE list_transform(v, x -> round(x / (m / 127))) END AS qv
        |  FROM (SELECT vec_id, label, v,
        |               list_max(list_transform(v, x -> abs(x))) AS m
        |        FROM base)),
        |e AS (
        |  SELECT vec_id, label, i AS pos, CAST(qv[i] AS BIGINT) AS q
        |  FROM qz, unnest(range(1, len(qv) + 1)) AS t(i)),
        |ca AS (SELECT label, pos, CAST(sum(q) AS BIGINT) AS sa,
        |              count(*) AS na
        |       FROM e WHERE vec_id % 2 = 0 GROUP BY 1, 2),
        |cb AS (SELECT label, pos, CAST(sum(q) AS BIGINT) AS sb,
        |              count(*) AS nb
        |       FROM e WHERE vec_id % 2 = 1 GROUP BY 1, 2),
        |m AS (SELECT label, na, nb,
        |             (sa * 1000000) // na AS ma,
        |             (sb * 1000000) // nb AS mb
        |      FROM ca JOIN cb USING (label, pos))
        |SELECT label, CAST(max(na) AS BIGINT) AS n_prev,
        |       CAST(max(nb) AS BIGINT) AS n_cur,
        |       CAST(sum((ma - mb) * (ma - mb)) AS VARCHAR)
        |         AS drift_num
        |FROM m GROUP BY 1 ORDER BY label""".stripMargin,

    "x42_scd2_enrich" -> scd2EnrichSql,

    "s14_stream_enrich" -> scd2EnrichSql,

    "x41_pmi_pairs" ->
      // PMI replayed: unigram census, adjacent-pair census via lateral
      // unnest over 1..len-1, the >=5 cut, (Nu, Nb) from ONE pass over
      // the token arrays, the SAME pinned multiply/divide association
      // inside the single ln, one micro-nat rounding (slack-audited in
      // MicroNatSlackSpec), and the (pmi DESC, w1, w2) top-50 — the
      // (w1, w2) key makes the order total, so LIMIT is deterministic.
      raw"""WITH t AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE text IS NOT NULL AND len(trim(text)) > 0),
        |uni AS (
        |  SELECT w, count(*) AS c FROM (SELECT unnest(toks) AS w FROM t)
        |  WHERE w <> '' GROUP BY 1),
        |pairs AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, unnest(range(1, len(toks))) AS r(i)),
        |big AS (
        |  SELECT w1, w2, count(*) AS c12 FROM pairs
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |tot AS (
        |  SELECT CAST(sum(len(toks)) AS BIGINT) AS nu,
        |         CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS nb
        |  FROM t),
        |scored AS (
        |  SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
        |         CAST(round(ln(((b.c12 * 1.0 * tot.nu) / tot.nb) *
        |                       ((tot.nu * 1.0) / u1.c) / u2.c)
        |                    * 1000000.0) AS BIGINT) AS pmi_micro
        |  FROM big b JOIN uni u1 ON b.w1 = u1.w
        |             JOIN uni u2 ON b.w2 = u2.w
        |             CROSS JOIN tot)
        |SELECT w1, w2, c12, c1, c2, pmi_micro FROM scored
        |ORDER BY pmi_micro DESC, w1, w2 LIMIT 50""".stripMargin,

    "x40_dataset_card" ->
      // Every card signal re-derived independently: the shared
      // token-count CASE, the normText dedup family (the oracle counts
      // distinct NORMS where the engine counts distinct md5s — same
      // cardinality), the x7 PII patterns, exact interpolated median
      // (quantile_cont ≡ Spark percentile), all under GROUP BY
      // ROLLUP(source) with the '(all)' sentinel.
      """WITH t AS (SELECT source, lang, text,
        |    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
        |    coalesce(length(text), 0) AS n_ch,
        |    coalesce(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '') AS norm,
        |    (text IS NULL OR length(trim(text)) = 0) AS blank,
        |    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
        |    len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS np,
        |    len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ni
        |  FROM documents)
        |SELECT coalesce(source, '(all)') AS source,
        |       CAST(GROUPING(source) AS BIGINT) AS grouping_level,
        |       count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(sum(n_ch) AS BIGINT) AS n_chars,
        |       count(CASE WHEN blank THEN 1 END) AS n_empty,
        |       count(DISTINCT norm) AS n_distinct_text,
        |       CAST(((count(*) - count(DISTINCT norm)) * 1000000) //
        |            count(*) AS BIGINT) AS dup_ppm,
        |       count(DISTINCT lang) AS n_langs,
        |       count(CASE WHEN ne > 0 OR np > 0 OR ni > 0 THEN 1 END)
        |         AS docs_with_pii,
        |       round(CAST(sum(n_tok) AS DOUBLE) / count(*), 4) AS mean_tok,
        |       round(quantile_cont(n_tok, 0.5), 4) AS p50_tok
        |FROM t GROUP BY ROLLUP (source)
        |ORDER BY grouping_level, source""".stripMargin,

    "x39_length_batches" ->
      // The banded hierarchical rank replayed as the NAIVE per-band
      // window the staged plan avoids (row_number over the same
      // (band, doc_id) order), then the same batch census arithmetic —
      // any document the two ranks batch differently moves a max/sum
      // and breaks the hash. DuckDB sums BIGINT into HUGEINT, so every
      // sum casts back before the compare.
      """WITH toks AS (SELECT doc_id,
        |    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
        |  FROM documents),
        |b AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |             CAST(least(n_tok // 64, 31) AS BIGINT) AS band
        |      FROM toks WHERE n_tok > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY band
        |        ORDER BY doc_id) - 1 AS rnk FROM b)
        |SELECT band, CAST(rnk // 32 AS BIGINT) AS batch_idx,
        |       count(*) AS n_docs, max(n_tok) AS max_tok,
        |       CAST(sum(n_tok) AS BIGINT) AS actual_tok,
        |       count(*) * max(n_tok) AS padded_tok,
        |       CAST(((count(*) * max(n_tok) - sum(n_tok)) * 1000000) //
        |            (count(*) * max(n_tok)) AS BIGINT) AS pad_waste_ppm
        |FROM r GROUP BY 1, 2 ORDER BY band, batch_idx""".stripMargin,

    "x38_fuzzy_join" ->
      // The full linkage replayed: the keyed one-char deletion plant,
      // lowercase trigram sets via lateral unnest, the right-side df
      // census with the cap, candidate blocking on cold trigrams only,
      // the exact full-set intersection verify, the integer-ppm
      // Jaccard, and the (jppm DESC, rkey ASC) top-1 window. Any row
      // the engine's broadcast-blocked staged plan links differently
      // breaks the hash.
      """WITH clean AS (SELECT c_custkey AS rkey, lower(c_name) AS rname
        |               FROM customer),
        |dirty AS (SELECT c_custkey AS lkey,
        |                 lower(concat(
        |                   substr(c_name, 1, ((c_custkey % (length(c_name) - 3)) + 3) - 1),
        |                   substr(c_name, ((c_custkey % (length(c_name) - 3)) + 3) + 1))) AS lname
        |          FROM customer),
        |rg AS (SELECT DISTINCT rkey, substr(rname, i, 3) AS g
        |       FROM clean, unnest(range(1, greatest(length(rname) - 1, 1))) AS t(i)
        |       WHERE length(rname) >= 3),
        |lg AS (SELECT DISTINCT lkey, substr(lname, i, 3) AS g
        |       FROM dirty, unnest(range(1, greatest(length(lname) - 1, 1))) AS t(i)
        |       WHERE length(lname) >= 3),
        |dfc AS (SELECT g, count(*) AS n FROM rg GROUP BY 1),
        |cand AS (SELECT DISTINCT lg.lkey, rg.rkey
        |         FROM lg JOIN dfc USING (g) JOIN rg USING (g)
        |         WHERE dfc.n <= 64),
        |sl AS (SELECT lkey, count(*) AS nl FROM lg GROUP BY 1),
        |sr AS (SELECT rkey, count(*) AS nr FROM rg GROUP BY 1),
        |inter AS (SELECT c.lkey, c.rkey, count(*) AS ni
        |          FROM cand c JOIN lg ON lg.lkey = c.lkey
        |                      JOIN rg ON rg.rkey = c.rkey AND rg.g = lg.g
        |          GROUP BY 1, 2),
        |j AS (SELECT i.lkey, i.rkey, ni AS n_inter,
        |             nl + nr - ni AS n_union,
        |             (ni * 1000000) // (nl + nr - ni) AS jaccard_ppm
        |      FROM inter i JOIN sl USING (lkey) JOIN sr USING (rkey)
        |      WHERE (ni * 1000000) // (nl + nr - ni) >= 500000),
        |t AS (SELECT *, row_number() OVER (PARTITION BY lkey
        |        ORDER BY jaccard_ppm DESC, rkey ASC) AS rank_in_group
        |      FROM j)
        |SELECT lkey, rkey, CAST(rank_in_group AS BIGINT) AS rank_in_group,
        |       n_inter, n_union, jaccard_ppm,
        |       lkey = rkey AS is_true_match
        |FROM t WHERE rank_in_group <= 1 ORDER BY lkey""".stripMargin,

    "x37_event_funnel" ->
      // The chained earliest-after-previous funnel replayed as three
      // correlated min-aggregates; strict > on both engines, floor
      // division for the ppm.
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ts) AS t2
        |       FROM events e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ts) AS t3
        |       FROM events e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1),
        |c AS (SELECT 1 AS step_idx, 'view' AS step,
        |             CAST(count(*) AS BIGINT) AS n_users FROM s1
        |      UNION ALL SELECT 2, 'click', count(*) FROM s2
        |      UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT CAST(step_idx AS BIGINT) AS step_idx, step, n_users,
        |       CAST((n_users * 1000000) //
        |            (SELECT n_users FROM c WHERE step_idx = 1) AS BIGINT)
        |         AS conv_ppm
        |FROM c ORDER BY step_idx""".stripMargin,

    "x36_cohort_retention" ->
      // The retention matrix straight from raw events: distinct
      // (user, UTC day) activity, min-day cohorts, distinct actives
      // per (cohort, offset), cohort sizes, integer-ppm rate (floor
      // division on positives matches Spark's div).
      """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |           FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1),
        |s AS (SELECT cohort_day, count(*) AS cohort_size FROM c GROUP BY 1),
        |r AS (SELECT c.cohort_day,
        |             CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
        |             count(DISTINCT a.user_id) AS n_active
        |      FROM a JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort_day,
        |       day_offset, n_active, cohort_size,
        |       CAST((n_active * 1000000) // cohort_size AS BIGINT)
        |         AS retained_ppm
        |FROM r JOIN s USING (cohort_day)
        |ORDER BY 1, 2""".stripMargin,

    "x35_time_layout" ->
      // The one-week census straight from the raw events: dt = UTC day
      // of ts (the engine session pins UTC), DECIMAL-accumulated value
      // sum rounded in decimal then cast (the d-series discipline).
      """SELECT strftime(ts, '%Y-%m-%d') AS dt, event_type,
        |       count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
        |         AS value_sum
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x5_header_parse" ->
      // The planted header fields re-derived from the generation
      // formulas: doc_id%3 picks the container; width/height/rate/
      // duration are pure functions of doc_id and n_chars. The Spark side
      // reads these values OUT OF THE PAYLOAD BYTES — equality proves
      // both the hex assembly and the byte parsing.
      """SELECT doc_id AS media_id,
        |       CASE CAST(doc_id % 3 AS INT)
        |            WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
        |       CASE WHEN doc_id % 3 = 0 THEN CAST(32 + doc_id % 64 AS INT) END AS width,
        |       CASE WHEN doc_id % 3 = 0 THEN CAST(32 + doc_id % 32 AS INT) END AS height,
        |       CASE WHEN doc_id % 3 = 1 THEN CAST(8000 + (doc_id % 5) * 2000 AS INT) END AS sample_rate,
        |       CASE WHEN doc_id % 3 = 2 THEN CAST(n_chars * 10 AS BIGINT) END AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,

    "x20_psi_drift" ->
      // PSI replayed bin for bin: absolute epoch weeks (fractional
      // DuckDB epoch floors identically through /604800), width-25
      // value bins, +1 smoothing over the weeks × observed-(type,bin)
      // grid, per-bin micro-nat rounding (products in DOUBLE), integer
      // sums. ln agreement between engines is within the audited
      // micro-nat slack (MicroNatSlackSpec discipline).
      raw"""WITH c AS (
        |  SELECT CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS week,
        |         event_type,
        |         CAST(floor(value / 25.0) AS BIGINT) AS bin,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |bw AS (SELECT min(week) AS base_week FROM c),
        |base AS (
        |  SELECT event_type, bin, n AS nb FROM c, bw WHERE week = base_week),
        |grid AS (
        |  SELECT w.week, tb.event_type, tb.bin
        |  FROM (SELECT DISTINCT week FROM c) w
        |  CROSS JOIN (SELECT DISTINCT event_type, bin FROM c) tb),
        |sm AS (
        |  SELECT g.week, g.event_type, g.bin,
        |         coalesce(c.n, 0) AS n_raw,
        |         coalesce(c.n, 0) + 1 AS a,
        |         coalesce(b.nb, 0) + 1 AS b
        |  FROM grid g
        |  LEFT JOIN c ON c.week = g.week AND c.event_type = g.event_type
        |             AND c.bin = g.bin
        |  LEFT JOIN base b ON b.event_type = g.event_type AND b.bin = g.bin),
        |tot AS (
        |  SELECT week, event_type, sum(a) AS ta, sum(b) AS tb
        |  FROM sm GROUP BY 1, 2),
        |pb AS (
        |  SELECT s.week, s.event_type, s.n_raw,
        |         CAST(round((CAST(s.a AS DOUBLE) / t.ta
        |                       - CAST(s.b AS DOUBLE) / t.tb)
        |           * ln((CAST(s.a AS DOUBLE) * t.tb)
        |                  / (CAST(s.b AS DOUBLE) * t.ta))
        |           * 1000000.0) AS BIGINT) AS contrib_micro
        |  FROM sm s JOIN tot t USING (week, event_type))
        |SELECT week, event_type,
        |       CAST(sum(n_raw) AS BIGINT) AS n_events,
        |       CAST(sum(contrib_micro) AS BIGINT) AS psi_micro,
        |       round(sum(contrib_micro) / 1000000.0, 4) AS psi
        |FROM pb GROUP BY week, event_type
        |ORDER BY week, event_type""".stripMargin,

    "s12_stream_clean" ->
      // The full stage-0 chain composed from the SHARED replay parts
      // (markup dirt -> mojibake replace -> nfc_normalize -> the
      // line-dedup CTEs' boiler footer + first-occurrence rewrite ->
      // the clean chain) -- none of the stages can drift from their
      // standalone lanes because the SQL is assembled from the same
      // builders. %7 wins over %11 like the engine's when-chain
      // (deliberate: U+0301 would void the repair).
      ("WITH " + dirtyCteNamed("m0") + ",\n" +
        """dirty0 AS (
          |  SELECT doc_id, lang,
          |         CASE WHEN doc_id % 7 = 3
          |              THEN replace(coalesce(t, '') || ' caf\u00c3\u00a9',
          |                           '\u00c3\u00a9', '\u00e9')
          |              WHEN doc_id % 11 = 4
          |              THEN nfc_normalize(coalesce(t, '') || ' cafe\u0301 nfd')
          |              ELSE t END AS t
          |  FROM m0),""".stripMargin + "\n" +
        lineDedupCtes + ",\n" + cleanCtes + "\n" +
        """SELECT lang, count(*) AS n_docs,
          |       CAST(sum(length(clean)) AS BIGINT) AS clean_chars,
          |       CAST(sum(CAST(('0x' || substr(md5(clean), 1, 15)) AS BIGINT)
          |            % 1000000000) AS BIGINT) AS clean_fp_sum
          |FROM c4 GROUP BY lang ORDER BY lang""".stripMargin),

    "x19_text_clean" ->
      // The cleaning chain replayed step for step (shared dirtyCte +
      // cleanCtes — see their Scaladoc for the &amp;-last single-pass
      // discipline). had_markup = cleaned IS DISTINCT FROM the dirty
      // input; md5 over UTF-8 bytes matches Spark's md5(cast binary).
      ("WITH " + dirtyCte + ",\n" + cleanCtes + "\n" +
        raw"""SELECT doc_id,
          |       clean IS DISTINCT FROM t AS had_markup,
          |       CASE WHEN clean IS NULL OR len(trim(clean)) = 0 THEN 0
          |            ELSE len(string_split_regex(trim(clean), '\s+')) END
          |         AS n_tok_clean,
          |       md5(coalesce(clean, '')) AS clean_md5
          |FROM c4 ORDER BY doc_id""".stripMargin),

    "x19_line_dedup" ->
      // The within-doc line-dedup rewrite replayed at the string level:
      // first occurrence per exact line wins, order preserved
      // (row_number over the line ordinal, string_agg back in ordinal
      // order), counts from the -1-limit split (trailing empties
      // survive on both engines), md5 over the rewritten bytes.
      """WITH d AS (
        |  SELECT doc_id,
        |         coalesce(text, '') || chr(10) || 'boiler' || chr(10)
        |           || 'keep ' || CAST(doc_id AS VARCHAR) || chr(10)
        |           || 'boiler' || chr(10) || 'boiler' AS t
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, unnest(string_split(t, chr(10))) AS line,
        |         generate_subscripts(string_split(t, chr(10)), 1) AS ord
        |  FROM d),
        |firsts AS (
        |  SELECT doc_id, line, ord,
        |         row_number() OVER (PARTITION BY doc_id, line ORDER BY ord) AS rn
        |  FROM lines),
        |deduped AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS out,
        |         CAST(count(*) AS BIGINT) AS n_lines_out
        |  FROM firsts WHERE rn = 1 GROUP BY doc_id),
        |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines_in
        |        FROM lines GROUP BY doc_id)
        |SELECT doc_id, n_lines_in, n_lines_out,
        |       n_lines_in <> n_lines_out AS had_dup_lines,
        |       md5(coalesce(out, '')) AS dedup_md5
        |FROM d JOIN cnt USING (doc_id) JOIN deduped USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "x19_xdoc_dedup" ->
      // The CROSS-document boilerplate strip replayed end-to-end: the
      // normalized-line census over DISTINCT (line, doc) pairs, the
      // minDocFreq=3 threshold (the planted universal footer drops,
      // the df=2 pair lines survive, natural df>=3 corpus repeats drop
      // too), the order-preserving reassembly (string_agg in ordinal
      // order), and the per-source census with the md5-prefix
      // fingerprint sum over every rewritten text. Whitespace-only
      // norms are exempt from the census (blank lines are structure).
      raw"""WITH d AS (
        |  SELECT doc_id, source,
        |         coalesce(text, '') || chr(10) || 'subscribe to our newsletter'
        |           || chr(10) || 'pair ' || CAST(doc_id // 2 AS VARCHAR) AS t
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, unnest(string_split(t, chr(10))) AS line,
        |         generate_subscripts(string_split(t, chr(10)), 1) AS ord
        |  FROM d),
        |n AS (
        |  SELECT doc_id, line, ord,
        |         lower(trim(regexp_replace(line, '\s+', ' ', 'g'))) AS lnorm
        |  FROM lines),
        |heavy AS (
        |  SELECT lnorm FROM (SELECT DISTINCT lnorm, doc_id FROM n WHERE lnorm <> '')
        |  GROUP BY lnorm HAVING count(*) >= 3),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS xt,
        |         count(*) AS n_out
        |  FROM n WHERE lnorm NOT IN (SELECT lnorm FROM heavy)
        |  GROUP BY doc_id),
        |cnt AS (SELECT doc_id, count(*) AS n_in FROM lines GROUP BY doc_id)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(c.n_in - coalesce(r.n_out, 0)) AS BIGINT) AS boiler_dropped,
        |       CAST(count(CASE WHEN c.n_in > coalesce(r.n_out, 0) THEN 1 END)
        |         AS BIGINT) AS docs_hit,
        |       CAST(sum(CAST(('0x' || substr(md5(coalesce(r.xt, '')), 1, 15))
        |         AS BIGINT) % 1000000000) AS BIGINT) AS text_fp_sum
        |FROM d LEFT JOIN rebuilt r USING (doc_id) JOIN cnt c USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "x10_clean_funnel" ->
      // X19 composed into X10: the funnel replayed over the
      // LINE-DEDUPED, CLEANED dirtied corpus — the planted three-copy
      // boiler footer collapses to one line (dedupLinesFirst), then
      // dedup norms, contamination shingles (corpus grams from the
      // cleaned text vs bench grams from the RAW docs 0-2), PII
      // redaction, token band, and sampling all run downstream of the
      // clean chain. No url/history/fuzzy stages (no-ops).
      ("WITH " + dirtyCteNamed("dirty0") + ",\n" + lineDedupCtes + ",\n" +
        cleanCtes + ",\n" +
        "cc AS (SELECT doc_id, lang, clean AS text FROM c4),\n" +
        gram4CtesFrom("cc") + ",\n" + benchGramsRawCtes + ",\n" +
        noFuzzyFunnelBody("cc")),

    "x10_nfc_funnel" ->
      // X19d composed into X10 (Config.nfcFirst): the planted NFD twin
      // (+2e6) must share its composed sibling's (+1e6) dedup family —
      // NFC(NFD(x)) = NFC(x), so the oracle needs only nfc_normalize
      // (utf8proc and the JDK Normalizer implement the same spec).
      // Corpus grams from the NFC'd planted corpus; bench grams from
      // the RAW docs 0-2 (the engine passes the raw bench frame — NFC
      // of the ASCII bench text is the identity). No url/history/fuzzy
      // stages (no-ops).
      ("WITH pn AS (\n" +
        raw"""  SELECT doc_id, lang, nfc_normalize(text) AS text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 1000000, lang,
          |         nfc_normalize(coalesce(text, '') || ' é café')
          |  FROM documents WHERE doc_id < 10
          |  UNION ALL
          |  SELECT doc_id + 2000000, lang,
          |         nfc_normalize(coalesce(text, '') || ' é café')
          |  FROM documents WHERE doc_id < 10),""".stripMargin + "\n" +
        gram4CtesFrom("pn") + ",\n" + benchGramsRawCtes + ",\n" +
        noFuzzyFunnelBody("pn")),

    "x10_mojibake_funnel" ->
      // X19e composed into X10 (Config.fixEncodingFirst): the damaged
      // twin (+2e6, " caf\u00c3\u00a9") repairs to its clean sibling's
      // bytes (+1e6, " caf\u00e9"), so they form ONE dedup family and
      // min-key keeps +1e6. The repair replays as the planted replace
      // chain (exact: the base corpus is ASCII and passes through; the
      // clean twin's lone \u00e9 is a malformed continuation byte, also
      // passthrough). Bench grams from the RAW docs 0-2; no url/
      // history/fuzzy stages (no-ops).
      ("WITH pm AS (\n" +
        """  SELECT doc_id, lang, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 1000000, lang, coalesce(text, '') || ' caf\u00e9'
          |  FROM documents WHERE doc_id < 10
          |  UNION ALL
          |  SELECT doc_id + 2000000, lang,
          |         replace(coalesce(text, '') || ' caf\u00c3\u00a9',
          |                 '\u00c3\u00a9', '\u00e9')
          |  FROM documents WHERE doc_id < 10),""".stripMargin + "\n" +
        gram4CtesFrom("pm") + ",\n" + benchGramsRawCtes + ",\n" +
        noFuzzyFunnelBody("pm")),

    "x10_card_funnel" ->
      // X7b composed into X10: the card plants replayed as the same
      // replace arithmetic as x7_card_scan, wired in as the funnel
      // body's redaction BASE (cards before the regex PII chain, the
      // s11 ordering) -- the census observes redaction through the
      // token mass and restraint through the surviving invalid
      // candidates' tokens.
      ("WITH pc AS (\n" +
        """  SELECT doc_id, lang,
          |         CASE WHEN doc_id % 17 = 0 THEN
          |                text || ' pay 4111111111111111 or 4539 5787 6362 1486 now'
          |              WHEN doc_id % 19 = 0 THEN
          |                text || ' order 4111111111111112 ref 1234567890123 end'
          |              ELSE text END AS text
          |  FROM documents),""".stripMargin + "\n" +
        gram4CtesFrom("pc") + ",\n" + benchGramsRawCtes + ",\n" +
        noFuzzyFunnelBody("pc", rtextBase =
          "CASE WHEN doc_id % 17 = 0 THEN " +
            "replace(replace(text, '4111111111111111', '<CARD>'), " +
            "'4539 5787 6362 1486', '<CARD>') ELSE text END")),

    "x10_blocklist_funnel" ->
      // X3i composed into X10: the blocklist page gate as one more
      // quality conjunct, replayed as the exact token-split semantics
      // inside the shared funnel body. The plant is MIXED CASE, so a
      // hash match proves the engine's byte-level case folding too.
      ("WITH pb AS (\n" +
        """  SELECT doc_id, lang,
          |         CASE WHEN doc_id % 9 = 2
          |              THEN coalesce(text, '') || ' utterly FORBIDDEN content'
          |              ELSE text END AS text
          |  FROM documents),""".stripMargin + "\n" +
        gram4CtesFrom("pb") + ",\n" + benchGramsRawCtes + ",\n" +
        noFuzzyFunnelBody("pb",
          extraAnnCol = ",\n         len(list_filter(" +
            "regexp_split_to_array(lower(rtext), '[^a-z0-9_]+'), " +
            "t -> t IN ('forbidden', 'viagra'))) AS bl",
          qualExtra = " AND bl = 0")),

    "x10_xdedup_funnel" ->
      // X19c composed into X10 (the CCNet ordering — the shard-level
      // line dedup is the FIRST text operation): the planted universal
      // footer strips (its normalized line is in every document),
      // single-line >=3-doc duplicate families collapse to the
      // empty-text family, and the whole funnel census replays over
      // the rewritten corpus. Bench grams from the RAW docs 0-2, the
      // x10_clean_funnel direction. No url/history/fuzzy stages
      // (no-ops).
      (raw"""WITH pd AS (
        |  SELECT doc_id, lang,
        |         coalesce(text, '') || chr(10) || 'subscribe to our newsletter' AS t
        |  FROM documents),
        |xl AS (
        |  SELECT doc_id, unnest(string_split(t, chr(10))) AS line,
        |         generate_subscripts(string_split(t, chr(10)), 1) AS ord
        |  FROM pd),
        |xn AS (
        |  SELECT doc_id, line, ord,
        |         lower(trim(regexp_replace(line, '\s+', ' ', 'g'))) AS lnorm
        |  FROM xl),
        |xheavy AS (
        |  SELECT lnorm FROM (SELECT DISTINCT lnorm, doc_id FROM xn WHERE lnorm <> '')
        |  GROUP BY lnorm HAVING count(*) >= 3),
        |xreb AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS xt
        |  FROM xn WHERE lnorm NOT IN (SELECT lnorm FROM xheavy)
        |  GROUP BY doc_id),
        |xdocs AS (
        |  SELECT p.doc_id, p.lang, coalesce(r.xt, '') AS text
        |  FROM pd p LEFT JOIN xreb r USING (doc_id)),
        |""".stripMargin +
        gram4CtesFrom("xdocs") + ",\n" + benchGramsRawCtes + ",\n" +
        noFuzzyFunnelBody("xdocs")),

    "x10_write_verify" ->
      // The written-corpus census derived INDEPENDENTLY from the base
      // tables: curate survivors (min-key canonical per norm, not
      // contaminated vs bench docs 0-2, redacted-token band 25..90,
      // en-0.4 keyed-hash sample), split = the salted-hash 80/10/10
      // band, fingerprint = md5-prefix of the REDACTED text mod 1e9.
      // The engine aggregates the same census from the parquet it
      // WROTE and re-read, so a hash match proves the write -> read
      // round trip preserved every surviving row byte-for-byte.
      ("WITH " + gram4Ctes + ",\n" +
        raw"""bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM grams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8),
          |rdoc AS (
          |  SELECT doc_id, lang, source,
          |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS kt,
          |         regexp_replace(regexp_replace(regexp_replace(text,
          |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
          |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
          |  FROM documents),
          |""".stripMargin +
        s"""ann AS (
           |  SELECT doc_id, source,
           |         doc_id = min(doc_id) OVER (PARTITION BY kt) AS is_canonical,
           |         doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
           |         CASE WHEN len(trim(rtext)) = 0 THEN 0
           |              ELSE len(string_split_regex(trim(rtext), '\\s+')) END AS n_tok,
           |         ${bucketSql("doc_id")} AS b,
           |         CASE lang WHEN 'en' THEN 4000 ELSE 10000 END AS thr,
           |         CASE WHEN ${bucketSql("doc_id", 42L ^ graft.ext.Sampling.SplitSalt)} < 8000 THEN 'train'
           |              WHEN ${bucketSql("doc_id", 42L ^ graft.ext.Sampling.SplitSalt)} < 9000 THEN 'val'
           |              ELSE 'test' END AS split,
           |         CAST(('0x' || substr(md5(rtext), 1, 15)) AS BIGINT)
           |           % 1000000000 AS fp
           |  FROM rdoc)
           |SELECT split, source, count(*) AS n_docs,
           |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
           |       CAST(sum(fp) AS BIGINT) AS text_fp_sum
           |FROM ann
           |WHERE is_canonical AND NOT is_contaminated
           |  AND n_tok BETWEEN 25 AND 90 AND b < thr
           |GROUP BY 1, 2 ORDER BY split, source""".stripMargin),

    "x10_layout_audit" ->
      // The layout audit's expected state derived INDEPENDENTLY: the
      // survivor census (same curation replay as x10_write_verify) and
      // the occupied-leaf count with the 8-way pmod shard replayed on
      // the salted order key — and ZERO violations (the
      // engine counts them from the parquet it re-read; the oracle
      // pins the expectation).
      ("WITH " + gram4Ctes + ",\n" +
        raw"""bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM grams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8),
          |rdoc AS (
          |  SELECT doc_id, lang, source,
          |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS kt,
          |         regexp_replace(regexp_replace(regexp_replace(text,
          |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
          |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
          |  FROM documents),
          |""".stripMargin +
        s"""ann AS (
           |  SELECT doc_id, source,
           |         doc_id = min(doc_id) OVER (PARTITION BY kt) AS is_canonical,
           |         doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
           |         CASE WHEN len(trim(rtext)) = 0 THEN 0
           |              ELSE len(string_split_regex(trim(rtext), '\\s+')) END AS n_tok,
           |         ${bucketSql("doc_id")} AS b,
           |         CASE lang WHEN 'en' THEN 4000 ELSE 10000 END AS thr,
           |         CASE WHEN ${bucketSql("doc_id", 42L ^ graft.ext.Sampling.SplitSalt)} < 8000 THEN 'train'
           |              WHEN ${bucketSql("doc_id", 42L ^ graft.ext.Sampling.SplitSalt)} < 9000 THEN 'val'
           |              ELSE 'test' END AS split,
           |         (${orderKeySql("doc_id", 42L ^ graft.ext.Sampling.OrderSalt)} % 8)
           |           AS shard
           |  FROM rdoc)
           |SELECT CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(count(DISTINCT split || '/' || source || '/'
           |                  || CAST(shard AS VARCHAR)) AS BIGINT) AS n_leaves,
           |       CAST(0 AS BIGINT) AS bad_split,
           |       CAST(0 AS BIGINT) AS bad_shuffle_key,
           |       CAST(0 AS BIGINT) AS bad_shard
           |FROM ann
           |WHERE is_canonical AND NOT is_contaminated
           |  AND n_tok BETWEEN 25 AND 90 AND b < thr""".stripMargin),

    "x10_recipe_funnel" ->
      // The recipe file encodes exactly the base config (25..90 token
      // band, en-0.4 sample, 512 seq len), and the replay is assembled
      // ENTIRELY from the shared parts — corpus grams, raw-bench
      // contamination, the no-fuzzy funnel body — so the file-driven
      // funnel binds to SQL that cannot drift from the other funnels.
      ("WITH " + gram4Ctes + ",\n" + benchGramsRawCtes + ",\n" +
        noFuzzyFunnelBody("documents")),

    "x10_c4_funnel" ->
      // X3h composed into X10: the funnel census with the C4 bundle as
      // the quality stage — the per-doc line retention through the
      // SAME c4LineCtes as x3_c4_rules, the 3-retained-sentence floor,
      // and both page gates over the REDACTED text; the other stages
      // the standard replay (min-key canonical per norm, 4-gram
      // contamination vs the planted docs 0-2, en-0.4 keyed-hash
      // sample). minTokens = 1, so quality = n_tok >= 1 AND the C4
      // verdict — the stage isolates the rule bundle.
      ("WITH pd AS (\n" +
        raw"""  SELECT doc_id, lang,
          |         coalesce(text, '') ||
          |         CASE WHEN doc_id % 2 = 0
          |              THEN chr(10) || 'this is a good first sentence here.'
          |                || chr(10) || 'this is a good second sentence here.'
          |                || chr(10) || 'this is a good third sentence here.'
          |              ELSE chr(10) || 'only one good sentence lives here.' END ||
          |         CASE WHEN doc_id % 6 = 0 THEN chr(10) || 'brace { line'
          |              ELSE '' END AS text
          |  FROM documents),
          |""".stripMargin + gram4CtesFrom("pd") + ",\n" +
        raw"""bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM grams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8),
          |rdoc AS (
          |  SELECT doc_id, lang,
          |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS kt,
          |         regexp_replace(regexp_replace(regexp_replace(text,
          |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
          |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
          |  FROM pd),
          |csrc AS (SELECT doc_id, coalesce(rtext, '') AS t FROM rdoc),
          |""".stripMargin + c4LineCtes("csrc") + ",\n" +
        raw"""cpass AS (
          |  SELECT s.doc_id,
          |         NOT contains(s.t, '{')
          |         AND NOT contains(lower(s.t), 'lorem ipsum')
          |         AND len(regexp_extract_all(coalesce(r.xt, ''), '[.!?]')) >= 3
          |           AS cpass
          |  FROM csrc s LEFT JOIN c4reb r USING (doc_id)),
          |""".stripMargin +
        s"""ann AS (
           |  SELECT r.doc_id,
           |         r.doc_id = min(r.doc_id) OVER (PARTITION BY r.kt) AS is_canonical,
           |         r.doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
           |         CASE WHEN len(trim(r.rtext)) = 0 THEN 0
           |              ELSE len(string_split_regex(trim(r.rtext), '\\s+')) END AS n_tok,
           |         p.cpass,
           |         ${bucketSql("r.doc_id")} AS b,
           |         CASE r.lang WHEN 'en' THEN 4000 ELSE 10000 END AS thr
           |  FROM rdoc r JOIN cpass p ON r.doc_id = p.doc_id
           |), f AS (
           |  SELECT count(*) AS n_raw,
           |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_dedup,
           |         count(CASE WHEN is_canonical AND NOT is_contaminated THEN 1 END)
           |           AS n_after_decontam,
           |         count(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND n_tok >= 1 AND cpass THEN 1 END)
           |           AS n_after_quality,
           |         count(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND n_tok >= 1 AND cpass AND b < thr THEN 1 END)
           |           AS n_after_sample,
           |         COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS tokens_raw,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical
           |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_dedup,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
           |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_decontam,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND n_tok >= 1 AND cpass
           |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_quality,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND n_tok >= 1 AND cpass AND b < thr
           |                    THEN n_tok END) AS BIGINT), 0) AS n_tokens
           |  FROM ann)
           |SELECT n_raw, n_raw AS n_after_url,
           |       n_after_dedup, n_after_dedup AS n_after_history,
           |       n_after_dedup AS n_after_fuzzy,
           |       n_after_decontam, n_after_quality, n_after_sample,
           |       tokens_raw, tokens_raw AS tokens_after_url,
           |       tokens_after_dedup, tokens_after_dedup AS tokens_after_history,
           |       tokens_after_dedup AS tokens_after_fuzzy,
           |       tokens_after_decontam, tokens_after_quality, n_tokens,
           |       CASE WHEN n_tokens = 0 THEN 0
           |            ELSE (n_tokens - 1) // 512 + 1 END AS n_sequences
           |FROM f""".stripMargin),

    "x10_gopher_funnel" ->
      // X3g composed into X10: the funnel census with the FULL Gopher
      // rule conjunction as the quality stage, every rule replayed per
      // document over the REDACTED text (gopherPassCtes), the other
      // stages the standard replay (min-key canonical per norm,
      // 4-gram contamination vs bench docs 0-2, en-0.4 keyed-hash
      // sample). Config.minTokens = 1, so quality = n_tok >= 1 AND the
      // Gopher verdict — the stage isolates the rule bundle.
      ("WITH " + gram4Ctes + ",\n" +
        raw"""bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM grams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8),
          |rdoc AS (
          |  SELECT doc_id, lang,
          |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS kt,
          |         regexp_replace(regexp_replace(regexp_replace(text,
          |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
          |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
          |  FROM documents),
          |gsrc AS (SELECT doc_id, coalesce(rtext, '') AS t FROM rdoc),
          |""".stripMargin + gopherPassCtes + ",\n" +
        s"""ann AS (
           |  SELECT r.doc_id,
           |         r.doc_id = min(r.doc_id) OVER (PARTITION BY r.kt) AS is_canonical,
           |         r.doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
           |         CASE WHEN len(trim(r.rtext)) = 0 THEN 0
           |              ELSE len(string_split_regex(trim(r.rtext), '\\s+')) END AS n_tok,
           |         p.gpass,
           |         ${bucketSql("r.doc_id")} AS b,
           |         CASE r.lang WHEN 'en' THEN 4000 ELSE 10000 END AS thr
           |  FROM rdoc r JOIN gpass p ON r.doc_id = p.doc_id
           |), f AS (
           |  SELECT count(*) AS n_raw,
           |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_dedup,
           |         count(CASE WHEN is_canonical AND NOT is_contaminated THEN 1 END)
           |           AS n_after_decontam,
           |         count(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND n_tok >= 1 AND gpass THEN 1 END)
           |           AS n_after_quality,
           |         count(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND n_tok >= 1 AND gpass AND b < thr THEN 1 END)
           |           AS n_after_sample,
           |         COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS tokens_raw,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical
           |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_dedup,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
           |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_decontam,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND n_tok >= 1 AND gpass
           |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_quality,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND n_tok >= 1 AND gpass AND b < thr
           |                    THEN n_tok END) AS BIGINT), 0) AS n_tokens
           |  FROM ann)
           |SELECT n_raw, n_raw AS n_after_url,
           |       n_after_dedup, n_after_dedup AS n_after_history,
           |       n_after_dedup AS n_after_fuzzy,
           |       n_after_decontam, n_after_quality, n_after_sample,
           |       tokens_raw, tokens_raw AS tokens_after_url,
           |       tokens_after_dedup, tokens_after_dedup AS tokens_after_history,
           |       tokens_after_dedup AS tokens_after_fuzzy,
           |       tokens_after_decontam, tokens_after_quality, n_tokens,
           |       CASE WHEN n_tokens = 0 THEN 0
           |            ELSE (n_tokens - 1) // 512 + 1 END AS n_sequences
           |FROM f""".stripMargin),

    "x10_gopher_bylang" ->
      // The Gopher funnel gate DISPATCHED PER LANGUAGE: identical
      // funnel replay to x10_gopher_funnel, with the per-doc rule CTEs
      // swapping in the language-cased tokenization / stop lists /
      // script symbol classes / CJK mean-token floor (the shipped
      // preset catalog, interpolated — config data, rules restated).
      ("WITH " + gram4Ctes + ",\n" +
        raw"""bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM grams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8),
          |rdoc AS (
          |  SELECT doc_id, lang,
          |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS kt,
          |         regexp_replace(regexp_replace(regexp_replace(text,
          |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
          |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
          |  FROM documents),
          |gsrc AS (SELECT doc_id, lang, coalesce(rtext, '') AS t FROM rdoc),
          |""".stripMargin + gopherPassByLangCtes + ",\n" +
        s"""ann AS (
           |  SELECT r.doc_id,
           |         r.doc_id = min(r.doc_id) OVER (PARTITION BY r.kt) AS is_canonical,
           |         r.doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
           |         CASE WHEN len(trim(r.rtext)) = 0 THEN 0
           |              ELSE len(string_split_regex(trim(r.rtext), '\\s+')) END AS n_tok,
           |         p.gpass,
           |         ${bucketSql("r.doc_id")} AS b,
           |         CASE r.lang WHEN 'en' THEN 4000 ELSE 10000 END AS thr
           |  FROM rdoc r JOIN gpass p ON r.doc_id = p.doc_id
           |), f AS (
           |  SELECT count(*) AS n_raw,
           |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_dedup,
           |         count(CASE WHEN is_canonical AND NOT is_contaminated THEN 1 END)
           |           AS n_after_decontam,
           |         count(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND n_tok >= 1 AND gpass THEN 1 END)
           |           AS n_after_quality,
           |         count(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND n_tok >= 1 AND gpass AND b < thr THEN 1 END)
           |           AS n_after_sample,
           |         COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS tokens_raw,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical
           |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_dedup,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
           |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_decontam,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND n_tok >= 1 AND gpass
           |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_quality,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND n_tok >= 1 AND gpass AND b < thr
           |                    THEN n_tok END) AS BIGINT), 0) AS n_tokens
           |  FROM ann)
           |SELECT n_raw, n_raw AS n_after_url,
           |       n_after_dedup, n_after_dedup AS n_after_history,
           |       n_after_dedup AS n_after_fuzzy,
           |       n_after_decontam, n_after_quality, n_after_sample,
           |       tokens_raw, tokens_raw AS tokens_after_url,
           |       tokens_after_dedup, tokens_after_dedup AS tokens_after_history,
           |       tokens_after_dedup AS tokens_after_fuzzy,
           |       tokens_after_decontam, tokens_after_quality, n_tokens,
           |       CASE WHEN n_tokens = 0 THEN 0
           |            ELSE (n_tokens - 1) // 512 + 1 END AS n_sequences
           |FROM f""".stripMargin),

    "x10_write_packed" ->
      // The terminal artifact replayed end-to-end: curation survivors
      // (the x10_write_verify machinery), the salted 80/10/10 split
      // bands, then each split's OWN pack — the prefix-sum window
      // PARTITIONED BY split — sliced, reassembled in doc order, and
      // fingerprinted per sequence (md5-prefix mod 1e9, summed per
      // split). The engine aggregates the same census from the shards
      // it wrote and re-read.
      ("WITH " + gram4Ctes + ",\n" +
        raw"""bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM grams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8),
          |rdoc AS (
          |  SELECT doc_id, lang,
          |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS kt,
          |         regexp_replace(regexp_replace(regexp_replace(text,
          |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
          |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
          |  FROM documents),
          |""".stripMargin +
        s"""ann AS (
           |  SELECT doc_id, rtext,
           |         doc_id = min(doc_id) OVER (PARTITION BY kt) AS is_canonical,
           |         doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
           |         CASE WHEN len(trim(rtext)) = 0 THEN 0
           |              ELSE len(string_split_regex(trim(rtext), '\\s+')) END AS n_tok,
           |         ${bucketSql("doc_id")} AS bkt,
           |         CASE lang WHEN 'en' THEN 4000 ELSE 10000 END AS thr,
           |         CASE WHEN ${bucketSql("doc_id", 42L ^ graft.ext.Sampling.SplitSalt)} < 8000 THEN 'train'
           |              WHEN ${bucketSql("doc_id", 42L ^ graft.ext.Sampling.SplitSalt)} < 9000 THEN 'val'
           |              ELSE 'test' END AS split
           |  FROM rdoc),
           |""".stripMargin +
        raw"""surv AS (
          |  SELECT doc_id, split,
          |         string_split_regex(trim(rtext), '\s+') AS toks, n_tok
          |  FROM ann
          |  WHERE is_canonical AND NOT is_contaminated
          |    AND n_tok BETWEEN 25 AND 90 AND bkt < thr),
          |pc AS (
          |  SELECT doc_id, split, toks, n_tok,
          |         COALESCE(CAST(sum(n_tok) OVER (PARTITION BY split ORDER BY doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start
          |  FROM surv),
          |pspans AS (
          |  SELECT doc_id, split, toks, n_tok, start,
          |         unnest(range(start // 512, (start + n_tok - 1) // 512 + 1)) AS seq_id
          |  FROM pc),
          |psl AS (
          |  SELECT split, seq_id, doc_id, e - b2 AS ntk,
          |         array_to_string(list_slice(toks, b2 + 1, e), ' ') AS chunk
          |  FROM (SELECT split, seq_id, doc_id, toks,
          |               greatest(seq_id * 512, start) - start AS b2,
          |               least((seq_id + 1) * 512, start + n_tok) - start AS e
          |        FROM pspans)),
          |pseq AS (
          |  SELECT split, seq_id, CAST(sum(ntk) AS BIGINT) AS seq_tok,
          |         string_agg(chunk, ' ' ORDER BY doc_id) AS seq_text
          |  FROM psl GROUP BY 1, 2)
          |SELECT split, count(*) AS n_seqs,
          |       CAST(sum(seq_tok) AS BIGINT) AS n_tokens,
          |       CAST(sum(CAST(('0x' || substr(md5(seq_text), 1, 15)) AS BIGINT)
          |            % 1000000000) AS BIGINT) AS seq_fp_sum
          |FROM pseq GROUP BY 1 ORDER BY split""".stripMargin),

    "x23_chunk_docs" ->
      // Chunk layout replayed: 32-token windows, stride 24, count =
      // (n-33) // 24 + 2 above one chunk (non-negative numerator — the
      // Spark side guards the same way because `div` truncates while
      // `//` floors on negatives), 1-based inclusive list_slice, md5 of
      // the space-joined window.
      raw"""WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
        |         CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, n,
        |         CASE WHEN n <= 32 THEN 1 ELSE (n - 33) // 24 + 2 END AS nchunks
        |  FROM t WHERE n > 0),
        |e AS (
        |  SELECT doc_id, toks,
        |         unnest(range(0, CAST(nchunks AS BIGINT))) AS chunk_idx
        |  FROM c),
        |s AS (
        |  SELECT doc_id, chunk_idx,
        |         list_slice(toks, CAST(chunk_idx * 24 + 1 AS BIGINT),
        |                    CAST(chunk_idx * 24 + 32 AS BIGINT)) AS chunk
        |  FROM e)
        |SELECT doc_id, chunk_idx,
        |       CAST(len(chunk) AS BIGINT) AS n_tok_chunk,
        |       md5(array_to_string(chunk, ' ')) AS chunk_md5
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    "x25_corpus_diff" ->
      // The snapshot diff replayed with direct TEXT comparison (the
      // engine compares md5 fingerprints — equality of the hash must
      // equal equality of the bytes), the same plant derivation, and
      // the per-status key sums pinning WHICH docs carry each status.
      """WITH old AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
        |newer AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 13 = 0 THEN 'edited v2: ' || t ELSE t END AS t
        |  FROM old WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, t FROM old WHERE doc_id < 20),
        |d AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |         CASE WHEN o.doc_id IS NULL THEN 'added'
        |              WHEN n.doc_id IS NULL THEN 'removed'
        |              WHEN o.t = n.t THEN 'unchanged'
        |              ELSE 'modified' END AS status
        |  FROM old o FULL OUTER JOIN newer n ON o.doc_id = n.doc_id)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(doc_id) AS BIGINT) AS key_sum
        |FROM d GROUP BY status ORDER BY status""".stripMargin,

    "x28_bucketed_join" ->
      // The co-located bucketed join replayed as the PLAIN join — the
      // storage layout must be result-invisible. DECIMAL accumulation
      // + the sessionize round/cast discipline for the double price.
      """SELECT c.c_mktsegment AS mktsegment,
        |       count(*) AS n_orders,
        |       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2)
        |            AS DOUBLE) AS revenue
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment
        |ORDER BY mktsegment""".stripMargin,

    "x29_jsonl_roundtrip" -> docCensusSql,

    // The CSV round trip and the compaction rewrite bind to the SAME
    // original-parquet census: losslessness (x32) and layout-only-ness
    // (x33) are the same proof shape.
    "x32_csv_roundtrip" -> docCensusSql,
    "x33_compact_verify" -> docCensusSql,
    "x34_orc_roundtrip" -> docCensusSql,
    "x19_fix_mojibake" ->
      // The planted damage vocabulary replays as a literal replace
      // chain (\u escapes mirror the plant; U+009F is invisible) --
      // exact because clean corpus text is ASCII and the repair's
      // strict round-trip condition passes it through untouched (see
      // Queries.x19FixMojibake / FixMojibakeSpec).
      ("""WITH planted AS (
        |  SELECT source,
        |         CASE WHEN doc_id % 7 = 3
        |              THEN coalesce(text, '') ||
        |                ' caf\u00c3\u00a9 \u00e2\u20ac\u201d""" +
        """ don\u00e2\u20ac\u2122t stra\u00c3\u009fe'
        |              ELSE text END AS text
        |  FROM documents),
        |f AS (
        |  SELECT source, text,
        |         replace(replace(replace(replace(text,
        |           '\u00c3\u00a9', '\u00e9'),
        |           '\u00e2\u20ac\u201d', '\u2014'),
        |           '\u00e2\u20ac\u2122', '\u2019'),
        |           '\u00c3\u009f', '\u00df') AS fixed
        |  FROM planted)
        |SELECT source, count(*) AS n_docs,
        |       CAST(count(CASE WHEN fixed IS DISTINCT FROM text THEN 1 END)
        |            AS BIGINT) AS n_repaired,
        |       CAST(sum(length(fixed)) AS BIGINT) AS fixed_chars,
        |       CAST(sum(CAST(('0x' || substr(md5(fixed), 1, 15)) AS BIGINT)
        |            % 1000000000) AS BIGINT) AS fixed_fp_sum
        |FROM f GROUP BY source ORDER BY source""").stripMargin,
    "x3_top_terms" ->
      // The shared whitespace token split, one global count, and the
      // same (n DESC, term ASC) total order under the cut — ties at
      // rank 20 are deterministic in both engines.
      raw"""SELECT term, count(*) AS n
        |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
        |      FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        |GROUP BY term
        |ORDER BY n DESC, term ASC
        |LIMIT 20""".stripMargin,

    "x3_word_blocklist" ->
      """WITH planted AS (
        |  SELECT source,
        |         CASE WHEN doc_id % 13 = 5
        |              THEN coalesce(text, '') || ' Slow VECTOR flagged'
        |              ELSE text END AS text
        |  FROM documents),
        |h AS (
        |  SELECT source,
        |         CASE WHEN text IS NULL THEN NULL
        |              ELSE len(list_filter(
        |                regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
        |                t -> t IN ('vector', 'merge', 'slow', 'customer')))
        |              END AS hits
        |  FROM planted)
        |SELECT source, count(*) AS n_docs,
        |       CAST(count(CASE WHEN hits > 0 THEN 1 END) AS BIGINT)
        |         AS n_flagged,
        |       CAST(sum(hits) AS BIGINT) AS hits_sum,
        |       CAST(max(hits) AS BIGINT) AS max_hits
        |FROM h GROUP BY source ORDER BY source""".stripMargin,

    "x27_pctl_against" ->
      // The persisted-cut gate replayed from scratch: the per-source
      // cut is the smallest score whose integer cume_dist clears the
      // 10th percentile, then the gate is one comparison per row
      // (NULL score ⇒ FALSE — null never survives an adaptive cut).
      // Null-safe stratum join, mirroring the engine's <=>.
      """WITH c AS (
        |  SELECT source, n_chars, count(*) AS n FROM documents
        |  WHERE n_chars IS NOT NULL GROUP BY source, n_chars),
        |g AS (
        |  SELECT source, n_chars,
        |         sum(n) OVER (PARTITION BY source ORDER BY n_chars) AS cum_le,
        |         sum(n) OVER (PARTITION BY source) AS tot
        |  FROM c),
        |cut AS (
        |  SELECT source, min(n_chars) AS cut_score FROM g
        |  WHERE (cum_le * 1000000) // tot >= 100000 GROUP BY source)
        |SELECT d.doc_id, d.source, d.n_chars, t.cut_score,
        |       coalesce(d.n_chars >= t.cut_score, FALSE) AS is_kept
        |FROM documents d
        |LEFT JOIN cut t ON d.source IS NOT DISTINCT FROM t.source
        |ORDER BY d.doc_id""".stripMargin,

    "s9_stream_pctl_gate" ->
      // The streaming serve-time gate batch-replayed: cuts re-derived
      // from the FIT corpus only (docs < 300 — the history shard), the
      // gate one comparison per arriving document (docs >= 300). A
      // source absent from history yields no cut row → NULL cut_score
      // → FALSE (an unknown stratum never survives an adaptive cut).
      """WITH c AS (
        |  SELECT source, n_chars, count(*) AS n FROM documents
        |  WHERE doc_id < 300 AND n_chars IS NOT NULL
        |  GROUP BY source, n_chars),
        |g AS (
        |  SELECT source, n_chars,
        |         sum(n) OVER (PARTITION BY source ORDER BY n_chars) AS cum_le,
        |         sum(n) OVER (PARTITION BY source) AS tot
        |  FROM c),
        |cut AS (
        |  SELECT source, min(n_chars) AS cut_score FROM g
        |  WHERE (cum_le * 1000000) // tot >= 100000 GROUP BY source)
        |SELECT d.doc_id, d.source, d.n_chars, t.cut_score,
        |       coalesce(d.n_chars >= t.cut_score, FALSE) AS is_kept
        |FROM documents d
        |LEFT JOIN cut t ON d.source IS NOT DISTINCT FROM t.source
        |WHERE d.doc_id >= 300
        |ORDER BY d.doc_id""".stripMargin,

    "x10_pctl_funnel" ->
      // X27 composed into X10: the funnel census with the FITTED
      // per-language token floor as the quality stage — the cut
      // re-derived from scratch (integer cume_dist over the RAW-text
      // token census, min passing count), the gate replayed per
      // document over the REDACTED text's n_tok, the other stages the
      // standard replay (min-key canonical per norm, 4-gram
      // contamination vs bench docs 0-2, en-0.4 keyed-hash sample).
      ("WITH " + gram4Ctes + ",\n" +
        raw"""bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < 3),
          |bn AS (SELECT bench_id, count(*) AS n FROM bench GROUP BY 1),
          |contam AS (
          |  SELECT DISTINCT doc_id FROM (
          |    SELECT g.doc_id, b.bench_id, count(*) AS i
          |    FROM grams g JOIN bench b ON g.gram = b.gram
          |    GROUP BY 1, 2) JOIN bn USING (bench_id)
          |  WHERE round(i * 1.0 / n, 4) >= 0.8),
          |rdoc AS (
          |  SELECT doc_id, lang,
          |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS kt,
          |         regexp_replace(regexp_replace(regexp_replace(text,
          |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
          |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS rtext
          |  FROM documents),
          |rawtok AS (
          |  SELECT lang,
          |         CASE WHEN text IS NULL OR trim(text) = '' THEN 0
          |              ELSE len(string_split_regex(trim(text), '\s+')) END AS rt
          |  FROM documents),
          |tc AS (SELECT lang, rt, count(*) AS n FROM rawtok GROUP BY lang, rt),
          |tg AS (
          |  SELECT lang, rt,
          |         sum(n) OVER (PARTITION BY lang ORDER BY rt) AS cum,
          |         sum(n) OVER (PARTITION BY lang) AS tot
          |  FROM tc),
          |cut AS (
          |  SELECT lang, min(rt) AS cs FROM tg
          |  WHERE (cum * 1000000) // tot >= 100000 GROUP BY lang),
          |""".stripMargin +
        s"""ann AS (
           |  SELECT r.doc_id,
           |         r.doc_id = min(r.doc_id) OVER (PARTITION BY r.kt) AS is_canonical,
           |         r.doc_id IN (SELECT doc_id FROM contam) AS is_contaminated,
           |         CASE WHEN len(trim(r.rtext)) = 0 THEN 0
           |              ELSE len(string_split_regex(trim(r.rtext), '\\s+')) END AS n_tok,
           |         c.cs,
           |         ${bucketSql("r.doc_id")} AS b,
           |         CASE r.lang WHEN 'en' THEN 4000 ELSE 10000 END AS thr
           |  FROM rdoc r LEFT JOIN cut c ON r.lang IS NOT DISTINCT FROM c.lang
           |), q AS (
           |  SELECT *, n_tok >= 1 AND coalesce(n_tok >= cs, FALSE) AS qpass
           |  FROM ann
           |), f AS (
           |  SELECT count(*) AS n_raw,
           |         count(CASE WHEN is_canonical THEN 1 END) AS n_after_dedup,
           |         count(CASE WHEN is_canonical AND NOT is_contaminated THEN 1 END)
           |           AS n_after_decontam,
           |         count(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND qpass THEN 1 END)
           |           AS n_after_quality,
           |         count(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND qpass AND b < thr THEN 1 END)
           |           AS n_after_sample,
           |         COALESCE(CAST(sum(n_tok) AS BIGINT), 0) AS tokens_raw,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical
           |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_dedup,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
           |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_decontam,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND qpass
           |                    THEN n_tok END) AS BIGINT), 0) AS tokens_after_quality,
           |         COALESCE(CAST(sum(CASE WHEN is_canonical AND NOT is_contaminated
           |                         AND qpass AND b < thr
           |                    THEN n_tok END) AS BIGINT), 0) AS n_tokens
           |  FROM q)
           |SELECT n_raw, n_raw AS n_after_url,
           |       n_after_dedup, n_after_dedup AS n_after_history,
           |       n_after_dedup AS n_after_fuzzy,
           |       n_after_decontam, n_after_quality, n_after_sample,
           |       tokens_raw, tokens_raw AS tokens_after_url,
           |       tokens_after_dedup, tokens_after_dedup AS tokens_after_history,
           |       tokens_after_dedup AS tokens_after_fuzzy,
           |       tokens_after_decontam, tokens_after_quality, n_tokens,
           |       CASE WHEN n_tokens = 0 THEN 0
           |            ELSE (n_tokens - 1) // 512 + 1 END AS n_sequences
           |FROM f""".stripMargin),

    "x27_score_percentile" ->
      // The adaptive threshold replayed as the NAIVE plan the staged
      // census+CDF operator avoids: cume_dist of every corpus row via
      // a census-equivalent window pair (cum ≤-count and group total),
      // all integer — (cum_le·10⁶) // tot is DuckDB floor division,
      // identical to Spark's `div` for these non-negative operands.
      // NULL scores sit outside the census (no rank among real
      // scores): pctl_ppm NULL, is_kept FALSE.
      """WITH c AS (
        |  SELECT source, n_chars, count(*) AS n FROM documents
        |  WHERE n_chars IS NOT NULL GROUP BY source, n_chars),
        |g AS (
        |  SELECT source, n_chars,
        |         sum(n) OVER (PARTITION BY source ORDER BY n_chars) AS cum_le,
        |         sum(n) OVER (PARTITION BY source) AS tot
        |  FROM c)
        |SELECT d.doc_id, d.source, d.n_chars,
        |       CAST((g.cum_le * 1000000) // g.tot AS BIGINT) AS pctl_ppm,
        |       coalesce((g.cum_le * 1000000) // g.tot >= 100000, FALSE)
        |         AS is_kept
        |FROM documents d
        |LEFT JOIN g ON d.source IS NOT DISTINCT FROM g.source
        |           AND d.n_chars = g.n_chars
        |ORDER BY d.doc_id""".stripMargin,

    "x26_budget_bpe" ->
      // The BPE-denominated budget cut: merges re-derived from the
      // census chain, the apply chain replayed per distinct word,
      // wordless docs at 0 tokens, then the same naive global-window
      // prefix cut (ROWS frame — the strict (n_chars DESC, doc_id)
      // total order).
      bpeBudgetSql(maxWords = 300, merges = 8, budget = 30000L),

    "x26_budget_cut" ->
      // The staged budget cut replayed as the NAIVE global-window plan
      // the operator exists to avoid: one un-partitioned cumulative sum
      // over the TOTAL order (n_chars DESC, doc_id ASC; explicit ROWS
      // frame — RANGE would sum order-peers together), keep while the
      // INCLUSIVE running total fits. Same whitespace-token definition
      // as the x3 oracle (empty/null text → 0 tokens, kept if inside
      // the prefix).
      raw"""WITH t AS (
        |  SELECT doc_id, source, n_chars,
        |         CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, toks,
        |         sum(toks) OVER (ORDER BY n_chars DESC, doc_id ASC
        |                         ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, CAST(count(*) AS BIGINT) AS kept_docs,
        |       CAST(sum(toks) AS BIGINT) AS kept_tokens,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM c WHERE cum <= 12000
        |GROUP BY source ORDER BY source""".stripMargin,

    "x24_tfidf_terms" ->
      // TF-IDF replayed: per-(doc,term) tf, term df census, ONE
      // micro-nat rounding on ln(N/df) (slack-audited), integer score
      // tf·idf_micro, rank by (score desc, term asc), top 3.
      raw"""WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents WHERE text IS NOT NULL AND len(trim(text)) > 0),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term <> '' GROUP BY 1, 2),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |         tf.tf * CAST(round(ln(n.n * 1.0 / dfc.df) * 1000000.0)
        |                      AS BIGINT) AS score_micro
        |  FROM tf JOIN dfc USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tf, score_micro,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY score_micro DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, score_micro
        |FROM ranked WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    "x21_asof_join" ->
      // DuckDB's NATIVE ASOF LEFT JOIN replays the union+window
      // formulation: greatest right ts <= left ts per user, right side
      // deduped per (user, ts) by max event_id, unmatched rows null.
      """WITH p AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'
        |  QUALIFY row_number() OVER (
        |    PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
        |SELECT e.event_id, e.user_id, e.ts,
        |       p.event_id AS ref_event_id, p.value AS ref_value
        |FROM events e
        |ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,

    "x22_range_join" ->
      // The bin-bucketed equi join replayed as the plain BETWEEN join
      // over the SAME session derivation (sessionizeSql as a subquery)
      // — bucketing must be result-invisible.
      ("""SELECT e.event_id, e.user_id, s.session_idx
        |FROM events e JOIN (
        |""".stripMargin +
        sessionizeSql + "\n" +
        """) s ON e.user_id = s.user_id
          |     AND e.ts >= s.start_ts AND e.ts <= s.end_ts
          |ORDER BY e.event_id, s.session_idx""".stripMargin),

    "x18_sessionize" -> sessionizeSql,

    // The native session_window duel (VERDICT r16 next #7): the
    // floor-second + gap+1 adapter makes the built-in's semantics
    // equal the gaps-and-islands convention by construction, so the
    // SAME oracle binds all three formulations (window, custom-state
    // stream fold, built-in aggregation) — none can drift.
    "x18_session_builtin" -> sessionizeSql,

    // The STREAMING fold (flatMapGroupsWithState, batch-replayed) must
    // produce the identical session set — ONE oracle bound to both, so
    // the two formulations can never drift.
    "s5_stream_sessions" -> sessionizeSql,

    "x5_png_decode" ->
      // The real-codec round trip replayed WITHOUT a codec: payloads are
      // JDK-encoded PNGs of the per-scanline formula r=(id+y)%256,
      // g=(2id+y)%256, b=(3id+y)%256 at w=32+id%64, h=32+id%32; PNG is
      // lossless, so the decoded dims + integer channel sums equal the
      // closed-form replay below exactly.
      """WITH img AS (
        |  SELECT doc_id, CAST(32 + doc_id % 64 AS INTEGER) AS w,
        |         CAST(32 + doc_id % 32 AS INTEGER) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |scan AS (
        |  SELECT doc_id, w, h, unnest(range(0, CAST(h AS BIGINT))) AS y FROM img)
        |SELECT doc_id AS media_id, w AS png_w, h AS png_h,
        |       CAST(sum(w * ((doc_id + y) % 256)) AS BIGINT) AS sum_r,
        |       CAST(sum(w * ((2 * doc_id + y) % 256)) AS BIGINT) AS sum_g,
        |       CAST(sum(w * ((3 * doc_id + y) % 256)) AS BIGINT) AS sum_b
        |FROM scan GROUP BY doc_id, w, h
        |ORDER BY media_id""".stripMargin,

    "x5_gif_decode" ->
      // The real-codec ANIMATED round trip replayed WITHOUT a codec:
      // payloads are JDK-encoded indexed-color GIFs (explicit 64-entry
      // palette (3i,5i,7i)%256 — no quantizer runs, so the format is
      // lossless) with frame f's scanline y painted palette index
      // (id + 17f + y) % 64 at w=16+id%32, h=16+id%16, frames=1+id%4;
      // the per-frame decoded dims + integer channel sums equal this
      // closed form exactly.
      """WITH img AS (
        |  SELECT doc_id, CAST(16 + doc_id % 32 AS INTEGER) AS w,
        |         CAST(16 + doc_id % 16 AS INTEGER) AS h,
        |         CAST(1 + doc_id % 4 AS BIGINT) AS nf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM img),
        |px AS (
        |  SELECT doc_id, w, h, f, (doc_id + 17 * f + y) % 64 AS idx
        |  FROM (SELECT doc_id, w, h, f,
        |               unnest(range(0, CAST(h AS BIGINT))) AS y FROM fr))
        |SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
        |       w AS gif_w, h AS gif_h,
        |       CAST(sum(w * ((idx * 3) % 256)) AS BIGINT) AS sum_r,
        |       CAST(sum(w * ((idx * 5) % 256)) AS BIGINT) AS sum_g,
        |       CAST(sum(w * ((idx * 7) % 256)) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, f, w, h
        |ORDER BY media_id, frame_idx""".stripMargin,

    "x5_wav_decode" ->
      // The real-codec WAV round trip replayed WITHOUT a codec: payloads
      // are JDK-encoded 16-bit PCM mono WAVs of sample formula
      // s(t) = ((id*31 + 7t) % 2003) - 1001 with n = 256 + id % 256
      // samples at rate 8000 + (id % 4)*4000; PCM is lossless, so the
      // decoded rate/count/integer sum equal this closed form exactly.
      """WITH aud AS (
        |  SELECT doc_id, CAST(256 + doc_id % 256 AS BIGINT) AS n,
        |         CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS rate
        |  FROM documents WHERE doc_id % 3 = 1),
        |samp AS (
        |  SELECT doc_id, n, rate, unnest(range(0, n)) AS t FROM aud)
        |SELECT doc_id AS media_id, rate AS sample_rate, n AS n_samples,
        |       CAST(sum((doc_id * 31 + 7 * t) % 2003 - 1001) AS BIGINT) AS sum_samples
        |FROM samp GROUP BY doc_id, rate, n
        |ORDER BY media_id""".stripMargin,

    "x5_dhash_pairs" ->
      // The perceptual-hash near-dup lane replayed as BRUTE FORCE: every
      // pixel of the planted corpus is closed-form (see
      // Multimodal.dhashLuma — the oracle mirrors it verbatim), so the
      // oracle recomputes every image's 64-bit dHash (cell sums compared
      // by cross-multiplication, bit 63 assembled from the Long.MinValue
      // literal since DuckDB refuses 1<<63) and then applies the
      // brute-force all-pairs Hamming predicate. The engine's pigeonhole
      // band join must equal it EXACTLY — the LSH-style recall guarantee,
      // hash-checked rather than trusted.
      ("WITH " + dhashPairCtes + "\n" +
        """SELECT media_id_a, media_id_b, hamming FROM dpair
          |ORDER BY media_id_a, media_id_b""".stripMargin),

    "x5_dhash_dropset" ->
      // Keep-first over the near-dup relation: dropped = the b-side of
      // any qualifying pair (some smaller-id image within Hamming <= 3).
      ("WITH " + dhashPairCtes + "\n" +
        """SELECT DISTINCT media_id_b AS media_id FROM dpair
          |ORDER BY media_id""".stripMargin),

    "x5_adpcm_decode" ->
      // The REAL compressed-audio round trip replayed WITHOUT sharing the
      // decoder: payloads are WAVE/IMA-ADPCM containers carrying the
      // closed-form nibble stream nib(id,t) = xor(id*7 + 13t, t//8) % 16
      // with header predictor (id*97)%2048-1024 and initial index id%89;
      // the oracle re-runs the IMA state machine INDEPENDENTLY as a
      // recursive CTE — step/index tables as VALUES, both clamps, the
      // shift-form diff — so the engine's byte-level parse + decode must
      // reproduce the exact PCM sums.
      ("""WITH RECURSIVE
        |aud AS (
        |  SELECT doc_id, CAST(64 + doc_id % 64 AS BIGINT) AS n,
        |         CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS rate,
        |         CAST((doc_id * 97) % 2048 - 1024 AS BIGINT) AS p0,
        |         CAST(doc_id % 89 AS BIGINT) AS i0
        |  FROM documents WHERE doc_id % 3 = 1),
        |st(i, s) AS (VALUES """.stripMargin + imaStepValues + """),
        |dec AS (
        |  SELECT doc_id, n, CAST(0 AS BIGINT) AS t, p0 AS pred, i0 AS idx,
        |         p0 AS ssum, p0 AS wsum
        |  FROM aud
        |  UNION ALL
        |  SELECT doc_id, n, t, npred, nidx, ssum + npred,
        |         wsum + npred * (t + 1)
        |  FROM (
        |    SELECT q.doc_id, q.n, q.t, q.ssum, q.wsum,
        |           LEAST(GREATEST(CASE WHEN q.nib >= 8 THEN q.pred - q.diff
        |                               ELSE q.pred + q.diff END,
        |                          -32768), 32767) AS npred,
        |           LEAST(GREATEST(q.idx + CASE WHEN q.nib % 8 < 4 THEN -1
        |                                       WHEN q.nib % 8 = 4 THEN 2
        |                                       WHEN q.nib % 8 = 5 THEN 4
        |                                       WHEN q.nib % 8 = 6 THEN 6
        |                                       ELSE 8 END, 0), 88) AS nidx
        |    FROM (
        |      SELECT p.*, p.s // 8
        |             + CASE WHEN p.nib % 2 = 1 THEN p.s // 4 ELSE 0 END
        |             + CASE WHEN (p.nib // 2) % 2 = 1 THEN p.s // 2 ELSE 0 END
        |             + CASE WHEN (p.nib // 4) % 2 = 1 THEN p.s ELSE 0 END AS diff
        |      FROM (
        |        SELECT d.doc_id, d.n, d.t + 1 AS t, d.pred, d.idx,
        |               d.ssum, d.wsum, st.s,
        |               xor(d.doc_id * 7 + 13 * (d.t + 1), (d.t + 1) // 8) % 16 AS nib
        |        FROM dec d JOIN st ON st.i = d.idx
        |        WHERE d.t + 1 < d.n) p) q) z
        |)
        |SELECT d.doc_id AS media_id, a.rate AS sample_rate, d.n AS n_samples,
        |       d.ssum AS sum_samples, d.wsum AS sum_weighted
        |FROM dec d JOIN aud a USING (doc_id)
        |WHERE d.t = d.n - 1
        |ORDER BY media_id""".stripMargin),

    "x5_dhash_groups" ->
      // The X1f resolution replayed on the image pair graph: the SAME
      // recursive reachability as x1_dedup_groups over the closed-form
      // dhash pairs — per family the variant chain (|Δvp| <= 3 between
      // adjacent variants) is connected, so components ARE the planted
      // families and the representative is the family's smallest id.
      ("WITH RECURSIVE " + dhashPairCtes + ",\n" +
        componentCtesFrom("dpair", "media_id_a", "media_id_b") + "\n" +
        """SELECT id AS media_id, min(lbl) AS cluster_id,
          |       min(lbl) = id AS keep
          |FROM creach GROUP BY id ORDER BY media_id""".stripMargin),

    "x5_jpeg_decode" ->
      // The LOSSY round trip's closed-form verdict: dims replay
      // exactly; fidelity ships as n_blocks_within_tol = n_blocks
      // (every decoded MCU-block mean within ±4 counts of the planted
      // constant — block-constant gray input at explicit q0.95 bounds
      // the error to DC quantization + YCbCr rounding; measured max 2,
      // registered tolerance 4). The oracle ASSERTS the full count;
      // one drifted block breaks the hash. ADVICE r15 caveat, by
      // design: the bound depends on the JVM's ImageIO q0.95 quant
      // tables — a JDK whose DC step exceeds ~8 fails this lane
      // legitimately (the lane exists to catch codec drift).
      """SELECT doc_id AS media_id,
        |       CAST(16 + 8 * ((doc_id // 3) % 3) AS INTEGER) AS jpeg_w,
        |       CAST(16 + 8 * ((doc_id // 3) % 2) AS INTEGER) AS jpeg_h,
        |       CAST(((16 + 8 * ((doc_id // 3) % 3)) // 8)
        |            * ((16 + 8 * ((doc_id // 3) % 2)) // 8)
        |         AS INTEGER) AS n_blocks,
        |       CAST(((16 + 8 * ((doc_id // 3) % 3)) // 8)
        |            * ((16 + 8 * ((doc_id // 3) % 2)) // 8)
        |         AS INTEGER) AS n_blocks_within_tol
        |FROM documents WHERE doc_id % 3 = 0
        |ORDER BY media_id""".stripMargin,

    "x5_phash_pairs" ->
      // The DCT perceptual-hash near-dup replayed as BRUTE FORCE over
      // hashes recomputed from the closed-form planted luma — the
      // exact-integer DCT (shared fixed-point basis, floor-div cell
      // means, order-statistic median) is what makes a float-free
      // replay possible; the banded engine must equal the all-pairs
      // Hamming predicate exactly.
      ("WITH " + phashHashCtes + ",\n" +
        """ppair AS (
          |  SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
          |         CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER)
          |           AS hamming
          |  FROM phash a JOIN phash b ON a.doc_id < b.doc_id
          |  WHERE bit_count(xor(a.phash, b.phash)) <= 4)
          |SELECT media_id_a, media_id_b, hamming FROM ppair
          |ORDER BY media_id_a, media_id_b""".stripMargin),

    "x5_ahash_pairs" ->
      // The audio perceptual-hash near-dup replayed as BRUTE FORCE
      // over hashes recomputed from the closed-form planted samples —
      // PCM is lossless and every energy comparison is exact-integer,
      // so the banded engine must equal the all-pairs Hamming
      // predicate exactly (the x5_dhash_pairs posture on audio; the
      // v=5/v=6 exact-re-gain pairs surface at Hamming 0 despite
      // byte-different payloads — the volume-invariance claim under
      // the oracle).
      ("WITH " + ahashHashCtes + ",\n" +
        """apair AS (
          |  SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
          |         CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER)
          |           AS hamming
          |  FROM ahash a JOIN ahash b ON a.doc_id < b.doc_id
          |  WHERE bit_count(xor(a.ahash, b.ahash)) <= 3)
          |SELECT media_id_a, media_id_b, hamming FROM apair
          |ORDER BY media_id_a, media_id_b""".stripMargin),

    "x5_ahash_dropset" ->
      // Keep-first over the audio near-dup relation: dropped = the
      // b-side of any qualifying pair.
      ("WITH " + ahashHashCtes + "\n" +
        """SELECT DISTINCT b.doc_id AS media_id
          |FROM ahash a JOIN ahash b ON a.doc_id < b.doc_id
          |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
          |ORDER BY media_id""".stripMargin),

    "x5_ahash_against" ->
      // The incremental (cross-shard) audio near-dup replayed as the
      // brute-force cross predicate over closed-form hashes: history =
      // variants 0-2 (the persisted signature index), shard = 3-6.
      ("WITH " + ahashHashCtes + "\n" +
        """SELECT s.doc_id AS media_id_new, h.doc_id AS media_id_hist,
          |       CAST(bit_count(xor(s.ahash, h.ahash)) AS INTEGER)
          |         AS hamming
          |FROM ahash s JOIN ahash h
          |  ON bit_count(xor(s.ahash, h.ahash)) <= 3
          |WHERE (s.doc_id % 21) // 3 >= 3 AND (h.doc_id % 21) // 3 < 3
          |ORDER BY media_id_new, media_id_hist""".stripMargin),

    "x5_video_neardup" ->
      // The video frame-majority near-dup replayed end to end in
      // closed form (shared hash chain: videoHashCtes): the
      // brute-force Hamming<=4 frame predicate across clips,
      // distinct-frame containment counts, and the 600,000-ppm
      // integer gate. The family's re-cut member shares exactly 4 of
      // 6 frame contents — matched bit-for-bit (lossless indexed
      // color), 666,667 ppm >= the gate.
      ("WITH " + videoHashCtes + ",\n" +
        """|vmatch AS (
          |  SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
          |         CAST(count(DISTINCT a.k) AS BIGINT) AS matched_a,
          |         CAST(count(DISTINCT b.k) AS BIGINT) AS matched_b
          |  FROM vhash a JOIN vhash b
          |    ON a.doc_id < b.doc_id AND bit_count(xor(a.h, b.h)) <= 4
          |  GROUP BY 1, 2)
          |SELECT m.media_id_a, m.media_id_b, m.matched_a, m.matched_b,
          |       va.frames AS frames_a, vb.frames AS frames_b
          |FROM vmatch m
          |JOIN vcnt va ON va.doc_id = m.media_id_a
          |JOIN vcnt vb ON vb.doc_id = m.media_id_b
          |WHERE least(m.matched_a, m.matched_b) * 1000000
          |      >= 600000 * least(va.frames, vb.frames)
          |ORDER BY media_id_a, media_id_b""".stripMargin),

    "x10_media_funnel" ->
      // The media curation capstone replayed from all three shared
      // closed-form hash chains: per modality the corpus size, the
      // signed (decodable) count, and the unique survivors after the
      // keep-first drop (images/audio: brute-force Hamming <= 3 pair
      // b-sides; video: the alignment gate's b-sides).
      ("WITH " + dhashHashCtes + ",\n" + ahashHashCtes + ",\n"
        + videoHashCtes + ",\n" +
        """|idrop AS (
          |  SELECT DISTINCT b.doc_id FROM hash a JOIN hash b
          |    ON a.doc_id < b.doc_id
          |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 3),
          |adrop AS (
          |  SELECT DISTINCT b.doc_id FROM ahash a JOIN ahash b
          |    ON a.doc_id < b.doc_id
          |  WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
          |valign0 AS (
          |  SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
          |         b.k - a.k AS off,
          |         CAST(count(DISTINCT a.k) AS BIGINT) AS at_offset
          |  FROM vhash a JOIN vhash b
          |    ON a.doc_id < b.doc_id AND bit_count(xor(a.h, b.h)) <= 4
          |  GROUP BY 1, 2, 3),
          |vax AS (SELECT media_id_a, media_id_b,
          |               max(at_offset) AS aligned
          |        FROM valign0 GROUP BY 1, 2),
          |vdrop AS (
          |  SELECT DISTINCT v.media_id_b AS doc_id FROM vax v
          |  JOIN vcnt va ON va.doc_id = v.media_id_a
          |  JOIN vcnt vb ON vb.doc_id = v.media_id_b
          |  WHERE v.aligned * 1000000
          |        >= 600000 * least(va.frames, vb.frames))
          |SELECT * FROM (
          |  SELECT 'audio' AS modality,
          |         (SELECT CAST(count(*) AS BIGINT) FROM aimg) AS n_media,
          |         (SELECT CAST(count(*) AS BIGINT) FROM ahash) AS n_signed,
          |         (SELECT CAST(count(*) AS BIGINT) FROM ahash)
          |           - (SELECT CAST(count(*) AS BIGINT) FROM adrop)
          |           AS n_unique
          |  UNION ALL
          |  SELECT 'image',
          |         (SELECT CAST(count(*) AS BIGINT) FROM img),
          |         (SELECT CAST(count(*) AS BIGINT) FROM hash),
          |         (SELECT CAST(count(*) AS BIGINT) FROM hash)
          |           - (SELECT CAST(count(*) AS BIGINT) FROM idrop)
          |  UNION ALL
          |  SELECT 'video',
          |         (SELECT CAST(count(*) AS BIGINT) FROM vdoc),
          |         (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
          |          FROM vhash),
          |         (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
          |          FROM vhash)
          |           - (SELECT CAST(count(*) AS BIGINT) FROM vdrop))
          |ORDER BY modality""".stripMargin),

    "x5_video_align" ->
      // The temporal-alignment video near-dup replayed in closed form
      // (shared hash chain: videoHashCtes): matched frame pairs group
      // by their offset (frame_b - frame_a), the verdict takes the
      // MAX distinct-frame count over offsets, and the 600,000-ppm
      // gate replays as the same integer cross-multiplication. The
      // planted re-cut aligns its 4 shared frames at the single
      // offset -2.
      ("WITH " + videoHashCtes + ",\n" +
        """|valign AS (
          |  SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
          |         b.k - a.k AS off,
          |         CAST(count(DISTINCT a.k) AS BIGINT) AS at_offset
          |  FROM vhash a JOIN vhash b
          |    ON a.doc_id < b.doc_id AND bit_count(xor(a.h, b.h)) <= 4
          |  GROUP BY 1, 2, 3),
          |vbest AS (
          |  SELECT media_id_a, media_id_b,
          |         CAST(max(at_offset) AS BIGINT) AS aligned
          |  FROM valign GROUP BY 1, 2)
          |SELECT m.media_id_a, m.media_id_b, m.aligned,
          |       va.frames AS frames_a, vb.frames AS frames_b
          |FROM vbest m
          |JOIN vcnt va ON va.doc_id = m.media_id_a
          |JOIN vcnt vb ON vb.doc_id = m.media_id_b
          |WHERE m.aligned * 1000000
          |      >= 600000 * least(va.frames, vb.frames)
          |ORDER BY media_id_a, media_id_b""".stripMargin),

    "x5_video_against" ->
      // The incremental video probe replayed as the brute-force cross
      // predicate over closed-form hashes: history = member-0 frames,
      // probes = member-1; the frame-majority containment verdict
      // keyed (new, hist).
      ("WITH " + videoHashCtes + ",\n" +
        """|vx AS (
          |  SELECT n.doc_id AS media_id_new, h.doc_id AS media_id_hist,
          |         CAST(count(DISTINCT n.k) AS BIGINT) AS matched_new,
          |         CAST(count(DISTINCT h.k) AS BIGINT) AS matched_hist
          |  FROM vhash n JOIN vhash h
          |    ON bit_count(xor(n.h, h.h)) <= 4
          |  WHERE n.doc_id % 6 = 3 AND h.doc_id % 6 = 0
          |  GROUP BY 1, 2)
          |SELECT v.media_id_new, v.media_id_hist,
          |       v.matched_new, v.matched_hist,
          |       cn.frames AS frames_new, ch.frames AS frames_hist
          |FROM vx v
          |JOIN vcnt cn ON cn.doc_id = v.media_id_new
          |JOIN vcnt ch ON ch.doc_id = v.media_id_hist
          |WHERE least(v.matched_new, v.matched_hist) * 1000000
          |      >= 600000 * least(cn.frames, ch.frames)
          |ORDER BY media_id_new, media_id_hist""".stripMargin),

        "x5_ahash_chunks" ->
      // The window-chunked long-clip audio near-dup replayed end to
      // end in closed form (shared hash chain: ahashChunkCtes): clips
      // pair on EXACT segment-hash equality and the 500,000-ppm
      // containment gate replays as the same integer
      // cross-multiplication. The 2x re-gain member matches its
      // original's 3 shared segments bit-for-bit — volume invariance
      // per segment, under the oracle.
      ("WITH " + ahashChunkCtes + ",\n" +
        """ccnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS segs
          |         FROM ckeep GROUP BY 1),
          |cmatch AS (
          |  SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b,
          |         CAST(count(DISTINCT a.seg) AS BIGINT) AS matched_a,
          |         CAST(count(DISTINCT b.seg) AS BIGINT) AS matched_b
          |  FROM ckeep a JOIN ckeep b
          |    ON a.h = b.h AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT m.media_id_a, m.media_id_b, m.matched_a, m.matched_b,
          |       ca.segs AS segs_a, cb2.segs AS segs_b
          |FROM cmatch m
          |JOIN ccnt ca ON ca.doc_id = m.media_id_a
          |JOIN ccnt cb2 ON cb2.doc_id = m.media_id_b
          |WHERE least(m.matched_a, m.matched_b) * 1000000
          |      >= 500000 * least(ca.segs, cb2.segs)
          |ORDER BY media_id_a, media_id_b""".stripMargin),

    "s24_stream_chunks" ->
      // The streaming segment-containment drop's batch replay in
      // closed form: history = member-0 segment hashes of EVEN
      // families (the saved index), arrivals = every member-1 clip;
      // a clip drops iff matched*1e6 >= 500000*nsegs over its
      // fingerprintable segments (even families sit exactly on the
      // 3/6 boundary — dropped; odd families match nothing —
      // survive). Zero-segment clips survive by the no-evidence rule.
      ("WITH " + ahashChunkCtes + ",\n" +
        """hist AS (SELECT h FROM ckeep
          |         WHERE doc_id % 6 = 2 AND (doc_id // 6) % 2 = 0),
          |aseg AS (SELECT doc_id, seg, h FROM ckeep WHERE doc_id % 6 = 5),
          |acnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsegs
          |         FROM aseg GROUP BY 1),
          |amatch AS (
          |  SELECT doc_id, CAST(count(DISTINCT seg) AS BIGINT) AS matched
          |  FROM aseg WHERE h IN (SELECT h FROM hist) GROUP BY 1)
          |SELECT d.doc_id AS media_id,
          |       CAST(coalesce(c.nsegs, 0) AS BIGINT) AS n_segments
          |FROM (SELECT doc_id FROM cdoc WHERE m = 1) d
          |LEFT JOIN acnt c ON c.doc_id = d.doc_id
          |LEFT JOIN amatch mm ON mm.doc_id = d.doc_id
          |WHERE NOT (c.nsegs IS NOT NULL
          |           AND coalesce(mm.matched, 0) * 1000000
          |               >= 500000 * c.nsegs)
          |ORDER BY media_id""".stripMargin),

    "s23_stream_ahash" ->
      // The streaming audio drop's batch replay in closed form (the
      // s19/s21 posture on the aHash family): survivors = shard clips
      // (variants 3-6) with NO history clip (variants 0-2) within
      // Hamming <= 3 — 31 drop / 64 survive at sf0.01, both outcomes
      // exercised. Deterministic end-to-end: the closed-form sample
      // CTE recomputes every signature.
      ("WITH " + ahashHashCtes + "\n" +
        """SELECT s.doc_id AS media_id, s.ahash
          |FROM ahash s
          |WHERE (s.doc_id % 21) // 3 >= 3
          |  AND NOT EXISTS (
          |    SELECT 1 FROM ahash h
          |    WHERE (h.doc_id % 21) // 3 < 3
          |      AND bit_count(xor(s.ahash, h.ahash)) <= 3)
          |ORDER BY media_id""".stripMargin),

    "x5_xcodec_dedup" ->
      // The cross-codec drop set replayed WITHOUT a codec, by certainty
      // bands (measured at sf0.01: re-encode drift <= 4 bits,
      // within-family <= 4, cross-family >= 14; threshold 6 sits in
      // the [4, 13] certainty interval): every JPEG re-encode drops
      // against its own smaller-id original, and — because every
      // re-encode id is offset ABOVE every original — a PNG's verdict
      // depends only on PNG-PNG pairs, which the exact-integer pHash
      // CTE replays in closed form. Extra pairs among re-encodes can't
      // perturb the set (their b-side is a re-encode, already in it).
      ("WITH " + phashHashCtes + ",\n" +
        """xpair AS (
          |  SELECT b.doc_id AS media_id
          |  FROM phash a JOIN phash b ON a.doc_id < b.doc_id
          |  WHERE bit_count(xor(a.phash, b.phash)) <= 6)
          |SELECT media_id FROM (
          |  SELECT DISTINCT media_id FROM xpair
          |  UNION ALL
          |  SELECT doc_id + 1000000000 AS media_id FROM pimg)
          |ORDER BY media_id""".stripMargin),

    "x5_xcodec_groups" ->
      // Cross-codec resolution replayed from the PNG side alone, by
      // the x5_xcodec_dedup certainty bands plus the clique claim
      // (within-family pairs of EITHER codec measure <= 4 bits,
      // asserted <= 6 in XcodecDedupSpec): the union graph's
      // components are the closed-form PNG pHash components with each
      // re-encode (id + 1e9) attached to its own original's cluster —
      // a re-encode can neither merge components (cross-family >= 14)
      // nor out-rank a PNG label (ids offset above every original).
      // Isolated PNGs (single-member families with no PNG pair)
      // label themselves, the x5_dhash_pipeline COALESCE shape.
      ("WITH RECURSIVE " + phashHashCtes + ",\n" +
        """xgp AS (
          |  SELECT a.doc_id AS media_id_a, b.doc_id AS media_id_b
          |  FROM phash a JOIN phash b ON a.doc_id < b.doc_id
          |  WHERE bit_count(xor(a.phash, b.phash)) <= 6),
          |""".stripMargin +
        componentCtesFrom("xgp", "media_id_a", "media_id_b") + ",\n" +
        """pngc AS (
          |  SELECT i.doc_id AS media_id,
          |         COALESCE(c.cluster_id, i.doc_id) AS cluster_id
          |  FROM pimg i
          |  LEFT JOIN (SELECT id, min(lbl) AS cluster_id
          |             FROM creach GROUP BY id) c ON c.id = i.doc_id)
          |SELECT media_id, cluster_id, cluster_id = media_id AS keep
          |FROM (
          |  SELECT media_id, cluster_id FROM pngc
          |  UNION ALL
          |  SELECT media_id + 1000000000, cluster_id FROM pngc)
          |ORDER BY media_id""".stripMargin),

    "x5_dhash_pipeline" ->
      // The composed production shape replayed per image from the
      // closed-form hash CTE: signature, connected component over the
      // full pair graph (isolated images label themselves), CC keep,
      // and the keep-first drop flag (EXISTS a smaller-id image within
      // Hamming <= 3 — the b-side of any qualifying pair).
      ("WITH RECURSIVE " + dhashPairCtes + ",\n" +
        componentCtesFrom("dpair", "media_id_a", "media_id_b") + "\n" +
        """SELECT h.doc_id AS media_id, h.dhash,
          |       COALESCE(c.cluster_id, h.doc_id) AS cluster_id,
          |       COALESCE(c.cluster_id, h.doc_id) = h.doc_id AS keep,
          |       EXISTS (SELECT 1 FROM dpair p
          |               WHERE p.media_id_b = h.doc_id) AS drop_firstseen
          |FROM hash h
          |LEFT JOIN (SELECT id, min(lbl) AS cluster_id
          |           FROM creach GROUP BY id) c ON c.id = h.doc_id
          |ORDER BY media_id""".stripMargin),

    "x5_dhash_against" ->
      // The incremental (cross-shard) image near-dup replayed as the
      // brute-force cross predicate: history = variants 0-2 of every
      // family (the persisted signature index), shard = variants 3-6;
      // a qualifying pair needs |vp_new - vp_hist| <= 3, which the
      // hash replay proves rather than assumes.
      ("WITH " + dhashHashCtes + "\n" +
        """SELECT s.doc_id AS media_id_new, h.doc_id AS media_id_hist,
          |       CAST(bit_count(xor(s.dhash, h.dhash)) AS INTEGER) AS hamming
          |FROM hash s JOIN hash h
          |  ON bit_count(xor(s.dhash, h.dhash)) <= 3
          |WHERE (s.doc_id % 21) // 3 >= 3 AND (h.doc_id % 21) // 3 < 3
          |ORDER BY media_id_new, media_id_hist""".stripMargin),

    "s19_stream_dhash" ->
      // The streaming image drop's batch replay in closed form:
      // survivors = shard images (variants 3-6) with NO history image
      // (variants 0-2) within Hamming <= 2 — at that threshold the
      // vp=5 members (distance 3 from the nearest history variant)
      // survive while vp=3/4 drop, so both outcomes are exercised.
      // The FULL oracle here is what the s3/s4 text lanes cannot have
      // (randomized hash families): dHash is deterministic end-to-end.
      ("WITH " + dhashHashCtes + "\n" +
        """SELECT s.doc_id AS media_id, s.dhash
          |FROM hash s
          |WHERE (s.doc_id % 21) // 3 >= 3
          |  AND NOT EXISTS (
          |    SELECT 1 FROM hash h
          |    WHERE (h.doc_id % 21) // 3 < 3
          |      AND bit_count(xor(s.dhash, h.dhash)) <= 2)
          |ORDER BY media_id""".stripMargin),

    "s21_stream_phash" ->
      // The streaming pHash drop's batch replay in closed form (the
      // s19 posture on the DCT family): survivors = shard images
      // (variants 3-7) with NO history image (variants 0-2) within
      // Hamming <= 2 — at that threshold most shard members drop
      // while the distance-4 members survive, so both outcomes are
      // exercised. Deterministic end-to-end: the exact-integer pHash
      // CTE recomputes every signature from the planted luma.
      ("WITH " + phashHashCtes + "\n" +
        """SELECT s.doc_id AS media_id, s.phash
          |FROM phash s
          |WHERE (s.doc_id % 24) // 3 >= 3
          |  AND NOT EXISTS (
          |    SELECT 1 FROM phash h
          |    WHERE (h.doc_id % 24) // 3 < 3
          |      AND bit_count(xor(s.phash, h.phash)) <= 2)
          |ORDER BY media_id""".stripMargin),

    "x5_media_features" ->
      // The byte-window pseudo-decode replayed from the document text
      // (payload = its UTF-8 bytes; testdata is pure ASCII so character
      // positions == byte positions): byte i of an n-byte payload lands
      // in window ((i+1)*64 - 1) / n, feature = mean of the window's
      // bytes computed in DOUBLE then narrowed to FLOAT, exactly the
      // Spark decode's arithmetic. Empty windows (n < 64) are absent
      // from `win` → sampled features coalesce to 0 and n_nonzero counts
      // the occupied windows (every mean is >= 32, never 0).
      // doc LEFT JOINs the per-window aggregate so an empty/NULL-text
      // document still yields its all-zero row, matching decodeStub's
      // zero array (the s2-oracle null-hardening class).
      """WITH doc AS (
        |  SELECT doc_id AS media_id, coalesce(text, '') AS t,
        |         CAST(length(coalesce(text, '')) AS BIGINT) AS n
        |  FROM documents),
        |byte AS (
        |  SELECT media_id, t, n, unnest(range(0, n)) AS i FROM doc),
        |win AS (
        |  SELECT media_id, ((i + 1) * 64 - 1) // n AS d, count(*) AS w,
        |         sum(ascii(substr(t, CAST(i AS INT) + 1, 1))) AS s
        |  FROM byte GROUP BY 1, 2),
        |feat AS (
        |  SELECT media_id, d,
        |         round(CAST(CAST(CAST(s AS DOUBLE) / w AS FLOAT) AS DOUBLE), 4) AS f
        |  FROM win),
        |agg AS (
        |  SELECT media_id,
        |         max(CASE WHEN d = 0 THEN f END) AS f0,
        |         max(CASE WHEN d = 16 THEN f END) AS f16,
        |         max(CASE WHEN d = 31 THEN f END) AS f31,
        |         max(CASE WHEN d = 47 THEN f END) AS f47,
        |         max(CASE WHEN d = 63 THEN f END) AS f63,
        |         count(*) AS n_nonzero
        |  FROM feat GROUP BY media_id)
        |SELECT doc.media_id, CAST(64 AS INT) AS dim,
        |       coalesce(f0, 0.0) AS f0, coalesce(f16, 0.0) AS f16,
        |       coalesce(f31, 0.0) AS f31, coalesce(f47, 0.0) AS f47,
        |       coalesce(f63, 0.0) AS f63,
        |       CAST(coalesce(n_nonzero, 0) AS BIGINT) AS n_nonzero
        |FROM doc LEFT JOIN agg ON doc.media_id = agg.media_id
        |ORDER BY doc.media_id""".stripMargin,

    "x5_media_integrity" ->
      """SELECT kind, count(*) AS n,
        |       count(CASE WHEN text IS NULL THEN 1 END) AS null_payload,
        |       count(CASE WHEN octet_length(encode(text)) < 8 THEN 1 END) AS truncated,
        |       CAST(floor(avg(octet_length(encode(text)))) AS BIGINT) AS avg_bytes
        |FROM (SELECT text,
        |             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        |      FROM documents)
        |GROUP BY 1 ORDER BY kind""".stripMargin,

    "p5_etl_diamond" ->
      """SELECT r_name AS region_name, trim(p_brand) AS brand,
        |       count(*) AS line_count,
        |       CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |JOIN part     ON l_partkey = p_partkey
        |WHERE p_retailprice > 0
        |GROUP BY 1, 2
        |ORDER BY region_name, brand""".stripMargin
  )
}
