package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ext.{Curation, Url}

/** The URL curation stage: canonicalization rules one by one, the
  * blocklist suffix rule, and the integrated annotate/funnel flags
  * (null semantics included — null URLs neither block nor dedup). */
class UrlSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    val d = df(urls.map(Row(_)), "u STRING")
    d.select(Url.canonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalize: each rule in isolation and combined") {
    assert(canon("https://Example.COM/a") == Seq("https://example.com/a"))
    assert(canon("HTTPS://example.com/a") == Seq("https://example.com/a"))
    assert(canon("https://www.example.com/a") == Seq("https://example.com/a"))
    assert(canon("https://example.com:443/a") == Seq("https://example.com/a"))
    assert(canon("http://example.com:80/a") == Seq("http://example.com/a"))
    // Non-default port is a different origin — kept.
    assert(canon("https://example.com:8443/a") == Seq("https://example.com:8443/a"))
    // http's default is NOT https's default.
    assert(canon("https://example.com:80/a") == Seq("https://example.com:80/a"))
    assert(canon("https://example.com/a/") == Seq("https://example.com/a"))
    assert(canon("https://example.com/a///") == Seq("https://example.com/a"))
    assert(canon("https://example.com/") == Seq("https://example.com"))
    assert(canon("https://example.com/a#frag") == Seq("https://example.com/a"))
    // Query survives; trailing slash strips from the PATH only; path
    // case is preserved (only scheme+host are case-insensitive).
    assert(canon("https://example.com/A/?q=1&r=2") ==
      Seq("https://example.com/A?q=1&r=2"))
    assert(canon("  https://example.com/a  ") == Seq("https://example.com/a"))
    assert(canon("HTTP://WWW.Example.Com:80/Dir/?x=Y#z") ==
      Seq("http://example.com/Dir?x=Y"))
    // Schemeless: trimmed + fragment-stripped, otherwise untouched.
    assert(canon("example.com/A#f") == Seq("example.com/A"))
    // Userinfo is not part of the host (and must not split the dedup key).
    assert(canon("https://user:pw@example.com/a") == Seq("https://example.com/a"))
    assert(canon("https://crawler@WWW.Example.com/a") == Seq("https://example.com/a"))
    // A newline-bearing fragment strips WHOLLY (dotall '.'), keeping the
    // pattern single-match for oracle portability.
    assert(canon("https://example.com/a#f\ng") == Seq("https://example.com/a"))
  }

  test("canonicalize and domain are null-safe") {
    val d = df(Seq(Row(null)), "u STRING")
    val r = d.select(Url.canonicalize(col("u")), Url.domain(col("u"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("domain: canonical host; null for schemeless") {
    val d = df(Seq(Row("HTTPS://WWW.Ads.Example.COM:443/x?q#f"), Row("no-scheme/x")),
      "u STRING")
    val got = d.select(Url.domain(col("u")).as("d")).collect().map(r =>
      Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("ads.example.com"), None))
  }

  test("isBlocked: exact + subdomain suffix, not substring; null/schemeless pass") {
    val rows = Seq(
      "https://bad.org/x" -> true,        // exact
      "https://www.bad.org/x" -> true,    // www-stripped exact
      "https://cdn.bad.org/x" -> true,    // subdomain
      "https://a.b.bad.org/x" -> true,    // deep subdomain
      "https://notbad.org/x" -> false,    // suffix rule, NOT substring
      "https://bad.org.evil.com/x" -> false, // domain is evil.com
      "https://bad.org:8080/x" -> true,   // a non-default port is no bypass
      "https://anything@bad.org/x" -> true, // nor is userinfo
      "https://u:p@cdn.bad.org:9443/x" -> true, // nor both at once
      "no-scheme-bad.org" -> false)       // schemeless: no host to match
    val d = df(rows.map(r => Row(r._1)), "u STRING")
    val got = d.select(col("u"), Url.isBlocked(col("u"), Seq("bad.org")).as("b"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    rows.foreach { case (u, want) => assert(got(u) == want, u) }
    // Null URL: not blocked (blocklist, not allowlist).
    assert(!df(Seq(Row(null)), "u STRING")
      .select(Url.isBlocked(col("u"), Seq("bad.org"))).head().getBoolean(0))
    // Uppercase blocklist entries are a config error, loudly.
    intercept[IllegalArgumentException](Url.isBlocked(col("u"), Seq("Bad.org")))
  }

  private val docsSchema = "doc_id BIGINT, text STRING, lang STRING, url STRING"
  private def annotate(rows: Seq[Row], blocked: Seq[String] = Seq("bad.org")) =
    Curation.annotate(
      df(rows, docsSchema),
      df(Seq.empty[Row], "bench_id BIGINT, text STRING"),
      Curation.Config(urlCol = Some("url"), blockedDomains = blocked))

  test("annotate: url-canonical dedup keeps min key per canonical URL; nulls never dedup") {
    val rows = Seq(
      Row(1L, "a", "en", "https://ok.org/p"),
      Row(2L, "b", "en", "https://www.ok.org/p/"),  // same canonical as 1
      Row(3L, "c", "en", "HTTPS://ok.org:443/p#f"), // same canonical as 1
      Row(4L, "d", "en", "https://ok.org/q"),
      Row(5L, "e", "en", null),
      Row(6L, "f", "en", null))                     // null ≠ null: both canonical
    val got = annotate(rows)
      .select(col("doc_id"), col("is_url_canonical"), col("is_url_ok"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L), "null-URL rows must survive the join")
    assert(got(1L)._1 && !got(2L)._1 && !got(3L)._1 && got(4L)._1)
    assert(got(5L)._1 && got(6L)._1, "null URLs are each their own canonical")
    assert(rows.map(_.getLong(0)).forall(got(_)._2), "nothing here is blocklisted")
  }

  test("annotate: blocklist flags the domain and its subdomains") {
    val rows = Seq(
      Row(1L, "a", "en", "https://bad.org/x"),
      Row(2L, "b", "en", "https://cdn.bad.org/x"),
      Row(3L, "c", "en", "https://ok.org/x"),
      Row(4L, "d", "en", null))
    val got = annotate(rows).select(col("doc_id"), col("is_url_ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> true, 4L -> true))
  }

  test("funnel: url stage gates first and its counts land between raw and dedup") {
    // doc 1+2 same canonical URL (url dedup drops 2); doc 3 blocked;
    // docs 3 and 4 identical TEXT — but 3 is already url-dead, and
    // text-dedup's keeper aggregate still runs over the WHOLE corpus
    // (min id 3 wins the text group), so 4 drops at the text stage:
    // the stage accounting is sequential, flags are corpus-global.
    val rows = Seq(
      Row(1L, "alpha beta", "en", "https://ok.org/p"),
      Row(2L, "gamma delta", "en", "https://www.ok.org/p"),
      Row(3L, "same text", "en", "https://bad.org/x"),
      Row(4L, "same text", "en", "https://ok.org/q"))
    val f = Curation.funnel(
      df(rows, docsSchema),
      df(Seq.empty[Row], "bench_id BIGINT, text STRING"),
      Curation.Config(urlCol = Some("url"), blockedDomains = Seq("bad.org"))).head()
    assert(f.getAs[Long]("n_raw") == 4L)
    assert(f.getAs[Long]("n_after_url") == 2L)    // 2 url-deduped, 3 blocked
    assert(f.getAs[Long]("n_after_dedup") == 1L)  // 4 loses its text group to 3
    assert(f.getAs[Long]("n_after_sample") == 1L)
    assert(f.getAs[Long]("tokens_after_url") == 4L)
  }

  test("config: blockedDomains without urlCol is rejected") {
    intercept[IllegalArgumentException](
      Curation.Config(blockedDomains = Seq("bad.org")))
  }

  test("registered x14_domain_cap: <= 3 per domain, contiguous ranks, " +
    "canonical domain keys") {
    val out = Queries.x14DomainCap(spark, sfDir).collect()
    assert(out.nonEmpty)
    val doms = out.map(_.getString(0)).distinct
    // The planted corpus yields plain + cdn. variants per source; the
    // domain key is canonical: no scheme, no www., no port.
    assert(doms.forall(d => d.endsWith(".example.org") &&
      !d.startsWith("www.") && !d.contains(":") && !d.contains("/")))
    assert(doms.exists(_.startsWith("cdn.")))
    doms.foreach { dm =>
      val ranks = out.filter(_.getString(0) == dm).map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length) && ranks.length <= 3,
        s"domain $dm ranks ${ranks.toSeq}")
    }
  }

  test("funnel without urlCol: url stage is a no-op (after_url == raw)") {
    val rows = Seq(Row(1L, "a b", "en", null), Row(2L, "c d", "en", null))
    val f = Curation.funnel(
      df(rows, docsSchema),
      df(Seq.empty[Row], "bench_id BIGINT, text STRING"),
      Curation.Config()).head()
    assert(f.getAs[Long]("n_after_url") == f.getAs[Long]("n_raw"))
    assert(f.getAs[Long]("tokens_after_url") == f.getAs[Long]("tokens_raw"))
  }
}
