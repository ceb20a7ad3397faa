package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and domain blocklisting — the stage a crawl
  * pipeline runs BEFORE any text operator (VERDICT r6 #2): most crawl
  * dedup is URL-keyed (the same page fetched twice differs in ads and
  * timestamps, so text-keyed exact dedup misses it), and domain
  * blocklists are the cheapest quality gate there is.
  *
  * Canonical form (the common-crawl conventions, restated):
  *   1. trim; strip the fragment (`#…` — client-side only, never
  *      distinguishes server content);
  *   2. lowercase the scheme and host (RFC 3986 §6.2.2.1 — both are
  *      case-insensitive; paths are NOT and keep their case);
  *   3. strip a leading `www.` label (the standard alias);
  *   4. strip the scheme's DEFAULT port only (`:80` for http, `:443`
  *      for https — a non-default port is a different origin);
  *   5. strip trailing slashes from the path (`…/a/` and `…/a` serve
  *      the same resource in practice);
  *   6. keep the query string verbatim (dropping or sorting parameters
  *      changes real content on many sites — a pipeline wanting
  *      `utm_*`-stripping should pre-clean the column).
  * A value with no `scheme://` is returned trimmed and
  * fragment-stripped but otherwise untouched (no host to normalize);
  * null stays null.
  *
  * Everything here is a plain Column expression chain — codegen'd,
  * map-only, pushdown-friendly; at 100 TB the URL stage adds zero
  * shuffles beyond the one url-canonical dedup aggregate (which
  * [[Curation.annotate]] owns).
  *
  * Every regex below matches AT MOST ONCE per value (anchored, or
  * consuming to end-of-string), so Spark's replace-all and an
  * engine that replaces first-match-only (DuckDB) agree — the same
  * RE2-portability discipline as [[Pii]].
  */
object Url {

  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*://"

  /** (scheme, host, path, query) of a trimmed, fragment-stripped URL.
    * Shared by [[canonicalize]] and [[domain]] — ONE definition, so the
    * blocklist can never disagree with the dedup key about what the
    * host is. */
  private def parts(t: Column): (Column, Column, Column, Column) = {
    val scheme = lower(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(t, SchemeRe, "")
    val hostport = lower(regexp_extract(rest, "^([^/?]+)", 1))
    val noWww = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val pathq = regexp_replace(rest, "^[^/?]+", "")
    val path = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val query = regexp_replace(pathq, "^[^?]*", "")
    (scheme, host, path, query)
  }

  /** The canonical URL (see object doc for the rules); the url-dedup
    * key. */
  def canonicalize(url: Column): Column = {
    val t = regexp_replace(trim(url), "#.*", "")
    val (scheme, host, path, query) = parts(t)
    when(scheme === "", t)
      .otherwise(concat(scheme, lit("://"), host, path, query))
  }

  /** The canonical registrable host (lowercased, `www.`-stripped,
    * default-port-stripped) — the blocklist key. Null for values
    * without a `scheme://` (nothing to safely call a host). */
  def domain(url: Column): Column = {
    val t = regexp_replace(trim(url), "#.*", "")
    val (scheme, host, _, _) = parts(t)
    when(scheme === "", lit(null).cast("string")).otherwise(host)
  }

  /** True when the URL's canonical domain is a blocked domain or any
    * subdomain of one (`ads.example.com` matches a block on
    * `example.com` — the standard suffix rule). Null/schemeless URLs
    * are NOT blocked: the blocklist only rejects KNOWN-bad domains,
    * it is not an allowlist. Blocked domains should be pre-lowercased
    * (require()d, not silently fixed). */
  def isBlocked(url: Column, blockedDomains: Seq[String]): Column = {
    require(blockedDomains.forall(d => d == d.toLowerCase(java.util.Locale.ROOT)),
      "blocked domains must be lowercase (the canonical-host form)")
    if (blockedDomains.isEmpty) lit(false)
    else {
      val d = domain(url)
      val hit = blockedDomains
        .map(b => d === b || d.endsWith("." + b))
        .reduce(_ || _)
      coalesce(hit, lit(false))
    }
  }
}
