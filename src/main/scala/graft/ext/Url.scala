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
  *   3. strip userinfo (`user:pw@` — not part of the host, RFC 3986
  *      §3.2.1; left in place it would both split the dedup key and
  *      let `anything@bad.org` walk past the blocklist);
  *   4. strip a leading `www.` label (the standard alias);
  *   5. strip the scheme's DEFAULT port only (`:80` for http, `:443`
  *      for https — a non-default port is a different origin);
  *   6. strip trailing slashes from the path (`…/a/` and `…/a` serve
  *      the same resource in practice);
  *   7. keep the query string verbatim (dropping or sorting parameters
  *      changes real content on many sites — a pipeline wanting
  *      `utm_*`-stripping should pre-clean the column).
  * [[domain]] — the BLOCKLIST key — additionally strips ANY port:
  * `bad.org:8080` is still bad.org for policy purposes, even though it
  * is a different origin for dedup purposes.
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

  /** (scheme, port-bearing host, path, query) of a trimmed,
    * fragment-stripped URL — host is lowercased, userinfo-stripped,
    * `www.`-stripped, but NOT port-stripped (the two consumers strip
    * ports by different rules). Shared by [[canonicalize]] and
    * [[domain]] — ONE definition, so the blocklist can never disagree
    * with the dedup key about what the host is. */
  private def parts(t: Column): (Column, Column, Column, Column) = {
    val scheme = lower(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(t, SchemeRe, "")
    val hostport = lower(regexp_extract(rest, "^([^/?]+)", 1))
    val noUser = regexp_replace(hostport, "^[^@/?]*@", "")
    val noWww = regexp_replace(noUser, "^www\\.", "")
    val pathq = regexp_replace(rest, "^[^/?]+", "")
    val path = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val query = regexp_replace(pathq, "^[^?]*", "")
    (scheme, noWww, path, query)
  }

  // (?s): '.' must include newlines, or a newline-bearing fragment is
  // only partially stripped AND the pattern stops being single-match
  // (the replace-all vs first-match-only portability invariant above).
  private val FragmentRe = "(?s)#.*"

  /** The canonical URL (see object doc for the rules); the url-dedup
    * key. */
  def canonicalize(url: Column): Column = {
    val t = regexp_replace(trim(url), FragmentRe, "")
    val (scheme, hostPort, path, query) = parts(t)
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    when(scheme === "", t)
      .otherwise(concat(scheme, lit("://"), host, path, query))
  }

  /** The canonical registrable host (lowercased, userinfo-stripped,
    * `www.`-stripped, ANY-port-stripped) — the blocklist key. A
    * non-default port must not bypass policy: `bad.org:8080` is still
    * bad.org here, though it stays a distinct origin in
    * [[canonicalize]]. Null for values without a `scheme://` (nothing
    * to safely call a host). */
  def domain(url: Column): Column = {
    val t = regexp_replace(trim(url), FragmentRe, "")
    val (scheme, hostPort, _, _) = parts(t)
    when(scheme === "", lit(null).cast("string"))
      .otherwise(regexp_replace(hostPort, ":[0-9]+$", ""))
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
