package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL primitives for web-corpus processing — the on-ramp that PRODUCES
  * the domain column the per-domain operators consume
  * ([[BudgetSelect.capPerGroup]]/[[BudgetSelect.mixByWeights]] caps,
  * [[graft.operators.Interleave]] ordering, per-domain quality stats):
  * canonicalization (the C4/CC-Net step before URL-level dedup — the same
  * page must hash identically however it was linked) and host /
  * registrable-domain extraction.
  *
  * Everything is scan-stage string arithmetic (codegen'd regex/array
  * functions, no UDF, no shuffle), deterministic, and chosen for
  * cross-engine parity: every rule is one regex/array op with identical
  * semantics in Spark and DuckDB, so URL-keyed gates hash (the patterns
  * avoid constructs where Java regex and RE2 diverge).
  *
  * Canonicalization rules (documented contract — canonicalizers differ,
  * this one is fixed): drop the fragment; drop userinfo (credentials are
  * transport state, not page identity — the same page linked with and
  * without them must get ONE dedup key); lowercase scheme and host; drop
  * default ports (http:80, https:443); drop a leading `www.`; sort query
  * parameters (byte order — `?b=2&a=1` ≡ `?a=1&b=2`); strip ONE trailing
  * slash from a non-root path. Dot-segments, percent-encoding case, and
  * duplicate-slash collapsing are deliberately NOT normalized (they
  * change path identity on some servers).
  */
object Urls {

  private def afterScheme(u: Column): Column =
    regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")

  /** Lowercased host without port / credentials; empty string when the
    * input has no `scheme://` authority (a non-URL row yields "" — not a
    * garbage token — so it can't pollute a domain column downstream).
    */
  def host(u: Column): Column = {
    val hasScheme = regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1) =!= ""
    val auth = regexp_extract(afterScheme(u), "^([^/?#]*)", 1)
    val noCred = regexp_replace(auth, "^[^@]*@", "")
    when(hasScheme, lower(regexp_replace(noCred, ":[0-9]*$", ""))).otherwise(lit(""))
  }

  /** Heuristic eTLD+1 (public-suffix-lite): the last two host labels, or
    * the last THREE when the second-to-last is a common second-level
    * registry label (co/com/net/org/ac/gov/edu) under a 2-letter ccTLD —
    * `news.bbc.co.uk` → `bbc.co.uk`, `a.b.example.com` → `example.com`.
    * The full public-suffix list is a data file, not an algorithm; this
    * heuristic covers the bulk of web corpora and is engine-replayable.
    */
  def registrableDomain(h: Column): Column = {
    val labels = split(h, "\\.")
    val n = size(labels)
    val last = element_at(labels, -1)
    val second = element_at(labels, -2)
    val takeThree = n >= lit(3) && length(last) === lit(2) &&
      second.isin("co", "com", "net", "org", "ac", "gov", "edu")
    when(n <= lit(2), h).otherwise(
      when(takeThree,
        concat_ws(".", element_at(labels, -3), second, last))
        .otherwise(concat_ws(".", second, last)))
  }

  /** Canonical URL under the documented rules; non-URL input degrades
    * gracefully (rules that don't match pass the string through).
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = afterScheme(noFrag)
    val auth0 = regexp_extract(rest, "^([^/?]*)", 1)
    val auth = regexp_replace(auth0, "^[^@]*@", "") // userinfo dropped
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val h0 = lower(regexp_replace(auth, ":[0-9]*$", ""))
    val h = regexp_replace(h0, "^www\\.", "")
    val keepPort = port =!= "" &&
      !(scheme === "https" && port === "443") &&
      !(scheme === "http" && port === "80")
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val path = regexp_extract(pathq, "^([^?]*)", 1)
    val query = regexp_replace(pathq, "^[^?]*", "") // "?a=1&b=2" or ""
    val qBody = regexp_replace(query, "^\\?", "")
    val sortedQ = when(qBody === "", lit(""))
      .otherwise(concat(lit("?"), concat_ws("&", sort_array(split(qBody, "&")))))
    val trimmedPath = when(length(path) > 1, regexp_replace(path, "/$", ""))
      .otherwise(path)
    when(scheme === "", u) // no scheme: pass through untouched
      .otherwise(concat(scheme, lit("://"), h, portPart, trimmedPath, sortedQ))
  }

  /** Tracking parameters stripped by [[stripTrackingParams]]: the
    * campaign/click identifiers that vary per LINK, not per PAGE — left
    * in, every ad click mints a "new" URL and URL-level dedup collapses
    * nothing. Prefixes match `utm_*` wholesale; exact names cover the
    * big click-id vendors.
    */
  val TrackingPrefixes: Seq[String] = Seq("utm_")
  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "igshid", "ref_src")

  /** Drop tracking query parameters from an already-[[canonicalizeUrl]]'d
    * URL (param order is already sorted, so removal keeps the canonical
    * form canonical; a query left empty drops its `?`). Scan-stage array
    * filtering — compose `stripTrackingParams(canonicalizeUrl(u))` for
    * the full dedup key.
    */
  def stripTrackingParams(u: Column): Column = {
    val base = regexp_extract(u, "^([^?]*)", 1)
    val qBody = regexp_replace(regexp_replace(u, "^[^?]*", ""), "^\\?", "")
    val kept = filter(split(qBody, "&"), p => {
      val key = regexp_extract(p, "^([^=]*)", 1)
      !TrackingPrefixes.map(pre => key.startsWith(pre))
        .foldLeft(lit(false))(_ || _) && !key.isin(TrackingParams: _*)
    })
    when(qBody === "", u)
      .otherwise(when(size(kept) === 0, base)
        .otherwise(concat(base, lit("?"), concat_ws("&", kept))))
  }

  /** SQL expression replaying [[stripTrackingParams]] over `urlSql`. */
  def stripTrackingSql(urlSql: String): String = {
    val prefixConds = TrackingPrefixes
      .map(p => s"(regexp_extract(p, '^([^=]*)', 1) LIKE '${p.replace("_", "\\_")}%' ESCAPE '\\')")
      .mkString(" OR ")
    val names = TrackingParams.map(n => s"'$n'").mkString(", ")
    s"""(WITH u0 AS (SELECT $urlSql AS orig),
       |u AS (SELECT orig, regexp_extract(orig, '^([^?]*)', 1) AS base,
       |    regexp_replace(regexp_replace(orig, '^[^?]*', ''), '^\\?', '') AS qbody
       |  FROM u0),
       |f AS (SELECT orig, base, qbody,
       |    list_filter(string_split(qbody, '&'),
       |      p -> NOT ($prefixConds OR regexp_extract(p, '^([^=]*)', 1) IN ($names)))
       |      AS kept FROM u)
       |SELECT CASE WHEN qbody = '' THEN orig
       |  WHEN len(kept) = 0 THEN base
       |  ELSE base || '?' || array_to_string(kept, '&') END FROM f)""".stripMargin
  }

  // ------------------------------------------------- DuckDB oracle SQL ----
  // Same rule chain, same regexes (all RE2-safe), same array sort.

  /** SQL expression replaying [[host]] over `urlSql`. */
  def hostSql(urlSql: String): String = {
    val after = s"regexp_replace($urlSql, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    val auth = s"regexp_extract($after, '^([^/?#]*)', 1)"
    val noCred = s"regexp_replace($auth, '^[^@]*@', '')"
    s"(CASE WHEN regexp_extract($urlSql, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) = '' THEN ''" +
      s" ELSE lower(regexp_replace($noCred, ':[0-9]*$$', '')) END)"
  }

  /** SQL expression replaying [[registrableDomain]] over `hostSql`. */
  def registrableDomainSql(hostSql: String): String =
    s"""(WITH x AS (SELECT string_split($hostSql, '.') AS l)
       |  SELECT CASE
       |    WHEN len(l) <= 2 THEN array_to_string(l, '.')
       |    WHEN len(l) >= 3 AND length(l[-1]) = 2
       |         AND l[-2] IN ('co','com','net','org','ac','gov','edu')
       |      THEN l[-3] || '.' || l[-2] || '.' || l[-1]
       |    ELSE l[-2] || '.' || l[-1] END FROM x)""".stripMargin

  /** SQL expression replaying [[canonicalizeUrl] over `urlSql`. */
  def canonicalizeSql(urlSql: String): String = {
    val noFrag = s"regexp_replace($urlSql, '#.*$$', '')"
    s"""(WITH u AS (SELECT $noFrag AS nf),
       |s AS (SELECT nf, lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |        regexp_replace(nf, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM u),
       |p AS (SELECT *, regexp_replace(regexp_extract(rest, '^([^/?]*)', 1), '^[^@]*@', '') AS auth,
       |        regexp_replace(rest, '^[^/?]*', '') AS pathq FROM s),
       |q AS (SELECT *, regexp_extract(auth, ':([0-9]+)$$', 1) AS port,
       |        regexp_replace(lower(regexp_replace(auth, ':[0-9]*$$', '')), '^www\\.', '') AS h,
       |        regexp_extract(pathq, '^([^?]*)', 1) AS path,
       |        regexp_replace(regexp_replace(pathq, '^[^?]*', ''), '^\\?', '') AS qbody
       |      FROM p)
       |SELECT CASE WHEN scheme = '' THEN $urlSql ELSE
       |  scheme || '://' || h ||
       |  CASE WHEN port <> '' AND NOT (scheme = 'https' AND port = '443')
       |            AND NOT (scheme = 'http' AND port = '80')
       |       THEN ':' || port ELSE '' END ||
       |  CASE WHEN length(path) > 1 THEN regexp_replace(path, '/$$', '') ELSE path END ||
       |  CASE WHEN qbody = '' THEN ''
       |       ELSE '?' || array_to_string(list_sort(string_split(qbody, '&')), '&') END
       |END FROM q)""".stripMargin
  }
}
