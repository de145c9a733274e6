package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/domain primitives — the curation axis every pretraining pipeline
  * filters and caps on (host extraction → registrable domain → per-domain
  * quotas → blocklist anti-joins). The reference pipeline's transforms
  * carry URL columns (`icon_url`, reference `etl/pipeline.py:153,184,219`);
  * this family turns them into curation keys.
  *
  * Everything here is narrow, codegen'd string arithmetic — one regexp +
  * split per row, no UDFs, no shuffle — so it composes with any
  * downstream groupBy/window/anti-join at 100 TB without adding cost of
  * its own. The host regex and the suffix-list rule are both portable
  * RE2/ANSI constructs an oracle replays verbatim.
  */
object Url {

  /** Host portion of an absolute URL: text between `scheme://` (plus an
    * optional `userinfo@`) and the first `/`, `?`, `#`, `:` (port) or
    * end — lowercased (DNS names are case-insensitive; URL paths are
    * not, so only this component is folded). IPv6/IPvFuture literals
    * (`https://[::1]:8080/x`) take the bracket alternative — the whole
    * `[...]` literal IS the host per RFC 3986 §3.2.2, brackets kept
    * (they distinguish the literal from a DNS name downstream; the port
    * after `]` is excluded like any other). Scheme-less input yields ''
    * (no silent guessing — a relative reference has no authority).
    * Shared with the oracle as `HostRegex` so both engines run the
    * identical RE2 pattern.
    */
  val HostRegex: String =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?(\\[[^\\]/?#]*\\]|[^/?#:]+)"

  def host(url: Column): Column = lower(regexp_extract(url, HostRegex, 1))

  /** The multi-label public suffixes the default registrable-domain rule
    * recognizes — a deliberately SMALL, pinned subset of the Public
    * Suffix List (the full PSL is an external artifact; production swaps
    * it in via the `multiSuffixes` parameter without touching the rule).
    */
  val DefaultMultiSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "co.in", "co.kr", "com.mx")

  /** Registrable domain (eTLD+1) of a lowercased host: the last THREE
    * labels when the trailing two form a recognized multi-label public
    * suffix (`bbc.co.uk`), otherwise the last TWO (`example.com`); hosts
    * of ≤ 2 labels pass through unchanged (already apex or a bare TLD —
    * nothing to strip), and bracketed IP literals (`[::1]`, what `host`
    * yields for an IPv6 authority) pass through whole — an address has
    * no registrable domain, and splitting an IPv4-mapped literal on '.'
    * would invent one. Pure split/element_at arithmetic, no per-row
    * allocation beyond the label array.
    */
  def registrableDomain(
      hostCol: Column,
      multiSuffixes: Seq[String] = DefaultMultiSuffixes): Column = {
    val parts = split(hostCol, "\\.")
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".",
      element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    when(hostCol.startsWith("[") || size(parts) <= 2, hostCol)
      .otherwise(when(last2.isin(multiSuffixes: _*), last3).otherwise(last2))
  }

  /** Tracking query parameters the canonicalizer strips — the pinned
    * default set (regex alternation on the parameter NAME); production
    * extends via the parameter. The trailing `(=|$)` also strips
    * VALUELESS tracking params (`...?gclid`, `...&utm_source`) — a bare
    * name is the same tracker, and leaving it would split an
    * otherwise-identical URL group — while still refusing prefix
    * lookalikes (`gclid2=x` survives).
    */
  val TrackingParamRegex: String = "^(utm_[^=]*|gclid|fbclid|msclkid)(=|$)"

  /** Canonical form of an absolute URL — the normalization every
    * URL-keyed dedup/blocklist runs FIRST (two byte-different URLs that
    * canonicalize equal are the same fetch):
    *   - scheme and host lowercased (userinfo and path stay
    *     case-sensitive per RFC 3986),
    *   - default ports dropped (:80 for http, :443 for https),
    *   - the fragment dropped (never sent to the server),
    *   - tracking parameters removed (`TrackingParamRegex`), remaining
    *     parameters kept IN ORDER (sorting would merge semantically
    *     ordered duplicates some sites rely on), a now-empty query
    *     dropped entirely.
    * Scheme-less input passes through unchanged (no authority to
    * normalize). Idempotent — UrlSpec pins normalize∘normalize ≡
    * normalize. Pure regexp/split/filter column arithmetic, one row in,
    * one row out.
    */
  def normalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    val userinfo = regexp_extract(auth, "^([^@]*@)", 1)
    val hostPort = lower(regexp_replace(auth, "^[^@]*@", ""))
    val hostNoDef = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rest = regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = array_join(
      filter(split(query, "&"),
        p => !p.rlike(TrackingParamRegex) && p =!= lit("")), "&")
    val tail = when(query === "" || kept === "", path)
      .otherwise(concat(path, lit("?"), kept))
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), userinfo, hostNoDef, tail))
  }

  /** The oracle-side twin of `normalize` for a URL expression `u`.
    * NOTE: no emitted line may BEGIN with `|` or `||` — these snippets
    * are interpolated into catalog templates that run their own
    * `stripMargin`, which would eat the leading pipe (the r13
    * UrlFixtureCte lesson) — so every concat `||` sits at line END.
    */
  def normalizeSql(u: String): String = {
    val scheme = s"regexp_extract($u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)"
    val auth = s"regexp_extract($u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)"
    val hostPort = s"lower(regexp_replace($auth, '^[^@]*@', ''))"
    val rest =
      s"regexp_extract($u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1)"
    // coalesce: DuckDB's array_to_string returns NULL (not '') for an
    // EMPTY filtered list, and the NULL would swallow the whole concat
    val kept =
      s"""coalesce(array_to_string(list_filter(string_split(
         |      regexp_extract($rest, '\\?(.*)$$', 1), '&'),
         |      p -> NOT regexp_matches(p, '$TrackingParamRegex')
         |           AND p <> ''), '&'), '')""".stripMargin
    s"""CASE WHEN $scheme = '' THEN $u ELSE
       |  lower($scheme) || '://' ||
       |  regexp_extract($auth, '^([^@]*@)', 1) ||
       |  (CASE lower($scheme)
       |      WHEN 'http' THEN regexp_replace($hostPort, ':80$$', '')
       |      WHEN 'https' THEN regexp_replace($hostPort, ':443$$', '')
       |      ELSE $hostPort END) ||
       |  regexp_extract($rest, '^([^?]*)', 1) ||
       |  (CASE WHEN $kept = '' THEN '' ELSE '?' || $kept END)
       |END""".stripMargin
  }

  /** DuckDB replay of `registrableDomain(host(url))` for a host
    * expression `h` — emitted by the catalog oracles so the suffix list
    * and the label rule cannot drift between engines.
    */
  def registrableDomainSql(h: String,
                           multiSuffixes: Seq[String] = DefaultMultiSuffixes): String = {
    val inList = multiSuffixes.map(s => s"'$s'").mkString(", ")
    s"""CASE WHEN $h LIKE '[%' THEN $h
       |  WHEN len(string_split($h, '.')) <= 2 THEN $h
       |  WHEN (string_split($h, '.'))[-2] || '.' || (string_split($h, '.'))[-1]
       |    IN ($inList)
       |  THEN (string_split($h, '.'))[-3] || '.' ||
       |       (string_split($h, '.'))[-2] || '.' || (string_split($h, '.'))[-1]
       |  ELSE (string_split($h, '.'))[-2] || '.' || (string_split($h, '.'))[-1]
       |END""".stripMargin
  }

  /** The oracle-side host extraction for a URL expression `u`. */
  def hostSql(u: String): String =
    s"lower(regexp_extract($u, '$HostRegex', 1))"
}
