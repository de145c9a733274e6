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
    * not, so only this component is folded). Scheme-less input yields ''
    * (no silent guessing — a relative reference has no authority).
    * Shared with the oracle as `HostRegex` so both engines run the
    * identical RE2 pattern.
    */
  val HostRegex: String =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"

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
    * nothing to strip). Pure split/element_at arithmetic, no per-row
    * allocation beyond the label array.
    */
  def registrableDomain(
      hostCol: Column,
      multiSuffixes: Seq[String] = DefaultMultiSuffixes): Column = {
    val parts = split(hostCol, "\\.")
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".",
      element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    when(size(parts) <= 2, hostCol)
      .otherwise(when(last2.isin(multiSuffixes: _*), last3).otherwise(last2))
  }

  /** DuckDB replay of `registrableDomain(host(url))` for a host
    * expression `h` — emitted by the catalog oracles so the suffix list
    * and the label rule cannot drift between engines.
    */
  def registrableDomainSql(h: String,
                           multiSuffixes: Seq[String] = DefaultMultiSuffixes): String = {
    val inList = multiSuffixes.map(s => s"'$s'").mkString(", ")
    s"""CASE WHEN len(string_split($h, '.')) <= 2 THEN $h
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
