package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parsed Public Suffix List rules, bucketed by the shape the
  * registrable-domain column rule consumes. Label counts are the rule's
  * dispatch key, so suffixes arrive pre-sorted by length: exact 2-label
  * (`co.uk`, `github.io`), exact 3-label (`s3.amazonaws.com`,
  * `blogspot.co.uk`), single-label wildcards (`*.ck` → `ck`), and the
  * 2-label exception names that cancel a wildcard (`!www.ck` → `www.ck`).
  * `unsupported` records every rule the column path does NOT express
  * (4+-label suffixes, multi-label wildcards like `*.compute.amazonaws
  * .com`, deep exceptions) — surfaced, never silently dropped, so a
  * caller loading the FULL PSL can see exactly what coverage it bought.
  */
final case class PslRules(
    exact2: Seq[String],
    exact3: Seq[String],
    wildcardTlds: Seq[String],
    exceptions: Seq[String],
    unsupported: Seq[String]) {
  def suffixCount: Int = exact2.size + exact3.size + wildcardTlds.size
}

/** Public Suffix List loader + the PSL-aware registrable-domain rule.
  *
  * `Url.registrableDomain` keeps its deliberately tiny pinned default —
  * the catalog oracles stay stable on it — while this object gives the
  * production path: parse a real PSL-format file (publicsuffix.org), or
  * the bundled snapshot subset (`public_suffix_snapshot.dat`, ~170 rules
  * covering the `github.io`/`blogspot.com`/`co.nz` class a pretraining
  * crawl hits immediately), and constant-fold the rules into the same
  * narrow codegen'd column arithmetic. No UDFs, no join — at ~10 k full-
  * PSL entries the `isin` lowers to an `InSet` hash probe per row, which
  * is the broadcast-a-tiny-dim decision made for free.
  *
  * PSL semantics implemented (the publicsuffix.org algorithm restricted
  * to the rule shapes below; everything else lands in `unsupported`):
  *   - longest matching suffix wins (3-label exact > 2-label exact >
  *     single-label wildcard > implicit 1-label default);
  *   - `*.tld` wildcards make every 2-label suffix under `tld` public;
  *   - `!name` exceptions cancel the wildcard for that exact name;
  *   - a host that IS a bare public suffix passes through unchanged
  *     (the `Url.registrableDomain` convention), as do bracketed IP
  *     literals and hosts of ≤ 2 labels.
  */
object Psl {

  val SnapshotResource = "/graft/public_suffix_snapshot.dat"

  /** Parse PSL-format lines: strip comments (`//`) and blanks, take each
    * rule up to the first whitespace (the PSL spec's rule), lowercase.
    */
  def parse(lines: Iterator[String]): PslRules = {
    val e2 = Seq.newBuilder[String]; val e3 = Seq.newBuilder[String]
    val wc = Seq.newBuilder[String]; val ex = Seq.newBuilder[String]
    val un = Seq.newBuilder[String]
    lines.foreach { raw =>
      val line = raw.trim.takeWhile(!_.isWhitespace).toLowerCase
      if (line.nonEmpty && !line.startsWith("//")) {
        if (line.startsWith("!")) {
          val name = line.drop(1)
          if (name.count(_ == '.') == 1) ex += name else un += line
        } else if (line.startsWith("*.")) {
          val tail = line.drop(2)
          if (!tail.contains('.') && tail.nonEmpty) wc += tail else un += line
        } else line.count(_ == '.') match {
          case 0 => () // single-label TLD: the implicit default rule
          case 1 => e2 += line
          case 2 => e3 += line
          case _ => un += line
        }
      }
    }
    PslRules(e2.result().distinct, e3.result().distinct,
      wc.result().distinct, ex.result().distinct, un.result().distinct)
  }

  /** The bundled snapshot (classpath resource) — parsed once per JVM. */
  lazy val snapshot: PslRules = {
    val in = getClass.getResourceAsStream(SnapshotResource)
    require(in != null, s"missing classpath resource $SnapshotResource")
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Production path: parse a full PSL file from disk (the driver ships
    * it next to the job; ~10 k rules parse in milliseconds).
    */
  def load(path: String): PslRules = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  // isin() over an empty list is vacuously false, but spell it lit(false)
  // so an empty bucket contributes NO branch work at all.
  private def inSet(c: Column, vals: Seq[String]): Column =
    if (vals.isEmpty) lit(false) else c.isin(vals: _*)

  /** Registrable domain (eTLD+1) of a lowercased host under `rules` —
    * the PSL-aware generalization of `Url.registrableDomain`. Pure
    * split/element_at/InSet column arithmetic; branch conditions carry
    * their own size guards so no out-of-range `element_at` ever
    * evaluates (CaseWhen short-circuits per row).
    */
  def registrableDomain(hostCol: Column,
                        rules: PslRules = snapshot): Column = {
    val parts = split(hostCol, "\\.")
    def lastN(n: Int): Column =
      concat_ws(".", (n to 1 by -1).map(i => element_at(parts, -i)): _*)
    val (last2, last3, last4) = (lastN(2), lastN(3), lastN(4))
    val tld = element_at(parts, -1)
    when(hostCol.startsWith("[") || size(parts) <= 2, hostCol)
      .when(inSet(last2, rules.exceptions), last2)
      .when(size(parts) >= 4 && inSet(last3, rules.exact3), last4)
      .when(inSet(last3, rules.exact3), hostCol) // bare 3-label suffix
      .when(inSet(last2, rules.exact2), last3)
      .when(inSet(tld, rules.wildcardTlds), last3)
      .otherwise(last2)
  }

  private def sqlIn(e: String, vals: Seq[String]): String =
    if (vals.isEmpty) "FALSE"
    else s"$e IN (${vals.map(v => s"'$v'").mkString(", ")})"

  /** DuckDB replay of `registrableDomain(h, rules)` — the catalog emits
    * this from the SAME parsed rules, so the suffix set cannot drift
    * between engines. (DuckDB list indexing is NULL-safe out of range;
    * the length guards keep the branches aligned with the Spark rule
    * anyway.)
    */
  def registrableDomainSql(h: String, rules: PslRules = snapshot): String = {
    def lastN(n: Int): String =
      (n to 1 by -1).map(i => s"(string_split($h, '.'))[-$i]")
        .mkString(" || '.' || ")
    val (last2, last3, last4) = (lastN(2), lastN(3), lastN(4))
    val len = s"len(string_split($h, '.'))"
    s"""CASE WHEN $h LIKE '[%' OR $len <= 2 THEN $h
       |  WHEN ${sqlIn(last2, rules.exceptions)} THEN $last2
       |  WHEN $len >= 4 AND ${sqlIn(last3, rules.exact3)} THEN $last4
       |  WHEN ${sqlIn(last3, rules.exact3)} THEN $h
       |  WHEN ${sqlIn(last2, rules.exact2)} THEN $last3
       |  WHEN ${sqlIn(s"(string_split($h, '.'))[-1]", rules.wildcardTlds)}
       |    THEN $last3
       |  ELSE $last2
       |END""".stripMargin
  }
}
