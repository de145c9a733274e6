package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** ops/Url — host extraction + registrable-domain rule. The catalog
  * oracles prove both over the md5 URL fixture end-to-end; these pin the
  * string edges by hand.
  */
class UrlSpec extends SparkSpec {

  import spark.implicits._

  private def hosts(urls: Seq[String]): Seq[String] =
    urls.toDF("url").select(Url.host(col("url")).as("h"))
      .as[String].collect().toSeq

  private def domains(hs: Seq[String]): Seq[String] =
    hs.toDF("h").select(Url.registrableDomain(col("h")).as("d"))
      .as[String].collect().toSeq

  test("host: scheme/userinfo/port/path/query/fragment stripped, case " +
      "folded; scheme-less input yields ''") {
    val got = hosts(Seq(
      "https://example.com/path?q=1#frag",
      "http://USER:pw@Sub.Example.COM:8443/x",
      "https://example.co.uk",
      "ftp+ssh://a.b.c.d/",
      "https://host",                    // bare single label
      "example.com/no-scheme",           // no authority → ''
      "//protocol-relative.com/x",       // no scheme → ''
      "https://www.site.io?q=no-path",   // query directly after host
      "https://[::1]:8080/x",            // IPv6 literal: brackets kept,
      "http://[2001:DB8::1]/p",          //   port excluded, hex folded
      "https://user@[::ffff:192.0.2.1]?q=1"))
    assert(got == Seq("example.com", "sub.example.com", "example.co.uk",
      "a.b.c.d", "host", "", "", "www.site.io",
      "[::1]", "[2001:db8::1]", "[::ffff:192.0.2.1]"))
  }

  test("registrableDomain: multi-label public suffixes take three " +
      "labels, default two; short hosts pass through") {
    val got = domains(Seq(
      "www.example.com",        // → example.com
      "a.b.news.bbc.co.uk",     // multi-label suffix → bbc.co.uk
      "shop.example.com.au",    // → example.com.au
      "example.de",             // already apex
      "co.uk",                  // 2 labels: pass through (bare suffix)
      "localhost",              // 1 label: pass through
      "cdn.eu.site7.co.jp",     // depth 2 over multi-label → site7.co.jp
      "[::1]",                  // IP literal: pass through whole
      "[::ffff:192.0.2.1]"))    //   even when dotted inside the brackets
    assert(got == Seq("example.com", "bbc.co.uk", "example.com.au",
      "example.de", "co.uk", "localhost", "site7.co.jp",
      "[::1]", "[::ffff:192.0.2.1]"))
  }

  private def norm(urls: Seq[String]): Seq[String] =
    urls.toDF("url").select(Url.normalize(col("url")).as("n"))
      .as[String].collect().toSeq

  test("normalize: case folds scheme+host only, drops default ports / " +
      "fragments / tracking params, keeps surviving params in order, " +
      "and is idempotent") {
    val in = Seq(
      "HTTPS://Example.COM:443/Path?utm_source=x&id=7&gclid=z#frag",
      "http://Site.ORG:80/a",
      "http://site.org:8080/a",            // non-default port kept
      "https://User:PW@Host.Net/P?fbclid=1&b=2&a=1", // userinfo case kept
      "https://example.com?utm_campaign=c", // query dies entirely → no '?'
      "ftp://Mixed.Case/KeepPath",          // unknown scheme: no port rule
      "no-scheme/stays?utm_source=x#asis",  // pass-through unchanged
      "https://ex.com/p?gclid&a=1&utm_source", // BARE tracking params die
      "https://ex.com/p?gclid2=x&fbclid",   // prefix lookalike survives
      "https://[::1]:443/v6?utm_source=x")  // IPv6: default port dropped
    val want = Seq(
      "https://example.com/Path?id=7",
      "http://site.org/a",
      "http://site.org:8080/a",
      "https://User:PW@host.net/P?b=2&a=1",
      "https://example.com",
      "ftp://mixed.case/KeepPath",
      "no-scheme/stays?utm_source=x#asis",
      "https://ex.com/p?a=1",
      "https://ex.com/p?gclid2=x",
      "https://[::1]/v6")
    val got = norm(in)
    assert(got == want, s"got $got")
    assert(norm(got) == want, "normalize must be idempotent")
  }

  test("blocking at the registrable-domain key covers every subdomain " +
      "variant of a blocked apex") {
    val urls = Seq(
      1L -> "https://blocked.com/a",
      2L -> "https://www.blocked.com/b",
      3L -> "http://cdn.eu.BLOCKED.com:8443/c",
      4L -> "https://notblocked.com/d",
      5L -> "https://blocked.com.evil.org/e") // suffix-spoof: org apex
      .toDF("id", "url")
    val blocked = Seq("blocked.com").toDF("domain")
    val surv = urls
      .select(col("id"),
        Url.registrableDomain(Url.host(col("url"))).as("domain"))
      .join(blocked, Seq("domain"), "left_anti")
      .select(col("id")).as[Long].collect().toSet
    assert(surv == Set(4L, 5L),
      "subdomains of the blocked apex must drop; a spoofed suffix " +
        "(blocked.com.evil.org → evil.org) must survive")
  }
}
