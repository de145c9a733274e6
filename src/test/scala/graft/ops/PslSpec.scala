package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** ops/Psl — PSL-format parsing + the PSL-aware registrable-domain rule.
  * The `curate_domain_psl` catalog oracle proves the rule end-to-end over
  * the md5 host fixture (both engines consuming the SAME parsed snapshot);
  * these pin the parser buckets and the rule's precedence edges by hand.
  */
class PslSpec extends SparkSpec {

  import spark.implicits._

  test("parse: buckets by rule shape, strips comments/whitespace, " +
      "lowercases, dedups, and surfaces unsupported shapes") {
    val rules = Psl.parse(Iterator(
      "// comment", "", "  ", "com", "CO.UK ", "co.uk",
      "s3.amazonaws.com", "*.ck", "!www.ck",
      "blogspot.co.uk",
      "a.b.c.d",                 // 4-label exact: unsupported
      "*.compute.amazonaws.com", // multi-label wildcard: unsupported
      "!city.deep.kobe.jp"))     // deep exception: unsupported
    assert(rules.exact2 == Seq("co.uk"))
    assert(rules.exact3 == Seq("s3.amazonaws.com", "blogspot.co.uk"))
    assert(rules.wildcardTlds == Seq("ck"))
    assert(rules.exceptions == Seq("www.ck"))
    assert(rules.unsupported ==
      Seq("a.b.c.d", "*.compute.amazonaws.com", "!city.deep.kobe.jp"))
  }

  test("snapshot resource parses with zero unsupported rules and covers " +
      "the github.io/co.nz class") {
    val s = Psl.snapshot
    assert(s.unsupported.isEmpty, s"snapshot has unexpressible rules: ${s.unsupported}")
    assert(s.exact2.contains("github.io") && s.exact2.contains("co.nz") &&
      s.exact2.contains("blogspot.com") && s.exact3.contains("s3.amazonaws.com"))
    assert(s.wildcardTlds == Seq("ck") && s.exceptions == Seq("www.ck"))
    assert(s.suffixCount > 150)
  }

  private def domains(hs: Seq[String]): Seq[String] =
    hs.toDF("h").select(Psl.registrableDomain(col("h")).as("d"))
      .as[String].collect().toSeq

  test("registrableDomain(snapshot): longest suffix wins, wildcards and " +
      "exceptions apply, bare suffixes and IP literals pass through") {
    val cases = Seq(
      "www.example.com"          -> "example.com",  // implicit 1-label
      "user.github.io"           -> "user.github.io",
      "a.b.user.github.io"       -> "user.github.io",
      "github.io"                -> "github.io",    // bare suffix
      "shop.example.co.nz"       -> "example.co.nz",
      "blog7.blogspot.com"       -> "blog7.blogspot.com",
      "me.blogspot.co.uk"        -> "me.blogspot.co.uk", // 3-label beats co.uk
      "blogspot.co.uk"           -> "blogspot.co.uk",    // bare 3-label suffix
      "bucket.s3.amazonaws.com"  -> "bucket.s3.amazonaws.com",
      "x.bucket.s3.amazonaws.com" -> "bucket.s3.amazonaws.com",
      "foo.example.ck"           -> "foo.example.ck", // *.ck wildcard
      "a.foo.example.ck"         -> "foo.example.ck",
      "foo.www.ck"               -> "www.ck",         // !www.ck exception
      "www.ck"                   -> "www.ck",
      "deep.a.site.co.uk"        -> "site.co.uk",
      "localhost"                -> "localhost",
      "[::1]"                    -> "[::1]")
    val got = domains(cases.map(_._1))
    cases.zip(got).foreach { case ((h, want), d) =>
      assert(d == want, s"$h → $d, want $want")
    }
  }

  test("a full-PSL-format file loads through the same parser (loader " +
      "path) and a custom rule set overrides the snapshot") {
    val f = java.io.File.createTempFile("psl", ".dat")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      "// test psl\nexample\ncustom.zz\n*.ww\n!ok.ww\n")
    val r = Psl.load(f.getAbsolutePath)
    assert(r.exact2 == Seq("custom.zz") && r.wildcardTlds == Seq("ww") &&
      r.exceptions == Seq("ok.ww"))
    // under the SNAPSHOT the suffix is unknown → default last-2 rule
    assert(domains(Seq("a.b.custom.zz")) == Seq("custom.zz"))
    val got = Seq("a.b.custom.zz", "x.y.ww", "sub.ok.ww")
      .toDF("h").select(Psl.registrableDomain(col("h"), r).as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("b.custom.zz", "x.y.ww", "ok.ww"))
  }
}
