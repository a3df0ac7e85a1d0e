package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Direct unit coverage of the shared URL canonicalizer (batch
  * `q_url_curation` + streaming `urlFilterStream` both ride on it).
  * The key algebraic property: canonicalization is IDEMPOTENT — running
  * the canonicalizer over its own output changes nothing, for every case
  * in the table. A non-idempotent canonicalizer would make batch
  * compaction (re-canonicalizing already-canonical URLs) corrupt keys.
  */
class UrlCanonSpec extends SparkTestBase {
  import spark.implicits._

  private val cases = Seq(
    // (input, expected canon_url, expected domain)
    ("https://WWW.Site3.Example.COM/Page/7?utm_source=feed&id=1&ref=rss#s2",
      "https://www.site3.example.com/Page/7?id=1", "site3.example.com"),
    ("http://site13.example.com/y", "http://site13.example.com/y", "site13.example.com"),
    ("HTTPS://UPPER.example.ORG/Mixed/Case?id=9", "https://upper.example.org/Mixed/Case?id=9",
      "upper.example.org"),
    ("https://a.com/p?href=b&id=2", "https://a.com/p?href=b&id=2", "a.com"), // href= untouched
    ("https://a.com/p?utm_a=1&utm_b=2&id=3", "https://a.com/p?id=3", "a.com"), // adjacent utm
    ("https://a.com/p?utm_only=1", "https://a.com/p", "a.com"), // all params stripped
    ("https://a.com/p?ref=x", "https://a.com/p", "a.com"),
    ("https://www.b.net/q#fragment-only", "https://www.b.net/q", "b.net"),
    ("ftp://files.example.net/pub/x", "ftp://files.example.net/pub/x", "files.example.net"),
    // literal '&' in the PATH (legal RFC-3986 sub-delim): must not be
    // rewritten to '?' even though nothing was stripped
    ("https://a.com/p&q", "https://a.com/p&q", "a.com"),
    ("https://a.com/a&b?id=1", "https://a.com/a&b?id=1", "a.com"),
    // '?'-anchored tracking param followed by a real one: promotion to '?'
    ("https://a.com/p?ref=x&id=2", "https://a.com/p?id=2", "a.com"),
    // a '://' embedded in the QUERY must never supply the domain
    ("https://good.example.org/r?u=https://evil.example/x",
      "https://good.example.org/r?u=https://evil.example/x", "good.example.org"),
    // userinfo and port must not defeat an exact-match domain blocklist
    ("https://site13.example.com:443/x", "https://site13.example.com:443/x", "site13.example.com"),
    ("https://user@site13.example.com/x", "https://user@site13.example.com/x", "site13.example.com"))

  private def canon(urls: Seq[String]): Seq[(String, String, String)] =
    TextAnalysisOps.withCanonUrl(urls.toDF("url"), "url")
      .select(col("url"), col("canon_url"), col("domain"))
      .as[(String, String, String)].collect().toSeq

  test("canonicalizer: expected outputs over the tricky-case table") {
    val got = canon(cases.map(_._1))
    for (((in, wantUrl, wantDom), (_, gotUrl, gotDom)) <- cases.zip(got)) {
      assert(gotUrl == wantUrl, s"canon($in) = $gotUrl, want $wantUrl")
      assert(gotDom == wantDom, s"domain($in) = $gotDom, want $wantDom")
    }
  }

  test("canonicalization is idempotent: canon(canon(x)) == canon(x)") {
    val first = canon(cases.map(_._1)).map(_._2)
    val second = canon(first)
    for ((c, (_, c2, _)) <- first.zip(second))
      assert(c2 == c, s"not idempotent: canon($c) = $c2")
  }
}
