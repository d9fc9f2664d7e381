package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization and domain extraction: hand-checked rule
  * applications, pass-through for non-URLs, and the scan-stage (no
  * shuffle) plan shape.
  */
class UrlsSpec extends SparkSpec {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalizeUrl($"u")).as[String].collect().toSeq

  test("canonicalize: fragment, case, www, default port, query sort, trailing slash") {
    assert(canon("HTTPS://WWW.News.BBC.CO.UK:443/Path/Sub/?b=2&a=1#frag")
      === Seq("https://news.bbc.co.uk/Path/Sub?a=1&b=2"))
    assert(canon("http://Example.COM:8080/x/") === Seq("http://example.com:8080/x"))
    assert(canon("http://example.com:80/x") === Seq("http://example.com/x"))
    assert(canon("https://example.com") === Seq("https://example.com"))
    assert(canon("https://example.com/") === Seq("https://example.com/"))
  }

  test("canonicalize: path case is preserved, dot-segments untouched") {
    assert(canon("https://A.b/CaSe/../Path") === Seq("https://a.b/CaSe/../Path"))
  }

  test("non-URL input passes through untouched") {
    assert(canon("not a url", "relative/path") === Seq("not a url", "relative/path"))
  }

  test("canonicalize: userinfo dropped so credentialed links share a dedup key") {
    assert(canon("https://user:PW@WWW.Ex.COM:8443/p") === Seq("https://ex.com:8443/p"))
    assert(canon("https://www.ex.com:8443/p") === Seq("https://ex.com:8443/p"))
  }

  test("host: credentials and port stripped, lowercased; non-URL yields empty") {
    val got = Seq("https://user:pw@WWW.Ex.COM:8443/p", "not a url", "relative/path")
      .toDF("u").select(Urls.host($"u")).as[String].collect().toSeq
    assert(got === Seq("www.ex.com", "", ""))
  }

  test("registrableDomain: eTLD+1 heuristic incl. cc second-level registries") {
    val cases = Seq(
      "news.bbc.co.uk" -> "bbc.co.uk",
      "a.b.example.com" -> "example.com",
      "example.com" -> "example.com",
      "localhost" -> "localhost",
      "x.gov.br" -> "x.gov.br")
    val got = cases.map(_._1).toDF("h")
      .select($"h", Urls.registrableDomain($"h")).as[(String, String)]
      .collect().toMap
    cases.foreach { case (h, d) => assert(got(h) === d, h) }
  }

  test("stripTrackingParams: utm/click-ids drop, real params and bare URLs survive") {
    def strip(urls: String*): Seq[String] =
      urls.toDF("u").select(Urls.stripTrackingParams($"u")).as[String].collect().toSeq
    assert(strip("https://a.b/p?gclid=1&id=2&utm_source=x&z=3")
      === Seq("https://a.b/p?id=2&z=3"))
    assert(strip("https://a.b/p?utm_campaign=c") === Seq("https://a.b/p"))
    assert(strip("https://a.b/p?id=2") === Seq("https://a.b/p?id=2"))
    assert(strip("https://a.b/p") === Seq("https://a.b/p"))
    // 'utmost=1' is NOT a utm_ param; 'ref_src' is a named tracker
    assert(strip("https://a.b/p?utmost=1&ref_src=t") === Seq("https://a.b/p?utmost=1"))
  }

  test("plan: pure scan-stage projection, no exchange") {
    val plan = Seq("https://a.b/c").toDF("u")
      .select(Urls.canonicalizeUrl($"u"), Urls.registrableDomain(Urls.host($"u")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
