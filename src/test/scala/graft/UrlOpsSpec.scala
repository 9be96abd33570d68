package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.UrlOps

/** URL hygiene: normalizer cases, domain extraction, blocklist filter, dedup. */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def norm(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("url")
      .select(expr(UrlOps.normalizeSql("url", duck = false))).head().getString(0)
  }

  test("normalizer strips fragment, tracking params, port, www, trailing slash") {
    assert(norm("HTTPS://WWW.Example.ORG:443/pX") == "https://example.org/pX")
    assert(norm("http://a.test:80/x/") == "http://a.test/x")
    assert(norm("https://a.test/x?utm_source=s&utm_campaign=c") == "https://a.test/x")
    assert(norm("https://a.test/x?a=1&utm_medium=m#frag") == "https://a.test/x?a=1")
    assert(norm("https://a.test/x?utm_a=1&b=2") == "https://a.test/x?b=2")
    assert(norm("https://a.test/x?fbclid=abc") == "https://a.test/x")
    // Case of the PATH is preserved; only the authority is lowered.
    assert(norm("HTTP://A.TEST/CaseSensitive") == "http://a.test/CaseSensitive")
    // Non-default ports survive.
    assert(norm("https://a.test:8443/x") == "https://a.test:8443/x")
  }

  test("host and registrable domain") {
    import spark.implicits._
    val r = Seq("https://sub.deep.example.co/x").toDF("u")
      .select(expr(UrlOps.hostSql("u", duck = false)).as("h"),
        expr(UrlOps.domainSql("u", duck = false)).as("d")).head()
    assert(r.getString(0) == "sub.deep.example.co")
    assert(r.getString(1) == "example.co")
  }

  test("domain blocklist filter drops blocked registrable domains") {
    import spark.implicits._
    val pages = Seq(
      (1L, "https://ok.example.org/a"),
      (2L, "https://www.blocked.test/b"),
      (3L, "https://sub.ads-site.com/c")).toDF("doc_id", "url")
    val blocked = Seq("blocked.test", "ads-site.com").toDF("domain")
    val kept = UrlOps.domainFilter(pages, blocked).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("latest-snapshot URL dedup keeps the max-ts capture per normalized url") {
    import spark.implicits._
    val caps = Seq(
      ("https://a.test/x", 1L),
      ("https://www.a.test/x?utm_source=s", 2L), // same normalized url, later
      ("https://a.test/y", 5L)).toDF("url", "ts")
    val got = UrlOps.urlDedupLatest(caps).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("https://a.test/x", "https://www.a.test/x?utm_source=s", 2L),
      ("https://a.test/y", "https://a.test/y", 5L)))
  }
}
