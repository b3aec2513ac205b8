package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions

/** URL canonicalization rules, case by case, plus idempotence. */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlFunctions.canonicalizeUrl(col("u")))
      .collect().map(_.getString(0)).toSeq

  test("scheme and host lowercase; default ports dropped per scheme") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/a",
      "https://example.com:443/a",
      "http://example.com:8080/a", // non-default port kept
      "https://example.com:80/a"   // :80 is NOT https' default
    ) == Seq(
      "http://www.example.com/a",
      "https://example.com/a",
      "http://example.com:8080/a",
      "https://example.com:80/a"))
  }

  test("fragments dropped, trailing slashes trimmed, empty path is /") {
    assert(canon(
      "http://e.com/a/b/#frag",
      "http://e.com/a//",
      "http://e.com",
      "http://e.com/#x"
    ) == Seq(
      "http://e.com/a/b",
      "http://e.com/a",
      "http://e.com/",
      "http://e.com/"))
  }

  test("query params: tracking stripped, empties dropped, rest sorted") {
    assert(canon(
      "http://e.com/p?b=2&a=1",
      "http://e.com/p?a=1&utm_source=x&b=2&gclid=g&fbclid=f&ref=r",
      "http://e.com/p?utm_campaign=only",
      "http://e.com/p?&&a=1&"
    ) == Seq(
      "http://e.com/p?a=1&b=2",
      "http://e.com/p?a=1&b=2",
      "http://e.com/p",
      "http://e.com/p?a=1"))
  }

  test("canonicalization is idempotent") {
    val urls = Seq(
      "HTTPS://A.B:443/x/y/?b=2&a=1&utm_source=z#f",
      "http://e.com", "http://e.com:8080/q?z=1")
    val once = canon(urls: _*)
    assert(canon(once: _*) == once)
  }

  test("malformed inputs pass through unchanged (never collapsed)") {
    assert(canon("not a url", "", "ftp//missing.colon/x") ==
      Seq("not a url", "", "ftp//missing.colon/x"))
  }
}
