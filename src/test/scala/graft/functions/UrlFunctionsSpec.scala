package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlFunctions.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq

  test("case, www, default port, fragment, trailing slash collapse") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b/?x=1#frag") ==
      Seq("https://example.com/A/b?x=1"))
  }

  test("aliases of the same resource canonicalize identically") {
    val forms = Seq(
      "https://example.com/p?b=2&a=1",
      "HTTPS://www.example.com:443/p/?a=1&b=2#top",
      "https://EXAMPLE.com/p?utm_source=x&b=2&fbclid=zzz&a=1")
    assert(canon(forms: _*).distinct == Seq("https://example.com/p?a=1&b=2"))
  }

  test("non-default port and non-tracking params survive") {
    assert(canon("http://example.com:8080/x?ref=abc&q=1&utm_medium=m") ==
      Seq("http://example.com:8080/x?q=1"))
    // http on 443 is NOT a default port
    assert(canon("http://example.com:443/x") ==
      Seq("http://example.com:443/x"))
  }

  test("bare host, empty path, empty query normalize to root") {
    assert(canon("https://example.com", "https://example.com/",
      "https://example.com?#") ==
      Seq("https://example.com/", "https://example.com/",
        "https://example.com/"))
  }

  test("a ? inside the fragment is NOT a query") {
    // r8 regression: \?([^#]*) matched the first ? anywhere, so a
    // no-query URL with ? in its fragment kept fragment content
    assert(canon("http://example.com/p#a?b=1") ==
      Seq("http://example.com/p"))
    // and a real query still stops at the fragment
    assert(canon("http://example.com/p?a=1#x?b=2") ==
      Seq("http://example.com/p?a=1"))
  }

  test("path case is preserved; only one leading www strips") {
    assert(canon("https://www.www.example.com/CaseSensitive/Path") ==
      Seq("https://www.example.com/CaseSensitive/Path"))
  }

  test("luhn validates known card test vectors and rejects mutations") {
    // public test numbers (Visa/Amex/Mastercard doc vectors)
    val rows = Seq(
      ("4532015112830366", true),
      ("4111111111111111", true),
      ("378282246310005", true),
      ("5555555555554444", true),
      ("4532015112830367", false), // last digit off by one
      ("4111111111111112", false),
      ("1234567890123456", false)
    ).toDF("cand", "expected")
    val bad = rows
      .withColumn("got", TextFunctions.luhnValid($"cand"))
      .filter($"got" =!= $"expected")
    assert(bad.count() == 0)
  }
}
