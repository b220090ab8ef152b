package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[HtmlText]] — the boilerplate-removal extractor. */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.ensure(spark)

  private def x(html: String): String = HtmlText.extract(html)

  test("tags strip; block vs inline boundaries") {
    assert(x("<b>b</b>old") == "b old") // inline = space
    assert(x("one<br>two") == "one\ntwo")
    assert(x("<p>a</p><p>b</p>") == "a\n\nb") // paragraph break
    assert(x("<h1>T</h1>body") == "T\nbody")
    assert(x("plain text stays") == "plain text stays")
  }

  test("script/style/head/comment/CDATA content drops entirely") {
    assert(x("<head><title>never</title></head><body>yes</body>") == "yes")
    // a script contributes NOTHING, not even a boundary — "ab" is
    // exactly what a browser renders for a<script/>b
    assert(x("a<script>var x = '<p>not text</p>';</script>b") == "ab")
    assert(x("a<style>p { color: red }</style>b") == "ab")
    assert(x("a<!-- comment with <tags> -->b") == "ab")
    assert(x("a<![CDATA[ raw <stuff> ]]>b") == "ab")
    assert(x("<!DOCTYPE html>a") == "a")
    // nested same-name close inside script text does not fool the
    // matcher (script content until </script>)
    assert(x("a<script>if (x<y) { s = \"</div>\" }</script>b")
      .startsWith("a"))
  }

  test("entities: named, decimal, hex, unknown-literal") {
    assert(x("fish &amp; chips") == "fish & chips")
    assert(x("a&lt;b&gt;c") == "a<b>c")
    assert(x("dash &#8212; here") == "dash — here")
    assert(x("hex &#x2014; here") == "hex — here")
    assert(x("caf&eacute;") == "caf&eacute;") // unknown named: literal
    assert(x("5 &lt 6") == "5 &lt 6") // no semicolon: literal
    assert(x("&nbsp;x&nbsp;") == "x")
  }

  test("whitespace collapses; attribute soup; bare '<'") {
    assert(x("a   b\t\tc") == "a b c")
    assert(x("<p>a</p>\n\n\n<p>b</p>") == "a\n\nb")
    assert(x("""<a href="x>y" title='z>w'>link</a>""") == "link")
    assert(x("3 < 5 but 7 > 2") == "3 < 5 but 7 > 2")
    assert(x("<img src='x'/>после") == "после") // self-closing inline
    // unclosed tag at EOF degrades, never throws
    assert(x("text <a href=") == "text")
  }

  test("the WarcFixture html extracts to the body text (the gate's shape)") {
    for (id <- Seq(3L, 8L); i <- 0 to 3) {
      val expected = ("crawl text " + id + " " + i + " ") * (i % 4 + 1)
      assert(x(WarcFixture.html(id, i)) == expected.trim, s"id=$id i=$i")
    }
  }

  test("codegen path ≡ direct call; NULL-safe") {
    val htmls = Seq("<p>a</p>b", "<head>x</head>ok", null)
    val got = htmls.zipWithIndex.map { case (h, i) => (i, h) }
      .toDF("i", "h")
      .select($"i", call_function("html_text", $"h").as("t"))
      .orderBy($"i").collect()
      .map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq
    assert(got(0) == x(htmls(0)) && got(1) == x(htmls(1)) && got(2) == null)
  }
}
