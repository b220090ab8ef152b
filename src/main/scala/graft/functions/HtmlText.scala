package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction — the boilerplate-removal step between
  * [[WarcRecords]] and every text-quality stage: a web corpus is
  * useless until markup stops counting as words. One fused pass, no
  * regex backtracking, no DOM allocation:
  *
  *  - tags are stripped; the CONTENT of `script`, `style`,
  *    `noscript`, `template`, `head`, `svg`, and HTML comments /
  *    CDATA / DOCTYPE is dropped entirely (that text was never
  *    prose);
  *  - block-level boundaries (p, div, br, li, tr, headings, ...)
  *    emit a newline, inline tags a space — so "one<br>two" keeps a
  *    word boundary but "<b>b</b>old" does not gain one;
  *  - the ~30 named entities that dominate real HTML plus numeric
  *    `&#...;` / `&#x...;` forms decode (unknown entities pass
  *    through literally — dropping them would silently eat prose);
  *  - whitespace collapses: runs of spaces/tabs become one space,
  *    ≥ 2 newlines become exactly two (paragraph break), and
  *    leading/trailing whitespace trims.
  *
  * This is a TEXT extractor, not an HTML validator: unclosed tags,
  * attribute soup, and bare `<` followed by non-name bytes (kept as
  * text, per the HTML5 tokenizer's own rule) all degrade gracefully —
  * a crawl contains them all. `html_text(NULL)` is NULL; non-HTML
  * text passes through (minus whitespace collapsing).
  *
  * Scale shape: scan-stage, O(bytes), whole-stage-codegen'd — the
  * standard first projection after a WARC explode.
  */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"html_text expects a string arg, got ${t.simpleString}")
    }

  override def nullSafeEval(html: Any): Any =
    UTF8String.fromString(
      HtmlText.extract(html.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.HtmlText.extract($h.toString()));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

object HtmlText {

  /** Elements whose CONTENT is dropped (until the matching close). */
  private val RawDrop = Set("script", "style", "noscript", "template",
    "head", "svg")

  /** Elements that imply a line break around them. */
  private val Block = Set("p", "div", "br", "li", "ul", "ol", "tr",
    "td", "th", "table", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "section", "article", "header", "footer",
    "form", "hr", "figure", "figcaption", "main", "nav", "aside",
    "dt", "dd", "dl", "option", "title")

  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "hellip" -> "…",
    "mdash" -> "—", "ndash" -> "–", "lsquo" -> "‘",
    "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "bull" -> "•", "middot" -> "·", "sect" -> "§",
    "para" -> "¶", "deg" -> "°", "plusmn" -> "±",
    "frac12" -> "½", "times" -> "×", "divide" -> "÷",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢", "laquo" -> "«", "raquo" -> "»")

  def extract(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n / 2 + 16)
    var i = 0
    var dropUntil: String = null // inside a raw-drop element
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        // comment / CDATA / doctype?
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' ||
          html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i + 1)
          i = if (e < 0) n else e + 1
        } else {
          // tag name
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          if (j == nameStart) {
            // bare '<' followed by non-name: literal text (HTML5 rule)
            if (dropUntil == null) out.append(c)
            i += 1
          } else {
            val name = html.substring(nameStart, j).toLowerCase
            // scan to tag end (attribute soup may contain quoted '>')
            var q = 0.toChar
            var e = j
            var done = false
            while (e < n && !done) {
              val ch = html.charAt(e)
              if (q != 0) { if (ch == q) q = 0.toChar }
              else if (ch == '"' || ch == '\'') q = ch
              else if (ch == '>') done = true
              if (!done) e += 1
            }
            val selfClosed = e > j && e < n && html.charAt(e - 1) == '/'
            i = if (e >= n) n else e + 1
            if (dropUntil != null) {
              if (closing && name == dropUntil) dropUntil = null
            } else if (!closing && RawDrop.contains(name) && !selfClosed) {
              dropUntil = name
              if (Block.contains(name)) out.append('\n')
            } else {
              out.append(if (Block.contains(name)) '\n' else ' ')
            }
          }
        }
      } else if (c == '&' && dropUntil == null) {
        // entity
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = html.substring(i + 1, semi)
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try {
              out.appendCodePoint(Integer.parseInt(body.substring(2), 16))
              i = semi + 1
            } catch { case _: Exception => out.append(c); i += 1 }
          } else if (body.startsWith("#")) {
            try {
              out.appendCodePoint(Integer.parseInt(body.substring(1)))
              i = semi + 1
            } catch { case _: Exception => out.append(c); i += 1 }
          } else Entities.get(body) match {
            case Some(r) => out.append(r); i = semi + 1
            case None => out.append(c); i += 1 // unknown: literal
          }
        } else { out.append(c); i += 1 }
      } else {
        if (dropUntil == null) out.append(c)
        i += 1
      }
    }
    collapse(out.toString)
  }

  /** Space runs → one space; ≥2 newlines → exactly two; trim. */
  private def collapse(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var pendingNl = 0
    var pendingSp = false
    var started = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n' || c == '\r') { pendingNl += 1 }
      else if (c == ' ' || c == '\t' || c == '\u00a0' || c == '\f') {
        pendingSp = true
      } else {
        if (started) {
          if (pendingNl >= 2) out.append("\n\n")
          else if (pendingNl == 1) out.append('\n')
          else if (pendingSp) out.append(' ')
        }
        pendingNl = 0; pendingSp = false
        started = true
        out.append(c)
      }
      i += 1
    }
    out.toString
  }
}
