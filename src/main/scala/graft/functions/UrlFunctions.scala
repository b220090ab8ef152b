package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation.
  *
  * Crawl dedup's first line of defense is URL identity — but raw
  * URLs over-count (case-variant hosts, tracking params, fragments,
  * default ports, trailing slashes all alias the same resource).
  * Canonicalization collapses those aliases BEFORE content ever
  * downloads/deduplicates, which at 100 TB is the cheapest dedup
  * stage there is: a pure scan-stage projection, then an exact
  * dedup on a short canonical string.
  *
  * Rules applied (the standard crawler set — cf. the RFC 3986 §6
  * normalizations plus the tracking-param strip every production
  * crawler adds):
  *   - scheme and host lowercased; one leading `www.` stripped
  *   - default ports dropped (http:80, https:443); others kept
  *   - trailing slashes stripped from the path; empty path → `/`
  *   - query params: tracking keys removed (`utm_*`, `fbclid`,
  *     `gclid`, `ref`), survivors sorted lexicographically
  *   - fragment dropped
  *
  * Everything is built-in regexp/array expressions — codegen'd, no
  * UDF, no shuffle — and each rule is mirrored exactly in the DuckDB
  * oracle, so canonical equality is cross-engine checkable.
  */
object UrlFunctions {

  /** Non-`utm_*` tracking param keys stripped by canonicalization. */
  val trackingKeys: Seq[String] = Seq("fbclid", "gclid", "ref")

  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Host, lowercased, one leading `www.` stripped, port excluded. */
  def urlHost(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, "://([^/?#:]*)", 1)),
      "^www\\.", "")

  /** Explicit port digits, or empty string when absent. */
  def urlPort(url: Column): Column =
    regexp_extract(url, "://[^/?#:]*:([0-9]+)", 1)

  /** Path with trailing slashes stripped; empty → `/`. Case is
    * preserved — paths are case-sensitive, unlike scheme/host. */
  def urlPathCanon(url: Column): Column = {
    val p = regexp_replace(
      regexp_extract(url, "://[^/?#]*(/[^?#]*)", 1), "/+$", "")
    when(p === "", lit("/")).otherwise(p)
  }

  /** Raw query string (between `?` and `#`/end), no `?`. The first
    * `?` must precede any `#` (`[^#?]*` prefix): a URL whose only
    * `?` lives INSIDE the fragment (`http://h/p#a?b=1`) has no query
    * — the r8 pattern `\?([^#]*)` matched that fragment `?`, letting
    * fragment content survive the 'fragment dropped' rule. */
  def urlQuery(url: Column): Column =
    regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)

  /** Kept query params, sorted: drops empties, `utm_*`, and
    * [[trackingKeys]]. */
  private def keptParams(url: Column): Column =
    array_sort(filter(split(urlQuery(url), "&"), p => {
      val key = substring_index(p, "=", 1)
      p =!= "" && !key.startsWith("utm_") &&
        !key.isin(trackingKeys.map(x => x: Any): _*)
    }))

  /** Full canonical form — see object doc for the rule set. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val port = urlPort(url)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val kept = keptParams(url)
    val queryPart = when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), concat_ws("&", kept)))
    concat(scheme, lit("://"), urlHost(url), portPart,
      urlPathCanon(url), queryPart)
  }
}
