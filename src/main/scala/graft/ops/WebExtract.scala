package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-corpus text extraction — the WET step of a crawl pipeline
  * (Common Crawl's WARC→WET conversion; C4/CCNet consume the result).
  * A crawl delivers markup; every downstream operator in this engine
  * (C4 line cleaning, Gopher gating, dedup, LM filters) expects
  * extracted plain text, so this is the stage that turns the one into
  * the other. Deterministic rule set, all inside the Java-regex ∩ RE2
  * subset so a DuckDB oracle replays the extraction
  * character-for-character:
  *
  *   1. tags `<...>` become a single space (block separation — words
  *      from adjacent elements must not fuse),
  *   2. the five predefined character entities unescape, `&amp;`
  *      LAST (unescaping it first would double-decode `&amp;lt;`),
  *   3. whitespace runs collapse to one space, ends trimmed.
  *
  * Everything is a codegen'd per-row projection: zero shuffles, scan
  * speed, trivially 100 TB-safe. */
object WebExtract {

  private val TagPattern = "<[^>]*>"
  private val HrefPattern = "href=\"([^\"]*)\""

  private def unescapeEntities(c: org.apache.spark.sql.Column) =
    replace(replace(replace(replace(replace(c,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))

  /** (id, title, body_text, n_links) per document. `title` is the raw
    * `<title>` element text; `body_text` is the full extracted text
    * (title included — WET keeps it); `n_links` counts href
    * attributes, the fan-out statistic link-graph curation reads. */
  def extractText(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
      regexp_extract(col(htmlCol), "<title>([^<]*)</title>", 1).as("title"),
      trim(regexp_replace(
        unescapeEntities(regexp_replace(col(htmlCol), TagPattern, " ")),
        "[ \\t\\n\\r]+", " ")).as("body_text"),
      size(regexp_extract_all(col(htmlCol), lit(HrefPattern), lit(1)))
        .as("n_links"))

  /** One row per href occurrence, in document order:
    * (id, link_pos, href). The edge-list extraction that feeds
    * [[Graph.pageRankMicro]] — row-multiplying but bounded by the
    * link count, still a shuffle-free generator. */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(regexp_extract_all(col(htmlCol), lit(HrefPattern), lit(1))))
      .toDF(idCol, "link_pos", "href")

  // -------------------------------------------------------------------
  // URL canonicalization + registered-domain extraction (r18, VERDICT
  // r17 missing #4): the normalization step between extractLinks and
  // every URL-keyed operator — dedup keys, host-level quality priors,
  // domain-grouped joins. Pure codegen'd Column projection: zero
  // shuffles, scan speed, every rule replayable as SQL string surgery.
  // -------------------------------------------------------------------

  /** Common tracking query parameters stripped by
    * [[canonicalizeUrls]] — the public "utm" family plus the major
    * ad-click/mail-campaign ids. A fixed public list: canonical keys
    * must be deterministic, not config-shaped. */
  val DefaultTrackingParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "utm_id", "gclid", "fbclid", "msclkid",
    "mc_eid", "mc_cid", "igshid", "_ga", "ref")

  /** Embedded snapshot of the most common MULTI-LABEL public suffixes
    * (the publicsuffix.org concept; a production deployment swaps in
    * the full list — the ALGORITHM is what this op pins): when a
    * host's last two labels match an entry, the registrable domain
    * keeps three labels; otherwise the documented two-label fallback
    * applies. */
  val PublicSuffixSnapshot: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.nz", "net.nz", "org.nz", "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "com.mx", "com.ar", "com.tr",
    "co.in", "net.in", "org.in", "co.kr", "or.kr", "co.za",
    "com.sg", "com.hk", "com.tw", "com.my", "co.id", "com.vn")

  /** The registrable-domain Column for a LOWERCASE host Column:
    * plain IPv4-ish hosts (all digits/dots) are their own key;
    * otherwise last-3 labels when the final two match the
    * [[PublicSuffixSnapshot]], else last-2 (else the host itself for
    * single-label hosts). `try_element_at` keeps out-of-range label
    * indexes null (→ the condition fails) instead of ANSI-throwing. */
  private def registeredDomainCol(host: org.apache.spark.sql.Column) = {
    val labels = split(host, "\\.")
    val lastTwo = concat(try_element_at(labels, lit(-2)), lit("."),
      try_element_at(labels, lit(-1)))
    val suffixArr = array(PublicSuffixSnapshot.map(lit): _*)
    when(host.rlike("^[0-9.]+$"), host)
      .when(size(labels) >= 3 && array_contains(suffixArr, lastTwo),
        concat(try_element_at(labels, lit(-3)), lit("."), lastTwo))
      .when(size(labels) >= 2, lastTwo)
      .otherwise(host)
  }

  /** Canonicalize a URL column (RFC 3986 normalization subset, the
    * rules URL-keyed dedup needs to be stable under crawl noise):
    *
    *   1. scheme and host lowercase; userinfo stripped,
    *   2. default port stripped (http:80, https:443), explicit
    *      non-default ports kept,
    *   3. empty path → "/",
    *   4. query params: tracking keys dropped (case-insensitive key
    *      match against `trackingParams`), survivors SORTED
    *      lexicographically (one canonical order), empty query → no
    *      "?",
    *   5. fragment dropped.
    *
    * Output per row: (id, ok, reason, url_canon, scheme, host, port,
    * registered_domain) — `reason` ∈ (no_scheme, no_host); `port` is
    * the canonical port (null when default/absent). Percent-encoding
    * normalization is deliberately out of scope (documented): it
    * needs a byte-level decoder, and crawl dedup keys tolerate it as
    * a distinct-key false negative, never a false merge. Pure
    * projection — zero shuffle, whole-stage codegen, 100 TB-safe by
    * construction. */
  def canonicalizeUrls(df: DataFrame, idCol: String, urlCol: String,
      trackingParams: Seq[String] = DefaultTrackingParams): DataFrame = {
    val url = coalesce(col(urlCol).cast("string"), lit(""))
    val scheme = lower(
      regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    val authority = regexp_extract(rest, "^([^/?#]*)", 1)
    val hostPort = element_at(split(authority, "@"), -1)
    val host = lower(regexp_extract(hostPort, "^([^:]*)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val pathQF = rest.substr(length(authority) + 1, length(rest))
    val path = regexp_extract(pathQF, "^([^?#]*)", 1)
    // the query sits strictly between the first '?' BEFORE any '#'
    // and the fragment — "/p#a?b" has no query
    val query = regexp_extract(pathQF, "^[^#?]*\\?([^#]*)", 1)
    val pathC = when(path === "", lit("/")).otherwise(path)
    val trackingArr = array(trackingParams.map(p => lit(p.toLowerCase)): _*)
    val params = filter(split(query, "&"),
      p => p =!= "" && !array_contains(trackingArr,
        lower(element_at(split(p, "="), 1))))
    val paramsSorted = array_sort(params)
    val queryC = when(size(paramsSorted) > 0,
      concat(lit("?"), array_join(paramsSorted, "&"))).otherwise(lit(""))
    val portC = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val ok = scheme =!= "" && host =!= ""
    val reason = when(scheme === "", lit("no_scheme"))
      .when(host === "", lit("no_host"))
    df.select(col(idCol), ok.as("ok"), reason.as("reason"),
      when(ok, concat(scheme, lit("://"), host, portC, pathC, queryC))
        .as("url_canon"),
      when(ok, scheme).as("scheme"),
      when(ok, host).as("host"),
      // ≤ 9 digits before the cast: an ANSI cast of a crafted
      // 12-digit "port" would THROW mid-scan instead of
      // dead-lettering; 9 digits < 2³¹ casts safely, anything longer
      // stays null (the canonical string keeps it verbatim either way)
      when(ok && portC =!= "" && port.rlike("^[0-9]{1,9}$"),
        port.cast("int")).as("port"),
      when(ok, registeredDomainCol(host)).as("registered_domain"))
  }

  /** URL-keyed exact dedup over a [[canonicalizeUrls]] frame: one row
    * per canonical URL occurring more than once — (url_canon, rep_id
    * = min id, n_copies). One map-side-combinable shuffle keyed on
    * the canonical string (the q25 exact-dedup shape); raw URLs never
    * join each other, only their normal forms. */
  def urlDupGroups(canon: DataFrame, idCol: String): DataFrame =
    canon.filter(col("ok"))
      .groupBy(col("url_canon"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("url_canon"), col("rep_id"), col("n_copies"))
}
