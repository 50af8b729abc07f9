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
}
