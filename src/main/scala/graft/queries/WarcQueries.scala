package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.WebExtract
import graft.sources.WarcSource
import QuerySpec.table

/** Batch 19 (round 19): the WARC container source (VERDICT r18
  * missing #1) — the link between crawl bytes and the existing WET →
  * C4 → dedup → langid chain. The fixture follows the q33/q129/q337
  * encode-half discipline: WARC files are BUILT from documents
  * arithmetic (one gzip member per record, ISO 28500), so every gate
  * oracle re-derives record attributes from doc_id formulas and the
  * record-split contract — the reader's marker walk, member
  * boundaries, and dead-letter lanes — is what the hash-exact
  * comparison pins. */
object WarcQueries {

  /** Records per fixture: doc_id mod 16 → 16 files; within a file,
    * records in doc_id order. Lanes (precedence = the reader's check
    * order): %23 → WARC version line clobbered (`bad_header`; the
    * gzip member is intact, so the NEXT records still decode — the
    * containment property); %29 → declared Content-Length overshoots
    * the payload by 1000 (`truncated`); %31 → payload padded past
    * the 2 KiB gate cap (`oversized`). */
  private val NFiles = 16
  private val GateMaxPayload = 2048L
  private val OversizePad = 3000

  private def htmlOf(id: Long, text: String): String = {
    val esc = text.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    s"<html><head><title>w $id</title><script>var w=$id;" +
      s"</script></head><body><p>$esc</p></body></html>"
  }

  private def targetOf(id: Long): String =
    s"HTTP://WWW.Host${id % 40}.example.com:80/d/$id" +
      s"?utm_source=w&x=${id % 7}#top"

  /** (file_id, data): the driver-visible construction — built inside
    * the query (500 docs at sf0.01 / 5000 at sf0.1 — millisecond
    * scale; a real deployment READS warc.gz, it does not build it). */
  private def warcFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents").select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .groupByKey(_._1 % NFiles)
      .mapGroups { (fid, it) =>
        val docs = it.toSeq.sortBy(_._1)
        val recs = docs.map { case (id, text) =>
          val pad =
            if (id % 23 != 0 && id % 29 != 0 && id % 31 == 0)
              "x" * OversizePad
            else ""
          val payload = (WarcSource.HttpHead + htmlOf(id, text) + pad)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          WarcSource.encodeWarcResponse(
            recordId = id.toString,
            targetUri = targetOf(id),
            payload = payload,
            declaredDelta =
              if (id % 23 != 0 && id % 29 == 0) 1000 else 0,
            clobberVersion = id % 23 == 0)
        }
        (fid, WarcSource.encodeWarcGz(recs))
      }
      .toDF("file_id", "data")
  }

  /** The fixture's derivation as DuckDB CTEs — ends in
    * `w(doc_id, text, file_id, rec_idx, reason, html)` where `reason`
    * is NULL on the ok lane. */
  private def warcDeriveSql: String =
    """w AS (SELECT doc_id, text,
      |    doc_id % 16 AS file_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id % 16
      |      ORDER BY doc_id) - 1 AS INTEGER) AS rec_idx,
      |    CASE WHEN doc_id % 23 = 0 THEN 'bad_header'
      |         WHEN doc_id % 29 = 0 THEN 'truncated'
      |         WHEN doc_id % 31 = 0 THEN 'oversized' END AS reason,
      |    '<html><head><title>w ' || doc_id ||
      |      '</title><script>var w=' || doc_id ||
      |      ';</script></head><body><p>' ||
      |      replace(replace(replace(text, '&', '&amp;'),
      |        '<', '&lt;'), '>', '&gt;') ||
      |      '</p></body></html>' AS html
      |  FROM documents)""".stripMargin

  private def targetSql: String =
    """'HTTP://WWW.Host' || (doc_id % 40) || '.example.com:80/d/' ||
      |      doc_id || '?utm_source=w&x=' || (doc_id % 7) || '#top'"""
      .stripMargin

  val all: Seq[QuerySpec] = Seq(

    // WARC record split + parse: gzip-member walk, WARC/1.x header
    // parse, Content-Length-bounded payload extraction, HTTP head
    // split — per record (file_id, rec_idx, ok, reason, warc_type,
    // target_uri, content_length, http_status, content_type, body).
    // The bad_header lane sits INSIDE files whose later records must
    // still decode (member containment — the property that makes
    // WARC.gz resumable); content_length re-derives bytewise from
    // the construction (HTTP head + html octet lengths + lane
    // deltas), so any slip in the reader's byte accounting moves a
    // committed column.
    QuerySpec("q353_warc_records",
      (s, dir) => WarcSource.records(s, warcFixture(s, dir),
          "file_id", "data", maxPayload = GateMaxPayload)
        .orderBy(col("file_id"), col("rec_idx")),
      Some(s"""WITH $warcDeriveSql,
        |p AS (SELECT *,
        |    ${WarcSource.HttpHead.length} +
        |      octet_length(encode(html)) AS base_len
        |  FROM w)
        |SELECT file_id, rec_idx, reason IS NULL AS ok, reason,
        |  CASE WHEN reason IS NULL THEN 'response' END AS warc_type,
        |  CASE WHEN reason IS NULL THEN $targetSql
        |    END AS target_uri,
        |  CAST(CASE WHEN reason = 'bad_header' THEN NULL
        |       WHEN reason = 'truncated' THEN base_len + 1000
        |       WHEN reason = 'oversized' THEN base_len + $OversizePad
        |       ELSE base_len END AS BIGINT) AS content_length,
        |  CAST(CASE WHEN reason IS NULL THEN 200 END AS INTEGER)
        |    AS http_status,
        |  CASE WHEN reason IS NULL THEN 'text/html' END
        |    AS content_type,
        |  CASE WHEN reason IS NULL THEN html END AS body
        |FROM p ORDER BY file_id, rec_idx""".stripMargin)),

    // WARC → WET chain: the records' HTML bodies through the r19
    // script-stripping extractText — crawl bytes to training text in
    // two operators. The planted per-doc <script> body must NOT
    // surface; the oracle replays construction AND extraction
    // character-for-character (the q130 chain, fed by the container
    // source instead of a column).
    QuerySpec("q354_warc_text_chain",
      (s, dir) => {
        val recs = WarcSource.records(s, warcFixture(s, dir),
            "file_id", "data", maxPayload = GateMaxPayload)
          .filter(col("ok"))
          .select(regexp_extract(col("target_uri"), "/d/([0-9]+)", 1)
            .cast("long").as("doc_id"), col("body"))
        WebExtract.extractText(recs, "doc_id", "body")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $warcDeriveSql
        |SELECT doc_id,
        |  regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(
        |      regexp_replace(regexp_replace(html,
        |        '${WebExtract.ScriptStylePattern}', ' ', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&amp;', '&'),
        |    '[ \t\n\r]+', ' ', 'g')) AS body_text,
        |  CAST(len(regexp_extract_all(html, 'href="([^"]*)"', 1))
        |    AS INTEGER) AS n_links
        |FROM w WHERE reason IS NULL ORDER BY doc_id""".stripMargin)),

    // WARC → URL canonicalization chain (the "q340's canonicalizer
    // gets real URLs" ask): the records' WARC-Target-URIs through
    // canonicalizeUrls — scheme/host case, default :80, utm param,
    // and fragment noise all collapse; registered_domain falls back
    // two-label (example.com is NOT a public suffix). Oracle =
    // the SHARED urlCanonSqlCtes replay over the same derived URIs.
    QuerySpec("q355_warc_url_chain",
      (s, dir) => {
        val recs = WarcSource.records(s, warcFixture(s, dir),
            "file_id", "data", maxPayload = GateMaxPayload)
          .filter(col("ok"))
          .select(regexp_extract(col("target_uri"), "/d/([0-9]+)", 1)
            .cast("long").as("doc_id"), col("target_uri"))
        WebExtract.canonicalizeUrls(recs, "doc_id", "target_uri")
          .select(col("doc_id"), col("url_canon"), col("scheme"),
            col("host"), col("registered_domain"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $warcDeriveSql,
        |uf AS (SELECT doc_id, $targetSql AS url
        |  FROM w WHERE reason IS NULL),
        |${WebCorpusQueries.urlCanonSqlCtes}
        |SELECT doc_id, url_canon, scheme, host, registered_domain
        |FROM cn ORDER BY doc_id""".stripMargin)),

    // robots.txt parse (r19, RFC 9309 §2.2): the fixture builds one
    // robots file per host from host-id arithmetic — CRLF endings,
    // comments, an empty Disallow (matches nothing), an ignored
    // Crawl-delay, multi-User-agent groups, and a host class with NO
    // specific group — and the parser must land the exact rule frame
    // the oracle re-derives from the same arithmetic (the encode-half
    // discipline: no SQL parsing, the CONSTRUCTION is the oracle).
    QuerySpec("q361_robots_parse",
      (s, dir) => WebExtract.parseRobots(
          robotsFixture(s, dir), "host", "robots")
        .orderBy(col("host"), col("rule_idx")),
      Some(s"""WITH hx AS (SELECT UNNEST(generate_series(0, 15)) AS h),
        |a0 AS (SELECT h, 0 AS group_idx, '*' AS agents,
        |    0 AS rule_idx, FALSE AS allow, '' AS path_prefix
        |  FROM hx WHERE h % 6 = 0),
        |a1 AS (SELECT h, 0, '*',
        |    CASE WHEN h % 6 = 0 THEN 1 ELSE 0 END, FALSE,
        |    '/private' || (h % 3) || '/' FROM hx),
        |a2 AS (SELECT h, 0, '*',
        |    CASE WHEN h % 6 = 0 THEN 2 ELSE 1 END, TRUE,
        |    '/private' || (h % 3) || '/pub' FROM hx),
        |a3 AS (SELECT h, 1, 'graftbot;otherbot',
        |    CASE WHEN h % 6 = 0 THEN 3 ELSE 2 END, FALSE,
        |    '/bot' || (h % 5) || '/' FROM hx WHERE h % 4 <> 0),
        |r AS (SELECT * FROM a0 UNION ALL SELECT * FROM a1
        |  UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3)
        |SELECT 'site' || h || '.example' AS host,
        |  CAST(group_idx AS INTEGER) AS group_idx, agents,
        |  CAST(rule_idx AS INTEGER) AS rule_idx, allow, path_prefix
        |FROM r ORDER BY host, rule_idx""".stripMargin)),

    // robots decision (r19, RFC 9309 §5): per URL, the longest-
    // path-match rule of the agent's group decides — the SPECIFIC
    // group fully shadows `*` (h % 4 ≠ 0 hosts ignore the wildcard
    // group's /private rule for graftbot), Allow wins length ties
    // (the /private/pub lane), no match → allowed. One host-keyed
    // join against file-bounded rules + one per-URL window: the
    // compliance filter shape a 100 TB crawl runs.
    QuerySpec("q362_robots_filter",
      (s, dir) => {
        val urls = table(s, dir, "documents").select(col("doc_id"),
          concat(lit("site"), pmod(col("doc_id"), lit(16)),
            lit(".example")).as("host"),
          robotsPathExpr(col("doc_id")).as("path"))
        WebExtract.robotsDecide(urls, "doc_id",
            WebExtract.parseRobots(robotsFixture(s, dir), "host",
              "robots"), "GraftBot")
          .orderBy(col("doc_id"))
      },
      Some("""WITH u AS (SELECT doc_id,
        |    'site' || (doc_id % 16) || '.example' AS host,
        |    doc_id % 16 AS h,
        |    CASE doc_id % 4
        |      WHEN 0 THEN '/private' || (doc_id % 16) % 3 ||
        |        '/x' || doc_id
        |      WHEN 1 THEN '/private' || (doc_id % 16) % 3 || '/pub/y'
        |      WHEN 2 THEN '/bot' || (doc_id % 16) % 5 || '/z'
        |      ELSE '/open/w' || doc_id END AS path
        |  FROM documents)
        |SELECT doc_id, host, path,
        |  CASE WHEN h % 4 = 0
        |    THEN doc_id % 4 <> 0
        |    ELSE doc_id % 4 <> 2 END AS allowed,
        |  CASE WHEN h % 4 = 0 AND doc_id % 4 = 0
        |      THEN '/private' || (h % 3) || '/'
        |    WHEN h % 4 = 0 AND doc_id % 4 = 1
        |      THEN '/private' || (h % 3) || '/pub'
        |    WHEN h % 4 <> 0 AND doc_id % 4 = 2
        |      THEN '/bot' || (h % 5) || '/'
        |  END AS matched_rule
        |FROM u ORDER BY doc_id""".stripMargin)),

    // The full crawl-compliance composition (r19): WARC records →
    // URL canonicalization → robots decision, ONE plan from crawl
    // bytes to the fetch-compliant URL set. Per-host robots re-allow
    // the /d/<first-digit-class> subtree under a blanket /d/
    // disallow, so the decision needs the canonicalized host AND the
    // longest-match window to land — the oracle replays target
    // derivation, canonical host/path, and the decision table from
    // doc_id arithmetic alone.
    QuerySpec("q365_warc_compliance_chain",
      (s, dir) => {
        val recs = WarcSource.records(s, warcFixture(s, dir),
            "file_id", "data", maxPayload = GateMaxPayload)
          .filter(col("ok"))
          .select(regexp_extract(col("target_uri"), "/d/([0-9]+)", 1)
            .cast("long").as("doc_id"), col("target_uri"))
        val canon = WebExtract.canonicalizeUrls(recs, "doc_id",
            "target_uri")
          .filter(col("ok"))
          .select(col("doc_id"), col("host"),
            regexp_extract(col("url_canon"),
              "^[a-z]+://[^/]+(/[^?#]*)", 1).as("path"))
        WebExtract.robotsDecide(canon, "doc_id",
            WebExtract.parseRobots(warcRobotsFixture(s, dir),
              "host", "robots"), "graftbot")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $warcDeriveSql,
        |u AS (SELECT doc_id,
        |    'www.host' || (doc_id % 40) || '.example.com' AS host,
        |    '/d/' || doc_id AS path,
        |    (doc_id % 40) % 4 AS k
        |  FROM w WHERE reason IS NULL)
        |SELECT doc_id, host, path,
        |  substr(CAST(doc_id AS VARCHAR), 1, 1) = CAST(k AS VARCHAR)
        |    AS allowed,
        |  CASE WHEN substr(CAST(doc_id AS VARCHAR), 1, 1) =
        |      CAST(k AS VARCHAR)
        |    THEN '/d/' || k ELSE '/d/' END AS matched_rule
        |FROM u ORDER BY doc_id""".stripMargin))
  )

  /** q365: the full crawl-compliance composition — container records
    * → canonical URLs → robots decision, in one plan. Declared here
    * so the three operators' fixtures stay the ONE source of truth:
    * the WARC fixture's target hosts (`www.hostN.example.com`) carry
    * robots built by the SAME per-host arithmetic as q361's, keyed on
    * N = doc_id % 40 this time, so the oracle replays target
    * derivation, canonicalization, and the decision table without
    * parsing a byte. */
  private def warcRobotsFixture(s: SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select(pmod(col("doc_id"), lit(40)).as("n")).distinct()
      .as[Long].map { n =>
        val sb = new StringBuilder
        sb ++= "User-agent: *\r\n"
        sb ++= s"Disallow: /d/\r\n"
        sb ++= s"Allow: /d/${n % 4}\r\n"
        (s"www.host$n.example.com", sb.toString)
      }.toDF("host", "robots")
  }

  /** One robots.txt per host (16 hosts = doc_id mod 16, sourced from
    * the documents table so every scale carries the same host set):
    * CRLF line endings, a comment, group 0 = `*` with an optional
    * empty Disallow (h ≡ 0 mod 6), /private<h%3>/ disallowed but its
    * /pub subtree re-allowed, an ignored Crawl-delay (h ≡ 0 mod 7);
    * group 1 = (graftbot, otherbot) disallowing /bot<h%5>/ — ABSENT
    * for h ≡ 0 mod 4, the class that proves wildcard fallback. */
  private def robotsFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select(pmod(col("doc_id"), lit(16)).as("h")).distinct()
      .as[Long].map { h =>
        val sb = new StringBuilder
        sb ++= "# graft robots fixture\r\n"
        sb ++= "User-agent: *\r\n"
        if (h % 6 == 0) sb ++= "Disallow:\r\n"
        sb ++= s"Disallow: /private${h % 3}/\r\n"
        sb ++= s"Allow: /private${h % 3}/pub\r\n"
        if (h % 7 == 0) sb ++= "Crawl-delay: 5\r\n"
        if (h % 4 != 0) {
          sb ++= "\r\n"
          sb ++= "User-agent: GraftBot\r\n"
          sb ++= "User-agent: OtherBot\r\n"
          sb ++= s"Disallow: /bot${h % 5}/\r\n"
        }
        (s"site$h.example", sb.toString)
      }.toDF("host", "robots")
  }

  /** The q362 URL-path formula (shared Spark/SQL construction). */
  private def robotsPathExpr(
      d: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = pmod(d, lit(16))
    when(pmod(d, lit(4)) === 0,
        concat(lit("/private"), pmod(h, lit(3)), lit("/x"), d))
      .when(pmod(d, lit(4)) === 1,
        concat(lit("/private"), pmod(h, lit(3)), lit("/pub/y")))
      .when(pmod(d, lit(4)) === 2,
        concat(lit("/bot"), pmod(h, lit(5)), lit("/z")))
      .otherwise(concat(lit("/open/w"), d))
  }
}
