package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Graph, Multimodal, Sketches, WebExtract, ZOrder}
import QuerySpec.table

/** Batch 14 (round 10, second leg): the corpus-boundary operators —
  * the portable mergeable HLL sketch (q127/q128), WAVE audio header
  * decode (q129, the audio half of the multimodal contract), and
  * HTML→text/link extraction (q130–q132, the WET stage that feeds
  * everything else, composed end-to-end into the link-graph quality
  * prior). Every gate is exact integer/string arithmetic, so every
  * oracle is hash-exact. */
object WebCorpusQueries {

  /** The q127 oracle — also q128's verbatim (merge ≡ rebuild is the
    * property under test, so the merged form must hash-match the
    * direct build). Mirrors [[graft.ops.Sketches.hllRegisters]]:
    * md5 lane hash, 2-hex bucket, 13-hex rank window, rho by
    * leading-zero-nibble string arithmetic. */
  private val hllRegistersSql: String =
    """WITH h AS (SELECT md5('hll:' || CAST(l_orderkey AS VARCHAR)) AS hx
      |  FROM lineitem WHERE l_orderkey IS NOT NULL),
      |b AS (SELECT CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) AS bucket,
      |    ltrim(substr(hx, 3, 13), '0') AS t FROM h),
      |r AS (SELECT bucket, CASE WHEN t = '' THEN 53
      |    ELSE 4 * (13 - length(t)) +
      |      CASE WHEN substr(t, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 1
      |           WHEN substr(t, 1, 1) IN ('4','5','6','7') THEN 2
      |           WHEN substr(t, 1, 1) IN ('2','3') THEN 3
      |           ELSE 4 END END AS rho FROM b)
      |SELECT CAST(bucket AS INTEGER) AS bucket,
      |  CAST(MAX(rho) AS INTEGER) AS rho_max
      |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Deterministic WAVE fixture from documents arithmetic (the q33
    * move: the encode half controls the bytes, so the oracle
    * re-derives every attribute from doc_id formulas). Lanes:
    * %11 → truncated (cut inside the RIFF descriptor), %13 →
    * bad_magic (first byte clobbered); truncation wins on overlap,
    * matching the CASE order in the oracle. */
  private def wavFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents").select(col("doc_id")).as[Long]
      .map { id =>
        val channels = 1 + (id % 2).toInt
        val rate = (id % 3) match {
          case 0 => 8000; case 1 => 16000; case _ => 44100 }
        val bits = 8 + 8 * ((id / 2) % 2).toInt
        val n = 1 + (id % 97).toInt
        val bytes = Multimodal.encodeWav(channels, rate, bits, n)
        val out =
          if (id % 11 == 0) bytes.take(10)
          else if (id % 13 == 0) { val c = bytes.clone(); c(0) = 'X'.toByte; c }
          else bytes
        (id, out)
      }
      .toDF("media_id", "media").withColumn("kind", lit("audio"))
  }

  /** Deterministic HTML wrapping of documents — markup the fixture
    * controls, so the oracle replays BOTH the construction and the
    * extraction. Text is entity-escaped on the way in (& < > — the
    * same three the extractor's unescape step reverses); every doc
    * links to (7·id+3) mod 101, every fourth also to (13·id+5)
    * mod 101 — a deterministic host-graph shape for q132. r19: the
    * head plants a `<style>` block and a doc_id-bearing `<script>`,
    * the body a `<noscript>` — bodies the extractor must REMOVE
    * (VERDICT r18 wrong #2), so their survival anywhere in
    * body_text fails the gate. */
  private def htmlFixture(s: SparkSession, dir: String): DataFrame = {
    val esc = replace(replace(replace(col("text"),
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    table(s, dir, "documents").select(col("doc_id"), concat(
      lit("<html><head><title>doc "), col("doc_id"),
      lit("</title><style>p{margin:0;}</style><script>var g="),
      col("doc_id"),
      lit(";</script></head><body><h1>"), col("source"), lit("</h1><p>"),
      esc,
      lit("</p><a href=\"https://corp.example/d/"),
      pmod(col("doc_id") * 7 + 3, lit(101)), lit("\">n1</a> "),
      when(pmod(col("doc_id"), lit(4)) === 0,
        concat(lit("<a href=\"https://corp.example/d/"),
          pmod(col("doc_id") * 13 + 5, lit(101)), lit("\">n2</a>")))
        .otherwise(lit("")),
      lit("<noscript>js off "), col("doc_id"),
      lit("</noscript></body></html>")).as("html"))
  }

  /** The htmlFixture construction as a DuckDB CTE (shared by
    * q130/q131/q132 — one definition, the gates can't drift). */
  private val htmlFixtureSql: String =
    """hx AS (SELECT doc_id,
      |  '<html><head><title>doc ' || doc_id ||
      |  '</title><style>p{margin:0;}</style><script>var g=' || doc_id ||
      |  ';</script></head><body><h1>' || source || '</h1><p>' ||
      |  replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'),
      |          '>', '&gt;') ||
      |  '</p><a href="https://corp.example/d/' ||
      |  (doc_id * 7 + 3) % 101 || '">n1</a> ' ||
      |  CASE WHEN doc_id % 4 = 0
      |       THEN '<a href="https://corp.example/d/' ||
      |            (doc_id * 13 + 5) % 101 || '">n2</a>'
      |       ELSE '' END ||
      |  '<noscript>js off ' || doc_id || '</noscript></body></html>'
      |    AS html FROM documents)""".stripMargin

  /** The q142 EDJoin oracle chain (fixture construction + gram/
    * frequency pruning + levenshtein verify), shared verbatim with
    * q182's entity-resolution closure so the two cannot drift.
    * `ver` is the verified candidate frame (probe_id, p_partkey,
    * dist). */
  private[queries] val edjoinPairsCtes: String =
    """ent AS (SELECT p_name, MIN(p_partkey) AS p_partkey
      |  FROM part WHERE length(p_name) >= 8 GROUP BY 1),
      |pr AS (SELECT p_partkey + 1000000 AS probe_id,
      |    CASE WHEN p_partkey % 3 = 0
      |         THEN substr(p_name, 1, 3) || '#' || substr(p_name, 5)
      |         ELSE p_name END AS probe_name FROM ent),
      |lgi AS (SELECT probe_id AS lid, probe_name AS ls,
      |    UNNEST(generate_series(1, length(probe_name) - 2)) AS i
      |  FROM pr WHERE length(probe_name) >= 7),
      |lgr AS (SELECT DISTINCT lid, ls,
      |    substr(ls, CAST(i AS INTEGER), 3) AS g FROM lgi),
      |rgi AS (SELECT p_partkey AS rid, p_name AS rs,
      |    UNNEST(generate_series(1, length(p_name) - 2)) AS i
      |  FROM ent WHERE length(p_name) >= 7),
      |rgr AS (SELECT DISTINCT rid, rs,
      |    substr(rs, CAST(i AS INTEGER), 3) AS g FROM rgi),
      |fr AS (SELECT g, COUNT(*) AS f FROM (
      |    SELECT g FROM lgr UNION ALL SELECT g FROM rgr) GROUP BY 1),
      |lpf AS (SELECT lid, ls, g FROM (
      |    SELECT lgr.*, fr.f, ROW_NUMBER() OVER (PARTITION BY lid
      |      ORDER BY fr.f, lgr.g) AS rk FROM lgr JOIN fr USING (g))
      |  WHERE rk <= 4),
      |rpf AS (SELECT rid, rs, g FROM (
      |    SELECT rgr.*, fr.f, ROW_NUMBER() OVER (PARTITION BY rid
      |      ORDER BY fr.f, rgr.g) AS rk FROM rgr JOIN fr USING (g))
      |  WHERE rk <= 4),
      |cand AS (SELECT DISTINCT lid, ls, rid, rs FROM lpf JOIN rpf USING (g)),
      |ver AS (SELECT lid AS probe_id, rid AS p_partkey,
      |    CAST(levenshtein(ls, rs) AS INTEGER) AS dist
      |  FROM cand WHERE abs(length(ls) - length(rs)) <= 1)""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    // Portable HyperLogLog register table (p=8) over the order keys:
    // md5 lane hash → bucket + leading-zero rank, every step
    // integer/string arithmetic, so the full register state is
    // hash-exact against DuckDB. Unlike q49's opaque HLL++ gate this
    // sketch is persistable, engine-independent, and mergeable.
    QuerySpec("q127_hll_registers",
      (s, dir) => Sketches.hllRegisters(
          table(s, dir, "lineitem"), "l_orderkey")
        .orderBy(col("bucket")),
      Some(hllRegistersSql)),

    // Merge ≡ rebuild: registers built on the two l_orderkey parity
    // halves and max-merged must hash-match the direct build over the
    // whole table (the oracle IS q127's direct-build SQL). This is
    // the property that makes the sketch an appendable state frame —
    // absorb an ingest batch with a 256-row max-merge, never rescan.
    QuerySpec("q128_hll_merge",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        Sketches.hllMerge(
            Sketches.hllRegisters(
              li.filter(pmod(col("l_orderkey"), lit(2)) === 0), "l_orderkey"),
            Sketches.hllRegisters(
              li.filter(pmod(col("l_orderkey"), lit(2)) === 1), "l_orderkey"))
          .orderBy(col("bucket"))
      },
      Some(hllRegistersSql)),

    // Production-speed HLL twin of q127 (VERDICT r10 #2, the q27→q70
    // pattern reversed): same register layout and estimate machinery,
    // lane from one compiled xxhash64 kernel instead of an md5 hex
    // string — the form a 100 TB scan runs. Rows-only: DuckDB has no
    // xxhash64; WebCorpusSpec pins the estimate to the same accuracy
    // band as the q127 portable registers.
    QuerySpec("q187_hll_fast",
      (s, dir) => Sketches.hllRegistersFast(
          table(s, dir, "lineitem"), "l_orderkey")
        .orderBy(col("bucket")),
      None,
      rowsOnlyReason = Some("xxhash64 lane hashes have no DuckDB " +
        "equivalent; the register layout/merge/estimate logic is " +
        "hash-exact-proven by the md5-portable twin q127_hll_registers, " +
        "and WebCorpusSpec gates the two estimates to the same band")),

    // Multimodal audio: REAL RIFF/WAVE header decode (canonical PCM
    // layout — RIFF descriptor, fmt chunk with internal-consistency
    // checks, data chunk) over payloads built by the spec-conformant
    // encode half. The oracle never parses bytes: every attribute
    // (and both dead-letter lanes) re-derives from the fixture's
    // doc_id arithmetic. duration_micros is integer floor, so it is
    // engine-exact.
    QuerySpec("q129_audio_features",
      (s, dir) => Multimodal.wavHeaders(s, wavFixture(s, dir))
        .orderBy(col("media_id")),
      Some("""WITH p AS (SELECT doc_id,
        |    doc_id % 11 <> 0 AND doc_id % 13 <> 0 AS ok,
        |    CASE WHEN doc_id % 11 = 0 THEN 'truncated'
        |         WHEN doc_id % 13 = 0 THEN 'bad_magic' END AS reason,
        |    CAST(1 + doc_id % 2 AS INTEGER) AS ch,
        |    CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |         ELSE 44100 END AS INTEGER) AS rate,
        |    CAST(8 + 8 * ((doc_id // 2) % 2) AS INTEGER) AS bits,
        |    CAST(1 + doc_id % 97 AS BIGINT) AS n
        |  FROM documents)
        |SELECT doc_id AS media_id, ok, reason,
        |  CASE WHEN ok THEN ch END AS channels,
        |  CASE WHEN ok THEN rate END AS sample_rate,
        |  CASE WHEN ok THEN bits END AS bits_per_sample,
        |  CASE WHEN ok THEN n END AS n_samples,
        |  CASE WHEN ok THEN (n * 1000000) // rate END AS duration_micros
        |FROM p ORDER BY media_id""".stripMargin)),

    // Byte-level EXACT media dedup (r15): content-identity groups of
    // the WAV fixture's binary column, keyed (md5, length) so the
    // payload never crosses the wire. The oracle never hashes bytes:
    // the fixture's payload is a PURE FUNCTION of its doc_id-derived
    // attributes, so byte-equality classes re-derive as attribute
    // tuples per lane — ok/bad_magic files are byte-equal iff
    // (channels, rate, bits, n) match (bad_magic only clobbers byte
    // 0, same for all), truncated files (first 10 bytes = RIFF tag +
    // size + 'WA') iff their RIFF size — i.e. dataSize — matches.
    // n_bytes (10 truncated, 44 + dataSize otherwise) rides along as
    // the byte-identity cross-check.
    QuerySpec("q283_media_dedup_exact",
      (s, dir) => Multimodal.mediaDedupExact(
          wavFixture(s, dir), "media_id", "media")
        .orderBy(col("rep_media_id")),
      Some("""WITH a AS (SELECT doc_id,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS ch,
        |    CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |         ELSE 44100 END AS BIGINT) AS rate,
        |    CAST(8 + 8 * ((doc_id // 2) % 2) AS BIGINT) AS bits,
        |    CAST(1 + doc_id % 97 AS BIGINT) AS n
        |  FROM documents),
        |k AS (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0
        |      THEN 't:' || CAST(n * ch * (bits // 8) AS VARCHAR)
        |      WHEN doc_id % 13 = 0
        |      THEN 'x:' || CAST(ch AS VARCHAR) || ':' ||
        |        CAST(rate AS VARCHAR) || ':' || CAST(bits AS VARCHAR)
        |        || ':' || CAST(n AS VARCHAR)
        |      ELSE 'o:' || CAST(ch AS VARCHAR) || ':' ||
        |        CAST(rate AS VARCHAR) || ':' || CAST(bits AS VARCHAR)
        |        || ':' || CAST(n AS VARCHAR) END AS grp,
        |    CASE WHEN doc_id % 11 = 0 THEN 10
        |      ELSE 44 + n * ch * (bits // 8) END AS nb
        |  FROM a)
        |SELECT MIN(doc_id) AS rep_media_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_copies,
        |  CAST(MIN(nb) AS INTEGER) AS n_bytes
        |FROM k GROUP BY grp ORDER BY rep_media_id""".stripMargin)),

    // WET extraction: script/style/noscript ELEMENTS removed content
    // and all (r19 — the fixture's planted JS/CSS/noscript bodies
    // must NOT surface), remaining tags → space, predefined entities
    // unescaped (&amp; last), whitespace collapsed. The fixture
    // escaped the text on the way in, so extraction must return it
    // verbatim inside the assembled page text — the oracle replays
    // construction AND extraction character-for-character.
    QuerySpec("q130_html_extract",
      (s, dir) => WebExtract.extractText(htmlFixture(s, dir), "doc_id", "html")
        .orderBy(col("doc_id")),
      Some(s"""WITH $htmlFixtureSql
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
        |  CAST(len(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS INTEGER)
        |    AS n_links
        |FROM hx ORDER BY doc_id""".stripMargin)),

    // Link extraction in document order — the edge-list half of WET.
    QuerySpec("q131_link_extract",
      (s, dir) => WebExtract.extractLinks(htmlFixture(s, dir), "doc_id", "html")
        .orderBy(col("doc_id"), col("link_pos")),
      Some(s"""WITH $htmlFixtureSql,
        |lx AS (SELECT doc_id,
        |    UNNEST(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href,
        |    CAST(generate_subscripts(
        |      regexp_extract_all(html, 'href="([^"]*)"', 1), 1) - 1
        |      AS INTEGER) AS link_pos
        |  FROM hx)
        |SELECT doc_id, link_pos, href FROM lx
        |ORDER BY doc_id, link_pos""".stripMargin)),

    // End-to-end: HTML → href edges → integer-micro PageRank (2
    // iterations) — the crawl-to-quality-prior composition (extract
    // with q131's machinery, rank with q125's). The oracle replays
    // extraction, target parsing, and the full unrolled rank update.
    QuerySpec("q132_link_rank",
      (s, dir) => {
        val edges = WebExtract.extractLinks(htmlFixture(s, dir), "doc_id", "html")
          .select(col("doc_id").as("src"),
            regexp_extract(col("href"), "([0-9]+)$", 1).cast("long").as("dst"))
        Graph.pageRankMicro(edges, "src", "dst", iters = 2)
          .orderBy(col("id"))
      },
      Some {
        def iter(i: Int, prev: String): String =
          s"""m$i AS (SELECT e.dst AS id, SUM(r.rank_micro // d.deg) AS m
             |  FROM e JOIN $prev r ON r.id = e.src
             |  JOIN dg d ON d.src = e.src GROUP BY 1),
             |r$i AS (SELECT n.id,
             |    CAST(150000 + (85 * COALESCE(m$i.m, 0)) // 100 AS BIGINT)
             |      AS rank_micro
             |  FROM n LEFT JOIN m$i USING (id))""".stripMargin
        s"""WITH $htmlFixtureSql,
           |e AS (SELECT DISTINCT doc_id AS src,
           |    CAST(regexp_extract(href, '([0-9]+)$$', 1) AS BIGINT) AS dst
           |  FROM (SELECT doc_id,
           |      UNNEST(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
           |    FROM hx)),
           |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
           |dg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
           |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank_micro FROM n),
           |${(1 to 2).map(i => iter(i, s"r${i - 1}")).mkString(",\n")}
           |SELECT id, rank_micro FROM r2 ORDER BY id""".stripMargin
      }),

    // Count-Min counter matrix (Cormode 2005) over l_suppkey
    // occurrences: md5 lane hash per depth row, exact integer counts —
    // the frequency dual of the q127 HLL, hash-exact and additive.
    QuerySpec("q133_cms_sketch",
      (s, dir) => Sketches.cmsSketch(
          table(s, dir, "lineitem")
            .filter(col("l_orderkey") % 4 === 0), "l_suppkey")
        .orderBy(col("r"), col("pos")),
      Some {
        val rows = (0 until 4).map { r =>
          s"""SELECT $r AS r,
             |  CAST(CAST(('0x' || substr(md5('cms$r:' || key), 1, 15))
             |    AS BIGINT) % 256 AS INTEGER) AS pos FROM k""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH k AS (SELECT CAST(l_suppkey AS VARCHAR) AS key FROM lineitem
           |  WHERE l_suppkey IS NOT NULL AND l_orderkey % 4 = 0),
           |h AS ($rows)
           |SELECT r, pos, COUNT(*) AS cnt FROM h GROUP BY 1, 2
           |ORDER BY r, pos""".stripMargin
      }),

    // CMS point estimates for every distinct supplier, gated against
    // the exact frequencies: est = min over depth cells, and the
    // defining one-sided guarantee (never undercounts) is emitted as
    // a column the oracle re-derives — collisions at width 256 with
    // ~|suppliers| keys make some estimates exceed truth, which is
    // exactly what the sketch contract permits.
    QuerySpec("q134_cms_estimate",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
          .filter(col("l_orderkey") % 4 === 0)
        val est = Sketches.cmsEstimate(
          Sketches.cmsSketch(li, "l_suppkey"), li, "l_suppkey")
        li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("true_cnt"))
          .join(est, Seq("l_suppkey"))
          .select(col("l_suppkey"), col("true_cnt"), col("est_cnt"),
            (col("est_cnt") >= col("true_cnt")).as("no_undercount"))
          .orderBy(col("l_suppkey"))
      },
      Some {
        val rows = (0 until 4).map { r =>
          s"""SELECT key, $r AS r,
             |  CAST(CAST(('0x' || substr(md5('cms$r:' || key), 1, 15))
             |    AS BIGINT) % 256 AS INTEGER) AS pos FROM k""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH k AS (SELECT l_suppkey, CAST(l_suppkey AS VARCHAR) AS key
           |  FROM lineitem
           |  WHERE l_suppkey IS NOT NULL AND l_orderkey % 4 = 0),
           |h AS ($rows),
           |cells AS (SELECT r, pos, COUNT(*) AS cnt FROM h GROUP BY 1, 2),
           |probe AS (SELECT DISTINCT key, r, pos FROM h),
           |est AS (SELECT p.key, MIN(c.cnt) AS est_cnt
           |  FROM probe p JOIN cells c USING (r, pos) GROUP BY p.key),
           |tc AS (SELECT l_suppkey, key, COUNT(*) AS true_cnt FROM k
           |  GROUP BY 1, 2)
           |SELECT tc.l_suppkey, tc.true_cnt, est.est_cnt,
           |  est.est_cnt >= tc.true_cnt AS no_undercount
           |FROM tc JOIN est USING (key) ORDER BY tc.l_suppkey""".stripMargin
      }),

    // Production-speed CMS twin of q133+q134 in one gate: the
    // Kirsch–Mitzenmacher xxhash64 kernel builds the counter matrix
    // (one hash per row vs four md5 hex strings) and the same probe
    // checks every supplier's estimate against its exact count.
    // Rows-only (no xxhash64 in DuckDB); the one-sided no-undercount
    // invariant and the error band are gated in WebCorpusSpec, and
    // the cell/probe LOGIC is hash-exact-proven by the md5 twins.
    QuerySpec("q188_cms_fast",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val est = Sketches.cmsEstimateFast(
          Sketches.cmsSketchFast(li, "l_suppkey"), li, "l_suppkey")
        li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("true_cnt"))
          .join(est, Seq("l_suppkey"))
          .select(col("l_suppkey"), col("true_cnt"), col("est_cnt"),
            (col("est_cnt") >= col("true_cnt")).as("no_undercount"))
          .orderBy(col("l_suppkey"))
      },
      None,
      rowsOnlyReason = Some("xxhash64 lane hashes have no DuckDB " +
        "equivalent; the cell/probe/min-estimate logic is " +
        "hash-exact-proven by the md5-portable twins q133_cms_sketch/" +
        "q134_cms_estimate, and WebCorpusSpec gates the no-undercount " +
        "invariant and error band of this fast form")),

    // CMS inner product (Cormode 2005 §4.3): per-depth dot products
    // of the orders.o_custkey and customer.c_custkey frequency
    // matrices — min over depth = the equi-join SIZE estimate, never
    // under the true |orders ⋈ customer|. Width is sized to the
    // estimate's error term ε·ΣfA·ΣfB (Cormode §4.3): 4096 here puts
    // the collision inflation at ~⅓ of the true join size, where the
    // point-query default 256 would be 6× useless — the sizing rule
    // IS part of the operator. Pure integer arithmetic end to end, so
    // the oracle replays both matrix builds and the products
    // hash-exactly.
    QuerySpec("q193_cms_join_size",
      (s, dir) => Sketches.cmsInnerProductByDepth(
          Sketches.cmsSketch(table(s, dir, "orders"), "o_custkey",
            depth = 4, width = 4096),
          Sketches.cmsSketch(table(s, dir, "customer"), "c_custkey",
            depth = 4, width = 4096))
        .orderBy(col("r")),
      Some {
        def arms(src: String) = (0 until 4).map { r =>
          s"""SELECT $r AS r,
             |  CAST(CAST(('0x' || substr(md5('cms$r:' || key), 1, 15))
             |    AS BIGINT) % 4096 AS INTEGER) AS pos FROM $src""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH ka AS (SELECT CAST(o_custkey AS VARCHAR) AS key
           |  FROM orders WHERE o_custkey IS NOT NULL),
           |kb AS (SELECT CAST(c_custkey AS VARCHAR) AS key
           |  FROM customer WHERE c_custkey IS NOT NULL),
           |ha AS (${arms("ka")}),
           |hb AS (${arms("kb")}),
           |ma AS (SELECT r, pos, COUNT(*) AS cnt_a FROM ha GROUP BY 1, 2),
           |mb AS (SELECT r, pos, COUNT(*) AS cnt_b FROM hb GROUP BY 1, 2)
           |SELECT r, CAST(SUM(cnt_a * cnt_b) AS BIGINT) AS dot
           |FROM ma JOIN mb USING (r, pos)
           |GROUP BY r ORDER BY r""".stripMargin
      }),

    // Production-speed twin of q193 (the q187/q188 convention): the
    // SAME layout-agnostic inner-product op over cmsSketchFast
    // xxhash64 matrices — the form a 100 TB planner probe runs
    // (the md5 matrix build is q193's entire cost; this one is
    // sketch-build-bound at xxhash64 speed).
    QuerySpec("q195_cms_join_size_fast",
      (s, dir) => Sketches.cmsInnerProductByDepth(
          Sketches.cmsSketchFast(table(s, dir, "orders"), "o_custkey",
            depth = 4, width = 4096),
          Sketches.cmsSketchFast(table(s, dir, "customer"), "c_custkey",
            depth = 4, width = 4096))
        .orderBy(col("r")),
      None,
      rowsOnlyReason = Some("xxhash64 lane hashes have no DuckDB " +
        "equivalent; the inner-product arithmetic is hash-exact-proven " +
        "by the md5-portable twin q193_cms_join_size (the op is " +
        "layout-agnostic and shared verbatim), and WebCorpusSpec gates " +
        "the never-undercount invariant and band on fast matrices")),

    // Production-speed twin of q167 (grouped HLL): one xxhash64
    // register table PER SUPPLIER, identical (group, bucket, rho_max)
    // layout and per-group register-wise-max merge — the last-but-one
    // cell of the fast-twin matrix (ungrouped HLL/CMS r10, this pair
    // closes the grouped row, VERDICT r11 missing #3).
    QuerySpec("q198_hll_grouped_fast",
      (s, dir) => Sketches.hllRegistersByFast(
          table(s, dir, "lineitem"), Seq("l_suppkey"), "l_orderkey")
        .orderBy(col("l_suppkey"), col("bucket")),
      None,
      rowsOnlyReason = Some("xxhash64 lane hashes have no DuckDB " +
        "equivalent; the grouped register layout/merge logic is " +
        "hash-exact-proven by the md5-portable twin q167_hll_grouped " +
        "(same groupBy path, lane swapped), and WebCorpusSpec gates " +
        "per-group merge≡rebuild and the per-group estimate band " +
        "against the md5 registers")),

    // Production-speed twin of q186 (grouped CMS): one xxhash64
    // counter matrix per return flag, identical (group, r, pos, cnt)
    // layout and per-group cell-wise-sum merge — completes the
    // fast-twin matrix.
    QuerySpec("q199_cms_grouped_fast",
      (s, dir) => Sketches.cmsSketchByFast(
          table(s, dir, "lineitem"), Seq("l_returnflag"), "l_suppkey",
          depth = 2, width = 64)
        .orderBy(col("l_returnflag"), col("r"), col("pos")),
      None,
      rowsOnlyReason = Some("xxhash64 lane hashes have no DuckDB " +
        "equivalent; the grouped counter layout/merge logic is " +
        "hash-exact-proven by the md5-portable twin q186_cms_grouped " +
        "(same groupBy path, lane swapped), and WebCorpusSpec gates " +
        "per-group merge≡rebuild and the per-group no-undercount " +
        "invariant against exact counts")),

    // HLL set algebra: the "how many ids appear in BOTH corpora"
    // question answered from ≤ 3·256 rows of register state, no join.
    // A = orderkeys with a returned item, B = orderkeys with a
    // non-returned 'R'-flag item; the union registers come from
    // hllMerge (lossless max, q128-proven ≡ direct build, which is
    // exactly what the oracle computes). Emits the q189-style integer
    // sufficient statistics per set — hash-exact in DuckDB — from
    // which hllEstimateFromStats and the inclusion–exclusion
    // intersection estimate derive (WebCorpusSpec pins both paths and
    // the band vs the exact intersection).
    QuerySpec("q192_hll_intersect",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val a = Sketches.hllRegisters(
          li.filter(col("l_returnflag") === "A"), "l_orderkey")
        val b = Sketches.hllRegisters(
          li.filter(col("l_returnflag") === "R"), "l_orderkey")
        Sketches.hllStats(a, "a")
          .unionByName(Sketches.hllStats(b, "b"))
          .unionByName(Sketches.hllStats(Sketches.hllMerge(a, b), "union"))
          .orderBy(col("set_name"))
      },
      Some {
        val laneArms = Seq(
          "a" -> "l_returnflag = 'A'",
          "b" -> "l_returnflag = 'R'",
          "union" -> "l_returnflag IN ('A', 'R')").map { case (nm, w) =>
          s"""SELECT '$nm' AS set_name,
             |    md5('hll:' || CAST(l_orderkey AS VARCHAR)) AS hx
             |  FROM lineitem WHERE $w AND l_orderkey IS NOT NULL""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH lv AS ($laneArms),
           |b AS (SELECT set_name,
           |    CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) AS bucket,
           |    ltrim(substr(hx, 3, 13), '0') AS t FROM lv),
           |r AS (SELECT set_name, bucket, CASE WHEN t = '' THEN 53
           |    ELSE 4 * (13 - length(t)) +
           |      CASE WHEN substr(t, 1, 1) IN
           |             ('8','9','a','b','c','d','e','f') THEN 1
           |           WHEN substr(t, 1, 1) IN ('4','5','6','7') THEN 2
           |           WHEN substr(t, 1, 1) IN ('2','3') THEN 3
           |           ELSE 4 END END AS rho FROM b),
           |regs AS (SELECT set_name, bucket, MAX(rho) AS rho_max
           |  FROM r GROUP BY 1, 2)
           |SELECT set_name,
           |  CAST(COUNT(*) AS INTEGER) AS nd_buckets,
           |  CAST(SUM(CAST(1 AS BIGINT) << (53 - rho_max)) AS BIGINT)
           |    AS nd_s53
           |FROM regs GROUP BY 1
           |ORDER BY set_name""".stripMargin
      }),

    // Fixed-bin integer histogram of price cents over [0, 110000.00):
    // bin = (cents·256) div range, exact integer — the deterministic
    // quantile sketch (q49 gates the engine-private approx forms; this
    // one is hash-exact and additive under union).
    QuerySpec("q135_hist_sketch",
      (s, dir) => Sketches.histSketch(
          table(s, dir, "lineitem")
            .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long")
              .as("cents")),
          "cents", lo = 0L, hi = 11000000L, bins = 256)
        .orderBy(col("bin")),
      Some("""WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
        |    AS BIGINT) AS cents
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (SELECT LEAST(255, GREATEST(0, (cents * 256) // 11000000))
        |    AS bin FROM c)
        |SELECT CAST(bin AS INTEGER) AS bin, COUNT(*) AS cnt FROM b
        |GROUP BY 1 ORDER BY bin""".stripMargin)),

    // Quantile bins reconstructed from the histogram: first bin whose
    // cumulative count reaches ceil(p·N/1000), with floor-arithmetic
    // value edges — error bounded by one bin width by construction,
    // and every step integer, so p50/p90/p99 are hash-exact.
    QuerySpec("q136_hist_quantiles",
      (s, dir) => Sketches.histQuantileBins(
          Sketches.histSketch(
            table(s, dir, "lineitem")
              .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long")
                .as("cents")),
            "cents", lo = 0L, hi = 11000000L, bins = 256),
          lo = 0L, hi = 11000000L, bins = 256, pMillis = Seq(500, 900, 990))
        .orderBy(col("p_milli")),
      Some("""WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
        |    AS BIGINT) AS cents
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (SELECT LEAST(255, GREATEST(0, (cents * 256) // 11000000))
        |    AS bin FROM c),
        |hist AS (SELECT bin, COUNT(*) AS cnt FROM b GROUP BY 1),
        |cum AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM hist),
        |t AS (SELECT SUM(cnt) AS total FROM hist),
        |p AS (SELECT UNNEST([500, 900, 990]) AS p_milli),
        |tgt AS (SELECT p_milli, (p_milli * total + 999) // 1000 AS target
        |  FROM p CROSS JOIN t),
        |q AS (SELECT p_milli, MIN(bin) AS bin FROM tgt
        |  JOIN cum ON cum.cum >= tgt.target GROUP BY 1)
        |SELECT CAST(p_milli AS INTEGER) AS p_milli, CAST(bin AS INTEGER) AS bin,
        |  (CAST(bin AS BIGINT) * 11000000) // 256 AS lo_val,
        |  (CAST(bin + 1 AS BIGINT) * 11000000) // 256 AS hi_val
        |FROM q ORDER BY p_milli""".stripMargin)),

    // Z-order layout: Morton-interleave two bucketed dimensions and
    // report each Z-curve segment's envelope — every 2^14-code bucket
    // must cover a NARROW range of BOTH dims at once (the property
    // that makes a zordered write prunable on either column; the spec
    // measures the pruning win against a hash layout). Pure bit
    // arithmetic, so the whole tiling is hash-exact.
    QuerySpec("q139_zorder",
      (s, dir) => {
        val a = pmod(col("l_partkey"), lit(1024L))
        val b = pmod(col("l_suppkey"), lit(1024L))
        table(s, dir, "lineitem")
          .select(a.as("pa"), b.as("sb"),
            ZOrder.mortonCode(a, b, bits = 10).as("z"))
          .withColumn("zbucket", expr("z div 16384"))
          .groupBy(col("zbucket"))
          .agg(count(lit(1)).as("n"),
            min(col("pa")).as("min_a"), max(col("pa")).as("max_a"),
            min(col("sb")).as("min_b"), max(col("sb")).as("max_b"))
          .orderBy(col("zbucket"))
      },
      Some {
        val zExpr = (0 until 10).map { i =>
          s"((((pa >> $i) & 1) << ${2 * i}) | (((sb >> $i) & 1) << ${2 * i + 1}))"
        }.mkString(" | ")
        s"""WITH d AS (SELECT l_partkey % 1024 AS pa, l_suppkey % 1024 AS sb
           |  FROM lineitem),
           |zc AS (SELECT pa, sb, ($zExpr) AS z FROM d)
           |SELECT z // 16384 AS zbucket, COUNT(*) AS n,
           |  MIN(pa) AS min_a, MAX(pa) AS max_a,
           |  MIN(sb) AS min_b, MAX(sb) AS max_b
           |FROM zc GROUP BY 1 ORDER BY zbucket""".stripMargin
      }),

    // Column profiling (the ANALYZE surface): per-column counts,
    // nulls, distincts, native-type min/max — ONE scan for all six
    // columns (multi-aggregate + unpivot), engine-divergent types
    // pre-shaped (price → cents, timestamp → ISO string, which sorts
    // chronologically).
    QuerySpec("q140_profile",
      // Scans.spread measured SLOWER here (1.40 -> 2.0-2.3 s, r19):
      // the distinct-profile Expand emits near-distinct keys, so the
      // single-task partial agg collapses everything pre-shuffle,
      // while 32-way partials ship ~6x the bytes - left unspread
      (s, dir) => {
        val o = table(s, dir, "orders")
          .filter(col("o_orderkey") % 4 === 0)
          .select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("o_totalprice_cents"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
          col("o_orderpriority"))
        graft.ops.Profile.profile(o, Seq("o_orderkey", "o_custkey",
            "o_orderstatus", "o_totalprice_cents", "o_orderdate_s",
            "o_orderpriority"))
          .orderBy(col("col_name"))
      },
      Some {
        val colsSql = Seq(
          "o_orderkey" -> "o_orderkey",
          "o_custkey" -> "o_custkey",
          "o_orderstatus" -> "o_orderstatus",
          "o_totalprice_cents" ->
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)",
          "o_orderdate_s" -> "strftime(o_orderdate, '%Y-%m-%d')",
          "o_orderpriority" -> "o_orderpriority")
        colsSql.map { case (name, e) =>
          s"""SELECT '$name' AS col_name, COUNT(*) AS n,
             |  COUNT($e) AS n_nonnull, COUNT(DISTINCT $e) AS n_distinct,
             |  CAST(MIN($e) AS VARCHAR) AS min_s,
             |  CAST(MAX($e) AS VARCHAR) AS max_s
             |FROM orders WHERE o_orderkey % 4 = 0""".stripMargin
        }.mkString("\nUNION ALL\n") + "\nORDER BY col_name"
      }),

    // Sketch-profile twin of q140 (VERDICT r10 #3): exact counts/
    // min/max from ONE no-distinct aggregate — PlanSpec asserts the
    // Expand that multiplies rows ×columns in the exact form is GONE —
    // and distinctness as per-column HLL register statistics
    // (occupied buckets + the 2^53-scaled harmonic sum, both exact
    // integers, so the md5-portable lane is hash-exact in DuckDB).
    // q140 stays the exact oracle gate; this is the plan you'd run at
    // 100×.
    QuerySpec("q189_profile_approx",
      (s, dir) => {
        val o = table(s, dir, "orders").select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("o_totalprice_cents"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
          col("o_orderpriority"))
        graft.ops.Profile.profileApproxStats(o, Seq("o_orderkey",
            "o_custkey", "o_orderstatus", "o_totalprice_cents",
            "o_orderdate_s", "o_orderpriority"), portable = true)
          .orderBy(col("col_name"))
      },
      Some {
        val colsSql = Seq(
          "o_orderkey" -> "o_orderkey",
          "o_custkey" -> "o_custkey",
          "o_orderstatus" -> "o_orderstatus",
          "o_totalprice_cents" ->
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)",
          "o_orderdate_s" -> "strftime(o_orderdate, '%Y-%m-%d')",
          "o_orderpriority" -> "o_orderpriority")
        val exactArms = colsSql.map { case (name, e) =>
          s"""SELECT '$name' AS col_name, COUNT(*) AS n,
             |  COUNT($e) AS n_nonnull,
             |  CAST(MIN($e) AS VARCHAR) AS min_s,
             |  CAST(MAX($e) AS VARCHAR) AS max_s FROM orders""".stripMargin
        }.mkString("\nUNION ALL\n")
        val laneArms = colsSql.map { case (name, e) =>
          s"""SELECT '$name' AS col_name,
             |    md5('hll:' || CAST($e AS VARCHAR)) AS hx
             |  FROM orders WHERE $e IS NOT NULL""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH ex AS ($exactArms),
           |lv AS ($laneArms),
           |b AS (SELECT col_name,
           |    CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) AS bucket,
           |    ltrim(substr(hx, 3, 13), '0') AS t FROM lv),
           |r AS (SELECT col_name, bucket, CASE WHEN t = '' THEN 53
           |    ELSE 4 * (13 - length(t)) +
           |      CASE WHEN substr(t, 1, 1) IN
           |             ('8','9','a','b','c','d','e','f') THEN 1
           |           WHEN substr(t, 1, 1) IN ('4','5','6','7') THEN 2
           |           WHEN substr(t, 1, 1) IN ('2','3') THEN 3
           |           ELSE 4 END END AS rho FROM b),
           |regs AS (SELECT col_name, bucket, MAX(rho) AS rho_max
           |  FROM r GROUP BY 1, 2),
           |st AS (SELECT col_name,
           |    CAST(COUNT(*) AS INTEGER) AS nd_buckets,
           |    CAST(SUM(CAST(1 AS BIGINT) << (53 - rho_max)) AS BIGINT)
           |      AS nd_s53
           |  FROM regs GROUP BY 1)
           |SELECT ex.col_name, ex.n, ex.n_nonnull,
           |  COALESCE(st.nd_buckets, 0) AS nd_buckets,
           |  COALESCE(st.nd_s53, 0) AS nd_s53,
           |  ex.min_s, ex.max_s
           |FROM ex LEFT JOIN st USING (col_name)
           |ORDER BY col_name""".stripMargin
      }),

    // Edit-distance fuzzy join (entity resolution): DISTINCT name
    // entities (representative = min key per name — duplicated strings
    // would make the output itself quadratic, see the operator's
    // scaladoc), probe side planted with a single-character
    // substitution on every third representative (the derived-input
    // move). Candidates come from the EDJoin rarest-first PREFIX
    // filter (q·d+1 grams per string under a shared global frequency
    // order); the oracle replays gram explode, the frequency order,
    // the prefix cut, the candidate join, the length prune, and the
    // levenshtein verify — the full pruning pipeline, hash-exact.
    QuerySpec("q142_fuzzy_join",
      (s, dir) => {
        // names < tinyCut (= q·(d+1)+d+1 = 8) would route through
        // fuzzyJoin's tiny-string arm, which the shared oracle does
        // not replay — excluded explicitly so the gram-arm oracle is
        // COMPLETE by construction (all current part names qualify;
        // the tiny arm itself is brute-force-differential spec-tested)
        val ents = table(s, dir, "part")
          .filter(length(col("p_name")) >= 8)
          .groupBy(col("p_name")).agg(min(col("p_partkey")).as("p_partkey"))
        val probes = ents.select(
          (col("p_partkey") + 1000000L).as("probe_id"),
          when(pmod(col("p_partkey"), lit(3)) === 0,
            concat(substring(col("p_name"), 1, 3), lit("#"),
              substring(col("p_name"), 5, 100000)))
            .otherwise(col("p_name")).as("probe_name"))
        graft.ops.Relational.fuzzyJoin(probes, "probe_id", "probe_name",
            ents.select(col("p_partkey"), col("p_name")),
            "p_partkey", "p_name", q = 3, maxDist = 1)
          .orderBy(col("probe_id"), col("p_partkey"))
      },
      Some(s"""WITH $edjoinPairsCtes
        |SELECT probe_id, p_partkey, dist FROM ver WHERE dist <= 1
        |ORDER BY probe_id, p_partkey""".stripMargin)),

    // URL canonicalization (r18, VERDICT r17 missing #4): scheme/host
    // lowercase, userinfo + fragment + default-port stripped, tracking
    // params dropped, survivors sorted, registered domain via the
    // embedded multi-label-suffix snapshot. BOTH engines build the
    // same raw URL from doc_id (the htmlFixture discipline) and the
    // oracle performs its own independent string surgery in DuckDB —
    // the whole rule set is SQL-replayable, so the gate is hash-exact.
    QuerySpec("q340_url_canonicalize",
      (s, dir) => WebExtract.canonicalizeUrls(
          table(s, dir, "documents")
            .select(col("doc_id"), urlExpr(col("doc_id")).as("url")),
          "doc_id", "url")
        .orderBy(col("doc_id")),
      Some(s"""WITH uf AS (SELECT doc_id, ${urlSqlExpr("doc_id")} AS url
        |  FROM documents),
        |$urlCanonSqlCtes
        |SELECT doc_id, ok, reason, url_canon, scheme, host, port,
        |  registered_domain
        |FROM cn ORDER BY doc_id""".stripMargin)),

    // URL-keyed exact dedup (r18): crawl noise — tracking params,
    // fragments, scheme/host case, default ports — collapses onto one
    // canonical key; groups with >1 member surface with their min-id
    // representative. One map-side-combinable shuffle on the
    // canonical string.
    QuerySpec("q341_url_dedup",
      (s, dir) => WebExtract.urlDupGroups(
          WebExtract.canonicalizeUrls(
            table(s, dir, "documents")
              .filter(col("doc_id") % 2 === 0) // mod-2 fixture diet
              .select(col("doc_id"), urlExpr(col("doc_id")).as("url")),
            "doc_id", "url"), "doc_id")
        .orderBy(col("url_canon")),
      Some(s"""WITH uf AS (SELECT doc_id, ${urlSqlExpr("doc_id")} AS url
        |  FROM documents WHERE doc_id % 2 = 0),
        |$urlCanonSqlCtes
        |SELECT url_canon, MIN(doc_id) AS rep_id,
        |  COUNT(*) AS n_copies
        |FROM cn WHERE ok GROUP BY 1 HAVING COUNT(*) > 1
        |ORDER BY url_canon""".stripMargin)),

    // Host-grouped quality prior (r18): registered domains become the
    // link graph's nodes — each doc's canonical domain links to the
    // domain of its formula outlink (7·id+3), q125's exact integer
    // PageRank ranks the domains, and the rank joins BACK onto every
    // document (the Common-Crawl-style host-prior weighting step).
    // The oracle replays both canonicalizations, the edge derivation,
    // and the 3-iteration unrolled PageRank.
    QuerySpec("q342_domain_pagerank_join",
      (s, dir) => {
        // mod-2 fixture diet (the r17 rule: gates ≥ 2 s idle get a
        // key-mod subset mirrored in the oracle) — the domain-graph
        // SHAPE is unchanged, the per-row regex work halves
        val docs = table(s, dir, "documents").select(col("doc_id"))
          .filter(col("doc_id") % 2 === 0)
        val own = WebExtract.canonicalizeUrls(
          docs.select(col("doc_id"), urlExpr(col("doc_id")).as("url")),
          "doc_id", "url")
        // r19 optimization (guide §2.4, remove shuffles outright):
        // own+out canonicalized in ONE fused projection per row via
        // the passthrough chain — the old shape joined two one-call
        // frames back on doc_id, a shuffle join whose two sides were
        // row-aligned projections of the SAME scan. Inner join on
        // the unique doc_id == row-wise conjunction, so
        // filter(ok_own ∧ ok_out ∧ src ≠ dst) yields the identical
        // edge multiset (PageRank DISTINCTs it as before).
        val dual = WebExtract.canonicalizeUrls(
          WebExtract.canonicalizeUrls(
              docs.select(col("doc_id"),
                urlExpr(col("doc_id")).as("url"),
                urlExpr(col("doc_id") * 7 + 3).as("__out_url")),
              "doc_id", "url", passthrough = Seq("__out_url"))
            .select(col("doc_id"), col("ok").as("__ok_own"),
              col("registered_domain").as("__src"), col("__out_url")),
          "doc_id", "__out_url",
          passthrough = Seq("__ok_own", "__src"))
        val edges = dual
          .filter(col("__ok_own") && col("ok") &&
            col("__src") =!= col("registered_domain"))
          .select(col("__src").as("src"),
            col("registered_domain").as("dst"))
        val pr = graft.ops.Graph.pageRankMicro(edges, "src", "dst",
          iters = 3)
        own.filter(col("ok"))
          .select(col("doc_id"), col("registered_domain"))
          .join(pr.withColumnRenamed("id", "registered_domain"),
            Seq("registered_domain"), "left")
          .select(col("doc_id"), col("registered_domain"),
            col("rank_micro"))
          .orderBy(col("doc_id"))
      },
      Some {
        def iter(i: Int): String =
          s"""m$i AS (SELECT e.dst AS id, SUM(r.rank_micro // d.deg) AS m
             |  FROM e JOIN r${i - 1} r ON r.id = e.src
             |  JOIN dg d ON d.src = e.src GROUP BY 1),
             |r$i AS (SELECT n.id,
             |    CAST(150000 + (85 * COALESCE(m$i.m, 0)) // 100 AS BIGINT)
             |      AS rank_micro
             |  FROM n LEFT JOIN m$i USING (id))""".stripMargin
        s"""WITH dd AS (SELECT doc_id FROM documents
           |  WHERE doc_id % 2 = 0),
           |uf AS (
           |  SELECT doc_id, ${urlSqlExpr("doc_id")} AS url
           |  FROM dd
           |  UNION ALL
           |  SELECT doc_id + 10000000, ${urlSqlExpr("(doc_id * 7 + 3)")}
           |  FROM dd),
           |$urlCanonSqlCtes,
           |owns AS (SELECT doc_id, registered_domain FROM cn
           |  WHERE ok AND doc_id < 10000000),
           |outs AS (SELECT doc_id - 10000000 AS doc_id,
           |    registered_domain FROM cn
           |  WHERE ok AND doc_id >= 10000000),
           |e AS (SELECT DISTINCT o.registered_domain AS src,
           |    t.registered_domain AS dst
           |  FROM owns o JOIN outs t USING (doc_id)
           |  WHERE o.registered_domain <> t.registered_domain),
           |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
           |dg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
           |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank_micro
           |  FROM n),
           |${(1 to 3).map(iter).mkString(",\n")}
           |SELECT o.doc_id, o.registered_domain, r3.rank_micro
           |FROM owns o LEFT JOIN r3 ON r3.id = o.registered_domain
           |ORDER BY o.doc_id""".stripMargin
      }),

    // URL-dedup groups from LEDGERED state (r18, the streaming twin
    // standing rule applied to q341): the dup groups read from the
    // two-epoch aggIngestBatch state — count + min(doc_id) keyed on
    // the canonical URL, epoch-split by doc parity, replay no-op'd —
    // must equal q341's in-query answer over everything (the oracle
    // is q341's VERBATIM). The crawl ledger's steady path: per batch
    // one canonicalize scan + a summary-sized merge, history never
    // rescanned.
    QuerySpec("q350_url_dedup_ingest",
      (s, dir) => {
        val root = urlDedupIngestRoot(s, dir)
        s.read.parquet(s"$root/state/current/state")
          .filter(col("n") > 1)
          .select(col("url_canon"), col("min_doc_id").as("rep_id"),
            col("n").as("n_copies"))
          .orderBy(col("url_canon"))
      },
      Some(s"""WITH uf AS (SELECT doc_id, ${urlSqlExpr("doc_id")} AS url
        |  FROM documents WHERE doc_id % 2 = 0),
        |$urlCanonSqlCtes
        |SELECT url_canon, MIN(doc_id) AS rep_id,
        |  COUNT(*) AS n_copies
        |FROM cn WHERE ok GROUP BY 1 HAVING COUNT(*) > 1
        |ORDER BY url_canon""".stripMargin))
  )

  // Fixture-root prewarm registration (VERDICT r16 wrong #2)
  locally {
    FixtureCache.registerPrewarm((s, d) => { urlDedupIngestRoot(s, d); () })
  }

  /** TWO-EPOCH URL-dedup state (r18): the q341 groups maintained as
    * `_epoch`-ledgered summary state through the REAL
    * [[graft.streaming.StreamingIngest.aggIngestBatch]] path — keys =
    * url_canon, count + min(doc_id); epoch 0 lands the doc_id ≡ 0
    * (mod 4) half of the mod-2 lane, epoch 1 the ≡ 2 half, then
    * epoch 1 REPLAYS (must no-op). A crawl's dedup ledger never
    * rescans observed batches; state is ≤ |distinct canonical URLs|
    * rows by construction. */
  private def urlDedupIngestRoot(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val fp = FixtureCache.fingerprint(s"$dir/documents.parquet")
    // _pct in the cache key (the steadyDedup _b32 rule): pre-r19
    // roots hold state keyed by the PRE-percent-normalization
    // canonical form — serving those would mix two rule versions in
    // one ledger. New key → clean rebuild under the r19 rules.
    FixtureCache.ensure(s"/tmp/graft_url_dedup_ingest/${tag}_${fp}_pct") {
      tmp =>
      val canon = WebExtract.canonicalizeUrls(
        table(s, dir, "documents")
          .filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), urlExpr(col("doc_id")).as("url")),
        "doc_id", "url")
        .filter(col("ok"))
        .select(col("url_canon"), col("doc_id"))
      val st = s"$tmp/state"
      def epoch(pred: org.apache.spark.sql.Column, id: Long): Unit =
        graft.streaming.StreamingIngest.aggIngestBatch(
          canon.filter(pred), Seq("url_canon"), Nil, Seq("doc_id"),
          Nil, st, id)
      epoch(col("doc_id") % 4 === 0, 0L)
      epoch(col("doc_id") % 4 === 2, 1L)
      epoch(col("doc_id") % 4 === 2, 1L) // replay: must no-op
    }
  }

  /** Deterministic URL fixture for id expression `m` — scheme case,
    * userinfo, host case, multi-label suffixes, default and explicit
    * ports, empty paths, tracking/sortable queries, fragments, a
    * schemeless dead lane (m % 17), and (r19) PLANTED percent-variant
    * twins: `/%61/B` must collapse onto the `/a/B` lane's canonical
    * key, `/idx%2Ehtml` onto `/idx.html`, a `%53` host escape onto
    * the plain host, and `/q%3fz` must surface with uppercased
    * surviving hex. The Spark Column and [[urlSqlExpr]] build the
    * SAME string; divergence fails the gate loudly. */
  private def urlExpr(
      m: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val s5 = pmod(m, lit(5))
    val scheme = when(s5 === 0, lit("http")).when(s5 === 1, lit("HTTP"))
      .when(s5 === 2, lit("https")).when(s5 === 3, lit("HTTPS"))
      .otherwise(lit("ftp"))
    val user = when(pmod(m, lit(19)) === 0, lit("u:p@")).otherwise(lit(""))
    val s4 = pmod(m, lit(4))
    val host = concat(
      when(pmod(m, lit(19)) === 7, lit("WWW.%53ite"))
        .otherwise(lit("WWW.Site")),
      pmod(m, lit(40)).cast("string"),
      when(s4 === 0, lit(".com")).when(s4 === 1, lit(".co.uk"))
        .when(s4 === 2, lit(".org")).otherwise(lit(".com.au")))
    val s6 = pmod(m, lit(6))
    val port = when(s6 === 0, lit(":80")).when(s6 === 1, lit(":443"))
      .when(s6 === 2, lit(":8080")).otherwise(lit(""))
    val s3 = pmod(m, lit(3))
    val path = when(pmod(m, lit(13)) === 5, lit("/q%3fz"))
      .when(s3 === 0, lit(""))
      .when(s3 === 1, when(pmod(m, lit(2)) === 1, lit("/%61/B"))
        .otherwise(lit("/a/B")))
      .otherwise(when(pmod(m, lit(5)) === 2, lit("/idx%2Ehtml"))
        .otherwise(lit("/idx.html")))
    val s7 = pmod(m, lit(7))
    val query = when(s7 === 0,
        concat(lit("?utm_source=x&q="), pmod(m, lit(9)).cast("string")))
      .when(s7 === 1, lit("?b=2&a=1"))
      .when(s7 === 2, lit("?utm_campaign=c"))
      .when(s7 === 3, lit("?z=9&utm_medium=m&y=8"))
      .otherwise(lit(""))
    val frag = when(pmod(m, lit(2)) === 0,
      concat(lit("#s"), pmod(m, lit(5)).cast("string"))).otherwise(lit(""))
    when(pmod(m, lit(17)) === 0,
        concat(lit("/local/"), m.cast("string")))
      .otherwise(concat(scheme, lit("://"), user, host, port, path,
        query, frag))
  }

  /** [[urlExpr]] as a DuckDB expression over the id expression `m`.
    * NOTE: this text is interpolated into gate SQL that is ITSELF
    * stripMargin'd, so no line here may begin with whitespace + `|`
    * (the outer strip would eat one pipe of a leading `||`). */
  private def urlSqlExpr(m: String): String =
    s"""CASE WHEN ($m) % 17 = 0 THEN '/local/' || ($m)
       | ELSE
       |  CASE ($m) % 5 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTP'
       |    WHEN 2 THEN 'https' WHEN 3 THEN 'HTTPS'
       |    ELSE 'ftp' END || '://' ||
       |  CASE WHEN ($m) % 19 = 0 THEN 'u:p@' ELSE '' END ||
       |  CASE WHEN ($m) % 19 = 7 THEN 'WWW.%53ite'
       |    ELSE 'WWW.Site' END || (($m) % 40) ||
       |  CASE ($m) % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
       |    WHEN 2 THEN '.org' ELSE '.com.au' END ||
       |  CASE ($m) % 6 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
       |    WHEN 2 THEN ':8080' ELSE '' END ||
       |  CASE WHEN ($m) % 13 = 5 THEN '/q%3fz'
       |    WHEN ($m) % 3 = 0 THEN ''
       |    WHEN ($m) % 3 = 1 THEN
       |      CASE WHEN ($m) % 2 = 1 THEN '/%61/B' ELSE '/a/B' END
       |    ELSE CASE WHEN ($m) % 5 = 2 THEN '/idx%2Ehtml'
       |      ELSE '/idx.html' END END ||
       |  CASE ($m) % 7 WHEN 0 THEN '?utm_source=x&q=' || (($m) % 9)
       |    WHEN 1 THEN '?b=2&a=1' WHEN 2 THEN '?utm_campaign=c'
       |    WHEN 3 THEN '?z=9&utm_medium=m&y=8' ELSE '' END ||
       |  CASE WHEN ($m) % 2 = 0 THEN '#s' || (($m) % 5) ELSE '' END
       |END""".stripMargin

  /** [[WebExtract.pctNormalize]] as DuckDB string surgery over the
    * expression `x` (r19): split on `%`, per-part — decode the escape
    * when its byte is RFC 3986 unreserved, uppercase the hex
    * otherwise, pass malformed escapes through. `array_to_string` of
    * an EMPTY list is NULL in DuckDB (Spark's `array_join` is ''), so
    * the tail is COALESCEd. NOTE: interpolated into stripMargin'd
    * gate SQL — no line here may begin with whitespace + `|`. */
  private[queries] def pctSql(x: String): String =
    s"""string_split($x, '%')[1] ||
       |   COALESCE(array_to_string([CASE
       |    WHEN regexp_matches(p[1:2], '^[0-9A-Fa-f]{2}$$')
       |    THEN CASE
       |      WHEN (CAST(('0x' || p[1:2]) AS INTEGER) BETWEEN 48 AND 57)
       |        OR (CAST(('0x' || p[1:2]) AS INTEGER) BETWEEN 65 AND 90)
       |        OR (CAST(('0x' || p[1:2]) AS INTEGER) BETWEEN 97 AND 122)
       |        OR CAST(('0x' || p[1:2]) AS INTEGER) IN (45, 46, 95, 126)
       |      THEN chr(CAST(('0x' || p[1:2]) AS INTEGER)) || p[3:]
       |      ELSE '%' || upper(p[1:2]) || p[3:] END
       |    ELSE '%' || p END
       |   FOR p IN string_split($x, '%')[2:]], ''), '')""".stripMargin

  /** The [[WebExtract.canonicalizeUrls]] rule set as independent
    * DuckDB string surgery over a `uf(doc_id, url)` CTE — ends in
    * `cn(doc_id, ok, reason, url_canon, scheme, host, port,
    * registered_domain)`. Tracking/suffix lists inject from the ONE
    * Scala source of truth. */
  private[queries] def urlCanonSqlCtes: String = {
    val trackList = WebExtract.DefaultTrackingParams
      .map(p => s"'$p'").mkString("[", ", ", "]")
    val suffixList = WebExtract.PublicSuffixSnapshot
      .map(p => s"'$p'").mkString("[", ", ", "]")
    s"""c1 AS (SELECT doc_id, url,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
       |      AS scheme,
       |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(.*)$$', 1)
       |      AS rest
       |  FROM uf),
       |c2 AS (SELECT *, regexp_extract(rest, '^([^/?#]*)', 1) AS auth
       |  FROM c1),
       |c3 AS (SELECT *, string_split(auth, '@')[-1] AS hp,
       |    substr(rest, length(auth) + 1) AS pqf FROM c2),
       |c4a AS (SELECT *,
       |    regexp_extract(hp, '^([^:]*)', 1) AS rawhost,
       |    regexp_extract(hp, ':([0-9]+)$$', 1) AS prt,
       |    regexp_extract(pqf, '^([^?#]*)', 1) AS rawpth,
       |    regexp_extract(pqf, '^[^#?]*\\?([^#]*)', 1) AS qry
       |  FROM c3),
       |c4 AS (SELECT * EXCLUDE (rawhost, rawpth),
       |    lower(${pctSql("rawhost")}) AS host,
       |    ${pctSql("rawpth")} AS pth
       |  FROM c4a),
       |c5 AS (SELECT *, list_sort([p FOR p IN string_split(qry, '&')
       |      IF p <> '' AND NOT list_contains($trackList,
       |        lower(string_split(p, '=')[1]))]) AS ps,
       |    string_split(host, '.') AS lbl FROM c4),
       |cz AS (SELECT doc_id,
       |    scheme <> '' AND host <> '' AS ok,
       |    CASE WHEN scheme = '' THEN 'no_scheme'
       |         WHEN host = '' THEN 'no_host' END AS reason,
       |    scheme, host, prt,
       |    CASE WHEN prt = '' OR (scheme = 'http' AND prt = '80')
       |         OR (scheme = 'https' AND prt = '443') THEN ''
       |         ELSE ':' || prt END AS pc,
       |    CASE WHEN pth = '' THEN '/' ELSE pth END AS pthc,
       |    CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&')
       |         ELSE '' END AS qc,
       |    CASE WHEN regexp_matches(host, '^[0-9.]+$$') THEN host
       |      WHEN len(lbl) >= 3 AND list_contains($suffixList,
       |        lbl[-2] || '.' || lbl[-1])
       |      THEN lbl[-3] || '.' || lbl[-2] || '.' || lbl[-1]
       |      WHEN len(lbl) >= 2 THEN lbl[-2] || '.' || lbl[-1]
       |      ELSE host END AS rd
       |  FROM c5),
       |cn AS (SELECT doc_id, ok, reason,
       |    CASE WHEN ok
       |      THEN scheme || '://' || host || pc || pthc || qc
       |      END AS url_canon,
       |    CASE WHEN ok THEN scheme END AS scheme,
       |    CASE WHEN ok THEN host END AS host,
       |    CASE WHEN ok AND pc <> '' THEN CAST(prt AS INTEGER)
       |      END AS port,
       |    CASE WHEN ok THEN rd END AS registered_domain
       |  FROM cz)""".stripMargin
  }
}
