package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis => TA}
import QuerySpec.table

/** Batch 3: training-data pipeline operators (dedup / similarity /
  * text analysis / multimodal) over the documents + embeddings tables.
  * Hash-based sketches (minhash/simhash/LSH/stub features) are not
  * SQL-replicable in DuckDB → rows-only checks + ScalaTest instead. */
object TrainingQueries {

  /** Cosine in DuckDB with explicit double widening + left fold,
    * mirroring Similarity.cosine. */
  private def cosSql(a: String, b: String): String =
    s"""round(
       |  list_sum([CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE) FOR z IN list_zip($a, $b)]) /
       |  (sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) FOR x IN $a])) *
       |   sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) FOR x IN $b]))), 6)""".stripMargin

  /** q33 fixture: real PNG/JPEG payloads synthesized from doc_id via
    * the spec-conformant [[Multimodal.encodePng]]/[[Multimodal.encodeJpeg]]
    * writers (the generator controls the bytes, so the oracle
    * re-derives every attribute arithmetically — the ShapefileSource
    * fixture move). Two corruption lanes exercise the dead-letter
    * path: doc_id % 11 truncates the payload to 6 bytes (PNG: inside
    * the signature; JPEG: inside the APP0 segment — both must parse
    * as `truncated`), doc_id % 13 zeroes the magic byte (`bad_magic`).
    * PNG color types cycle through all five legal values. */
  private def imageFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val pngColorTypes = Array(0, 2, 3, 4, 6)
    table(s, dir, "documents").select(col("doc_id")).as[Long].map { id =>
      val w = (1 + id % 640).toInt
      val h = (1 + id % 480).toInt
      val full =
        if (id % 2 == 0)
          Multimodal.encodePng(w, h, pngColorTypes((id % 5).toInt), bitDepth = 8)
        else Multimodal.encodeJpeg(w, h, nComp = (1 + id % 3).toInt)
      val payload =
        if (id % 11 == 0) full.take(6)
        else if (id % 13 == 0) { val c = full.clone(); c(0) = 0; c }
        else full
      (id, (id % 3).toString, payload)
    }.toDF("media_id", "kind", "media")
  }

  val all: Seq[QuerySpec] = Seq(

    QuerySpec("q21_token_count",
      (s, dir) => table(s, dir, "documents")
        .select(col("doc_id"),
          TA.tokenCount(col("text")).as("n_ws"),
          TA.regexTokenCount(col("text")).cast("long").as("n_bpe"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_ws,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin)),

    QuerySpec("q22_quality_score",
      (s, dir) => table(s, dir, "documents")
        .select(col("doc_id"),
          TA.tokenCount(col("text")).as("n_tokens"),
          TA.avgTokenLen(col("text")).as("avg_token_len"),
          TA.punctRatio(col("text")).as("punct_ratio"),
          TA.stopwordRatio(col("text")).as("stopword_ratio"),
          TA.qualityOk(col("text")).as("quality_ok"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |    len(toks) AS n_tokens,
        |    CAST(list_sum([length(w) FOR w IN toks]) AS DOUBLE) / len(toks) AS avg_token_len,
        |    CAST(len(regexp_extract_all(text, '[\.,;:!?]')) AS DOUBLE) / length(text) AS punct_ratio,
        |    CAST(len(list_filter(toks, w -> list_contains(
        |      ['the','a','an','and','of','to','in','is','it','for'], w))) AS DOUBLE)
        |      / len(toks) AS stopword_ratio
        |  FROM t)
        |SELECT doc_id, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
        |  (n_tokens >= 5 AND n_tokens <= 10000 AND avg_token_len >= 2.0
        |   AND avg_token_len <= 15.0 AND stopword_ratio >= 0.0) AS quality_ok
        |FROM m ORDER BY doc_id""".stripMargin)),

    QuerySpec("q23_lang_id",
      (s, dir) => {
        val d = table(s, dir, "documents")
        val scores = TA.langScores(col("text"))
        d.select(Seq(col("doc_id")) ++
            scores.map { case (l, c) => c.as(s"s_$l") } ++
            Seq(TA.langId(col("text")).as("lang_pred")): _*)
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |sc AS (SELECT doc_id,
        |  len(list_filter(toks, w -> list_contains(['the','and','of','to','a','in','is'], w))) AS s_en,
        |  len(list_filter(toks, w -> list_contains(['el','la','de','que','y','los','en'], w))) AS s_es,
        |  len(list_filter(toks, w -> list_contains(['der','die','und','das','ist','von'], w))) AS s_de,
        |  len(list_filter(toks, w -> list_contains(['le','la','de','et','les','des','est'], w))) AS s_fr
        |  FROM t)
        |SELECT doc_id, s_en, s_es, s_de, s_fr,
        |  CASE WHEN s_en > GREATEST(s_es, s_de, s_fr) THEN 'en'
        |       WHEN s_es > GREATEST(s_en, s_de, s_fr) THEN 'es'
        |       WHEN s_de > GREATEST(s_en, s_es, s_fr) THEN 'de'
        |       WHEN s_fr > GREATEST(s_en, s_es, s_de) THEN 'fr'
        |       ELSE 'und' END AS lang_pred
        |FROM sc ORDER BY doc_id""".stripMargin)),

    QuerySpec("q24_fingerprint",
      (s, dir) => table(s, dir, "documents")
        .select(col("doc_id"), TA.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(c) AS BIGINT) FOR c IN string_split(trim(text), '')]),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Exact dedup over a derived input with real duplicate groups
    // (every text is unique in the source table).
    QuerySpec("q25_dedup_exact",
      (s, dir) => {
        val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
        val dups = d.unionByName(
          d.filter(col("doc_id") % 3 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        Dedup.exactDuplicates(dups, "doc_id", "text")
          // CSV-join the member list: the driver's pandas comparator
          // can't sort array cells (numpy.ndarray is unhashable there)
          .select(col("canonical_id"), col("n_copies"),
            array_join(col("member_ids").cast("array<string>"), ",").as("member_ids"))
          .orderBy(col("canonical_id"))
      },
      Some("""WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0)
        |SELECT min(doc_id) AS canonical_id, COUNT(*) AS n_copies,
        |  array_to_string(list_sort(list(doc_id)), ',') AS member_ids
        |FROM d GROUP BY text HAVING COUNT(*) > 1
        |ORDER BY canonical_id""".stripMargin)),

    // Inverted-index n-gram Jaccard (word trigrams, exact). Trigrams
    // rather than bigrams: the synthetic corpus has a ~30-word
    // vocabulary, so bigram shingles are shared by ~10% of all docs and
    // the inverted-index join goes quadratic (measured 20s at sf0.1 —
    // would not survive 100×). Trigrams keep the join keyed and sparse
    // with identical exact-Jaccard semantics.
    QuerySpec("q26_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(
          table(s, dir, "documents"), "doc_id", "text", k = 3, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    UNNEST([array_to_string(toks[i:i+2], ' ')
        |            FOR i IN generate_series(1, len(toks) - 2)]) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
        |FROM pairs
        |JOIN sz sa ON sa.doc_id = id_a
        |JOIN sz sb ON sb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin)),

    // MinHash+LSH — xxhash64-based, not DuckDB-replicable: rows-only
    // here; recall-vs-exact-Jaccard asserted in DedupSpec. The LSH
    // banding LOGIC is exact-hash-proved by q70's md5-portable twin.
    QuerySpec("q27_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(
          table(s, dir, "documents"), "doc_id", "text",
          k = 3, numHashes = 16, bands = 4, estThreshold = 0.5)
        .orderBy(col("id_a"), col("id_b")),
      None,
      rowsOnlyReason = Some("xxhash64 lane hashes have no DuckDB " +
        "equivalent; the banding/candidate/est-Jaccard logic is " +
        "hash-exact-proven by the md5-portable twin q70_minhash_portable")),

    // MinHash+LSH with the engine-portable md5 lane hash: identical
    // banding/candidate/est-Jaccard pipeline as q27, hash-exact
    // against DuckDB (md5 agrees bit-for-bit; lexicographic min over
    // fixed-width hex == unsigned numeric min; est = lanes/8, an exact
    // binary fraction).
    QuerySpec("q70_minhash_portable",
      (s, dir) => Dedup.minhashLshPairsPortable(
          table(s, dir, "documents"), "doc_id", "text",
          k = 2, numHashes = 8, bands = 2, estThreshold = 0.5)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    UNNEST([array_to_string(toks[i:i+1], ' ')
        |            FOR i IN generate_series(1, len(toks) - 1)]) AS shingle
        |  FROM t WHERE len(toks) >= 2),
        |sig AS (SELECT doc_id,
        |    min(md5('0:' || shingle)) AS h0, min(md5('1:' || shingle)) AS h1,
        |    min(md5('2:' || shingle)) AS h2, min(md5('3:' || shingle)) AS h3,
        |    min(md5('4:' || shingle)) AS h4, min(md5('5:' || shingle)) AS h5,
        |    min(md5('6:' || shingle)) AS h6, min(md5('7:' || shingle)) AS h7
        |  FROM sh GROUP BY doc_id),
        |banded AS (
        |  SELECT doc_id, 0 AS band, md5(h0 || h1 || h2 || h3) AS bh FROM sig
        |  UNION ALL
        |  SELECT doc_id, 1 AS band, md5(h4 || h5 || h6 || h7) AS bh FROM sig),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM banded a JOIN banded b USING (band, bh)
        |  WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  ((sa.h0 = sb.h0)::INT + (sa.h1 = sb.h1)::INT + (sa.h2 = sb.h2)::INT +
        |   (sa.h3 = sb.h3)::INT + (sa.h4 = sb.h4)::INT + (sa.h5 = sb.h5)::INT +
        |   (sa.h6 = sb.h6)::INT + (sa.h7 = sb.h7)::INT) / 8.0 AS est_jaccard
        |FROM cand
        |JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b
        |WHERE ((sa.h0 = sb.h0)::INT + (sa.h1 = sb.h1)::INT + (sa.h2 = sb.h2)::INT +
        |   (sa.h3 = sb.h3)::INT + (sa.h4 = sb.h4)::INT + (sa.h5 = sb.h5)::INT +
        |   (sa.h6 = sb.h6)::INT + (sa.h7 = sb.h7)::INT) / 8.0 >= 0.5
        |ORDER BY id_a, id_b""".stripMargin)),

    // SimHash banded hamming — rows-only + DedupSpec. The banding +
    // hamming logic is exact-hash-proved by q71's md5-portable twin.
    QuerySpec("q28_simhash",
      (s, dir) => Dedup.simhashPairs(
          table(s, dir, "documents"), "doc_id", "text", maxDist = 16)
        .orderBy(col("id_a"), col("id_b")),
      None,
      rowsOnlyReason = Some("xxhash64 token hashes have no DuckDB " +
        "equivalent; the sketch/banding/hamming logic is " +
        "hash-exact-proven by the md5-portable twin q71_simhash_portable")),

    // SimHash with the engine-portable 60-bit md5 token hash: same
    // ±1-vote sketch, 4x15-bit banding, and XOR-popcount hamming as
    // q28, hash-exact against DuckDB (hex-parsed md5 prefix agrees
    // bit-for-bit in both engines).
    QuerySpec("q71_simhash_portable",
      (s, dir) => Dedup.simhashPairsPortable(
          table(s, dir, "documents"), "doc_id", "text", maxDist = 15)
        .orderBy(col("id_a"), col("id_b")),
      Some {
        val bitSums = (0 until 60).map(i =>
          s"    SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
          .mkString(",\n")
        val sketch = (0 until 60).map(i =>
          s"(CASE WHEN b$i > 0 THEN (CAST(1 AS BIGINT) << $i) ELSE CAST(0 AS BIGINT) END)")
          .mkString(" + ")
        s"""WITH tok AS (SELECT doc_id,
           |    UNNEST(string_split_regex(trim(text), '\\s+')) AS w FROM documents),
           |hh AS (SELECT doc_id,
           |    CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h FROM tok),
           |bits AS (SELECT doc_id,
           |$bitSums
           |  FROM hh GROUP BY doc_id),
           |sk AS (SELECT doc_id, $sketch AS simhash FROM bits),
           |banded AS (SELECT doc_id, simhash, band,
           |    (simhash >> (band * 15)) & 32767 AS band_bits
           |  FROM sk, (VALUES (0), (1), (2), (3)) v(band))
           |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
           |FROM banded a JOIN banded b USING (band, band_bits)
           |WHERE a.doc_id < b.doc_id
           |  AND bit_count(xor(a.simhash, b.simhash)) <= 15
           |ORDER BY id_a, id_b""".stripMargin
      }),

    // Embedding near-dup pairs, blocked by label.
    QuerySpec("q29_embedding_neardup",
      (s, dir) => Similarity.nearDupPairs(
          table(s, dir, "embeddings"), "vec_id", "embedding",
          blockCol = "label", threshold = 0.25)
        .orderBy(col("block"), col("id_a"), col("id_b")),
      Some(s"""SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
        |  ${cosSql("a.embedding", "b.embedding")} AS sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.25
        |ORDER BY block, id_a, id_b""".stripMargin)),

    // Embedding-family dedup APPLY step: q29's blocked cosine pairs
    // through the shared component/min-id decision rule — the third
    // sketch family (n-gram q79, minhash q81, embedding q82) on one
    // apply operator. Output omits the float vectors (array cells are
    // unsortable in the driver's pandas comparator; the survivors'
    // ids + labels prove the decision).
    QuerySpec("q82_embedding_dedup",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        graft.ops.Dedup.dedupByPairs(e, "vec_id",
            graft.ops.Similarity.nearDupPairs(e, "vec_id", "embedding",
              blockCol = "label", threshold = 0.25),
            "id_a", "id_b")
          .select(col("vec_id"), col("label"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH good AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.25),
        |edges AS (SELECT id_a AS a, id_b AS b FROM good
        |  UNION SELECT id_b, id_a FROM good),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach AS (
        |  WITH RECURSIVE r(src, node) AS (
        |    SELECT id, id FROM nodes
        |    UNION
        |    SELECT r.src, e.b FROM r JOIN edges e ON e.a = r.node)
        |  SELECT * FROM r),
        |comp AS (SELECT src AS id, MIN(node) AS component
        |  FROM reach GROUP BY src)
        |SELECT vec_id, label FROM embeddings
        |WHERE vec_id NOT IN (SELECT id FROM comp WHERE id <> component)
        |ORDER BY vec_id""".stripMargin)),

    // Exact brute-force ANN baseline, top-10 for 5 query vectors.
    QuerySpec("q30_ann_bruteforce",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ${cosSql("q.embedding", "c.embedding")} AS sim
        |  FROM q JOIN embeddings c ON c.vec_id <> q.vec_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, rank, neighbor_id, sim FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin)),

    // LSH-bucketed ANN (the 100 TB shape) — rows-only (JVM-RNG planes
    // + float sign test are not DuckDB-replicable); recall vs brute
    // force asserted in SimilaritySpec. The banding/probe/rerank LOGIC
    // is exact-hash-proved by q120's md5-portable twin below.
    QuerySpec("q31_ann_lsh",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.lshTopK(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", dim = 64, k = 10, nPlanes = 4)
          .orderBy(col("query_id"), col("rank"))
      },
      None,
      rowsOnlyReason = Some("JVM-RNG hyperplanes and a float sign test " +
        "are not DuckDB-replicable; the bucket/probe/rerank logic is " +
        "hash-exact-proven by the md5-portable twin q120_ann_lsh_portable")),

    // LSH ANN with the engine-portable bucketing rule (md5-parity
    // plane signs + integer micro-unit sign test): identical bucket
    // join / per-query top-k window / cosine rerank as q31, hash-exact
    // against DuckDB — the q70/q71 construction applied to the last
    // sketch gate that lacked a twin.
    QuerySpec("q120_ann_lsh_portable",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.lshTopKPortable(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", dim = 64, k = 10, nPlanes = 4)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH p AS (SELECT j, i,
        |    CASE WHEN (CAST(('0x' || substr(md5('p:' || j || ':' || i), 1, 15))
        |          AS BIGINT) % 2) = 1 THEN 1 ELSE -1 END AS sgn
        |  FROM generate_series(0, 3) tj(j), generate_series(0, 63) ti(i)),
        |ex AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    CAST(floor(CAST(UNNEST(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS xm
        |  FROM embeddings),
        |bits AS (SELECT vec_id, j,
        |    CASE WHEN SUM(xm * sgn) > 0 THEN 1 ELSE 0 END AS bit
        |  FROM ex JOIN p USING (i) GROUP BY 1, 2),
        |bk AS (SELECT vec_id, CAST(SUM(bit * (1 << j)) AS BIGINT) AS bucket
        |  FROM bits GROUP BY 1),
        |q AS (SELECT e.vec_id AS query_id, e.embedding, bk.bucket
        |  FROM embeddings e JOIN bk ON bk.vec_id = e.vec_id WHERE e.vec_id < 5),
        |c AS (SELECT e.vec_id AS neighbor_id, e.embedding, bk.bucket
        |  FROM embeddings e JOIN bk ON bk.vec_id = e.vec_id),
        |s AS (SELECT q.query_id, c.neighbor_id,
        |    ${cosSql("q.embedding", "c.embedding")} AS sim
        |  FROM q JOIN c ON q.bucket = c.bucket AND c.neighbor_id <> q.query_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, rank, neighbor_id, sim FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin)),

    // Canonical text normalization (NFC + lower + whitespace collapse
    // + trim). The corpus is pure ASCII (guarded by SketchExprSpec),
    // so NFC is the identity here and the oracle is the built-in
    // lower/regexp/trim chain; the Unicode path is covered by the
    // NfcNormalize ScalaTest differentials.
    QuerySpec("q75_normalize",
      (s, dir) => table(s, dir, "documents")
        // inline(array(struct(...))) materializes norm ONCE per row
        // (Generate is a projection barrier); a plain chained select
        // would be re-merged by CollapseProject and run the
        // NFC+lower+regexp chain twice — once for norm, once for
        // changed (the q73 precedent)
        .select(col("doc_id"), col("text"),
          inline(array(struct(TA.normalizeText(col("text")).as("norm")))))
        .select(col("doc_id"), col("norm"),
          (col("norm") =!= col("text")).as("changed"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        |  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
        |  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> text AS changed
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Gopher-style repetition signals from the single-pass TokenStats
    // kernel: duplicate-word fraction and top-word fraction, the cheap
    // pre-filters that run before any dedup stage. inline(array(...))
    // evaluates the struct expression exactly once per row (a Generate
    // evaluates its child once — CollapseProject would otherwise clone
    // it into all five consumers); the fractions are plain integer
    // divisions, IEEE-identical in both engines.
    QuerySpec("q73_repetition_stats",
      (s, dir) => table(s, dir, "documents")
        .select(col("doc_id"),
          inline(array(graft.functions.sketches.token_stats(col("text")))))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("top_freq"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
            .as("dup_word_frac"),
          (col("top_freq").cast("double") / col("n_tokens")).as("top_word_frac"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |m AS (SELECT doc_id, len(toks) AS n_tokens,
        |    len(list_distinct(toks)) AS n_distinct,
        |    list_max([len(list_filter(toks, x -> x = w))
        |              FOR w IN list_distinct(toks)]) AS top_freq
        |  FROM t)
        |SELECT doc_id, n_tokens, n_distinct, top_freq,
        |  1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_word_frac,
        |  CAST(top_freq AS DOUBLE) / n_tokens AS top_word_frac
        |FROM m ORDER BY doc_id""".stripMargin)),

    // Gopher-style repetition gate: min length, min distinct-token
    // fraction, max top-token fraction — floor'd micros + integer
    // comparisons, the scan-speed pre-filter before any dedup stage.
    // Thresholds chosen to discriminate on this corpus (distinct
    // ratio 5th pct ≈ 0.31, median ≈ 0.46; top ratio median ≈ 0.09).
    QuerySpec("q83_gopher_filter",
      (s, dir) => TA.gopherRepetitionReport(
          table(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |m AS (SELECT doc_id, len(toks) AS n_tokens,
        |    len(list_distinct(toks)) AS n_distinct,
        |    list_max([len(list_filter(toks, x -> x = w))
        |              FOR w IN list_distinct(toks)]) AS top_freq
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(floor(CAST(n_distinct AS DOUBLE) * 1000000 / n_tokens) AS BIGINT)
        |    AS distinct_micro,
        |  CAST(floor(CAST(top_freq AS DOUBLE) * 1000000 / n_tokens) AS BIGINT)
        |    AS top_micro,
        |  (n_tokens >= 20
        |   AND floor(CAST(n_distinct AS DOUBLE) * 1000000 / n_tokens) >= 350000
        |   AND floor(CAST(top_freq AS DOUBLE) * 1000000 / n_tokens) <= 125000)
        |    AS gopher_ok
        |FROM m ORDER BY doc_id""".stripMargin)),

    // Multimodal: binary payload metadata (pure expressions).
    QuerySpec("q32_media_metadata",
      (s, dir) => Multimodal.mediaMetadata(
          Multimodal.asMedia(table(s, dir, "documents"), "doc_id", "text"))
        .select(col("media_id"), col("kind"), col("n_bytes"), col("head_hex"))
        .orderBy(col("media_id")),
      Some("""SELECT doc_id AS media_id, CAST(doc_id % 3 AS VARCHAR) AS kind,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  hex(CAST(substr(text, 1, 8) AS BLOB)) AS head_hex
        |FROM documents ORDER BY media_id""".stripMargin)),

    // Multimodal REAL header decode (was a deterministic fake until
    // r10): parseImageHeader reads the public container specs — PNG
    // signature + IHDR (ISO/IEC 15948), JPEG marker walk to SOFn
    // (ITU-T T.81, skipping the APP0 the fixture plants in the way) —
    // over payloads built by the spec-conformant encode half. The
    // oracle never parses bytes: the fixture derives every attribute
    // from doc_id arithmetic, so DuckDB re-derives the expected
    // attributes (and the two dead-letter lanes) from the same
    // formulas. Round-trip + corruption specs live in MlPrepSpec.
    QuerySpec("q33_media_features",
      (s, dir) => Multimodal.imageHeaders(s, imageFixture(s, dir))
        .orderBy(col("media_id")),
      Some("""SELECT doc_id AS media_id, CAST(doc_id % 3 AS VARCHAR) AS kind,
        |  doc_id % 11 <> 0 AND doc_id % 13 <> 0 AS ok,
        |  CASE WHEN doc_id % 11 = 0 THEN 'truncated'
        |       WHEN doc_id % 13 = 0 THEN 'bad_magic' END AS reason,
        |  CASE WHEN doc_id % 11 = 0 OR doc_id % 13 = 0 THEN NULL
        |       WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  CASE WHEN doc_id % 11 = 0 OR doc_id % 13 = 0 THEN NULL
        |       ELSE CAST(1 + doc_id % 640 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 11 = 0 OR doc_id % 13 = 0 THEN NULL
        |       ELSE CAST(1 + doc_id % 480 AS INTEGER) END AS height,
        |  CASE WHEN doc_id % 11 = 0 OR doc_id % 13 = 0 THEN NULL
        |       WHEN doc_id % 2 = 0 THEN CAST(CASE doc_id % 5
        |            WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 1
        |            WHEN 3 THEN 2 WHEN 4 THEN 4 END AS INTEGER)
        |       ELSE CAST(1 + doc_id % 3 AS INTEGER) END AS channels,
        |  CASE WHEN doc_id % 11 = 0 OR doc_id % 13 = 0 THEN NULL
        |       ELSE CAST(8 AS INTEGER) END AS bit_depth
        |FROM documents ORDER BY media_id""".stripMargin)),

    // The decode→filter stage a multimodal pretraining pipeline runs
    // over q33's headers: admit only decodable, ≥32px, ≤2:1-aspect,
    // ≥3-channel images (integer cross-multiply aspect rule — no
    // float division). The oracle re-derives headers AND the rule from
    // the fixture arithmetic; corrupt lanes are keep=false by ok=false.
    QuerySpec("q122_image_filter",
      (s, dir) => Multimodal.imageQualityFilter(
          Multimodal.imageHeaders(s, imageFixture(s, dir)))
        .select(col("media_id"), col("ok"), col("width"), col("height"),
          col("channels"), col("keep"))
        .orderBy(col("media_id")),
      Some("""WITH h AS (SELECT doc_id AS media_id,
        |    doc_id % 11 <> 0 AND doc_id % 13 <> 0 AS ok,
        |    CASE WHEN doc_id % 11 = 0 OR doc_id % 13 = 0 THEN NULL
        |         ELSE CAST(1 + doc_id % 640 AS INTEGER) END AS width,
        |    CASE WHEN doc_id % 11 = 0 OR doc_id % 13 = 0 THEN NULL
        |         ELSE CAST(1 + doc_id % 480 AS INTEGER) END AS height,
        |    CASE WHEN doc_id % 11 = 0 OR doc_id % 13 = 0 THEN NULL
        |         WHEN doc_id % 2 = 0 THEN CAST(CASE doc_id % 5
        |              WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 1
        |              WHEN 3 THEN 2 WHEN 4 THEN 4 END AS INTEGER)
        |         ELSE CAST(1 + doc_id % 3 AS INTEGER) END AS channels
        |  FROM documents)
        |SELECT media_id, ok, width, height, channels,
        |  COALESCE(ok AND width >= 32 AND height >= 32
        |    AND GREATEST(width, height) * 1000 <= LEAST(width, height) * 2000
        |    AND channels >= 3, FALSE) AS keep
        |FROM h ORDER BY media_id""".stripMargin)),

    // PII scrubbing (the CCNet/Pile redaction pass): emails → <EMAIL>,
    // IPv4 → <IP>, phone runs → <PHONE>, in that order (order is part
    // of the contract — see TextAnalysis.piiScrub), plus per-type
    // counts. The corpus has no PII, so the input plants deterministic
    // addresses from doc_id arithmetic ON BOTH SIDES (the q25 derived-
    // input move); patterns stay inside the Java-regex ∩ RE2 subset so
    // DuckDB replays the scrub character-for-character.
    QuerySpec("q123_pii_scrub",
      (s, dir) => {
        val planted = table(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 5 === 0, concat(lit(" reach user"),
              col("doc_id"), lit("@example.com"))).otherwise(lit("")),
            when(col("doc_id") % 7 === 0, concat(lit(" from 10.0."),
              (col("doc_id") % 256), lit(".7"))).otherwise(lit("")),
            when(col("doc_id") % 3 === 0, concat(lit(" call +31 20 "),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
              lit(" 88"))).otherwise(lit(""))).as("text"))
        graft.ops.TextAnalysis.piiReport(planted, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some {
        val email = graft.ops.TextAnalysis.EmailPattern
        val ip = graft.ops.TextAnalysis.Ipv4Pattern
        val phone = graft.ops.TextAnalysis.PhonePattern
        s"""WITH p AS (SELECT doc_id, text ||
           |    CASE WHEN doc_id % 5 = 0
           |      THEN ' reach user' || doc_id || '@example.com' ELSE '' END ||
           |    CASE WHEN doc_id % 7 = 0
           |      THEN ' from 10.0.' || (doc_id % 256) || '.7' ELSE '' END ||
           |    CASE WHEN doc_id % 3 = 0
           |      THEN ' call +31 20 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           |           || ' 88' ELSE '' END AS text
           |  FROM documents),
           |s1 AS (SELECT doc_id, text,
           |    regexp_replace(text, '$email', '<EMAIL>', 'g') AS t1 FROM p),
           |s2 AS (SELECT doc_id, text, t1,
           |    regexp_replace(t1, '$ip', '<IP>', 'g') AS t2 FROM s1)
           |SELECT doc_id,
           |  regexp_replace(t2, '$phone', '<PHONE>', 'g') AS scrubbed,
           |  CAST(len(regexp_extract_all(text, '$email')) AS INTEGER) AS n_email,
           |  CAST(len(regexp_extract_all(t1, '$ip')) AS INTEGER) AS n_ip,
           |  CAST(len(regexp_extract_all(t2, '$phone')) AS INTEGER) AS n_phone
           |FROM s2 ORDER BY doc_id""".stripMargin
      }),

    // Containment-scored near-dup pairs (Broder containment; Dolma's
    // one-sided rule): |A∩B| / min(|A|,|B|) — catches a short doc
    // wholly embedded in a longer one, which symmetric Jaccard (q26)
    // dilutes to ~0.5 and misses at any practical threshold. The
    // derived input plants exactly that case: first-half-token
    // truncations (+2M ids) of every 4th document, whose trigram sets
    // are subsets of their originals -> containment 1.0.
    QuerySpec("q124_containment_pairs",
      (s, dir) => {
        val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
        val toks = split(trim(col("text")), "\\s+")
        val half = array_join(slice(toks, lit(1),
          floor((size(toks) + lit(1)) / lit(2)).cast("int")), " ")
        val planted = d.unionByName(
          d.filter(col("doc_id") % 4 === 1 && size(toks) >= 6)
            .select((col("doc_id") + 2000000).as("doc_id"), half.as("text")))
        Dedup.ngramContainmentPairs(planted, "doc_id", "text",
            k = 3, threshold = 0.9)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    array_to_string(toks[1:(len(toks)+1)//2], ' ')
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |        FROM documents)
        |  WHERE doc_id % 4 = 1 AND len(toks) >= 6),
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM base),
        |sh AS (SELECT DISTINCT doc_id,
        |    UNNEST([array_to_string(toks[i:i+2], ' ')
        |            FOR i IN generate_series(1, len(toks) - 2)]) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(inter AS DOUBLE) / LEAST(sa.n, sb.n) AS containment
        |FROM pairs
        |JOIN sz sa ON sa.doc_id = id_a
        |JOIN sz sb ON sb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / LEAST(sa.n, sb.n) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin))
  )
}
