package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}
import QuerySpec.table

/** Batch 10 (round 8): the materialized-index forms of the flagship
  * incremental operators — incremental dedup over a persisted corpus
  * shingle index (q90) and IVFADC ANN (q91). Each is the 100 TB shape
  * of an operator whose in-query form already has a hash-exact gate:
  * the new query must reproduce the SAME result, so the oracles are
  * shared/derived from the existing ones. */
object IndexedQueries {

  private[queries] def dist2Sql(a: String, b: String): String =
    s"""list_sum([(CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) *
       | (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) FOR z IN list_zip($a, $b)])""".stripMargin

  /** The q91 IVFADC oracle CTE chain (coarse cells, probes, PQ codes,
    * tables, cell-pruned ADC, ranked `r`) — the SINGLE definition;
    * q91 cuts it at rank ≤ 10, q94's rerank stage cuts at the
    * shortlist size, and the r19 tombstone gates inject a neighbor
    * predicate ([[ivfadcChainSqlWhere]]), so none of the gates can
    * drift apart. */
  private[queries] def ivfadcChainSql: String = ivfadcChainSqlWhere("TRUE")

  /** [[ivfadcChainSql]] with `neighborPred` (over `c.vec_id`, the
    * candidate/corpus side) applied in the ADC stage — the oracle
    * form of "rebuild the index WITHOUT the deleted ids under the
    * same frozen codebooks": centroid seeds and PQ codebooks still
    * derive from the FULL corpus (a tombstone never retrains the
    * model — the q356/q357 contract), only the candidate set
    * shrinks. */
  private[queries] def ivfadcChainSqlWhere(neighborPred: String): String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |cent AS (SELECT vec_id AS cent_id, embedding AS cv FROM e WHERE vec_id < 8),
       |cella AS (SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY round(${dist2Sql("e.embedding", "c.cv")}, 6), c.cent_id) AS rn
       |    FROM e CROSS JOIN cent c) WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, cell FROM (
       |    SELECT e.vec_id, c.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY round(${dist2Sql("e.embedding", "c.cv")}, 6), c.cent_id) AS rn
       |    FROM e CROSS JOIN cent c WHERE e.vec_id < 5) WHERE rn <= 2),
       |mv AS (SELECT vec_id,
       |    [CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT) FOR x IN embedding] AS v
       |  FROM embeddings),
       |sub AS (SELECT unnest(range(4)) AS s),
       |cb AS (SELECT ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS cid,
       |    s, v[s*16+1:(s+1)*16] AS pv
       |  FROM mv, sub WHERE vec_id < 8),
       |corp AS (SELECT vec_id, s, v[s*16+1:(s+1)*16] AS sv FROM mv, sub),
       |codes AS (SELECT vec_id, s, cid FROM (
       |    SELECT c.vec_id, c.s, b.cid, ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.s
       |      ORDER BY list_sum([(z[1]-z[2])*(z[1]-z[2]) FOR z IN list_zip(c.sv, b.pv)]) ASC,
       |        b.cid ASC) AS rn
       |    FROM corp c JOIN cb b ON b.s = c.s) WHERE rn = 1),
       |tab AS (SELECT q.vec_id AS query_id, q.s, b.cid,
       |    list_sum([(z[1]-z[2])*(z[1]-z[2]) FOR z IN list_zip(q.sv, b.pv)]) AS d
       |  FROM corp q JOIN cb b ON b.s = q.s WHERE q.vec_id < 5),
       |adc AS (SELECT t.query_id, c.vec_id AS neighbor_id,
       |    CAST(SUM(t.d) AS BIGINT) AS adc_dist
       |  FROM codes c JOIN tab t ON t.s = c.s AND t.cid = c.cid
       |  JOIN cella a ON a.vec_id = c.vec_id
       |  JOIN probes p ON p.query_id = t.query_id AND p.cell = a.cell
       |  WHERE c.vec_id <> t.query_id AND ($neighborPred) GROUP BY 1, 2),
       |r AS (SELECT query_id, neighbor_id, adc_dist,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc_dist ASC, neighbor_id ASC) AS INTEGER) AS rank FROM adc)""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    // Incremental dedup against a MATERIALIZED corpus index: the
    // corpus's (doc_id, shingle, n_sh) inverted index + text keyset
    // are built once and checkpointed (standing in for the persisted
    // parquet a real ingest loop keeps), then the q89 batch is deduped
    // against the index — the corpus is never re-shingled in-query.
    // Same inputs as q89 -> must produce the IDENTICAL result, so the
    // oracle is q89's three-stage replay verbatim.
    QuerySpec("q90_dedup_increment_indexed",
      (s, dir) => {
        val corpus = table(s, dir, "documents")
        // localCheckpoint = the local-mode materialization of the
        // persisted index (PlanSpec proves the parquet-backed form
        // reads pure index scans on the corpus side)
        val idx = Dedup.corpusShingleIndex(corpus, "doc_id", "text", k = 3)
          .localCheckpoint()
        val keys = Dedup.corpusTextKeys(corpus, "text").localCheckpoint()
        Dedup.dedupIncrementFullIndexed(idx, keys,
            MlPrepQueries.incrementFullBatch(corpus), "doc_id", "text",
            k = 3, threshold = 0.5)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      MlPrepQueries.all.find(_.name == "q89_dedup_increment_full").get.oracle),

    // IVFADC (the production form of the paper q88 cites): coarse IVF
    // cells prune the corpus, ADC scores only the probed cells' codes.
    // 8 coarse cells / probe 2; PQ 4x16 dims, 8 centroids per
    // subspace, all id-seeded — the q45 + q88 rules composed, so the
    // oracle is their CTEs composed: cell assignment via the pinned
    // crossJoin+row_number replay, codes/tables in pure integer SQL,
    // ADC restricted by the probe join instead of scanning every code.
    QuerySpec("q91_ann_ivfadc",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.ivfadcTopK(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10, nCentroids = 8, nProbe = 2,
            m = 4, ksub = 8)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""$ivfadcChainSql
        |SELECT query_id, rank, neighbor_id, adc_dist FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin)),

    // TRAINED PQ codebooks: Lloyd k-means (the q72 kernel) over each
    // of the 4 sub-vector slices — 4 subspaces x 4 centroids x 2
    // iterations in exact integer micros, so the oracle unrolls the
    // whole training run in SQL, grouped by subspace (the q72
    // generator extended with an `s` key). Long-form output
    // (s, cent_id, dim, c_micro).
    QuerySpec("q92_pq_codebooks_trained",
      (sp, dir) => {
        val e = table(sp, dir, "embeddings")
        val cbs = Similarity.pqCodebooksTrained(e, "vec_id", "embedding",
          m = 4, ksub = 4, iters = 2)
        val rows = cbs.zipWithIndex.toSeq.flatMap { case (scb, sIdx) =>
          scb.zipWithIndex.toSeq.flatMap { case (c, cid) =>
            c.zipWithIndex.toSeq.map { case (v, dim) => (sIdx, cid, dim, v) }
          }
        }
        sp.createDataFrame(rows).toDF("s", "cent_id", "dim", "c_micro")
          .orderBy(col("s"), col("cent_id"), col("dim"))
      },
      Some {
        def iterSql(i: Int, prev: String): String =
          s"""d$i AS (SELECT em.s, em.vec_id, c.cent_id,
             |    SUM((em.x - c.c) * (em.x - c.c)) AS d
             |  FROM em JOIN $prev c ON c.s = em.s AND c.dim = em.dim
             |  GROUP BY em.s, em.vec_id, c.cent_id),
             |a$i AS (SELECT s, vec_id, cent_id FROM (
             |    SELECT s, vec_id, cent_id,
             |      row_number() OVER (PARTITION BY s, vec_id
             |        ORDER BY d, cent_id) AS rn
             |    FROM d$i) WHERE rn = 1),
             |u$i AS (SELECT a.s, a.cent_id, em.dim,
             |    CAST(floor(CAST(SUM(em.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
             |  FROM a$i a JOIN em ON em.vec_id = a.vec_id AND em.s = a.s
             |  GROUP BY a.s, a.cent_id, em.dim),
             |c$i AS (SELECT p.s, p.cent_id, p.dim, COALESCE(u$i.c, p.c) AS c
             |  FROM $prev p LEFT JOIN u$i
             |    ON u$i.s = p.s AND u$i.cent_id = p.cent_id AND u$i.dim = p.dim)"""
            .stripMargin
        val chain = (1 to 2).map(i => iterSql(i, s"c${i - 1}")).mkString(",\n")
        s"""WITH em0 AS (SELECT vec_id,
           |    generate_subscripts(embedding, 1) - 1 AS idx,
           |    CAST(floor(CAST(UNNEST(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS x
           |  FROM embeddings),
           |em AS (SELECT vec_id, CAST(idx // 16 AS INTEGER) AS s,
           |    CAST(idx % 16 AS INTEGER) AS dim, x FROM em0),
           |seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
           |      AS cent_id, vec_id
           |  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
           |c0 AS (SELECT em.s, sd.cent_id, em.dim, em.x AS c
           |  FROM seed sd JOIN em ON em.vec_id = sd.vec_id),
           |$chain
           |SELECT s, cent_id, dim, c AS c_micro FROM c2
           |ORDER BY s, cent_id, dim""".stripMargin
      }),

    // RESIDUAL-encoding IVFADC — the paper's shipped form: PQ encodes
    // x − q1(x) per cell, the query's ADC table is built per probed
    // cell, and residual codebooks seed from the ksub lowest
    // NON-centroid ids (a centroid's own residual is the zero vector).
    // All integer micros end-to-end; the oracle replays cells,
    // residuals, codebooks, codes, per-cell tables, and the pruned ADC
    // in pure SQL. Cell ids are rank positions on both sides.
    QuerySpec("q93_ann_ivfadc_residual",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.ivfadcResidualTopK(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10, nCentroids = 8, nProbe = 2,
            m = 4, ksub = 8)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |cent AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER)
        |      AS ccell, embedding AS cv
        |  FROM e WHERE vec_id < 8),
        |cella AS (SELECT vec_id, ccell FROM (
        |    SELECT e.vec_id, c.ccell,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${dist2Sql("e.embedding", "c.cv")}, 6), c.ccell) AS rn
        |    FROM e CROSS JOIN cent c) WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, ccell FROM (
        |    SELECT e.vec_id, c.ccell,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${dist2Sql("e.embedding", "c.cv")}, 6), c.ccell) AS rn
        |    FROM e CROSS JOIN cent c WHERE e.vec_id < 5) WHERE rn <= 2),
        |mv AS (SELECT vec_id,
        |    [CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT) FOR x IN embedding] AS v
        |  FROM embeddings),
        |cmv AS (SELECT ccell,
        |    [CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT) FOR x IN cv] AS v
        |  FROM cent),
        |res AS (SELECT m.vec_id, a.ccell,
        |    [z[1] - z[2] FOR z IN list_zip(m.v, c.v)] AS r
        |  FROM mv m JOIN cella a ON a.vec_id = m.vec_id
        |  JOIN cmv c ON c.ccell = a.ccell),
        |sub AS (SELECT unnest(range(4)) AS s),
        |rcb AS (SELECT CAST(ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1
        |      AS INTEGER) AS cid, s, r[s*16+1:(s+1)*16] AS pv
        |  FROM res, sub WHERE vec_id >= 8 AND vec_id < 16),
        |rsub AS (SELECT vec_id, s, r[s*16+1:(s+1)*16] AS sv FROM res, sub),
        |codes AS (SELECT vec_id, s, cid FROM (
        |    SELECT c.vec_id, c.s, b.cid, ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.s
        |      ORDER BY list_sum([(z[1]-z[2])*(z[1]-z[2]) FOR z IN list_zip(c.sv, b.pv)]) ASC,
        |        b.cid ASC) AS rn
        |    FROM rsub c JOIN rcb b ON b.s = c.s) WHERE rn = 1),
        |qres AS (SELECT p.query_id, p.ccell,
        |    [z[1] - z[2] FOR z IN list_zip(m.v, c.v)] AS r
        |  FROM probes p JOIN mv m ON m.vec_id = p.query_id
        |  JOIN cmv c ON c.ccell = p.ccell),
        |qrsub AS (SELECT query_id, ccell, s, r[s*16+1:(s+1)*16] AS sv FROM qres, sub),
        |tab AS (SELECT q.query_id, q.ccell, q.s, b.cid,
        |    list_sum([(z[1]-z[2])*(z[1]-z[2]) FOR z IN list_zip(q.sv, b.pv)]) AS d
        |  FROM qrsub q JOIN rcb b ON b.s = q.s),
        |adc AS (SELECT t.query_id, cd.vec_id AS neighbor_id,
        |    CAST(SUM(t.d) AS BIGINT) AS adc_dist
        |  FROM codes cd
        |  JOIN cella a ON a.vec_id = cd.vec_id
        |  JOIN tab t ON t.s = cd.s AND t.cid = cd.cid AND t.ccell = a.ccell
        |  WHERE cd.vec_id <> t.query_id GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, adc_dist,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY adc_dist ASC, neighbor_id ASC) AS INTEGER) AS rank FROM adc)
        |SELECT query_id, rank, neighbor_id, adc_dist FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin))
  )
}
