package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, Temporal}
import QuerySpec.table

/** Batch 6: temporal as-of join (the SCD2 point-in-time lookup) and
  * IVF-style ANN — both fully oracle-checked. */
object AdvancedQueries {

  private def dist2Sql(a: String, b: String): String =
    s"""list_sum([(CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) *
       | (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) FOR z IN list_zip($a, $b)])""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"""round(
       |  list_sum([CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE) FOR z IN list_zip($a, $b)]) /
       |  (sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) FOR x IN $a])) *
       |   sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) FOR x IN $b]))), 6)""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    // Temporal as-of join: which lineitem version was valid 200 days
    // after each order date. Versions are deduped to one row per
    // (key, volgnummer) first (the synthetic data has duplicate pairs).
    QuerySpec("q44_asof_join",
      (s, dir) => {
        val v0 = CoreQueries.lineitemVersioned(s, dir)
        val vers = v0.groupBy(col("identificatie"), col("volgnummer"))
          .agg(min(col("begin_geldigheid")).as("begin_geldigheid"),
            when(count(col("eind_geldigheid")) < count(lit(1)),
              lit(null).cast("timestamp"))
              .otherwise(max(col("eind_geldigheid"))).as("eind_geldigheid"),
            max(col("l_quantity")).as("l_quantity"))
        val probes = table(s, dir, "orders")
          .select(col("o_orderkey").cast("string").as("okey"),
            (col("o_orderdate") + expr("INTERVAL 200 DAYS")).as("asof_ts"))
        Temporal.asOfJoin(probes, "okey", "asof_ts", vers,
            payloadCols = Seq("l_quantity"))
          .orderBy(col("okey"))
      },
      Some("""WITH v0 AS (SELECT CAST(l_orderkey AS VARCHAR) AS identificatie,
        |    l_linenumber AS volgnummer, l_shipdate AS begin_geldigheid,
        |    CASE WHEN l_linestatus = 'O' THEN NULL
        |         ELSE l_shipdate + INTERVAL 30 DAY END AS eind_geldigheid,
        |    l_quantity
        |  FROM lineitem),
        |vers AS (SELECT identificatie, volgnummer,
        |    MIN(begin_geldigheid) AS vb,
        |    CASE WHEN COUNT(eind_geldigheid) < COUNT(*) THEN NULL
        |         ELSE MAX(eind_geldigheid) END AS ve,
        |    MAX(l_quantity) AS qty
        |  FROM v0 GROUP BY identificatie, volgnummer),
        |p AS (SELECT CAST(o_orderkey AS VARCHAR) AS okey,
        |    o_orderdate + INTERVAL 200 DAY AS asof_ts FROM orders),
        |j AS (SELECT p.okey, p.asof_ts, v.volgnummer, v.vb, v.ve, v.qty,
        |    ROW_NUMBER() OVER (PARTITION BY p.okey
        |      ORDER BY v.vb DESC, v.volgnummer DESC) AS rn
        |  FROM p JOIN vers v
        |    ON v.identificatie = p.okey AND v.vb <= p.asof_ts),
        |w AS (SELECT * FROM j WHERE rn = 1)
        |SELECT p.okey, p.asof_ts,
        |  CASE WHEN w.ve IS NULL OR w.ve > p.asof_ts THEN w.volgnummer END AS volgnummer,
        |  CASE WHEN w.ve IS NULL OR w.ve > p.asof_ts THEN w.vb END AS valid_from,
        |  CASE WHEN w.ve IS NULL OR w.ve > p.asof_ts THEN w.ve END AS valid_to,
        |  CASE WHEN w.ve IS NULL OR w.ve > p.asof_ts THEN w.qty END AS l_quantity
        |FROM p LEFT JOIN w ON w.okey = p.okey
        |ORDER BY p.okey""".stripMargin)),

    // IVF ANN: coarse-quantize into 8 cells, probe the 2 nearest.
    QuerySpec("q45_ann_ivf",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10, nCentroids = 8, nProbe = 2)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |cent AS (SELECT vec_id AS cent_id, embedding AS cv FROM e WHERE vec_id < 8),
        |assign AS (SELECT vec_id AS neighbor_id, embedding AS nv, cell FROM (
        |    SELECT e.vec_id, e.embedding, c.cent_id AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${dist2Sql("e.embedding", "c.cv")}, 6), c.cent_id) AS rn
        |    FROM e CROSS JOIN cent c) WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, embedding AS qv, cell FROM (
        |    SELECT e.vec_id, e.embedding, c.cent_id AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${dist2Sql("e.embedding", "c.cv")}, 6), c.cent_id) AS rn
        |    FROM e CROSS JOIN cent c WHERE e.vec_id < 5) WHERE rn <= 2),
        |cand AS (SELECT p.query_id, a.neighbor_id,
        |    ${cosSql("p.qv", "a.nv")} AS sim
        |  FROM probes p JOIN assign a USING (cell)
        |  WHERE a.neighbor_id <> p.query_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS rank FROM cand)
        |SELECT query_id, rank, neighbor_id, sim FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin)),

    // Reciprocal-rank fusion of the exact brute-force arm (q30 shape)
    // with the IVF arm (q45 shape) — ensemble retrieval. Both arms'
    // top-10 lists fuse via floor'd-micro Σ 1/(60+rank); the oracle
    // replays both pipelines as CTEs and the identical fusion
    // expression.
    QuerySpec("q85_rrf_fusion",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 5)
        Similarity.rrfFuse(
            Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10),
            Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 10,
              nCentroids = 8, nProbe = 2),
            topN = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        |xs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ${cosSql("q.embedding", "c.embedding")} AS sim
        |  FROM q JOIN e c ON c.vec_id <> q.vec_id),
        |xr AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS rank FROM xs),
        |cent AS (SELECT vec_id AS cent_id, embedding AS cv FROM e WHERE vec_id < 8),
        |assign AS (SELECT vec_id AS neighbor_id, embedding AS nv, cell FROM (
        |    SELECT e.vec_id, e.embedding, c.cent_id AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${dist2Sql("e.embedding", "c.cv")}, 6), c.cent_id) AS rn
        |    FROM e CROSS JOIN cent c) WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, embedding AS qv, cell FROM (
        |    SELECT e.vec_id, e.embedding, c.cent_id AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${dist2Sql("e.embedding", "c.cv")}, 6), c.cent_id) AS rn
        |    FROM e CROSS JOIN cent c WHERE e.vec_id < 5) WHERE rn <= 2),
        |icand AS (SELECT p.query_id, a.neighbor_id,
        |    ${cosSql("p.qv", "a.nv")} AS sim
        |  FROM probes p JOIN assign a USING (cell)
        |  WHERE a.neighbor_id <> p.query_id),
        |ir AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS rank FROM icand),
        |f AS (SELECT COALESCE(x.query_id, i.query_id) AS query_id,
        |    COALESCE(x.neighbor_id, i.neighbor_id) AS neighbor_id,
        |    CAST(floor(1000000.0 * (COALESCE(1.0 / (60 + x.rank), 0.0)
        |      + COALESCE(1.0 / (60 + i.rank), 0.0))) AS BIGINT) AS rrf_micro
        |  FROM (SELECT * FROM xr WHERE rank <= 10) x
        |  FULL OUTER JOIN (SELECT * FROM ir WHERE rank <= 10) i
        |    ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id),
        |fr AS (SELECT query_id, neighbor_id, rrf_micro,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY rrf_micro DESC, neighbor_id) AS INTEGER) AS rank FROM f)
        |SELECT query_id, rank, neighbor_id, rrf_micro FROM fr WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin)),

    // PQ/ADC ANN (Jégou et al. 2011): 4 subspaces × 16 dims, 8
    // centroids each (deterministic id-seeded codebooks, the q45
    // rule); corpus → 4-byte codes via the compiled argmin kernel,
    // query → flattened 4×8 exact-micro distance table, approximate
    // distance = 4 table lookups summed in long (compiled pq_adc).
    // The oracle replays codebooks/codes/tables/ADC in pure integer
    // SQL, so the match is hash-exact.
    QuerySpec("q88_ann_pq_adc",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.pqTopK(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10, m = 4, ksub = 8)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH mv AS (SELECT vec_id,
        |    [CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT) FOR x IN embedding] AS v
        |  FROM embeddings),
        |sub AS (SELECT unnest(range(4)) AS s),
        |cb AS (SELECT ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS cid,
        |    s, v[s*16+1:(s+1)*16] AS cv
        |  FROM mv, sub WHERE vec_id < 8),
        |corp AS (SELECT vec_id, s, v[s*16+1:(s+1)*16] AS sv FROM mv, sub),
        |codes AS (SELECT vec_id, s, cid FROM (
        |    SELECT c.vec_id, c.s, b.cid, ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.s
        |      ORDER BY list_sum([(z[1]-z[2])*(z[1]-z[2]) FOR z IN list_zip(c.sv, b.cv)]) ASC,
        |        b.cid ASC) AS rn
        |    FROM corp c JOIN cb b ON b.s = c.s) WHERE rn = 1),
        |tab AS (SELECT q.vec_id AS query_id, q.s, b.cid,
        |    list_sum([(z[1]-z[2])*(z[1]-z[2]) FOR z IN list_zip(q.sv, b.cv)]) AS d
        |  FROM corp q JOIN cb b ON b.s = q.s WHERE q.vec_id < 5),
        |adc AS (SELECT t.query_id, c.vec_id AS neighbor_id,
        |    CAST(SUM(t.d) AS BIGINT) AS adc_dist
        |  FROM codes c JOIN tab t ON t.s = c.s AND t.cid = c.cid
        |  WHERE c.vec_id <> t.query_id GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, adc_dist,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY adc_dist ASC, neighbor_id ASC) AS INTEGER) AS rank FROM adc)
        |SELECT query_id, rank, neighbor_id, adc_dist FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin))
  )
}
