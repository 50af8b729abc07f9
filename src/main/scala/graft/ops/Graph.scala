package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators for corpus curation. Web-scale training pipelines
  * weight documents by host/domain quality, and the standard quality
  * prior is link-graph PageRank over the crawl's host graph
  * (Page/Brin 1999; Common Crawl publishes exactly this ranking as a
  * curation input). The engine form is the set-oriented iteration:
  * each step is one shuffle-keyed join (rank → out-edges) plus one
  * map-side-combined aggregation (mass per target) — no driver-side
  * per-node state, no collect, so a billion-host graph iterates at
  * join speed and the iteration count (not the graph size) bounds the
  * plan depth.
  */
object Graph {

  /** Integer-exact PageRank in micro-units: ranks start at 1 000 000
    * per node and update as
    *
    *   r'(v) = (100 − d)·10 000  +  (d · Σ_{u→v} (r(u) div deg(u))) div 100
    *
    * with d = `dampingPct` (default 85) — every operation is integer
    * (div = floor division on non-negative values), so the result is
    * bit-identical in any engine and an unrolled SQL replay, with no
    * float accumulation-order concerns. Dangling nodes (no
    * out-edges) keep the teleport base and leak their surplus — the
    * standard simplification for a quality PRIOR (relative ordering,
    * not a normalized distribution, is what curation consumes).
    *
    * `iters` is a fixed unroll (quality priors use few iterations;
    * convergence tuning is the caller's choice). Each iteration adds
    * one join+agg stage pair to the lineage; for large `iters` on a
    * real cluster, checkpoint every ~10 rounds.
    *
    * Input: an edge frame; duplicate edges are collapsed (DISTINCT) so
    * parallel links don't double-weight. Output: (id, rank_micro),
    * one row per node appearing as source or target. */
  def pageRankMicro(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be 0..100, got $dampingPct")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct()
    val nodes = e.select(col("__src").as("id"))
      .union(e.select(col("__dst").as("id"))).distinct()
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
    val base = (100L - dampingPct) * 10000L
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iters) {
      val mass = e
        .join(ranks.withColumnRenamed("id", "__src"), Seq("__src"))
        .join(deg, Seq("__src"))
        .select(col("__dst").as("id"),
          expr("rank_micro div __deg").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__m"))
      ranks = nodes.join(mass, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampingPct * coalesce(__m, 0L)) div 100"))
            .as("rank_micro"))
    }
    ranks
  }
}
