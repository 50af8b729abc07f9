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
    // Materialize the collapsed frames ONCE: the unrolled loop
    // references e/nodes/deg every round, and without truncation each
    // round re-derives the upstream join+distinct through the lineage
    // (ReusedExchange only dedups identical exchanges within a stage
    // graph; the per-round stage-count constant still grows). Local
    // checkpoint = the standard iterative-graph move (GraphX's
    // periodic-checkpoint discipline); on a cluster the non-replicated
    // blocks trade executor-loss recovery for a flat per-round cost —
    // for long chains use a reliable checkpoint dir instead.
    // ... and pre-partitioned by the per-round join key: localCheckpoint
    // preserves outputPartitioning (LogicalRDD keeps the physical
    // plan's partitioning), so every round's rank⋈e join reuses the
    // hash(__src) layout with NO exchange on the edge side — the
    // in-memory analogue of bucketing the adjacency by source.
    // r19 optimization: the out-degree is FOLDED into the checkpointed
    // adjacency as a per-row __deg column (a source's degree repeats
    // on each of its out-edges — |e| longs, not a third frame), so
    // every iteration pays ONE join (ranks⋈e) instead of two
    // (ranks⋈e⋈deg) and the separate deg checkpoint job disappears —
    // measured 2 jobs/round + 1 eager job off the fixed cost of the
    // unrolled loop (guide §2.4). The degree window runs inside the
    // one checkpoint job over the hash(__src) layout the repartition
    // just established, exchange-free.
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct().repartition(col("__src"))
      .withColumn("__deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__src"))))
      .localCheckpoint(true)
    val nodes = e.select(col("__src").as("id"))
      .union(e.select(col("__dst").as("id"))).distinct().localCheckpoint(true)
    val base = (100L - dampingPct) * 10000L
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iters) {
      val mass = e
        .join(ranks.withColumnRenamed("id", "__src"), Seq("__src"))
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

  /** Weighted PageRank in the same integer micro-unit discipline as
    * [[pageRankMicro]]: mass flows in proportion to edge weight —
    *
    *   r'(v) = (100 − d)·10⁴ + (d · Σ_{u→v} (r(u)·w(u,v) div W(u))) div 100
    *
    * with W(u) = Σ out-weights of u, every step integer floor
    * arithmetic (exact replay in any engine). Parallel edges collapse
    * by SUMMING weights (they carry more mass, where the unweighted
    * form deduplicates) — the natural prior when edge multiplicity
    * means link strength (co-occurrence counts, traffic volume). */
  def pageRankWeightedMicro(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, iters: Int,
      dampingPct: Int = 85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // same once-materialization + hash(__src) pre-partitioning as
    // pageRankMicro (see comment there)
    // same degree-fold as pageRankMicro (r19): the per-source total
    // out-weight rides the checkpointed adjacency as a window sum, so
    // each round joins once and the tot checkpoint job disappears
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        col(weightCol).cast("long").as("__w"))
      .groupBy(col("__src"), col("__dst")).agg(sum(col("__w")).as("__w"))
      .repartition(col("__src"))
      .withColumn("__tw", sum(col("__w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__src"))))
      .localCheckpoint(true)
    val nodes = e.select(col("__src").as("id"))
      .union(e.select(col("__dst").as("id"))).distinct().localCheckpoint(true)
    val base = (100L - dampingPct) * 10000L
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iters) {
      val mass = e
        .join(ranks.withColumnRenamed("id", "__src"), Seq("__src"))
        .select(col("__dst").as("id"),
          expr("(rank_micro * __w) div __tw").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__m"))
      ranks = nodes.join(mass, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampingPct * coalesce(__m, 0L)) div 100"))
            .as("rank_micro"))
    }
    ranks
  }

  /** Canonical undirected edge set: self-loops dropped, both
    * directions collapsed to (a < b), parallel edges deduped. */
  private def canonicalEdges(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges.select(col(srcCol).cast("long").as("__s"),
        col(dstCol).cast("long").as("__d"))
      .filter(col("__s") =!= col("__d"))
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .distinct()

  /** Exact triangle count by degree-ordered orientation (the
    * compact-forward / Schank–Wagner algorithm): orient every
    * undirected edge from its lower-(degree, id) endpoint to the
    * higher, enumerate wedges by self-joining the oriented set on the
    * source, and close each wedge against the oriented edge set. The
    * orientation bounds every out-adjacency list by O(√m), so the
    * wedge join's skew is bounded no matter how hubby the graph —
    * the property that lets a web-scale graph count at join speed
    * (a canonical a<b orientation alone leaves hub nodes with O(n)
    * out-lists). Output: one row (n_nodes, n_edges, n_triangles);
    * each triangle counted exactly once. */
  def triangleCount(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val ce = canonicalEdges(edges, srcCol, dstCol)
    val deg = ce.select(col("a").as("v"))
      .unionAll(ce.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // (deg, id)-ordered orientation u ≺ w, with both endpoint degrees
    // carried so wedge pairs can be ordered without another join
    val oriented = ce
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("da").as("du"),
            col("b").as("w"), col("db").as("dw")))
          .otherwise(
            struct(col("b").as("u"), col("db").as("du"),
              col("a").as("w"), col("da").as("dw")))
          .as("__e"))
      .select(col("__e.u").as("u"), col("__e.w").as("w"),
        col("__e.dw").as("dw"))
    val e1 = oriented.select(col("u"), col("w").as("x"), col("dw").as("dx"))
    val e2 = oriented.select(col("u"), col("w").as("y"), col("dw").as("dy"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("x"), col("y"))
    val closing = oriented.select(col("u").as("x"), col("w").as("y"))
    val nTri = wedges.join(closing, Seq("x", "y"), "left_semi")
      // left_semi would dedup; wedges are already distinct per
      // (center u, x, y) triple — count matches per-triangle exactly
      .agg(count(lit(1)).as("n_triangles"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = ce.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(nTri)
  }

  /** Integer-exact HITS (Kleinberg 1999) in micro-units with
    * per-round max-normalization: iteration k computes
    *
    *   auth_k(v) = Σ_{u→v} hub_{k-1}(u), then ·1e6 div max
    *   hub_k(u)  = Σ_{u→v} auth_k(v),    then ·1e6 div max
    *
    * — every step integer floor arithmetic on non-negative values, so
    * an unrolled SQL replay is bit-identical (the pageRankMicro
    * discipline). Max-normalization (not L2) keeps the fixed point in
    * integers; the consumer reads relative ordering, as with the
    * PageRank prior. The global max is a 1-row aggregate broadcast
    * back by cross join — never an unpartitioned window. Output:
    * (kind 'hub'|'auth', id, score_micro). */
  def hitsMicro(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // same once-materialization + hash(__src) pre-partitioning as
    // pageRankMicro. HITS joins the edge set alternately on __src
    // (hub push) and __dst (auth pull); a second in-adjacency
    // checkpoint (repartition __dst) was measured at 1× and 10× and
    // LOST both (its build shuffle exceeds the per-round __dst
    // exchange it saves while the score side still broadcasts) —
    // revisit only past the broadcast→SMJ transition.
    val e = edges.select(col(srcCol).cast("long").as("__src"),
      col(dstCol).cast("long").as("__dst")).distinct()
      .repartition(col("__src")).localCheckpoint(true)
    val hubs0 = e.select(col("__src").as("id")).distinct()
      .withColumn("h", lit(1000000L))
    def normalized(df: DataFrame, c: String): DataFrame = {
      val mx = df.agg(max(col(c)).as("__mx"))
      // the ·1e6 step runs in DECIMAL(38,0): scores are ≤ 1e6
      // post-normalization, so a raw sum reaches indeg·1e6 and
      // indeg > ~9.2e6 (routine for web hubs) would wrap int64 under
      // a long multiply. (x − x mod m) / m is an exact integral
      // quotient, so the decimal division introduces no rounding.
      val x = col(c).cast("decimal(38,0)") * lit(1000000L)
      df.crossJoin(mx)
        .select(col("id"),
          ((x - pmod(x, col("__mx"))) / col("__mx")).cast("long").as(c))
    }
    var hubs = hubs0
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      auths = normalized(
        e.join(hubs.withColumnRenamed("id", "__src"), Seq("__src"))
          .groupBy(col("__dst").as("id")).agg(sum(col("h")).as("a")), "a")
      hubs = normalized(
        e.join(auths.withColumnRenamed("id", "__dst"), Seq("__dst"))
          .groupBy(col("__src").as("id")).agg(sum(col("a")).as("h")), "h")
    }
    hubs.select(lit("hub").as("kind"), col("id"),
        col("h").as("score_micro"))
      .unionAll(auths.select(lit("auth").as("kind"), col("id"),
        col("a").as("score_micro")))
  }

  /** Bounded-hop BFS distances over the undirected graph: dist 0 at
    * the seed set, then `maxHops` rounds of the min-plus relaxation
    * dist_k(v) = min(dist_{k-1}(v), 1 + min over neighbors) — each
    * round one keyed join + one keyed min-aggregate, no driver
    * state; the hop bound (not graph size) bounds plan depth, and
    * only reached nodes ever materialize. Output: (id, dist). */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val ce = canonicalEdges(edges, srcCol, dstCol)
    val ue = ce.select(col("a").as("u"), col("b").as("v"))
      .unionAll(ce.select(col("b").as("u"), col("a").as("v")))
    var dist = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .withColumn("dist", lit(0))
    for (_ <- 1 to maxHops) {
      val relaxed = ue
        .join(dist.withColumnRenamed("id", "u"), Seq("u"))
        .select(col("v").as("id"), (col("dist") + 1).as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
    }
    dist
  }

  /** Bounded-round WEIGHTED shortest paths (r15): [[bfsHops]]' min-plus
    * relaxation with an additive edge cost — after R rounds, dist(v) =
    * the cheapest ≤R-edge path from the seed set (Bellman–Ford rounds;
    * with R ≥ the shortest-path-tree depth this is the true distance).
    * Parallel undirected edges collapse to their MINIMUM weight first
    * (the cheapest copy dominates any relaxation the others could
    * make). Weights must be non-negative integers — the CALLER's
    * contract (checking would cost a scan): with a negative cost,
    * "bounded rounds" would silently mean "wrong", not "partial".
    * Each round: one keyed join + one keyed
    * min — R bounds plan depth, only reached nodes materialize.
    * Output: (id, dist). */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: DataFrame, seedCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 0, "shortestPaths: rounds must be >= 0")
    val ce = edges.select(col(srcCol).cast("long").as("__s"),
        col(dstCol).cast("long").as("__d"),
        col(weightCol).cast("long").as("__w"))
      .filter(col("__s") =!= col("__d") && col("__w").isNotNull)
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"), col("__w"))
      .groupBy(col("a"), col("b")).agg(min(col("__w")).as("w"))
    val ue = ce.select(col("a").as("u"), col("b").as("v"), col("w"))
      .unionAll(ce.select(col("b").as("u"), col("a").as("v"), col("w")))
    var dist = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .withColumn("dist", lit(0L))
    for (_ <- 1 to rounds) {
      val relaxed = ue
        .join(dist.withColumnRenamed("id", "u"), Seq("u"))
        .select(col("v").as("id"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
    }
    dist
  }

  /** Bounded-round k-CORE peel (r15): `rounds` iterations of "drop
    * every node whose surviving degree < k" over the canonical
    * undirected graph — the density-tier decomposition a corpus/web
    * graph pipeline uses to find its cohesive kernel (a node survives
    * the true k-core iff it survives the peel fixpoint). BOUNDED
    * rounds is the contract, exactly like [[bfsHops]]' maxHops and
    * the fixed-iteration PageRank/HITS: both engines compute the same
    * R-round peel, and R (not graph size) bounds plan depth; a run
    * that has converged is the fixpoint (the spec pins convergence on
    * its fixture; one extra round is the cheap convergence check).
    * Per round: ONE keyed degree count + two semi-joins, the frame
    * localCheckpoint'd so round r+1 rereads blocks instead of
    * recomputing the whole peel prefix three times (the q150/Kendall
    * multi-consumer discipline). Output: surviving (id, deg) with
    * the IN-SUBGRAPH degree. */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "kCorePeel: k and rounds must be >= 1")
    val ce = canonicalEdges(edges, srcCol, dstCol)
    var ue = ce.select(col("a").as("u"), col("b").as("v"))
      .unionAll(ce.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = ue.groupBy(col("u")).agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k).select(col("u"))
      ue = ue.join(keep, Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint()
    }
    ue.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
  }

  /** Per-node triangle participation + local clustering coefficient
    * (r15): [[triangleCount]]'s degree-ordered wedge machinery, kept
    * per node instead of reduced to one row — each closed wedge
    * (u, x, y) is one triangle counted once, and every triangle
    * credits all three corners. lcc_micro = (10⁶ · 2·t_v) div
    * (deg·(deg−1)) — the exact integer form of t_v / C(deg, 2);
    * degree-1 nodes drop (undefined). Same O(√m) out-list bound as
    * the count: hubs cannot skew the wedge join. Output:
    * (id, deg, n_triangles, lcc_micro). */
  def clusteringCoefficients(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val ce = canonicalEdges(edges, srcCol, dstCol)
    val deg = ce.select(col("a").as("v"))
      .unionAll(ce.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val oriented = ce
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("da").as("du"),
            col("b").as("w"), col("db").as("dw")))
          .otherwise(
            struct(col("b").as("u"), col("db").as("du"),
              col("a").as("w"), col("da").as("dw")))
          .as("__e"))
      .select(col("__e.u").as("u"), col("__e.w").as("w"),
        col("__e.dw").as("dw"))
    val e1 = oriented.select(col("u"), col("w").as("x"), col("dw").as("dx"))
    val e2 = oriented.select(col("u"), col("w").as("y"), col("dw").as("dy"))
    val triangles = e1.join(e2, Seq("u"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("u"), col("x"), col("y"))
      .join(oriented.select(col("u").as("x"), col("w").as("y")),
        Seq("x", "y"), "left_semi")
    val perNode = triangles.select(col("u").as("v"))
      .unionAll(triangles.select(col("x").as("v")))
      .unionAll(triangles.select(col("y").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("n_triangles"))
    deg.filter(col("deg") > 1)
      .join(perNode, Seq("v"), "left")
      .select(col("v").as("id"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        expr("(1000000 * 2 * COALESCE(n_triangles, 0)) div " +
          "(deg * (deg - 1))").as("lcc_micro"))
  }
}
