package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Graph analytics on planted graphs: triangle counting (orientation
  * logic vs brute force), HITS (hand-unrolled integer iterates), and
  * bounded-hop BFS (distances, bound, unreachability). The q149–q151
  * gates prove oracle agreement at scale; this pins the semantics. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("triangleCount: K4, star, pendant, duplicate+reversed edges") {
    // K4 on {1,2,3,4} = 4 triangles; edges given with duplicates,
    // reversals and a self-loop that must all be canonicalized away
    val k4 = Seq((1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (3, 4), (4, 3), (1, 1))
      .toDF("src", "dst")
    val r = Graph.triangleCount(k4, "src", "dst").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (4L, 6L, 4L))
    // star K1,5: plenty of wedges, zero triangles
    val star = (2 to 6).map(i => (1, i)).toDF("src", "dst")
    val s = Graph.triangleCount(star, "src", "dst").collect()(0)
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) == (6L, 5L, 0L))
    // triangle with a pendant vertex: exactly one
    val pend = Seq((1, 2), (2, 3), (3, 1), (3, 9)).toDF("src", "dst")
    val p = Graph.triangleCount(pend, "src", "dst").collect()(0)
    assert((p.getLong(0), p.getLong(1), p.getLong(2)) == (4L, 4L, 1L))
  }

  test("triangleCount: differential vs brute force on the sf0.001 mod graph") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(pmod(col("l_partkey"), lit(211)).as("src"),
        pmod(col("l_suppkey"), lit(211)).as("dst"))
    val got = Graph.triangleCount(li, "src", "dst").collect()(0)
    // brute force in driver Scala over the canonical edge set
    val edges = li.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toSet
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }
    val adj = nodes.map(v => v ->
      edges.collect { case (a, b) if a == v => b
                      case (a, b) if b == v => a }).toMap
    val sorted = nodes.toSeq.sorted
    var tri = 0L
    for (x <- sorted; y <- adj(x) if y > x; z <- adj(x) if z > y)
      if (adj(y).contains(z)) tri += 1
    assert(got.getLong(0) == nodes.size.toLong)
    assert(got.getLong(1) == edges.size.toLong)
    assert(got.getLong(2) == tri, s"got ${got.getLong(2)}, brute $tri")
  }

  test("hitsMicro: hand-unrolled asymmetric bipartite iterates") {
    // 1→10, 1→11, 2→10: hand-computed two-round integer iterates
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val out = Graph.hitsMicro(e, "src", "dst", iters = 2)
      .orderBy("kind", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("auth", 10L, 1000000L), ("auth", 11L, 600000L),
      ("hub", 1L, 1000000L), ("hub", 2L, 625000L)), out.toString)
  }

  test("hitsMicro: symmetric graph keeps symmetric scores") {
    val e = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L))
      .toDF("src", "dst")
    val out = Graph.hitsMicro(e, "src", "dst", iters = 2)
      .orderBy("kind", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("auth", 10L, 500000L), ("auth", 11L, 1000000L),
      ("auth", 12L, 500000L),
      ("hub", 1L, 1000000L), ("hub", 2L, 1000000L)))
  }

  test("pageRankWeightedMicro: uniform weights ≡ unweighted; heavy edge pulls rank") {
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("src", "dst")
    val uw = Graph.pageRankMicro(e, "src", "dst", iters = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val w1 = Graph.pageRankWeightedMicro(e.withColumn("w", lit(1L)),
        "src", "dst", "w", iters = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(w1 == uw, "uniform weights must reduce to the unweighted form")
    // 9:1 weighting from node 1: target 10 must outrank 11, and
    // parallel edges sum into the same pull
    val wz = Seq((1L, 10L, 9L), (1L, 11L, 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRankWeightedMicro(wz, "src", "dst", "w", iters = 2)
      .orderBy("id").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(10L) > r(11L))
    val par = Seq((1L, 10L, 3L), (1L, 10L, 6L), (1L, 11L, 1L))
      .toDF("src", "dst", "w")
    val rp = Graph.pageRankWeightedMicro(par, "src", "dst", "w", iters = 2)
      .orderBy("id").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(rp == r, "parallel edges must sum to the same weights")
  }

  test("bfsHops: line graph distances, hop bound, unreachable absent") {
    val line = Seq((1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (8, 9))
      .toDF("src", "dst")
    val seeds = Seq(1).toDF("sid")
    val out = Graph.bfsHops(line, "src", "dst", seeds, "sid", maxHops = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    // nodes 5, 6 are beyond 3 hops; component {8,9} unreachable
    assert(out == Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3)))
  }

  test("bfsHops: multiple seeds take the min, cycles don't loop") {
    val ring = Seq((1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1))
      .toDF("src", "dst")
    val seeds = Seq(1, 4).toDF("sid")
    val out = Graph.bfsHops(ring, "src", "dst", seeds, "sid", maxHops = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out == Seq((1L, 0), (2L, 1), (3L, 1), (4L, 0), (5L, 1),
      (6L, 1)))
    // a seed with no edges still reports itself at distance 0
    val lone = Graph.bfsHops(ring, "src", "dst", Seq(99).toDF("sid"),
        "sid", maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(lone == Seq((99L, 0)))
  }

  test("shortestPaths: weighted relaxation beats fewer hops; " +
      "parallel edges take the min; bounded rounds observable") {
    // seed 1; edge (1,4) costs 10, path 1-2-3-4 costs 1+1+1 — the
    // 3-round relax must find the cheap 3-edge path; a duplicate
    // (1,4) edge at cost 2 (reversed direction) must shadow the 10
    val g = Seq((1, 2, 1L), (2, 3, 1L), (3, 4, 1L), (1, 4, 10L))
      .toDF("s", "d", "w")
    val seeds = Seq(1L).toDF("sid")
    val d3 = Graph.shortestPaths(g, "s", "d", "w", seeds, "sid", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // with only 1 round, node 4 is reachable only by the direct edge
    val d1 = Graph.shortestPaths(g, "s", "d", "w", seeds, "sid", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 == Map(1L -> 0L, 2L -> 1L, 4L -> 10L))
    // parallel-edge min: add a cheaper reversed copy of (1,4)
    val g2 = g.union(Seq((4, 1, 2L)).toDF("s", "d", "w"))
    val p1 = Graph.shortestPaths(g2, "s", "d", "w", seeds, "sid", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1(4L) == 2L)
  }

  test("kCorePeel: cascade peel reaches the true core; fixpoint " +
      "within rounds; k above max degree empties") {
    // a 4-clique {1,2,3,4} with a pendant PATH 4-5-6-7: peeling k=2
    // must cascade down the path (7 first, then 6, then 5) — three
    // genuine rounds — and leave exactly the clique, every survivor
    // at in-subgraph degree 3
    val g = (Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)) ++
      Seq((4, 5), (5, 6), (6, 7))).toDF("src", "dst")
    val core = Graph.kCorePeel(g, "src", "dst", k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // one MORE round is a no-op (the peel had converged)
    val more = Graph.kCorePeel(g, "src", "dst", k = 2, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more == core)
    // fewer rounds than the cascade needs: path remnants survive
    // (the bounded-round contract is observable, not hidden)
    val early = Graph.kCorePeel(g, "src", "dst", k = 2, rounds = 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(early.contains(5L) && early.contains(6L) && !early.contains(7L))
    // k above the max degree empties the graph
    assert(Graph.kCorePeel(g, "src", "dst", k = 4, rounds = 4)
      .count() == 0)
  }

  test("clusteringCoefficients: hand graph — clique corners 10⁶, " +
      "bridge dilution, wedge-only 0, degree-1 drops") {
    // triangle {1,2,3} + pendant 4 on node 3 + wedge center 5
    // between 6 and 7
    val g = Seq((1, 2), (2, 3), (3, 1), (3, 4), (5, 6), (5, 7))
      .toDF("src", "dst")
    val out = Graph.clusteringCoefficients(g, "src", "dst")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 1L, 1000000L))) // pure triangle corner
    assert(out(2L) == ((2L, 1L, 1000000L)))
    assert(out(3L) == ((3L, 1L, 333333L))) // 1 tri / C(3,2), floored
    assert(out(5L) == ((2L, 0L, 0L)))      // wedge, never closed
    assert(!out.contains(4L) && !out.contains(6L)) // degree-1 drop
  }
}
