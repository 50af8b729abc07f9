package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Exact-integer PCA chain (q318-q320): hand scatter values, the
  * power iteration's fixed points, projection dots — everything
  * computed by hand in micro units. */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("pcaScatterMicro: hand n·G − s·sᵀ on 2-dim vectors; null and " +
      "wrong-width rows drop") {
    val d = vecs(Seq(
      1L -> Seq(1.0f, 2.0f),
      2L -> Seq(3.0f, 4.0f),
      3L -> Seq(5.0f, 6.0f),
      4L -> Seq(9.0f),          // wrong width: dropped
      5L -> null))              // null: dropped
      .unionByName(spark.sql( // null ELEMENT: whole vector dropped
        "SELECT CAST(6 AS BIGINT) AS vec_id, " +
          "array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS embedding"))
    val out = Similarity.pcaScatterMicro(d, "embedding", dims = 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        r.getDecimal(2).toBigInteger.longValueExact()).toMap
    // micro vectors (1e6,2e6),(3e6,4e6),(5e6,6e6): n=3,
    // s=(9e6,12e6), G=[[35e12,44e12],[44e12,56e12]],
    // M = 3G − ssᵀ = 24e12 in every cell
    val m = 24L * 1000000000000L
    assert(out == Map((0, 0) -> m, (0, 1) -> m, (1, 1) -> m))
  }

  test("principalDirectionMicro: all-equal scatter fixes (1e6, 1e6); " +
      "axis-aligned data fixes the axis; zero scatter keeps the " +
      "lowest-diagonal start") {
    def dir(rows: Seq[(Long, Seq[Float])]) =
      Similarity.principalDirectionMicro(
          Similarity.pcaScatterMicro(vecs(rows), "embedding", 2),
          dims = 2, iters = 8)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // collinear along (1,1): w ties every iteration -> exact fixpoint
    assert(dir(Seq(1L -> Seq(1.0f, 2.0f), 2L -> Seq(3.0f, 4.0f),
      3L -> Seq(5.0f, 6.0f))) == Map(0 -> 1000000L, 1 -> 1000000L))
    // variance only on dim 1
    assert(dir(Seq(1L -> Seq(2.0f, 1.0f), 2L -> Seq(2.0f, 5.0f),
      3L -> Seq(2.0f, 9.0f))) == Map(0 -> 0L, 1 -> 1000000L))
    // constant vectors: M = 0 everywhere, start = dim 0 (tie rule)
    assert(dir(Seq(1L -> Seq(1.0f, 1.0f), 2L -> Seq(1.0f, 1.0f)))
      == Map(0 -> 1000000L, 1 -> 0L))
  }

  test("principalDirectionMicro: converges to the dominant direction " +
      "on a planted anisotropic cloud (strict |v₀| < |v₁| ordering)") {
    // points spread 10x wider along dim 1 than dim 0
    val rows = (0 until 40).map(i =>
      i.toLong -> Seq((i % 4).toFloat * 0.01f, (i % 10).toFloat * 0.1f))
    val v = Similarity.principalDirectionMicro(
        Similarity.pcaScatterMicro(vecs(rows), "embedding", 2), 2, 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(math.abs(v(1)) == 1000000L, "dominant axis carries the L∞ unit")
    assert(math.abs(v(0)) < 200000L, s"minor axis stays small: $v")
  }

  test("pcaProjectMicro: exact integer dots against a literal " +
      "direction; wrong-width rows drop") {
    val d = vecs(Seq(1L -> Seq(1.0f, 2.0f), 2L -> Seq(3.0f, 4.0f),
      3L -> Seq(9.0f)))
    val direction = Seq((0, 1000000L), (1, 1000000L))
      .toDF("dim", "v_micro")
    val out = Similarity.pcaProjectMicro(d, "vec_id", "embedding",
        direction, dims = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3000000000000L, 2L -> 7000000000000L))
  }

  test("principalComponentsMicro: component 0 ≡ the single-direction " +
      "op; k components orthogonal within the quantization bound; " +
      "axis-aligned data recovers both axes in variance order") {
    // anisotropic: wide on dim 1, narrow on dim 0, zero covariance
    val rows = (0 until 40).map(i =>
      i.toLong -> Seq((i % 4).toFloat * 0.01f, (i % 10).toFloat * 0.1f))
    val scatter = Similarity.pcaScatterMicro(vecs(rows), "embedding", 2)
    val comps = Similarity.principalComponentsMicro(scatter, 2, 8, 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val single = Similarity.principalDirectionMicro(scatter, 2, 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(comps((0, 0)) == single(0) && comps((0, 1)) == single(1),
      "component 0 is byte-identical to principalDirectionMicro")
    // dominant = dim 1, second = dim 0 (variance order)
    assert(math.abs(comps((0, 1))) == 1000000L)
    assert(math.abs(comps((1, 0))) == 1000000L,
      s"second component carries the minor axis: $comps")
    // orthogonality within the 10^-6-per-entry quantization bound:
    // |v0 . v1| <= d * 1e6 * (max quantization step ~ 1e6) scaled —
    // empirically far tighter; pin a conservative 1e10 (exact zero
    // for this axis-aligned fixture would be 0 +- trunc noise)
    val dot = (0 until 2).map(d =>
      BigInt(comps((0, d))) * BigInt(comps((1, d)))).sum
    assert(dot.abs <= BigInt("10000000000"), s"near-orthogonal: $dot")
  }

  test("principalComponentsMicro: hand 2x2 deflation — after removing " +
      "the dominant axis the residual axis must win component 2") {
    // diagonal scatter diag(a, b), a >> b: v1 = e0; deflation leaves
    // ~diag(0, b) -> v2 = e1
    import spark.implicits._
    val scatter = Seq((0, 0, BigDecimal(9000000000000L)),
      (0, 1, BigDecimal(0)), (1, 1, BigDecimal(1000000000000L)))
      .toDF("i", "j", "m_scatter")
      .select(col("i"), col("j"),
        col("m_scatter").cast("decimal(38,0)").as("m_scatter"))
    val comps = Similarity.principalComponentsMicro(scatter, 2, 8, 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(comps == Map((0, 0) -> 1000000L, (0, 1) -> 0L,
      (1, 0) -> 0L, (1, 1) -> 1000000L))
  }

  test("pcaProjectKMicro + pcaCellNeighbors: exact per-component " +
      "scores, sign cells, same-cell ranking with id tie-break") {
    import spark.implicits._
    val comps = Seq((0, 0, 1000000L), (0, 1, 0L),
      (1, 0, 0L), (1, 1, 1000000L)).toDF("component", "dim", "v_micro")
    val d = vecs(Seq(
      1L -> Seq(1.0f, 1.0f),    // cell 3 (+,+)
      2L -> Seq(2.0f, 1.0f),    // cell 3
      3L -> Seq(3.0f, 1.0f),    // cell 3
      4L -> Seq(-1.0f, 1.0f)))  // cell 2 (-,+)
    val proj = Similarity.pcaProjectKMicro(d, "vec_id", "embedding",
      comps, dims = 2)
    val scores = proj.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(scores((1L, 0)) == 1000000000000L &&
      scores((1L, 1)) == 1000000000000L)
    assert(scores((4L, 0)) == -1000000000000L)
    val nn = Similarity.pcaCellNeighbors(proj, "vec_id",
        col("vec_id") === 1L, topK = 2)
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // query 1 (cell 3): neighbors 2 then 3 by distance; 4 is in
    // another cell and must NOT appear
    assert(nn == Map(1 -> ((2L, 3L)), 2 -> ((3L, 3L))))
  }
}
