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
}
