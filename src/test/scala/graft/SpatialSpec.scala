package graft

import org.apache.spark.sql.functions._
import graft.ops.Spatial

/** Grid distance-join semantics: inclusive radius, cell-border pairs
  * caught by the neighbor probe, each pair exactly once, differential
  * vs brute force on the real md5 point set. */
class SpatialSpec extends SparkSuite {
  import spark.implicits._

  private def pairsOf(pts: Seq[(Long, Long, Long)], r: Long) =
    Spatial.distanceJoin(pts.toDF("id", "x", "y"), "id", "x", "y", r)
      .orderBy("a", "b").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSeq

  test("inclusive radius, chain pairs, far point excluded") {
    val pts = Seq((1L, 0L, 0L), (2L, 100L, 0L), (3L, 200L, 0L),
      (4L, 5000L, 5000L))
    // r=150: (1,2) d2=10000, (2,3) d2=10000; (1,3) d=200 excluded
    assert(pairsOf(pts, 150) == Seq((1L, 2L, 10000L), (2L, 3L, 10000L)))
    // exactly-at-radius is INCLUDED: d2 = 150² = 22500
    assert(pairsOf(Seq((1L, 0L, 0L), (2L, 150L, 0L)), 150) ==
      Seq((1L, 2L, 22500L)))
    // one past the radius is not
    assert(pairsOf(Seq((1L, 0L, 0L), (2L, 151L, 0L)), 150).isEmpty)
  }

  test("pairs straddling cell borders are caught, incl. diagonals") {
    // r=150 → cells of 150: (149,0) in cell 0, (151,0) in cell 1
    assert(pairsOf(Seq((1L, 149L, 0L), (2L, 151L, 0L)), 150) ==
      Seq((1L, 2L, 4L)))
    // diagonal neighbors: (149,149) cell (0,0), (151,151) cell (1,1)
    assert(pairsOf(Seq((1L, 149L, 149L), (2L, 151L, 151L)), 150) ==
      Seq((1L, 2L, 8L)))
    // same cell still joins
    assert(pairsOf(Seq((1L, 10L, 10L), (2L, 20L, 20L)), 150) ==
      Seq((1L, 2L, 200L)))
  }

  test("differential vs brute force on the md5 customer points") {
    val pts = spark.read.parquet(s"$sf0001/customer.parquet").select(
      col("c_custkey").as("id"),
      Spatial.hashCoord("gx:", col("c_custkey"), 10000).as("x"),
      Spatial.hashCoord("gy:", col("c_custkey"), 10000).as("y"))
    // generous radius so the 150-customer sf0.001 set yields pairs
    val r = 1500L
    val got = Spatial.distanceJoin(pts, "id", "x", "y", r)
      .orderBy("a", "b").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSeq
    val raw = pts.collect().map(row =>
      (row.getLong(0), row.getLong(1), row.getLong(2)))
    val brute = (for {
      (a, ax, ay) <- raw; (b, bx, by) <- raw if a < b
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by) if d2 <= r * r
    } yield (a, b, d2)).sortBy(t => (t._1, t._2)).toSeq
    assert(got.nonEmpty && got == brute,
      s"grid ${got.length} pairs vs brute ${brute.length}")
  }
}
