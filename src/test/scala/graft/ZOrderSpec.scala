package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrder

/** Morton-code bijectivity and the layout property the operator
  * exists for: a zordered range partitioning gives every partition a
  * narrow min/max envelope on BOTH dimensions (→ file pruning on
  * either column), where a hash layout's envelopes span the domain. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("mortonCode/mortonDecode: bijective over a dense grid") {
    val bits = 6 // 64x64 grid = 4096 codes, exhaustive
    val grid = (0 until 64).flatMap(a => (0 until 64).map(b => (a, b)))
      .toDF("a", "b")
    val (da, db) = ZOrder.mortonDecode(col("z"), bits)
    val bad = grid
      .withColumn("z", ZOrder.mortonCode(col("a"), col("b"), bits))
      .select(col("a"), col("b"), col("z"), da.as("da"), db.as("db"))
      .filter(col("da") =!= col("a") || col("db") =!= col("b"))
      .count()
    assert(bad == 0)
    // codes are distinct (injective) and fill exactly [0, 4096)
    val codes = grid
      .withColumn("z", ZOrder.mortonCode(col("a"), col("b"), bits))
      .select(col("z")).distinct()
    assert(codes.count() == 4096)
    assert(codes.agg(min(col("z")), max(col("z"))).head() ==
      org.apache.spark.sql.Row(0L, 4095L))
  }

  test("zordered layout: per-partition envelopes are narrow on BOTH dims") {
    val bits = 8; val domain = 256
    // deterministic pseudo-uniform 2-d points
    val pts = (0 until 20000).map { i =>
      ((i * 48271) % domain, (i * 16807 + 11) % domain)
    }.toDF("a", "b")
    def envelopes(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("pid", spark_partition_id())
      .groupBy(col("pid"))
      .agg(((max(col("a")) - min(col("a"))) +
            (max(col("b")) - min(col("b")))).as("env"))
      .agg(avg(col("env"))).head().getDouble(0)
    val z = envelopes(ZOrder.zorderRepartition(pts, "a", "b", bits, 16))
    val hashed = envelopes(pts.repartition(16, col("a") + col("b") * 7))
    // 16 partitions of a 256x256 z-curve: each is ~4 tiles of 64x64 →
    // summed envelope well under half the 2·256 domain; a hash layout
    // scatters every partition across the full domain
    assert(z < 256.0, s"zordered envelope too wide: $z")
    assert(hashed > 300.0, s"hash layout unexpectedly narrow: $hashed")
    assert(z < hashed / 2, s"no pruning win: z=$z hashed=$hashed")
  }
}
