package graft

import org.apache.spark.sql.functions._

/** Approx-aggregate quality: HLL++ distinct within 5% of exact,
  * approx median within the exact p40-p60 band. */
class ApproxSpec extends SparkSuite {
  import spark.implicits._

  test("approx_count_distinct and percentile_approx track exact values") {
    val rows = SparkEntry.queries("q49_approx_stats")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val Array(p40, p60) = li.stat.approxQuantile("l_extendedprice",
      Array(0.4, 0.6), 0.0)
    val approxMedian = li.agg(
      percentile_approx($"l_extendedprice", lit(0.5), lit(1000))).head().getDouble(0)
    assert(approxMedian >= p40 && approxMedian <= p60)
  }
}
