package graft

import org.apache.spark.sql.functions._

/** Approx-aggregate quality: HLL++ distinct within 5% of exact,
  * approx median within the exact p40-p60 band. */
class ApproxSpec extends SparkSuite {
  import spark.implicits._

  test("approx_count_distinct and percentile_approx track exact values") {
    // q49 now emits the accuracy contract as booleans (and its oracle
    // asserts them all true) — the spec checks the same contract holds
    // at this scale with a readable failure per event type
    val rows = SparkEntry.queries("q49_approx_stats")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("users_ok") && r.getAs[Boolean]("p50_ok") &&
        r.getAs[Boolean]("p99_ok"),
        s"${r.getString(0)}: $r")
    }
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val Array(p40, p60) = li.stat.approxQuantile("l_extendedprice",
      Array(0.4, 0.6), 0.0)
    val approxMedian = li.agg(
      percentile_approx($"l_extendedprice", lit(0.5), lit(1000))).head().getDouble(0)
    assert(approxMedian >= p40 && approxMedian <= p60)
  }
}
