package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.IncrementalAgg

/** Incremental aggregate maintenance: merge ≡ rebuild under any split
  * of the input into batches, identity on empty batches, extremes
  * tracked across merges, and the persisted-state round trip. */
class IncrementalAggSpec extends SparkSuite {

  private val keys = Seq("l_returnflag", "l_linestatus", "l_suppkey")
  private val sums = Seq("l_quantity", "l_extendedprice")
  private val mins = Seq("l_shipdate")
  private val maxs = Seq("l_shipdate")

  private def li: DataFrame =
    spark.read.parquet(s"$sf0001/lineitem.parquet")

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy(keys.map(col): _*).collect().map(_.toString).toSeq

  test("merge of any batch split ≡ direct aggregate of the whole") {
    val full = IncrementalAgg.aggState(li, keys, sums, mins, maxs)
    for (nParts <- Seq(2, 3, 7)) {
      val parts = (0 until nParts).map(i =>
        IncrementalAgg.aggState(
          li.filter(pmod(col("l_orderkey"), lit(nParts)) === i),
          keys, sums, mins, maxs))
      val merged = IncrementalAgg.mergeState(parts, keys, sums, mins, maxs)
      assert(canon(merged) == canon(full), s"split into $nParts")
    }
  }

  test("merge folds incrementally: ((s1 ⊎ s2) ⊎ s3) ≡ direct") {
    val full = IncrementalAgg.aggState(li, keys, sums, mins, maxs)
    val folded = (0 until 3).map(i =>
      IncrementalAgg.aggState(
        li.filter(pmod(col("l_orderkey"), lit(3)) === i),
        keys, sums, mins, maxs))
      .reduce((a, b) =>
        IncrementalAgg.mergeState(Seq(a, b), keys, sums, mins, maxs))
    assert(canon(folded) == canon(full))
  }

  test("empty batch is a merge identity") {
    val state = IncrementalAgg.aggState(li, keys, sums, mins, maxs)
    val empty = IncrementalAgg.aggState(
      li.filter(lit(false)), keys, sums, mins, maxs)
    val merged = IncrementalAgg.mergeState(
      Seq(state, empty), keys, sums, mins, maxs)
    assert(canon(merged) == canon(state))
  }

  test("a delta carrying new extremes moves min/max, counts add") {
    import spark.implicits._
    val base = Seq(
      ("A", "O", 1L, 10L, 5.0, 100.0, "2024-03-01"),
      ("A", "O", 1L, 11L, 7.0, 200.0, "2024-05-01"))
      .toDF("l_returnflag", "l_linestatus", "l_suppkey", "l_orderkey",
        "l_quantity", "l_extendedprice", "l_shipdate")
      .withColumn("l_shipdate", to_timestamp(col("l_shipdate")))
    val delta = Seq(
      ("A", "O", 1L, 12L, 1.0, 50.0, "2023-12-31"), // earlier min
      ("A", "O", 1L, 13L, 2.0, 60.0, "2024-12-31")) // later max
      .toDF("l_returnflag", "l_linestatus", "l_suppkey", "l_orderkey",
        "l_quantity", "l_extendedprice", "l_shipdate")
      .withColumn("l_shipdate", to_timestamp(col("l_shipdate")))
    val merged = IncrementalAgg.mergeState(
      Seq(IncrementalAgg.aggState(base, keys, sums, mins, maxs),
        IncrementalAgg.aggState(delta, keys, sums, mins, maxs)),
      keys, sums, mins, maxs).collect()
    assert(merged.length == 1)
    val r = merged(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[java.math.BigDecimal]("sum_l_quantity")
      .compareTo(new java.math.BigDecimal("15.00")) == 0)
    assert(r.getAs[java.sql.Timestamp]("min_l_shipdate").toString
      .startsWith("2023-12-31"))
    assert(r.getAs[java.sql.Timestamp]("max_l_shipdate").toString
      .startsWith("2024-12-31"))
  }

  test("persisted state round-trips: write, read, merge ≡ in-memory merge") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_incr_agg_spec").toString
    val base = li.filter(pmod(col("l_orderkey"), lit(5)) =!= 0)
    val delta = li.filter(pmod(col("l_orderkey"), lit(5)) === 0)
    IncrementalAgg.aggState(base, keys, sums, mins, maxs)
      .write.mode("overwrite").parquet(s"$dir/state")
    val viaDisk = IncrementalAgg.mergeState(
      Seq(spark.read.parquet(s"$dir/state"),
        IncrementalAgg.aggState(delta, keys, sums, mins, maxs)),
      keys, sums, mins, maxs)
    val direct = IncrementalAgg.aggState(li, keys, sums, mins, maxs)
    assert(canon(viaDisk) == canon(direct))
  }
}
