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

  test("events loader: nanos-as-long and native-timestamp parquet agree") {
    // the driver has generated events.ts BOTH ways across rounds —
    // TIMESTAMP(NANOS) (readable only via nanosAsLong → bigint) and
    // native timestamp[us] (round 9 broke every events query until
    // the loader dispatched on the physical type). Pin both branches:
    // identical micros out, TimestampType both ways.
    import org.apache.spark.sql.types.TimestampType
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-events-schema").toString
    val micros = Seq(
      (1L, 1723500000123456L, 10L, "click", 1.5, "{}"),
      (2L, 1723586400987654L, 11L, "view", 2.5, "{}"))
    // variant A: ts as int64 NANOS (the nanosAsLong read surface)
    micros.map { case (e, us, u, t, v, p) => (e, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/nanos/events.parquet")
    // variant B: ts as a native microsecond timestamp (NTZ on read)
    micros.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$base/native/events.parquet")
    val a = graft.queries.QuerySpec.events(spark, s"$base/nanos")
    val b = graft.queries.QuerySpec.events(spark, s"$base/native")
    assert(a.schema("ts").dataType == TimestampType, s"nanos branch: ${a.schema}")
    assert(b.schema("ts").dataType == TimestampType, s"native branch: ${b.schema}")
    val ra = a.orderBy($"event_id").collect().map(_.toSeq).toSeq
    val rb = b.orderBy($"event_id").collect().map(_.toSeq).toSeq
    assert(ra == rb, s"loader branches disagree:\n$ra\nvs\n$rb")
    assert(ra.head(1).asInstanceOf[java.sql.Timestamp].getTime == 1723500000123L)
  }
}
