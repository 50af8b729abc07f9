package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{EventAnalytics, Profile, Relational}

/** Hand cases for the second-wave analytics ops: Pareto frontier
  * dominance edges, sessionization gap boundaries, and the integer
  * z-score outlier rewrite (the q155–q157 gates prove oracle
  * agreement at scale). */
class AnalyticsOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("joinFanoutProfile: 0 lane for unmatched keys, multiplicity " +
      "histogram exact, null keys out") {
    val left = Seq(Some(1L), Some(2L), Some(3L), Some(3L), Some(4L),
      None).toDF("k")
    val right = Seq(1L, 1L, 1L, 2L, 4L).toDF("k2")
    val out = Relational.joinFanoutProfile(left, "k", right, "k2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // key 1 -> 3 matches, key 2 -> 1, key 3 -> 0 (one key, deduped),
    // key 4 -> 1; nulls ignored
    assert(out == Map(0L -> 1L, 1L -> 2L, 3L -> 1L))
  }

  test("slidingDistinctStats: window estimate tracks the exact " +
      "trailing distinct within the m=256 band; single-hour " +
      "window equals per-hour registers") {
    val evs = (1 to 3000).map { i =>
      val hour = i % 6 // six observed hours
      (ts(f"2026-05-01 ${10 + hour}%02d:0${i % 6}:00"),
        (math.abs(s"sd$i".hashCode) % 700).toLong)
    }.toDF("ts", "uid")
    val got = graft.ops.Sketches.slidingDistinctStats(
        evs, "ts", "uid", windowHours = 3)
      .collect().map(r => (r.getString(0),
        graft.ops.Sketches.hllEstimateFromStats(r.getInt(1),
          r.getLong(2))))
      .toMap
    // exact trailing-3h distinct per observed hour, from the raw rows
    val rows = evs.collect().map(r =>
      (r.getTimestamp(0).getTime / 3600000L, r.getLong(1)))
    val hours = rows.map(_._1).distinct.sorted
    hours.foreach { h =>
      val exact = rows.filter(r => r._1 <= h && r._1 >= h - 2)
        .map(_._2).distinct.size
      val sdf = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      sdf.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val key = sdf.format(new java.util.Date(h * 3600000L))
      val est = got(key)
      assert(math.abs(est - exact) <= 0.15 * exact,
        s"window $key: est $est vs exact $exact")
    }
  }

  test("paretoFrontier: dominance, ties, duplicates, per-group isolation") {
    val pts = Seq(
      // group A frontier: (5,1), (2,2), (1,5) — mutually incomparable;
      // (4,1) dominated by (5,1), (1,4) by (1,5); (5,1) duplicated in
      // the input — frontier emits distinct points
      ("A", 5L, 1L), ("A", 5L, 1L), ("A", 1L, 5L), ("A", 4L, 1L),
      ("A", 1L, 4L), ("A", 2L, 2L),
      // same-x tie: only the max y of x=3 survives alongside (4,9)?
      // (3,7) vs (3,9): (3,9) dominates (3,7); (4,9) dominates (3,9)
      ("B", 3L, 7L), ("B", 3L, 9L), ("B", 4L, 9L),
      // group C: single point
      ("C", 0L, 0L))
      .toDF("g", "x", "y")
    val out = Relational.paretoFrontier(pts, "g", "x", "y")
      .orderBy("g", "x", "y").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("A", 1L, 5L), ("A", 2L, 2L), ("A", 5L, 1L),
      ("B", 4L, 9L), ("C", 0L, 0L)))
  }

  test("paretoFrontier: differential vs quadratic dominance on md5 points") {
    val pts = spark.read.parquet(s"$sf0001/part.parquet").select(
      col("p_brand").as("g"), col("p_size").cast("long").as("x"),
      (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
        .as("y"))
    val got = Relational.paretoFrontier(pts, "g", "x", "y")
      .orderBy("g", "x", "y").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val raw = pts.distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val brute = raw.filter { case (g, x, y) =>
      !raw.exists { case (g2, x2, y2) =>
        g2 == g && x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(got.nonEmpty && got == brute)
  }

  test("sessionize: gap boundary is strict, stats exact") {
    val e = Seq(
      (1L, 10L, ts("2026-01-05 10:00:00"), 1.00),
      (1L, 11L, ts("2026-01-05 10:30:00"), 2.00), // gap == 30min: SAME
      (1L, 12L, ts("2026-01-05 11:00:01"), 3.00), // 30min+1s: NEW
      (1L, 13L, ts("2026-01-05 11:10:01"), 4.00),
      (2L, 20L, ts("2026-01-05 09:00:00"), 9.00))
      .toDF("user_id", "event_id", "ts", "value")
    val out = EventAnalytics.sessionize(e, "user_id", "ts", "event_id",
        "value", gapMicros = 1800000000L)
      .orderBy("user_id", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5),
        r.getLong(6))).toSeq
    assert(out == Seq(
      (1L, 1L, 2L, 1800000000L, 300L), // 2 events, 30min span, 3.00
      (1L, 2L, 2L, 600000000L, 700L),  // 2 events, 10min span, 7.00
      (2L, 1L, 1L, 0L, 900L)))
  }

  test("fingerprint: order/partitioning-independent; any row change flips it") {
    import graft.ops.Reconcile
    val df = (1L to 500L).map(i => (i, s"name_$i")).toDF("k", "s")
    def fp(d: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = Reconcile.fingerprint(d, "t", Seq(col("k"), col("s")))
        .collect()(0)
      (r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val base = fp(df)
    assert(fp(df.repartition(13)) == base)
    assert(fp(df.orderBy(col("k").desc)) == base)
    // one mutated row changes the fingerprint, count unchanged
    val mutated = df.withColumn("s",
      when(col("k") === 250L, lit("tampered")).otherwise(col("s")))
    val m = fp(mutated)
    assert(m._1 == base._1 && (m._2 != base._2 || m._3 != base._3))
    // swapping content between two rows changes it too (not just sums)
    val swapped = df.withColumn("s",
      when(col("k") === 1L, lit("name_2"))
        .when(col("k") === 2L, lit("name_1")).otherwise(col("s")))
    val sw = fp(swapped)
    assert(sw._2 != base._2 || sw._3 != base._3)
    // XOR's blind spot — even multiplicities ({A,A} vs {B,B} both
    // XOR to 0) — is exactly what the modular-sum lane catches
    val aa = Seq((1L, "A"), (1L, "A")).toDF("k", "s")
    val bb = Seq((1L, "B"), (1L, "B")).toDF("k", "s")
    val (na, xa, sa) = fp(aa); val (nb, xb, sb) = fp(bb)
    assert(na == nb && xa == 0L && xb == 0L, "XOR lane is blind here")
    assert(sa != sb, "sum60 lane must separate even-multiplicity swaps")
  }

  test("tableDiff: added/removed/changed labeled, unchanged silent") {
    import graft.ops.Reconcile
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("k", "s", "v")
    val rev = Seq((1L, "a", 10L),        // unchanged
      (2L, "b", 99L),                    // changed
      (4L, "D", 40L),                    // changed (string col)
      (5L, "e", 50L))                    // added; 3 removed
      .toDF("k", "s", "v")
    val out = Reconcile.tableDiff(base, rev, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((2L, "changed"), (3L, "removed"), (4L, "changed"),
      (5L, "added")))
  }

  test("groupOutliers: planted spike flagged, uniform group silent") {
    // group 1: 20 values of 100 and one 10000 → clear z=3 outlier;
    // group 2: constant values → zero variance, nothing flagged
    val rows = (1L to 20L).map(i => (1L, i, 100L)) ++
      Seq((1L, 99L, 10000L)) ++ (1L to 20L).map(i => (2L, i, 500L))
    val df = rows.toDF("g", "id", "v_centi")
    val out = Profile.groupOutliers(df, "g", Seq("id"), "v_centi", z = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 99L, 10000L)))
  }

  test("coOccurrence: within-basket duplicates collapse, support " +
      "counts baskets, minSupport filters, mega-basket excluded") {
    import graft.ops.Relational
    // baskets: b1 {1,2,3} (item 2 listed twice), b2 {1,2}, b3 {2,3},
    // b4 {1,2}; mega basket b9 holds 1..50 and must be EXCLUDED
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (3L, 2L), (3L, 3L), (4L, 1L), (4L, 2L)) ++
      (1L to 50L).map(v => (9L, v))
    val df = rows.toDF("basket", "item").repartition(5)
    val out = Relational.coOccurrence(df, "basket", "item",
        minSupport = 2L, maxBasketSize = 40)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    // (1,2) in b1,b2,b4 = 3; (2,3) in b1,b3 = 2; (1,3) only b1 → cut
    assert(out == Map((1L, 2L) -> 3L, (2L, 3L) -> 2L))
    // with the cap lifted the mega basket floods every pair +1
    val capped = Relational.coOccurrence(df, "basket", "item",
        minSupport = 2L, maxBasketSize = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(capped((1L, 2L)) == 4L && capped((1L, 3L)) == 2L)
    // lift/confidence over the same kept baskets, BigInt-checked:
    // kept = b1..b4 (mega excluded), n_1 = 3, n_2 = 4, n_3 = 2,
    // baskets = 4, sup(1,2) = 3 → lift = 3·4/(3·4) = 1.0 exactly
    val lift = Relational.liftTable(df, "basket", "item",
        minSupport = 2L, maxBasketSize = 40)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
    assert(lift((1L, 2L)) ==
      ((3L, 3L, 4L, 4L, 1000000L, 1000000L, 750000L)))
    assert(lift((2L, 3L)) ==
      ((2L, 4L, 2L, 4L, 1000000L, 500000L, 1000000L)))
  }
}
