package graft

import graft.ops.Profile

/** Column-profile semantics on a planted frame (nulls, duplicates,
  * type-native min/max) and the single-scan plan shape. */
class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("profile: counts/nulls/distincts/min-max, native-type ordering") {
    val df = Seq(
      (Some(9L), Some("b")),
      (Some(10L), Some("a")),
      (Some(10L), None),
      (None, Some("a")))
      .toDF("num", "s")
    val out = Profile.profile(df, Seq("num", "s"))
      .orderBy("col_name").collect()
    val num = out(0); val s = out(1)
    assert(num.getString(0) == "num" && num.getLong(1) == 4 &&
      num.getLong(2) == 3 && num.getLong(3) == 2)
    // native long min/max: 9 < 10 (a string-space min would say "10")
    assert(num.getString(4) == "9" && num.getString(5) == "10")
    assert(s.getLong(2) == 3 && s.getLong(3) == 2 &&
      s.getString(4) == "a" && s.getString(5) == "b")
  }

  test("profileApprox: estimate == hllEstimate register-for-register, " +
      "band vs truth, exact stats unchanged, both lanes") {
    import org.apache.spark.sql.functions.col
    // 5000 distinct longs + a low-cardinality string column + nulls
    val df = (1 to 5000).map(i =>
        (if (i % 50 == 0) None else Some(i.toLong), s"s-${i % 7}"))
      .toDF("num", "s")
    for (portable <- Seq(true, false)) {
      val out = Profile.profileApprox(df, Seq("num", "s"), portable)
        .orderBy("col_name").collect()
      val num = out(0); val s = out(1)
      // exact stats identical to Profile.profile's
      assert(num.getLong(1) == 5000 && num.getLong(2) == 4900)
      assert(num.getString(4) == "1" && num.getString(5) == "4999")
      assert(s.getLong(2) == 5000 && s.getString(4) == "s-0" &&
        s.getString(5) == "s-6")
      // the estimate must be EXACTLY what hllEstimate derives from
      // the same lane's register table (the math is shared, only
      // re-expressed over integer sufficient statistics)...
      val regs =
        if (portable) graft.ops.Sketches.hllRegisters(
          df.filter(col("num").isNotNull), "num")
        else graft.ops.Sketches.hllRegistersFast(
          df.filter(col("num").isNotNull), "num")
      val ref = math.round(graft.ops.Sketches.hllEstimate(regs))
      assert(num.getLong(3) == ref, s"portable=$portable: ${num.getLong(3)} != $ref")
      // ...and inside the m=256 band of truth (3 sigma = 20%)
      assert(math.abs(num.getLong(3) - 4900) / 4900.0 < 0.20,
        s"portable=$portable est=${num.getLong(3)}")
      // low cardinality rides the linear-counting branch exactly
      assert(s.getLong(3) == 7, s"portable=$portable est7=${s.getLong(3)}")
    }
  }

  test("categoricalProfile: mode tiebreak, gini floor arithmetic, " +
      "single-value and uniform groups") {
    // g=1: counts {5:3, 7:3, 9:1} — tie between 5 and 7 → mode 5;
    //      n=7, nd=3, sq=19, gini = floor(1e6·(49−19)/49) = 612244
    // g=2: single value → gini 0
    // g=3: uniform two values → gini = floor(1e6·(4−2)/4) = 500000
    val df = (Seq.fill(3)(5L) ++ Seq.fill(3)(7L) ++ Seq(9L))
      .map((1L, _)) ++ Seq((2L, 4L), (2L, 4L), (3L, 1L), (3L, 2L))
    val out = Profile.categoricalProfile(
        df.toDF("g", "v"), "g", "v")
      .orderBy("g").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      (1L, 7L, 3L, 5L, 3L, 612244L),
      (2L, 2L, 1L, 4L, 2L, 0L),
      (3L, 2L, 2L, 1L, 1L, 500000L)))
  }

  test("profile: one scan for all columns") {
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("a", "b")
    val plan = Profile.profile(df, Seq("a", "b"))
      .queryExecution.optimizedPlan
    // all aggregates fold into one pass over one relation — profiling
    // N columns must not scan the table N times
    val scans = plan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => r
      case r if r.getClass.getSimpleName.contains("Relation") => r
    }
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}:\n$plan")
  }
}
