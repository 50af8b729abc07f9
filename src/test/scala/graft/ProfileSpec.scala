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
