package graft

import org.apache.spark.sql.functions._

import graft.ops.Expectations
import graft.ops.Expectations._

/** Declarative expectations: hand-planted violations per rule kind,
  * rule-order preservation, null semantics (null FK/row-local values
  * are absent, not violations), and the one-scan plan contract for
  * the fused row-local rules. */
class ExpectationsSpec extends SparkSuite {
  import spark.implicits._

  private def planted = Seq(
    // (id, k, status, score, name)
    (1L, Some(10L), "F", 5L, "a-1"),
    (2L, Some(10L), "O", 50L, "b-2"),   // score out of [0,20]
    (3L, None, "X", 5L, "c-3"),         // null k; bad status
    (4L, Some(99L), "F", -1L, "dd"),    // dangling k; score low; bad name
    (4L, Some(10L), "O", 5L, "e-5")     // duplicate id
  ).toDF("id", "k", "status", "score", "name")

  private def parents = Seq(10L, 11L).toDF("pk")

  test("each rule kind counts its planted violations; order preserved") {
    val out = Expectations.check(planted, Seq(
        NotNull("k_not_null", "k"),
        InRange("score_range", "score", 0L, 20L),
        AcceptedValues("status_domain", "status", Seq("F", "O")),
        MatchesRegex("name_format", "name", "[a-z]-[0-9]"),
        Unique("id_unique", Seq("id")),
        ForeignKey("k_fk", "k", parents, "pk")))
      .orderBy(col("rule_ord"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("k_not_null", 1L), ("score_range", 2L), ("status_domain", 1L),
      ("name_format", 1L), ("id_unique", 1L), ("k_fk", 1L)))
  }

  test("clean table → all zeros; empty-frame unique sums to 0 not null") {
    val clean = Seq((1L, "F")).toDF("id", "status")
    val out = Expectations.check(clean, Seq(
        AcceptedValues("s", "status", Seq("F")),
        Unique("u", Seq("id"))))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(out == Map("s" -> 0L, "u" -> 0L))
    val empty = Expectations.check(clean.filter(col("id") < 0), Seq(
        Unique("u", Seq("id"))))
      .collect().map(_.getLong(2)).toSeq
    assert(empty == Seq(0L))
  }

  test("row-local rules fuse into ONE scan of the source") {
    val dir = java.nio.file.Files
      .createTempDirectory("expectations_scan").toString
    planted.write.mode("overwrite").parquet(s"$dir/t.parquet")
    val t = spark.read.parquet(s"$dir/t.parquet")
    val plan = Expectations.check(t, Seq(
        NotNull("a", "k"), InRange("b", "score", 0L, 20L),
        AcceptedValues("c", "status", Seq("F", "O")),
        MatchesRegex("d", "name", ".*")))
      .queryExecution.executedPlan.toString
    val scans = "t\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan for 4 fused rules, got $scans")
  }

  test("functional dependency: extra images count, null rhs absent") {
    val df = Seq(
      ("a", Some(1L)), ("a", Some(2L)), ("a", Some(2L)), // a → {1,2}: 1
      ("b", Some(5L)), ("b", Some(5L)),                  // clean
      ("c", None), ("c", None),                          // all-null: 0
      ("d", None), ("d", Some(9L))                       // one image: 0
    ).toDF("k", "v")
    val out = Expectations.check(df,
        Seq(FunctionalDependency("fd", Seq("k"), "v")))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("fd", 1L)))
  }

  test("monotone: planted descents count; nulls and first rows never " +
      "violate; ≡ the plain-window count under a mega-key") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{lag, sum, when, lit, coalesce}
    val hand = Seq(
      (1L, 1L, Some(10L)), (1L, 2L, Some(5L)),   // descent
      (1L, 3L, None), (1L, 4L, Some(1L)),        // null lanes: 0
      (2L, 1L, Some(7L)), (2L, 2L, Some(7L)),    // equal: 0
      (2L, 3L, Some(9L)), (2L, 4L, Some(2L))     // descent
    ).toDF("k", "o", "v")
    val out = Expectations.check(hand,
        Seq(Monotone("m", "k", "o", "v")))
      .collect().map(_.getLong(2)).head
    assert(out == 2L)
    // mega-key differential vs the plain window count
    val big = spark.range(6000).selectExpr(
        "CASE WHEN id % 100 < 95 THEN 0 ELSE id % 7 + 1 END AS k",
        "id AS o", "CAST((id * 31) % 97 AS BIGINT) AS v")
      .repartition(9)
    val fast = Expectations.check(big,
        Seq(Monotone("m", "k", "o", "v")))
      .collect().map(_.getLong(2)).head
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val plain = big.withColumn("p", lag(col("v"), 1).over(w))
      .agg(coalesce(sum(when(col("p") > col("v"), 1L).otherwise(0L)),
        lit(0L)))
      .collect().head.getLong(0)
    assert(fast == plain)
  }

  test("nonOverlapping: chained containment counts, adjacency does " +
      "not; null lanes; ≡ plain prior-max window under a mega-key") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{max => fmax, sum, when, lit,
      coalesce}
    // key 1: [0,10) [5,7) [6,20) [20,25) — the 2nd overlaps the 1st,
    // the 3rd overlaps the 1st (prior-max 10 > 6) even though its
    // immediate predecessor ends at 7; [20,25) is adjacent → clean
    val hand = Seq(
      (1L, 0L, 0L, Some(10L)), (1L, 5L, 5L, Some(7L)),
      (1L, 6L, 6L, Some(20L)), (1L, 20L, 20L, Some(25L)),
      (2L, 0L, 0L, None), (2L, 3L, 3L, Some(4L)) // null end: no bound
    ).toDF("k", "o", "s", "e")
    val out = Expectations.check(hand, Seq(
        NonOverlapping("ov", "k", "o", "s", "e")))
      .collect().map(_.getLong(2)).head
    assert(out == 2L)
    // mega-key differential vs the plain prior-max window
    val big = spark.range(5000).selectExpr(
        "CASE WHEN id % 100 < 95 THEN 0 ELSE id % 5 + 1 END AS k",
        "id AS o", "CAST((id * 13) % 400 AS BIGINT) AS s",
        "CAST((id * 13) % 400 + (id * 7) % 30 AS BIGINT) AS e")
      .selectExpr("k", "s * 100000 + o AS o", "s", "e")
      .repartition(9)
    val fast = Expectations.check(big, Seq(
        NonOverlapping("ov", "k", "o", "s", "e")))
      .collect().map(_.getLong(2)).head
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val plain = big.withColumn("pm", fmax(col("e")).over(w))
      .agg(coalesce(sum(when(col("s") < col("pm"), 1L).otherwise(0L)),
        lit(0L)))
      .collect().head.getLong(0)
    assert(fast == plain && fast > 0L)
  }

  test("sizeBetween: shortfall/overage distances, in-bounds zero, " +
      "empty frame counts the full lo shortfall; wouldAbort keeps " +
      "only the violated rules") {
    val df = (1L to 10L).toDF("id")
    val out = Expectations.check(df, Seq(
        SizeBetween("too_small", 25L, 100L),  // 10 < 25 → 15
        SizeBetween("too_big", 1L, 7L),       // 10 > 7  → 3
        SizeBetween("in_bounds", 5L, 15L)))   // → 0
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(out == Map("too_small" -> 15L, "too_big" -> 3L,
      "in_bounds" -> 0L))
    // empty frame: count() is 0, shortfall = lo (never null)
    val empty = Expectations.check(df.filter(col("id") < 0), Seq(
        SizeBetween("nonempty", 3L, 100L), Unique("u", Seq("id"))))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(empty == Map("nonempty" -> 3L, "u" -> 0L))
    // the abort row set = exactly the violated rules, ord preserved
    val abort = Expectations.wouldAbort(df, Seq(
        SizeBetween("in_bounds", 5L, 15L),
        SizeBetween("too_big", 1L, 7L)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(abort == Seq((1L, "too_big", 3L)))
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.check(planted,
        Seq(NotNull("x", "k"), Unique("x", Seq("id"))))
    }
  }
}
