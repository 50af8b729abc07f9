package graft

import org.apache.spark.sql.functions._
import graft.ops.{Profile, TextAnalysis}

/** Operator-level checks for the r16 text-eval + governance batch
  * (q311-q314): ROUGE-N clipped-overlap arithmetic, distinct-n
  * diversity, k-anonymity / l-diversity histograms — every value
  * hand-computed. */
class TextEvalSpec extends SparkSuite {
  import spark.implicits._

  test("rougeN: identical 10⁶ everywhere, disjoint 0, clipped " +
      "overlap hand value, short side scores 0 not null") {
    val pairs = Seq(
      // identical: 3 bigrams each, overlap 3 -> P=R=F1=10⁶
      (1L, "a b c d", "a b c d"),
      // disjoint: no shared bigram
      (2L, "a b c", "x y z"),
      // clipping: cand has "a b" twice, ref once -> min = 1; plus
      // "b a" shared once. cand grams: [a b, b a, a b] (3), ref
      // grams: [a b, b a, b c] (3), clipped overlap = 1 + 1 = 2
      (3L, "a b a b", "a b a c"),
      // ref shorter than n: 0 ref grams -> recall 0, precision 0
      (4L, "a b c", "a"))
      .toDF("id", "cand", "ref")
    val out = TextAnalysis.rougeN(pairs, "id", "cand", "ref", 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(out(1L) == ((3L, 3L, 3L, 1000000L, 1000000L, 1000000L)))
    assert(out(2L) == ((2L, 2L, 0L, 0L, 0L, 0L)))
    // pair 3: cand grams {a b:2, b a:1}, ref grams {a b:1, b a:1,
    // a c:1} -> clipped = min(2,1) + min(1,1) = 2 of 3
    assert(out(3L) == ((3L, 3L, 2L, 666666L, 666666L, 666666L)))
    assert(out(4L) == ((2L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("rougeN: n=1 unigram recall equals the classic ROUGE-1 " +
      "definition on a hand pair") {
    val pairs = Seq((1L, "the cat sat", "the cat sat on the mat"))
      .toDF("id", "cand", "ref")
    val r = TextAnalysis.rougeN(pairs, "id", "cand", "ref", 1)
      .collect().head
    // cand 3 unigrams all in ref (the:1<=2, cat:1, sat:1) -> o=3
    assert(r.getLong(1) == 3L && r.getLong(2) == 6L)
    assert(r.getLong(3) == 3L)
    assert(r.getLong(4) == 1000000L)          // precision
    assert(r.getLong(5) == 500000L)           // recall 3/6
    assert(r.getLong(6) == (2000000L * 3) / 9) // F1 = 2o/(nc+nr)
  }

  test("distinctNGramDiversity: hand ratios; all-repeats group low, " +
      "all-unique group 10⁶; short-text groups drop") {
    val docs = Seq(
      ("rep", "x y x y x y"),    // bigrams: x y, y x, x y, y x, x y
      ("rep", "x y x y"),        // x y, y x, x y
      ("uni", "a b c"),          // a b, b c
      ("uni", "d e f"),          // d e, e f
      ("tiny", "solo"))          // no bigrams -> group drops
      .toDF("source", "text")
    val out = TextAnalysis
      .distinctNGramDiversity(docs, Seq("source"), "text", 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // rep: grams x y (×5), y x (×3) -> 2 distinct of 8
    assert(out("rep") == ((2L, 8L, 250000L)))
    assert(out("uni") == ((4L, 4L, 1000000L)))
    assert(!out.contains("tiny"))
  }

  test("kAnonymityProfile: planted class sizes, null quasi forms " +
      "its own class, violation flag at the k boundary") {
    val rows = Seq.fill(10)(("10001", "A")) ++ // size 10, safe at k=10
      Seq.fill(3)(("10001", "B")) ++           // size 3, violates
      Seq.fill(3)(("99999", "C")) ++           // size 3, violates
      Seq.fill(2)((null: String, "A"))         // null zip: size 2
    val out = Profile.kAnonymityProfile(
        rows.toDF("zip", "plan"), Seq("zip", "plan"), 10L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out(10L) == ((1L, 10L, false)))
    assert(out(3L) == ((2L, 6L, true)))
    assert(out(2L) == ((1L, 2L, true)))
    assert(out.size == 3)
  }

  test("averagePrecisionAtK: hand AP through the LCM denominator; " +
      "missing-from-top-k relevants dilute; no-relevant groups drop; " +
      "all-missed groups report 0") {
    // group a: ranks 1..4 in top-10, relevant at ranks 1 and 3, plus
    // one relevant doc ranked 12 (outside k) -> R = 3,
    // AP = (1/1 + 2/3)/3 = 5/9 -> 555555 micro (floor)
    val ranked = Seq(
      ("a", 101L, 1L), ("a", 102L, 2L), ("a", 103L, 3L),
      ("a", 104L, 4L), ("a", 105L, 12L),
      ("b", 201L, 1L), ("b", 202L, 2L),
      ("c", 301L, 1L)).toDF("g", "id", "rank")
    val rels = Seq(
      ("a", 101L, 2L), ("a", 103L, 1L), ("a", 105L, 1L),
      ("b", 299L, 1L), // relevant doc never ranked in top-k
      ("c", 301L, 0L)) // rel 0: NOT relevant -> group c drops
      .toDF("g", "id", "rel")
    val out = Profile.averagePrecisionAtK(ranked, rels, "g", "id",
        "rank", "rel", k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a") == ((3L, 555555L)))
    assert(out("b") == ((1L, 0L)))
    assert(!out.contains("c"))
  }

  test("kAnonymitySuppress: small classes drop whole, large stay " +
      "whole, null quasi joins its own class") {
    val rows = Seq.fill(4)(("z1", 1)) ++ Seq.fill(2)(("z2", 2)) ++
      Seq.fill(3)((null: String, 3))
    val out = Profile.kAnonymitySuppress(
        rows.toDF("zip", "v"), Seq("zip"), 3L)
      .collect().map(r => Option(r.getString(0)))
    assert(out.count(_.contains("z1")) == 4)
    assert(!out.exists(_.contains("z2")))
    // the 3-row null class meets k=3 and must survive the semi-join
    assert(out.count(_.isEmpty) == 3)
  }

  test("kAnonymitySuppress: null classes SUPPRESS when small, across " +
      "a multi-column quasi tuple (ADVICE r16: the gate corpus has " +
      "no nulls, so the <=> semantics are pinned here)") {
    // (null, x): 3 rows -> kept at k=3; (null, y): 2 rows -> dropped;
    // (z, null): 3 rows -> kept — null must match ONLY its own tuple,
    // never wildcard onto another class (what a plain = join can't
    // and an accidental IS NULL OR would get wrong)
    val rows = Seq.fill(3)((null: String, "x", 1)) ++
      Seq.fill(2)((null: String, "y", 2)) ++
      Seq.fill(3)(("z", null: String, 3))
    val out = Profile.kAnonymitySuppress(
        rows.toDF("zip", "seg", "v"), Seq("zip", "seg"), 3L)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(out.count(_ == ((None, Some("x")))) == 3)
    assert(!out.exists(_ == ((None, Some("y")))))
    assert(out.count(_ == ((Some("z"), None))) == 3)
  }

  test("tClosenessProfile: hand categorical-EMD values, zero for a " +
      "corpus-proportional class, absent values zero-filled, null " +
      "sensitive is a mass-conserving category") {
    // corpus: flu 6, cold 5, null 1 over N = 12
    val rows =
      Seq(("a", "flu"), ("a", "flu"), ("a", "cold"), ("a", null)) ++
      Seq.fill(4)(("b", "flu")) ++ Seq.fill(4)(("c", "cold"))
    val out = Profile.tClosenessProfile(rows.toDF("q", "diag"),
        Seq("q"), "diag", tMicro = 300000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    // class a (flu 2, cold 1, null 1): |2·12−6·4| + |1·12−5·4| +
    //   |1·12−1·4| = 0 + 8 + 8 = 16; t = 16/(2·4·12) → 166666, ok
    assert(out("a") == ((4L, 16L, 166666L, false)))
    // class b (flu 4): 24 + 20 + 4 = 48; t = 1/2 → 500000, violates
    assert(out("b") == ((4L, 48L, 500000L, true)))
    // class c (cold 4): 24 + 28 + 4 = 56 → 583333, violates
    assert(out("c") == ((4L, 56L, 583333L, true)))
  }

  test("lDiversityProfile: distinct-sensitive histogram; null " +
      "sensitive not counted but rows kept; flag below l") {
    val rows = Seq(
      ("a", "flu"), ("a", "flu"), ("a", "cold"),       // class a: 2 distinct, 3 rows
      ("b", "flu"), ("b", "cold"), ("b", "hiv"),       // class b: 3 distinct
      ("c", "flu"), ("c", null), ("c", null))          // class c: 1 distinct, 3 rows
      .toDF("q", "diag")
    val out = Profile.lDiversityProfile(
        rows.toDF("q", "diag"), Seq("q"), "diag", 3L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out(1L) == ((1L, 3L, true)))
    assert(out(2L) == ((1L, 3L, true)))
    assert(out(3L) == ((1L, 3L, false)))
  }
}
