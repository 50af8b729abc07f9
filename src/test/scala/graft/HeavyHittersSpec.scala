package graft

import org.apache.spark.sql.functions._
import graft.ops.MisraGries

/** Misra–Gries guarantees under hostile partitionings, plus the
  * merge-rule arithmetic directly. The q154 gate proves the
  * guarantees at scale against exact counts; this pins them on
  * planted streams where the decrement/cut paths are forced. */
class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  private def summarize(xs: Seq[Long], k: Int, parts: Int): Map[Long, Long] =
    xs.toDS().repartition(parts)
      .select(MisraGries(k).toColumn)
      .collect()(0).toMap

  test("exact when distinct keys fit the summary, any partitioning") {
    val xs = Seq.tabulate(1000L.toInt)(i => (i % 10).toLong)
    for (parts <- Seq(1, 7, 32)) {
      val m = summarize(xs, k = 16, parts)
      assert(m == (0L to 9L).map(_ -> 100L).toMap, s"parts=$parts")
    }
  }

  test("planted 50% key survives with bounded undercount at k=16") {
    // 5000 copies of key 0 + 5000 singletons forcing constant eviction
    val xs = Seq.fill(5000)(0L) ++ (1L to 5000L).map(_ + 100L)
    val n = xs.length
    for (parts <- Seq(1, 13, 32)) {
      val m = summarize(xs, k = 16, parts)
      val est = m.getOrElse(0L, 0L)
      assert(est > 0, s"heavy key missing at parts=$parts")
      assert(est <= 5000L, s"overcount at parts=$parts: $est")
      assert((5000L - est) * 17 <= n, s"undercount too big: $est")
    }
  }

  test("every key above n/(k+1) is present; none overcounted") {
    // three tiers: 2 very heavy, 3 moderately heavy, long tail
    val xs = Seq.fill(3000)(1L) ++ Seq.fill(2500)(2L) ++
      Seq.fill(900)(3L) ++ Seq.fill(800)(4L) ++ Seq.fill(700)(5L) ++
      (1L to 2100L).map(_ + 1000L)
    val n = xs.length
    val k = 16
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 8, 32)) {
      val m = summarize(xs, k, parts)
      for ((key, t) <- exact if t * (k + 1) > n)
        assert(m.contains(key), s"key $key (freq $t) missing, parts=$parts")
      for ((key, est) <- m)
        assert(est <= exact(key), s"overcount $key: $est > ${exact(key)}")
    }
  }

  test("merge rule: sum, cut at the (k+1)-th largest, drop non-positive") {
    val agg = MisraGries(3)
    val a = Map(1L -> 10L, 2L -> 5L, 3L -> 1L)
    val b = Map(2L -> 5L, 4L -> 4L, 5L -> 2L)
    // summed: 1→10, 2→10, 3→1, 4→4, 5→2 (5 keys > k=3);
    // 4th largest = 2 → subtract 2, drop ≤0: 1→8, 2→8, 4→2
    assert(agg.merge(a, b) == Map(1L -> 8L, 2L -> 8L, 4L -> 2L))
    // reduce past capacity decrements all and drops zeros
    assert(agg.reduce(Map(1L -> 2L, 2L -> 1L, 3L -> 1L), 9L) ==
      Map(1L -> 1L))
  }

  test("misraGriesBy: per-group guarantees independent — a key heavy " +
      "in one group only must be found there; nulls dropped") {
    // g1: key 7 is 50% of g1's mass; g2: key 7 absent, key 9 heavy;
    // eviction pressure from singletons in both groups
    val rows =
      Seq.fill(500)(("g1", 7L)) ++ (1L to 500L).map(v => ("g1", v + 1000)) ++
      Seq.fill(400)(("g2", 9L)) ++ (1L to 400L).map(v => ("g2", v + 9000)) ++
      Seq((null.asInstanceOf[String], 7L))
    val out = graft.ops.Sketches.misraGriesBy(
        rows.toDF("g", "k").repartition(13), "g", "k", 16)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        r.getLong(2))).toMap
    val e1 = out.getOrElse(("g1", 7L), 0L)
    val e2 = out.getOrElse(("g2", 9L), 0L)
    assert(e1 > 0 && e1 <= 500 && (500 - e1) * 17 <= 1000)
    assert(e2 > 0 && e2 <= 400 && (400 - e2) * 17 <= 800)
    assert(out.keys.forall(_._1 != null))
    // no overcount anywhere, per group
    val exact = rows.filter(_._1 != null).groupBy(identity)
      .map { case (gk, rs) => gk -> rs.size.toLong }
    assert(out.forall { case (gk, est) =>
      est <= exact.getOrElse(gk, 0L) })
  }

  test("misraGriesBy accepts byte/short keys — the guard matches " +
      "DataType values, not simpleString names (ADVICE r15: Spark " +
      "prints tinyint/smallint, so a name list rejected them)") {
    val rows = Seq(("g1", 3.toShort), ("g1", 3.toShort), ("g1", 4.toShort))
    val out = graft.ops.Sketches.misraGriesBy(
        rows.toDF("g", "k"), "g", "k", 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(out(3L) == 2L && out(4L) == 1L)
    val bytes = Seq(("g1", 1.toByte), ("g1", 1.toByte))
    val outB = graft.ops.Sketches.misraGriesBy(
        bytes.toDF("g", "k"), "g", "k", 4).collect()
    assert(outB.length == 1 && outB(0).getLong(2) == 2L)
  }

  test("misraGriesBy rejects a non-integral key dtype up front " +
      "(not an opaque encoder error)") {
    val df = Seq(("g1", "not-a-number")).toDF("g", "k")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Sketches.misraGriesBy(df, "g", "k", 4)
    }
    assert(e.getMessage.contains("must be integral"))
  }
}
