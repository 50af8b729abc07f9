package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** KMV (k-minimum-values) sketch: determinism, set semantics, the
  * merge ≡ rebuild union property, both estimator branches, and the
  * Jaccard/intersection overlap estimates — each checked against a
  * brute-force JVM reference over the same portable md5 lane. */
class KmvSpec extends SparkSuite {
  import spark.implicits._

  /** JVM reference: the k smallest distinct 60-bit kmv lanes. */
  private def refMins(keys: Seq[String], k: Int): Seq[Long] =
    keys.distinct
      .map { s =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(("kmv:" + s).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 15), 16)
      }
      .distinct.sorted.take(k)

  test("kmvSketch = k smallest distinct lanes; dups and nulls ignored") {
    val keys = (1 to 500).map(i => s"key$i")
    // duplicates + a null must not change the set
    val df = (keys ++ keys.take(100)).map(Option(_))
      .:+(None: Option[String]).toDF("k")
    val got = Sketches.kmvSketch(df, "k", 32).orderBy("pos")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val want = refMins(keys, 32).zipWithIndex
      .map { case (h, i) => (i + 1, h) }
    assert(got.toSeq == want)
  }

  test("kmvSketch unsaturated: all distinct hashes kept, in order") {
    val keys = (1 to 10).map(i => s"v$i")
    val got = Sketches.kmvSketch(keys.toDF("k"), "k", 64)
      .orderBy("pos").collect().map(_.getLong(1))
    assert(got.toSeq == refMins(keys, 64))
  }

  test("kmvMerge ≡ rebuild over the concatenated data") {
    val a = (1 to 300).map(i => s"a$i")
    val b = (200 to 600).map(i => s"a$i") // overlap on a200..a300
    val sa = Sketches.kmvSketch(a.toDF("k"), "k", 24)
    val sb = Sketches.kmvSketch(b.toDF("k"), "k", 24)
    val merged = Sketches.kmvMerge(sa, sb, 24).orderBy("pos")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val rebuilt = Sketches.kmvSketch((a ++ b).toDF("k"), "k", 24)
      .orderBy("pos").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(merged.toSeq == rebuilt.toSeq)
  }

  test("kmvEstimate: exact when unsaturated, banded when saturated") {
    val few = (1 to 40).map(i => s"few$i")
    val exact = Sketches.kmvEstimate(
        Sketches.kmvSketch(few.toDF("k"), "k", 64), 64, "x")
      .collect().head
    assert(exact.getInt(1) == 40 && exact.getLong(3) == 40L)

    val many = (1 to 20000).map(i => s"many$i")
    val est = Sketches.kmvEstimate(
        Sketches.kmvSketch(many.toDF("k"), "k", 256), 256, "x")
      .collect().head
    val nd = est.getLong(3)
    // 1/sqrt(k) ≈ 6.3%; allow 4 sigma
    assert(est.getInt(1) == 256 &&
      math.abs(nd - 20000L) < 20000L / 4,
      s"nd_est $nd not within band of 20000")
    // the estimator agrees with the JVM formula on the same kth hash
    val kth = refMins(many, 256).last
    val want = (BigInt(255) * BigInt(2).pow(60) / kth).toLong
    assert(nd == want)
  }

  test("kmvSketchBy/kmvEstimateBy: per-group k-min sets and both " +
      "estimator branches") {
    val rows = (1 to 5000).map(i => ("big", s"b$i")) ++
      (1 to 20).map(i => ("small", s"s$i")) ++
      Seq((null.asInstanceOf[String], "x1"), ("big", null))
    val df = rows.toDF("g", "k")
    val sk = Sketches.kmvSketchBy(df, "g", "k", 64)
    val byG = sk.collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) =>
        g -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(byG.keySet == Set("big", "small")) // null group dropped
    assert(byG("big") == refMins((1 to 5000).map(i => s"b$i"), 64))
    assert(byG("small") ==
      refMins((1 to 20).map(i => s"s$i"), 64)) // unsaturated: all 20
    val est = Sketches.kmvEstimateBy(sk, "g", 64).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(3))).toMap
    assert(est("small") == ((20, 20L))) // exact branch
    val (kUsed, nd) = est("big")
    assert(kUsed == 64 && math.abs(nd - 5000L) < 5000L / 2,
      s"big nd_est $nd out of band")
  }

  test("kmvJaccard: exact small-set branch and banded estimate") {
    // unsaturated union: matches IS the exact intersection
    val a = (1 to 30).map(i => s"j$i")
    val b = (21 to 50).map(i => s"j$i") // |A∩B| = 10, |A∪B| = 50
    val ex = Sketches.kmvJaccard(
        Sketches.kmvSketch(a.toDF("k"), "k", 128),
        Sketches.kmvSketch(b.toDF("k"), "k", 128), 128)
      .collect().head
    assert(ex.getInt(0) == 50 && ex.getLong(1) == 10L &&
      ex.getLong(2) == 200000L && ex.getLong(3) == 10L)

    // saturated: J = 1/3 by construction (A = 2/3, B = 2/3, ∩ = 1/3)
    val uni = (1 to 9000).map(i => s"u$i")
    val bigA = uni.filter(_.hashCode % 3 != 2)
    val bigB = uni.filter(_.hashCode % 3 != 0)
    val inter = uni.count(u => u.hashCode % 3 == 1)
    val es = Sketches.kmvJaccard(
        Sketches.kmvSketch(bigA.toDF("k"), "k", 256),
        Sketches.kmvSketch(bigB.toDF("k"), "k", 256), 256)
      .collect().head
    val jm = es.getLong(2)
    val trueJ = 1000000L * inter / uni.size
    assert(es.getInt(0) == 256 &&
      math.abs(jm - trueJ) < 150000L,
      s"jaccard_micro $jm not within band of $trueJ")
    assert(math.abs(es.getLong(3) - inter) < inter / 3,
      s"inter_est ${es.getLong(3)} not within band of $inter")
  }
}
