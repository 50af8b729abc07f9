package graft

import org.apache.spark.sql.functions._
import graft.ops.{MlPrep, Relational}

/** Operator-level checks for the ML-prep batch (q53-q58). */
class MlPrepSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val orders = spark.read.parquet(s"$sf0001/orders.parquet")
  private lazy val customer = spark.read.parquet(s"$sf0001/customer.parquet")

  test("lexicalCosinePairs: identical docs 1.0, hand cosine exact, " +
      "out-of-band terms carry nothing, no-in-band docs drop") {
    import graft.ops.MlPrep
    // 'stop' appears in all 5 docs (df 5 > maxDf 4 -> out of band);
    // docs 1/2 identical; doc 3 shares one in-band term with them;
    // doc 4 has ONLY the stopword -> no in-band vector at all
    val d = Seq(
      (1L, "alpha beta stop"),
      (2L, "alpha beta stop"),
      (3L, "alpha gamma stop"),
      (4L, "stop stop stop"),
      (5L, "gamma gamma stop"))
      .toDF("doc_id", "text")
    val out = MlPrep.lexicalCosinePairs(d, "doc_id", "text",
        threshold = 0.1, maxDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out((1L, 2L)) == 1.0) // identical in-band vectors
    // doc1=(alpha 1, beta 1), doc3=(alpha 1, gamma 1): cos = 1/2
    assert(out((1L, 3L)) == 0.5 && out((2L, 3L)) == 0.5)
    // doc3=(alpha,gamma) vs doc5=(gamma 2): 2/(sqrt(2)*2) = 0.707107
    assert(out((3L, 5L)) == math.BigDecimal(1 / math.sqrt(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("weightedJaccardPairs: identical 10⁶, hand multiset value, " +
      "min/max identity holds") {
    import graft.ops.MlPrep
    val d = Seq(
      (1L, "alpha alpha beta stop"),
      (2L, "alpha alpha beta stop"),
      (3L, "alpha beta beta stop"),
      (4L, "stop"),
      (5L, "stop stop"))
      .toDF("doc_id", "text")
    // stop df 5 > maxDf 3 -> out of band; alpha/beta df 3 stay in
    val out = MlPrep.weightedJaccardPairs(d, "doc_id", "text",
        thresholdMicro = 1L, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out((1L, 2L)) == 1000000L)
    // doc1=(alpha 2, beta 1) vs doc3=(alpha 1, beta 2):
    // Σmin = 1+1 = 2, Σmax = T1+T3−Σmin = 3+3−2 = 4 → 500000
    assert(out((1L, 3L)) == 500000L && out((2L, 3L)) == 500000L)
    // stopword-only docs have no in-band vector -> never pair
    assert(!out.keySet.exists(p => p._1 >= 4L || p._2 >= 4L))
  }

  test("vocabLane planted values at the q303/q304 gate knobs: when " +
      "base words are out of band (the sf0.1 regime) every 4-block " +
      "pair lands at the hand-computed cosine/J_w; vy-only pairs " +
      "stay under both thresholds") {
    // 64 docs sharing one base word -> df 64 > maxDf 60, out of band
    // at the gate knobs; the lane's vx (df 4) / vy (df 8) terms are
    // the entire in-band space — exactly the sf0.1 regime the r15
    // gate silently verified as an empty result
    val base = (0L to 63L).map(i => (i, "stop")).toDF("doc_id", "text")
    val d = graft.queries.EvalQueries.vocabLane(base)
    val cos = MlPrep.lexicalCosinePairs(d, "doc_id", "text",
        threshold = 0.6, maxDf = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // all 16 blocks x C(4,2) pairs pass; nothing else does
    assert(cos.size == 96)
    assert(cos.keySet.forall { case (a, b) => a / 4 == b / 4 })
    // same parity: (2,1)·(2,1)/5 or (1,1)·(1,1)/2 = 1.0 exactly
    assert(cos((0L, 2L)) == 1.0 && cos((1L, 3L)) == 1.0)
    // cross parity: (2,1)·(1,1)/(√5·√2) = 3/√10 → round 6
    assert(cos((0L, 1L)) == 0.948683 && cos((2L, 3L)) == 0.948683)
    val jw = MlPrep.weightedJaccardPairs(d, "doc_id", "text",
        thresholdMicro = 400000L, maxDf = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(jw.size == 96)
    assert(jw((0L, 2L)) == 1000000L && jw((1L, 3L)) == 1000000L)
    // cross parity: Σmin 2, T 3+2 → (10⁶·2) div 3 = 666666
    assert(jw((0L, 1L)) == 666666L)
    // vy-only pairs (same 8-block, different 4-block) score 0.2 /
    // 200000 — excluded by both gates' thresholds
    assert(!cos.contains((0L, 4L)) && !jw.contains((0L, 4L)))
  }

  test("skewSafeJoin returns exactly the plain inner join's rows") {
    val plain = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .select($"o_orderkey", $"c_mktsegment")
    val salted = Relational.skewSafeJoin(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        customer.select($"c_custkey", $"c_mktsegment"),
        keyCol = "c_custkey", saltSource = "o_orderkey", salts = 8)
      .select($"o_orderkey", $"c_mktsegment")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("skewSafeJoin spreads a mega-key across salts") {
    // one key owning 90% of the probe side — the AQE-resistant shape
    val probe = spark.range(1000)
      .select(when($"id" < 900, lit(7)).otherwise($"id").as("k"), $"id".as("row_id"))
    val build = spark.range(50).select($"id".as("k"), ($"id" * 2).as("v"))
    val joined = Relational.skewSafeJoin(probe, build, "k", "row_id", salts = 8)
    assert(joined.count() == probe.join(build, "k").count())
    // the salt column actually varies within the hot key
    val saltsUsed = probe.filter($"k" === 7)
      .withColumn("__salt", pmod(xxhash64($"row_id"), lit(8)))
      .select($"__salt").distinct().count()
    assert(saltsUsed == 8)
  }

  test("modSample is stable under append (old rows keep their verdict)") {
    val s1 = Relational.modSample(orders, "o_orderkey", 1, 20)
      .select($"o_orderkey").as[Long].collect().toSet
    val s2 = Relational.modSample(orders.limit(500), "o_orderkey", 1, 20)
      .select($"o_orderkey").as[Long].collect().toSet
    assert(s2.subsetOf(s1))
  }

  test("quantizeInt8: codes within [-127,127]; dequantization error <= 1 bin") {
    val q = MlPrep.quantizeInt8(emb, "vec_id", "embedding")
    val bad = q.select(explode($"codes").as("c"))
      .filter($"c" < -127 || $"c" > 127)
    assert(bad.count() == 0)
    // reconstruct and bound max abs error by the bin width
    val err = q.join(emb, "vec_id")
      .select($"vec_id", $"q_min", $"q_max",
        zip_with($"embedding", $"codes",
          (x, c) => abs(x.cast("double") -
            (($"q_max" - $"q_min") / 254.0 * (c + 127) + $"q_min"))).as("errs"),
        (($"q_max" - $"q_min") / 254.0).as("bin"))
      .select(array_max($"errs").as("maxerr"), $"bin")
      .filter($"maxerr" > $"bin" * 1.0001)
    assert(err.count() == 0)
  }

  test("tfIdf: rare terms outscore common ones at equal tf") {
    val d = Seq(
      (1L, "aardvark common"),
      (2L, "common common common"),
      (3L, "common banana zebra")).toDF("doc_id", "text")
    val top = MlPrep.tfIdfTopTerms(d, "doc_id", "text", topN = 1)
      .select($"doc_id", $"term").as[(Long, String)].collect().toMap
    // doc 1: equal tf=1, but common appears in all docs; aardvark unique
    assert(top(1L) == "aardvark")
    assert(top(3L) != "common")
  }

  test("bm25: term frequency saturates, rarity wins, only matching docs return") {
    val d = Seq(
      (1L, "apple apple apple apple banana"), // tf(apple)=4, dl=5
      (2L, "apple pear pear pear pear"),      // tf(apple)=1, dl=5
      (3L, "pear banana banana pear cherry"), // no apple
      (4L, "cherry cherry cherry date date")  // tf(cherry)=3, dl=5
    ).toDF("doc_id", "text")
    val q = Seq((0, "apple"), (1, "cherry"), (1, "nonexistent"))
      .toDF("query_id", "term")
    val got = MlPrep.bm25TopK(d, "doc_id", "text", q, "query_id", "term",
        topN = 10)
      .select($"query_id", $"rank", $"doc_id", $"score_micro")
      .as[(Int, Int, Long, Long)].collect().toSeq.sorted
    // query 0: only docs 1,2 contain apple; tf=4 beats tf=1 at equal dl
    val q0 = got.filter(_._1 == 0)
    assert(q0.map(_._3) == Seq(1L, 2L))
    assert(q0.head._4 > q0.last._4)
    // but saturation: 4x the tf is far less than 4x the score (k1=1.2)
    assert(q0.head._4 < 4 * q0.last._4)
    // query 1: "nonexistent" matches nothing (no NULL poisoning);
    // cherry docs rank by tf — doc 4 (tf=4) above doc 3 (tf=1)
    val q1 = got.filter(_._1 == 1)
    assert(q1.map(_._3) == Seq(4L, 3L))
    // scores positive (Lucene idf is non-negative by construction)
    assert(got.forall(_._4 > 0))
  }

  test("corpusPrep: junk filtered, dups canonicalized, split deterministic") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (2L, "tiny"),                                          // < 5 tokens
      (3L, "aa " * 2000 + "aa aa aa"),                       // fine (many short tokens)
      (10L, "another good document with enough plain words here"),
      (4L, "zzzzzzzzzzzzzzzzzzzzzzzz " * 6))                 // avg token len > 15
      .toDF("doc_id", "text")
    val out = MlPrep.corpusPrep(corpus, "doc_id", "text", holdoutDenom = 10)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(out.contains(1L) && !out.contains(11L)) // canonical min id kept
    assert(!out.contains(2L) && !out.contains(4L)) // junk gated out
    assert(out(10L) == "holdout" && out(1L) == "train")
  }

  test("labelCentroids: constant vectors give exact centroid") {
    val d = Seq((1, Seq(1.0f, -2.0f)), (1, Seq(1.0f, -2.0f)))
      .toDF("label", "embedding")
    val c = MlPrep.labelCentroids(d, "label", "embedding")
      .select($"dim", $"avg_micro").as[(Int, Long)].collect().toMap
    assert(c(0) == 1000000L)
    assert(c(1) == -2000000L)
  }

  test("hashedLinearScore: expression matches a sequential JVM reference") {
    import graft.ops.TextAnalysis
    val buckets = 512
    val w = TextAnalysis.md5StandInWeights(buckets)
    assert(w.length == buckets && w.forall(x => x >= -1000 && x <= 1000))
    // sequential reference: per-token md5 bucket -> weight, summed
    def ref(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      text.trim.split("\\s+").map { t =>
        val hex = md.digest(s"f:$t".getBytes("UTF-8"))
          .map(x => f"$x%02x").mkString.substring(0, 15)
        w((java.lang.Long.parseLong(hex, 16) % buckets).toInt)
      }.sum
    }
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the the the the"), // repeated token counts every occurrence
      (3L, "één ünïcode töken mix 123 !?"),
      (4L, "single"))
    val got = texts.toDF("doc_id", "text")
      .select($"doc_id",
        TextAnalysis.hashedLinearScore($"text", w, buckets).as("s"))
      .as[(Long, Long)].collect().toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == ref(t), s"doc $id: got ${got(id)}, ref ${ref(t)}")
    }
    // repeated-token doc = 4x the single-occurrence contribution
    assert(got(2L) == 4 * ref("the"))
    // weight-vector length is enforced
    intercept[IllegalArgumentException] {
      TextAnalysis.hashedLinearScore($"text", w, buckets + 1)
    }
  }

  test("piiScrub: replacement order, boundaries, and counts") {
    import graft.ops.TextAnalysis
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      // email local part has digits + dots: must become <EMAIL>, not
      // be chewed by the phone pass
      (1L, "mail a.b+tag99@sub.example.org now"),
      // IP inside a sentence; phone with +, spaces, dashes
      (2L, "host 192.168.001.255 call +31 20 555 01 99"),
      // phone-like run with dots; a bare short number must survive
      (3L, "dial 06.1234.5678 room 42"),
      // version strings: 1.2.3 must NOT be scrubbed as an IP (3 quads)
      (4L, "release 1.2.3 of 10.20.30.40"),
      (5L, "no pii here at all"))
    val out = TextAnalysis.piiReport(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    assert(out(0).getString(1) == "mail <EMAIL> now" &&
      out(0).getInt(2) == 1 && out(0).getInt(3) == 0 && out(0).getInt(4) == 0)
    assert(out(1).getString(1) == "host <IP> call <PHONE>" &&
      out(1).getInt(3) == 1 && out(1).getInt(4) == 1)
    assert(out(2).getString(1) == "dial <PHONE> room 42" &&
      out(2).getInt(4) == 1)
    assert(out(3).getString(1) == "release 1.2.3 of <IP>")
    assert(out(4).getString(1) == "no pii here at all" &&
      out(4).getInt(2) + out(4).getInt(3) + out(4).getInt(4) == 0)
  }

  test("positionalIndex + phraseHits: overlaps, repeats, misses") {
    val docs = Seq(
      (1L, "big data spark big data spark"), // "big data" ×2
      (2L, "a a a a"),      // self-overlapping "a a" anchors at 1,2,3
      (3L, "data big"),     // reversed — no "big data"
      (4L, "big"),          // phrase longer than doc
      (5L, "x big data y big data big data z")) // ×3
      .toDF("doc_id", "text")
    val idx = MlPrep.positionalIndex(docs, "doc_id", "text")
    // index shape: 1-based positions, every occurrence kept
    val d2 = idx.filter(col("doc_id") === 2).orderBy("pos")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(d2.toSeq ==
      Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a")))

    val hits = MlPrep.phraseHits(idx, Seq("big", "data"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits == Map(1L -> 2L, 5L -> 3L))
    val selfOv = MlPrep.phraseHits(idx, Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(selfOv == Map(2L -> 3L)) // overlapping occurrences count
    val tri = MlPrep.phraseHits(idx, Seq("a", "a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tri == Map(2L -> 2L))
    assert(MlPrep.phraseHits(idx, Seq("spark", "big", "x"))
      .collect().isEmpty)
  }

  test("windowCooccurrence: window bound, unordered normalize, " +
      "self-pairs, doc isolation, minCount") {
    val docs = Seq(
      (1L, "a b c d"),   // w=2: (a,b) (a,c) (b,c) (b,d) (c,d)
      (2L, "b a"),       // (a,b) again — unordered normalization
      (3L, "x x x"))     // self-pairs: (x,x) at dist 1,1,2 → 3
      .toDF("doc_id", "text")
    val idx = MlPrep.positionalIndex(docs, "doc_id", "text")
    val got = MlPrep.windowCooccurrence(idx, window = 2, minCount = 1L)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(got == Map(
      ("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L,
      ("b", "d") -> 1L, ("c", "d") -> 1L, ("x", "x") -> 3L))
    // minCount prunes; window=1 drops the distance-2 pairs
    val w1 = MlPrep.windowCooccurrence(idx, window = 1, minCount = 2L)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(w1 == Map(("a", "b") -> 2L, ("x", "x") -> 2L))
  }

  test("collocations: BigInt-checked lift, self-pairs excluded from " +
      "output but counted in marginals, minCount after marginals") {
    // window=1 pairs from "p q p q p": (p,q)×4; from "r r s":
    // (r,r)×1, (r,s)×1 — self pair feeds marginals, never output
    val docs = Seq((1L, "p q p q p"), (2L, "r r s"))
      .toDF("doc_id", "text")
    val idx = MlPrep.positionalIndex(docs, "doc_id", "text")
    val out = MlPrep.collocations(idx, window = 1, minCount = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // pairs: (p,q)=4, (r,r)=1, (r,s)=1 → m=6, m2=12
    // deg: p=4, q=4, r=2·1+1=3, s=1
    // lift(p,q) = 10⁶·4·12/(4·4) = 3_000_000
    // lift(r,s) = 10⁶·1·12/(3·1) = 4_000_000
    assert(out.keySet == Set(("p", "q"), ("r", "s")))
    assert(out(("p", "q")) == ((4L, 4L, 4L, 12L, 3000000L)))
    assert(out(("r", "s")) == ((1L, 3L, 1L, 12L, 4000000L)))
    // minCount prunes output only — marginals unchanged
    val pruned = MlPrep.collocations(idx, window = 1, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pruned.toSeq == Seq(("p", "q")))
  }

  test("proximityHits: slop bound, either order, per-doc counts, " +
      "same-term rejected") {
    val docs = Seq(
      (1L, "a x x b x a"), // pairs within 4: (1,4), (4,6) → 2
      (2L, "b y a"),       // reversed order, dist 2 → 1
      (3L, "a x x x x x b")) // dist 6 > 4 → no row
      .toDF("doc_id", "text")
    val idx = MlPrep.positionalIndex(docs, "doc_id", "text")
    val got = MlPrep.proximityHits(idx, "a", "b", slop = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
    intercept[IllegalArgumentException] {
      MlPrep.proximityHits(idx, "a", "a", slop = 2)
    }
  }
}
