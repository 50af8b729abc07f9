package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Sketch-operator quality checks that the DuckDB oracle can't cover
  * (xxhash64-based): minhash estimates track exact Jaccard, simhash of
  * identical texts collides, LSH ANN recall vs the exact baseline. */
class DedupSimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("exactDuplicates finds planted duplicate groups; deduplicated keeps canonical") {
    val d = docs.select($"doc_id", $"text")
    val dups = d.unionByName(d.filter($"doc_id" % 5 === 0)
      .select(($"doc_id" + 100000).as("doc_id"), $"text"))
    val groups = Dedup.exactDuplicates(dups, "doc_id", "text")
    val n = docs.filter($"doc_id" % 5 === 0).count()
    assert(groups.count() == n)
    assert(groups.filter($"n_copies" =!= 2).count() == 0)
    val kept = Dedup.deduplicated(dups, "doc_id", "text")
    assert(kept.count() == docs.count())          // one survivor per text
    assert(kept.filter($"doc_id" >= 100000).count() == 0) // canonical = min id
  }

  test("minhash LSH pairs approximate exact trigram-Jaccard pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val approx = Dedup.minhashLshPairs(docs, "doc_id", "text",
        k = 3, numHashes = 16, bands = 4, estThreshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // recall: most exact near-dups are recovered by the sketch
    if (exact.nonEmpty) {
      val recall = exact.intersect(approx).size.toDouble / exact.size
      assert(recall >= 0.6, s"recall=$recall exact=${exact.size} approx=${approx.size}")
    }
  }

  test("prefixJaccardPairs is LOSSLESS vs the full inverted-index " +
      "form and indexes strictly fewer postings") {
    import org.apache.spark.sql.functions.col
    for ((tn, td) <- Seq((1, 2), (4, 5))) {
      val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          k = 3, threshold = tn.toDouble / td)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2))).toSet
      val pref = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
          k = 3, tNum = tn, tDen = td)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2))).toSet
      assert(pref == full, s"prefix filter lost/invented pairs at $tn/$td")
    }
    // the prefix index is genuinely smaller than the full index
    val withN = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.inline(
        graft.functions.sketches.shingle_set_n(col("text"), 3)))
    val fullPostings = withN.count()
    // t = 4/5 keeps only |X| - ceil(0.8|X|) + 1 ≈ |X|/5 postings
    val prefPostings = withN
      .join(withN.groupBy(col("shingle"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("__df")),
        Seq("shingle"))
      .withColumn("__r",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id"))
            .orderBy(col("__df"), col("shingle"))))
      .filter(col("__r") <=
        col("n_sh") - org.apache.spark.sql.functions.expr(
          "(4 * n_sh + 4) div 5") + 1)
      .count()
    assert(prefPostings * 3 < fullPostings,
      s"prefix index $prefPostings not meaningfully smaller than $fullPostings")
  }

  test("hot shingle: maxDf pruning drops boilerplate, keeps exact scores elsewhere") {
    // two genuinely similar docs + 10 docs whose ONLY shared shingle is
    // a boilerplate trigram (the hot-shingle pathology: its bucket is
    // quadratic in df and carries zero near-dup signal)
    val near = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"))
    val boiler = (10L until 20L).map(i =>
      (i, s"copyright acme corp w$i x$i y$i"))
    val df = (near ++ boiler).toDF("doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        k = 3, threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard")
      .as[(Long, Long, Double)].collect()
    // the hot shingle inflates buckets but the exact form still scores
    // correctly: only (1,2) crosses 0.5 (boilerplate pairs sit at 1/7)
    assert(exact.map(t => (t._1, t._2)).toSet == Set((1L, 2L)))
    assert(exact.head._3 == 0.6) // 3 shared / (4 + 4 - 3)
    // pruned form (q63 shape): the df=10 boilerplate shingle is gone
    // from candidate generation, the near-dup pair's score is UNCHANGED
    // (its shingles are all rare), and no boilerplate pair survives —
    // the one-sided "scores only decrease" guarantee
    val pruned = Dedup.ngramJaccardPairsPruned(df, "doc_id", "text",
        k = 3, threshold = 0.5, maxDf = 5)
      .select($"id_a", $"id_b", $"jaccard")
      .as[(Long, Long, Double)].collect()
    assert(pruned.toSeq == exact.toSeq)
    // below the near-dup pair's threshold the pruned form returns
    // nothing at all for the boilerplate block even at threshold 0.1
    val lowThresh = Dedup.ngramJaccardPairsPruned(df, "doc_id", "text",
        k = 3, threshold = 0.1, maxDf = 5)
      .filter($"id_a" >= 10L).count()
    assert(lowThresh == 0)
  }

  test("nearDupDeduplicated: min-id survives its cluster, singletons untouched") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),   // near-dup of 1
      (3L, "alpha beta gamma delta epsilon theta"), // near-dup of 1 and 2
      (9L, "totally unrelated content right here exactly")
    ).toDF("doc_id", "text")
    val kept = Dedup.nearDupDeduplicated(df, "doc_id", "text",
        k = 3, threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    // {1,2,3} form one component; 1 is canonical; 9 never pairs
    assert(kept == Set(1L, 9L))
  }

  test("dedupIncrement: exact dup, near-dup, and fresh incoming docs routed right") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),     // exact dup of 1
      (11L, "alpha beta gamma delta epsilon eta"),      // near-dup of 1
      (12L, "completely different words appear here now") // fresh
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupIncrement(corpus, incoming, "doc_id", "text",
        k = 3, threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(12L))
    // asymmetry: within-batch dups are NOT this operator's job
    val twin = Seq((20L, "x y z w v u"), (21L, "x y z w v u"))
      .toDF("doc_id", "text")
    val keptTwins = Dedup.dedupIncrement(corpus, twin, "doc_id", "text",
        k = 3, threshold = 0.5).count()
    assert(keptTwins == 2)
  }

  test("lshBandStats: a planted boilerplate block is visible before the join") {
    // 40 docs with IDENTICAL text -> identical signatures -> one
    // bucket of 40 in every band; distinct background docs alongside
    val boiler = (0L until 40L).map(i =>
      (i, "copyright acme corp all rights reserved worldwide"))
    val bg = (100L until 120L).map(i =>
      (i, s"unique content w$i x$i y$i z$i"))
    val df = (boiler ++ bg).toDF("doc_id", "text")
    val stats = graft.ops.Dedup.lshBandStats(df, "doc_id", "text",
        k = 2, numHashes = 16, bands = 4)
      .as[(Int, Long, Long, BigDecimal)].collect()
    assert(stats.length == 4)
    stats.foreach { case (band, _, maxBucket, pairs) =>
      assert(maxBucket >= 40, s"band $band: hot bucket invisible ($maxBucket)")
      // the quadratic tail (40 choose 2 = 780) is measured pre-join,
      // in exact decimal (a long n·(n-1) wraps at bucket ~3e9 rows)
      assert(pairs >= BigDecimal(780), s"band $band: candidate pairs $pairs")
    }
    // a clean corpus shows no such tail
    val clean = graft.ops.Dedup.lshBandStats(bg.toDF("doc_id", "text"),
        "doc_id", "text", k = 2, numHashes = 16, bands = 4)
      .as[(Int, Long, Long, BigDecimal)].collect()
    assert(clean.forall(_._3 <= 2))
  }

  test("indexAppend: append-then-read == recompute-from-union, both frames") {
    val corpus = docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"text")
    val accepted = docs.filter($"doc_id" % 2 === 1).select($"doc_id", $"text")
    val (idx2, keys2) = Dedup.indexAppend(
      Dedup.corpusShingleIndex(corpus, "doc_id", "text", k = 3),
      Dedup.corpusTextKeys(corpus, "text"),
      accepted, "doc_id", "text", k = 3)
    val full = corpus.unionByName(accepted)
    val idxFull = Dedup.corpusShingleIndex(full, "doc_id", "text", k = 3)
    val keysFull = Dedup.corpusTextKeys(full, "text")
    assert(idx2.exceptAll(idxFull).count() == 0 &&
      idxFull.exceptAll(idx2).count() == 0, "index append != recompute")
    assert(keys2.exceptAll(keysFull).count() == 0 &&
      keysFull.exceptAll(keys2).count() == 0, "keyset append != recompute")
    assert(idx2.count() > 0 && keys2.count() > 0)
  }

  test("dedupIncrementFullIndexed over a materialized index == in-query form") {
    val corpus = docs.select($"doc_id", $"text")
    // q89-shaped batch: exact corpus dup, corpus near-dup, fresh doc,
    // plus a within-batch exact copy and near-dup of the fresh doc
    val fresh = regexp_replace($"text", "(\\S+)", "zq$1")
    val incoming = corpus.filter($"doc_id" % 11 === 3)
      .select(($"doc_id" + 1000000).as("doc_id"),
        concat($"text", lit(" zzqx")).as("text"))
      .unionByName(corpus.filter($"doc_id" % 11 === 5)
        .select(($"doc_id" + 2000000).as("doc_id"), $"text"))
      .unionByName(corpus.filter($"doc_id" % 11 === 1)
        .select(($"doc_id" + 3000000).as("doc_id"), fresh.as("text")))
      .unionByName(corpus.filter($"doc_id" % 11 === 1)
        .select(($"doc_id" + 4000000).as("doc_id"), fresh.as("text")))
    val direct = Dedup.dedupIncrementFull(corpus, incoming,
        "doc_id", "text", k = 3, threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    val idx = Dedup.corpusShingleIndex(corpus, "doc_id", "text", k = 3)
      .localCheckpoint()
    val keys = Dedup.corpusTextKeys(corpus, "text").localCheckpoint()
    val viaIndex = Dedup.dedupIncrementFullIndexed(idx, keys, incoming,
        "doc_id", "text", k = 3, threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(viaIndex == direct, s"indexed=${viaIndex.size} direct=${direct.size}")
    // only the +3M fresh arm survives (its +4M copies lose within-batch)
    assert(direct.nonEmpty && direct.forall(id => id >= 3000000L && id < 4000000L))
  }

  test("dedupByPairsPriority: highest-priority member survives its cluster") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", 10),
      (2L, "alpha beta gamma delta epsilon eta", 99),  // near-dup of 1, higher priority
      (9L, "totally unrelated content right here exactly", 1)
    ).toDF("doc_id", "text", "quality")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text",
      k = 3, threshold = 0.5)
    val kept = Dedup.dedupByPairsPriority(df, "doc_id", pairs,
        "id_a", "id_b", $"quality")
      .select($"doc_id").as[Long].collect().toSet
    // min-id rule would keep 1; priority keeps 2; singleton 9 untouched
    assert(kept == Set(2L, 9L))
  }

  test("duplicatedSpanRate: positions counted per occurrence, cross-doc only") {
    val df = Seq(
      (1L, "a b c d"),         // spans: "a b c", "b c d"
      (2L, "a b c x"),         // spans: "a b c", "b c x"
      (3L, "z z z z z"),       // 3 spans, all "z z z" — single-doc, NOT dup
      (4L, "a b c a b c"),     // 4 spans; "a b c" at 2 POSITIONS both count
      (5L, "q r")              // < k tokens: no spans, absent
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpanRate(df, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 2L, 1L, 500000L),   // "a b c" shared with docs 2/4
      (2L, 2L, 1L, 500000L),
      (3L, 3L, 0L, 0L),        // within-doc repetition alone is not dup
      (4L, 4L, 2L, 500000L)))  // both "a b c" positions counted
  }

  test("simhash: identical text -> identical sketch; hamming 0") {
    val two = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "something else entirely here")).toDF("doc_id", "text")
    val sk = Dedup.simhash(two, "doc_id", "text")
      .select($"doc_id", $"simhash").as[(Long, Long)].collect().toMap
    assert(sk(1L) == sk(2L))
    assert(sk(1L) != sk(3L))
    val pairs = Dedup.simhashPairs(two, "doc_id", "text", maxDist = 0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("nearDupComponents: chains collapse to min-id components (both paths)") {
    // components: {1,2,3,7} via chain 1-2, 2-3, 3-7; {5,6}; singletons absent
    val pairs = Seq((2L, 1L), (2L, 3L), (7L, 3L), (5L, 6L))
      .toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      5L -> 5L, 6L -> 5L)
    // adaptive single-task union-find (default threshold)
    val local = Dedup.nearDupComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(local == expected)
    // distributed iterative loop (threshold forced to 0) must agree
    val dist = Dedup.nearDupComponents(pairs, "id_a", "id_b",
      localEdgeThreshold = 0L).as[(Long, Long)].collect().toMap
    assert(dist == expected)
  }

  test("nearDupComponents: signals non-convergence instead of wrong labels") {
    // a 12-hop chain: diameter > maxIter=3, so min-label propagation
    // cannot finish — must throw, not return partially-propagated
    // labels (threshold 0 forces the iterative path under test)
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.nearDupComponents(chain, "id_a", "id_b", maxIter = 3,
        localEdgeThreshold = 0L)
    }
    assert(ex.getMessage.contains("not converged"))
    // same chain with room to converge (checkpoint path exercised at
    // checkpointEvery=2): one component labeled by the min id
    val comp = Dedup.nearDupComponents(chain, "id_a", "id_b",
      maxIter = 20, checkpointEvery = 2, localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(comp == (0L to 12L).map(_ -> 0L).toMap)
    // the union-find path handles the same deep chain without maxIter
    val uf = Dedup.nearDupComponents(chain, "id_a", "id_b", maxIter = 3)
      .as[(Long, Long)].collect().toMap
    assert(uf == (0L to 12L).map(_ -> 0L).toMap)
  }

  test("nearDupComponents: string ids label by UTF-8 byte order on both paths") {
    // U+FFFD is the UTF-8 minimum (EF BF BD) but the UTF-16 maximum
    // vs U+1F600 (surrogates D83D DE00; UTF-8 F0 9F 98 80) — Java
    // String order would pick the wrong canonical label here
    val smiley = "😀"
    val replacement = "�"
    assert(smiley.compareTo(replacement) < 0) // the UTF-16 trap under test
    val pairs = Seq((smiley, replacement)).toDF("id_a", "id_b")
    val expected = Map(smiley -> replacement, replacement -> replacement)
    val local = Dedup.nearDupComponents(pairs, "id_a", "id_b")
      .as[(String, String)].collect().toMap
    val dist = Dedup.nearDupComponents(pairs, "id_a", "id_b",
      localEdgeThreshold = 0L).as[(String, String)].collect().toMap
    assert(local == expected)
    assert(dist == expected)
    // guard: checkpointEvery must be positive (modulo-zero otherwise)
    intercept[IllegalArgumentException] {
      Dedup.nearDupComponents(pairs, "id_a", "id_b", checkpointEvery = 0)
    }
  }

  test("kmeansMicro: planted separated clusters converge to their exact means") {
    // two tight clusters far apart in 4 dims; seeds are ids 0 and 1
    // (one in each cluster), so 2 iterations lock onto the true means
    val rows = Seq(
      (0L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),     // cluster A
      (2L, Seq(0.2f, 0.0f, 0.0f, 0.0f)),
      (4L, Seq(0.1f, 0.1f, 0.0f, 0.0f)),
      (1L, Seq(10.0f, 10.0f, 10.0f, 10.0f)), // cluster B
      (3L, Seq(10.2f, 10.0f, 10.0f, 10.0f)),
      (5L, Seq(10.1f, 9.9f, 10.0f, 10.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val cent = graft.ops.Similarity.kmeansMicro(df, "vec_id", "embedding",
        k = 2, iters = 2)
      .as[(Int, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // exact integer-micro means after FLOAT quantization (10.2f is
    // ~10.1999998 -> floor 10199999, 9.9f -> 9899999):
    // A = (100000, 33333, 0, 0); B = (10099999, 9966666, 1e7, 1e7)
    assert(cent(0) == Seq(100000L, 33333L, 0L, 0L))
    assert(cent(1) == Seq(10099999L, 9966666L, 10000000L, 10000000L))
  }

  test("cosine: self-similarity 1, brute-force ranks are total-ordered") {
    val self = emb.limit(3)
      .select(round(Similarity.cosine($"embedding", $"embedding"), 9).as("c"))
      .as[Double].collect()
    assert(self.forall(_ == 1.0))
    val topk = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 2),
      "vec_id", "embedding", k = 5)
    val byQuery = topk.groupBy($"query_id").agg(count(lit(1)).as("n"),
      max($"rank").as("mx")).collect()
    assert(byQuery.forall(r => r.getLong(1) == 5 && r.getInt(2) == 5))
  }

  test("LSH ANN: results are a subset-ranking consistent with brute force") {
    val exact = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3),
        "vec_id", "embedding", k = 20)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, emb.filter($"vec_id" < 3),
        "vec_id", "embedding", dim = 64, k = 5, nPlanes = 4)
    // every LSH hit must be a genuine corpus vector ranked by true cosine;
    // recall against exact top-20 should be non-trivial
    val hits = lsh.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(hits.nonEmpty)
    val recall = hits.count(exact.contains).toDouble / hits.length
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("rrfFuse: consensus candidates outrank single-arm ones; micros exact") {
    val armA = Seq((0L, 101L, 1), (0L, 102L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val armB = Seq((0L, 102L, 1), (0L, 103L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val fused = Similarity.rrfFuse(armA, armB, topN = 10)
      .as[(Long, Int, Long, Long)].collect().toSeq.sortBy(_._2)
    // 102 appears in both arms (1/62 + 1/61) and must win over 101
    // (1/61 alone) and 103 (1/62 alone); equal-score 101 vs 103 would
    // tie-break by id, but 101's rank-1 arm beats 103's rank-2 arm
    assert(fused.map(_._3) == Seq(102L, 101L, 103L))
    assert(fused.head._4 ==
      math.floor(1e6 * (1.0 / 62 + 1.0 / 61)).toLong)
    assert(fused(1)._4 == math.floor(1e6 * (1.0 / 61)).toLong)
  }

  test("PQ/ADC: codes are total, ADC distances exact, recall sane vs brute force") {
    val queries = emb.filter($"vec_id" < 3)
    // every corpus row must encode (codes are total over clean vectors)
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, ksub = 8)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cbs)
    assert(codes.filter($"codes".isNull).count() == 0)
    assert(codes.count() == emb.count())
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding", k = 10)
      .cache()
    // ADC distance for one (query, neighbor) pair recomputed by hand
    // from the driver-side codebooks must equal the kernel's output
    val row = pq.orderBy($"query_id", $"rank").head()
    val (qid, nid, adc) = (row.getLong(0), row.getLong(2), row.getLong(3))
    val micro = (v: Seq[Any]) => v.map {
      case f: Float => math.floor(f.toDouble * 1e6).toLong
      case d: Double => math.floor(d * 1e6).toLong
    }.toArray
    val vecOf = (id: Long) => micro(emb.filter($"vec_id" === id)
      .select($"embedding").head().getSeq[Any](0))
    val (qv, nv) = (vecOf(qid), vecOf(nid))
    val dsub = 16
    val manual = (0 until 4).map { s =>
      val nSub = nv.slice(s * dsub, (s + 1) * dsub)
      // the neighbor's code = argmin over the subspace codebook
      val code = cbs(s).zipWithIndex.minBy { case (c, i) =>
        (c.zip(nSub).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }._2
      qv.slice(s * dsub, (s + 1) * dsub).zip(cbs(s)(code))
        .map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum
    assert(adc == manual, s"ADC kernel $adc != manual $manual")
    // recall vs exact top-20 (the q31 LSH discipline): PQ with 8
    // untrained centroids per subspace is coarse; hits must still
    // overlap the true neighborhood well above chance (20/500 = 4%)
    val exact = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k = 20)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val hits = pq.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(hits.length == 3 * 10)
    val recall = hits.count(exact.contains).toDouble / hits.length
    assert(recall >= 0.2, s"recall=$recall")
    pq.unpersist()
  }

  test("IVFADC: pruning preserves ADC distances; recall sane vs exhaustive ADC") {
    val queries = emb.filter($"vec_id" < 3)
    val exhaustive = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        k = 10, m = 4, ksub = 8)
      .select($"query_id", $"neighbor_id", $"adc_dist")
      .as[(Long, Long, Long)].collect()
    val pruned = Similarity.ivfadcTopK(emb, queries, "vec_id", "embedding",
        k = 10, nCentroids = 8, nProbe = 2, m = 4, ksub = 8)
      .select($"query_id", $"neighbor_id", $"adc_dist")
      .as[(Long, Long, Long)].collect()
    // every query answered, never more than k rows
    assert(pruned.groupBy(_._1).forall(_._2.length <= 10))
    assert(pruned.map(_._1).toSet == Set(0L, 1L, 2L))
    // pruning must not CHANGE a distance — shared (query, neighbor)
    // pairs carry the identical ADC value
    val exMap = exhaustive.map(t => (t._1, t._2) -> t._3).toMap
    pruned.foreach { case (q, n, d) =>
      exMap.get((q, n)).foreach(ed => assert(ed == d,
        s"ADC dist diverged under pruning for ($q,$n): $d vs $ed"))
    }
    // probing 2 of 8 cells: the pruned top-10 must still recover a
    // healthy share of the exhaustive-ADC top-10 (well above the 2/8
    // chance floor)
    val exSet = exhaustive.map(t => (t._1, t._2)).toSet
    val recall = pruned.count(t => exSet.contains((t._1, t._2))).toDouble /
      exhaustive.length
    assert(recall >= 0.3, s"recall=$recall")
  }

  test("residual IVFADC: deterministic, non-negative dists, recall above chance") {
    val queries = emb.filter($"vec_id" < 3)
    def run() = Similarity.ivfadcResidualTopK(emb, queries,
        "vec_id", "embedding", k = 10, nCentroids = 8, nProbe = 2,
        m = 4, ksub = 8)
      .select($"query_id", $"rank", $"neighbor_id", $"adc_dist")
      .as[(Long, Int, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
    val a = run()
    assert(a == run())                       // bit-stable across runs
    assert(a.forall(_._4 >= 0))              // sums of squares
    assert(a.map(_._1).toSet == Set(0L, 1L, 2L))
    assert(a.groupBy(_._1).forall(_._2.length <= 10))
    // recall vs the exact cosine top-20 (the q88 discipline): residual
    // quantization with probed cells must beat the 4% chance floor
    val exact = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k = 20)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = a.count(t => exact.contains((t._1, t._3))).toDouble / a.length
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("trained PQ codebooks: valid shape, compose into pqTopKWith, recall >= id-seeded") {
    val queries = emb.filter($"vec_id" < 3)
    val m = 4; val ksub = 8
    val seeded = Similarity.pqCodebooks(emb, "vec_id", "embedding", m, ksub)
    val trained = Similarity.pqCodebooksTrained(emb, "vec_id", "embedding",
      m, ksub, iters = 3)
    // shape: m subspaces x ksub centroids x dsub micros
    assert(trained.length == m)
    assert(trained.forall(_.length == ksub))
    assert(trained.forall(_.forall(_.length == seeded.head.head.length)))
    val exact = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k = 20)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(cbs: Array[Array[Array[Long]]]): Double = {
      val hits = Similarity.pqTopKWith(emb, queries, "vec_id", "embedding",
          k = 10, cbs)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      hits.count(exact.contains).toDouble / hits.length
    }
    val rs = recallOf(seeded)
    val rt = recallOf(trained)
    // Lloyd iterations must not make the quantizer worse than its
    // arbitrary id-seeded starting point
    assert(rt >= rs, s"trained recall $rt < seeded recall $rs")
  }

  test("trained IVF: kmeans codebook composes into ivfTopKTrained with sane recall") {
    val queries = emb.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k = 20)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val codebook = Similarity.kmeansMicro(emb, "vec_id", "embedding",
      k = 8, iters = 2)
    val trained = Similarity.ivfTopKTrained(emb, queries,
        "vec_id", "embedding", k = 5, codebook, nProbe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(trained.nonEmpty)
    // probing 2 of 8 trained cells: hits must overlap the exact top-20
    val recall = trained.count(exact.contains).toDouble / trained.length
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("IVFADC+R: with full probing + full shortlist, rerank ≡ exact micro-L2 top-k") {
    import graft.functions.sketches.vec_dist2_long
    val queries = emb.filter($"vec_id" < 3)
    // probe ALL cells with an uncapped shortlist: the ADC stage can
    // then hide no candidate, so the exact rerank must reproduce the
    // brute-force integer-micro L2 ranking bit-for-bit
    val rr = Similarity.ivfadcRerankTopK(emb, queries, "vec_id", "embedding",
        k = 10, shortlist = 1000000, nCentroids = 8, nProbe = 8,
        m = 4, ksub = 8)
      .select($"query_id", $"rank", $"neighbor_id", $"d2_micro")
      .as[(Long, Int, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
    val micro = (c: org.apache.spark.sql.Column) =>
      transform(c, x => floor(x.cast("double") * 1e6).cast("long"))
    val q = queries.select($"vec_id".as("query_id"), micro($"embedding").as("qv"))
    val c = emb.select($"vec_id".as("neighbor_id"), micro($"embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
      .orderBy($"d2_micro".asc, $"neighbor_id".asc)
    val exact = q.crossJoin(c).filter($"query_id" =!= $"neighbor_id")
      .withColumn("d2_micro", vec_dist2_long($"qv", $"cv"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 10)
      .select($"query_id", $"rank", $"neighbor_id", $"d2_micro")
      .as[(Long, Int, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
    assert(rr == exact)
  }

  test("IVFADC+R: rerank recall vs exact L2 >= the ADC-only ranking's") {
    import graft.functions.sketches.vec_dist2_long
    val queries = emb.filter($"vec_id" < 3)
    val micro = (c: org.apache.spark.sql.Column) =>
      transform(c, x => floor(x.cast("double") * 1e6).cast("long"))
    val q = queries.select($"vec_id".as("query_id"), micro($"embedding").as("qv"))
    val c = emb.select($"vec_id".as("neighbor_id"), micro($"embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
      .orderBy($"d2_micro".asc, $"neighbor_id".asc)
    val exact = q.crossJoin(c).filter($"query_id" =!= $"neighbor_id")
      .withColumn("d2_micro", vec_dist2_long($"qv", $"cv"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val hits = df.select($"query_id", $"neighbor_id")
        .as[(Long, Long)].collect()
      hits.count(exact.contains).toDouble / hits.length
    }
    val adcOnly = recallOf(Similarity.ivfadcTopK(emb, queries,
      "vec_id", "embedding", k = 10, nCentroids = 8, nProbe = 2,
      m = 4, ksub = 8))
    val reranked = recallOf(Similarity.ivfadcRerankTopK(emb, queries,
      "vec_id", "embedding", k = 10, shortlist = 30, nCentroids = 8,
      nProbe = 2, m = 4, ksub = 8))
    // same candidate pool, exact ordering on a 3x shortlist: the
    // refinement stage must not lose recall vs raw ADC ranking
    assert(reranked >= adcOnly,
      s"rerank recall $reranked < ADC-only recall $adcOnly")
  }

  test("materialized IVFADC index: indexed probe ≡ direct; append ≡ recompute") {
    val queries = emb.filter($"vec_id" < 3)
    val cb = Similarity.coarseCodebook(emb, "vec_id", "embedding", 8)
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, ksub = 8)
    val direct = Similarity.ivfadcTopK(emb, queries, "vec_id", "embedding",
        k = 10, nCentroids = 8, nProbe = 2, m = 4, ksub = 8)
      .select($"query_id", $"rank", $"neighbor_id", $"adc_dist")
      .as[(Long, Int, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
    val idx = Similarity.ivfadcIndex(emb, "vec_id", "embedding", cb, cbs)
      .localCheckpoint()
    val viaIndex = Similarity.ivfadcTopKIndexed(idx, queries,
        "vec_id", "embedding", k = 10, cb, cbs, nProbe = 2)
      .select($"query_id", $"rank", $"neighbor_id", $"adc_dist")
      .as[(Long, Int, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
    assert(viaIndex == direct)
    // append-then-query ≡ recompute-from-union: encode half the corpus,
    // fold in the other half with the FROZEN codebooks
    val first = emb.filter($"vec_id" % 2 === 0)
    val rest = emb.filter($"vec_id" % 2 =!= 0)
    val appended = Similarity.annIndexAppend(
        Similarity.ivfadcIndex(first, "vec_id", "embedding", cb, cbs),
        rest, "vec_id", "embedding", cb, cbs)
      .select($"neighbor_id", $"cell", $"codes")
      .as[(Long, Int, Seq[Int])].collect().toSet
    val recomputed = idx.select($"neighbor_id", $"cell", $"codes")
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(appended == recomputed)
  }

  test("annIndexApplyTombstones (r19): delete ≡ rebuild-without under " +
      "frozen codebooks; unknown ids no-op; delete-all empties; " +
      "deleted ids may still probe") {
    val cb = Similarity.coarseCodebook(emb, "vec_id", "embedding", 8)
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 4, ksub = 8)
    val idx = Similarity.ivfadcIndex(emb, "vec_id", "embedding", cb, cbs)
      .localCheckpoint()
    val dead = emb.filter($"vec_id" % 5 === 2).select($"vec_id")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select($"neighbor_id", $"cell", $"codes")
        .as[(Long, Int, Seq[Int])].collect().toSet
    // index-level: tombstoned ≡ encode-only-the-survivors (SAME cbs)
    val viaTomb = rows(Similarity.annIndexApplyTombstones(idx, dead,
      "vec_id"))
    val rebuilt = rows(Similarity.ivfadcIndex(
      emb.filter($"vec_id" % 5 =!= 2), "vec_id", "embedding", cb, cbs))
    assert(viaTomb == rebuilt && viaTomb.nonEmpty)
    // probe-level: queries include a DELETED id (2) — it still probes,
    // and no deleted id ever surfaces as a neighbor
    val probed = Similarity.ivfadcTopKIndexed(
        Similarity.annIndexApplyTombstones(idx, dead, "vec_id"),
        emb.filter($"vec_id" < 3), "vec_id", "embedding",
        k = 10, cb, cbs, nProbe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(probed.map(_._1).toSet == Set(0L, 1L, 2L))
    assert(probed.forall(_._2 % 5 != 2))
    // unknown ids no-op; empty tombstone frame no-ops; delete-all empties
    val unknown = Seq(999999L, -5L).toDF("vec_id")
    assert(rows(Similarity.annIndexApplyTombstones(idx, unknown,
      "vec_id")) == rows(idx))
    assert(rows(Similarity.annIndexApplyTombstones(idx,
      emb.select($"vec_id"), "vec_id")).isEmpty)
  }

  test("fully-trained IVFADC: codebook rebuild exact, deterministic, recall above chance") {
    val queries = emb.filter($"vec_id" < 3)
    val centLong = Similarity.kmeansMicro(emb, "vec_id", "embedding",
      k = 8, iters = 2)
    val cb = Similarity.coarseCodebookFromLong(centLong)
    // rebuild is exactly micros/1e6 in (cent_id, dim) order
    val direct = centLong.orderBy($"cent_id", $"dim")
      .as[(Int, Int, Long)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3.toDouble / 1e6).toSeq)
    assert(cb.map(_.toSeq).toSeq == direct)
    val cbs = Similarity.pqCodebooksTrained(emb, "vec_id", "embedding",
      m = 4, ksub = 4, iters = 2)
    def run() = Similarity.ivfadcTopKIndexed(
        Similarity.ivfadcIndex(emb, "vec_id", "embedding", cb, cbs),
        queries, "vec_id", "embedding", k = 10, cb, cbs, nProbe = 2)
      .select($"query_id", $"rank", $"neighbor_id", $"adc_dist")
      .as[(Long, Int, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
    val a = run()
    assert(a == run()) // the whole trained pipeline is bit-stable
    assert(a.map(_._1).toSet == Set(0L, 1L, 2L))
    // trained quantizers, 2 of 8 cells probed: recall vs the exact
    // cosine top-20 must clear the 4% chance floor comfortably
    val exact = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k = 20)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = a.count(t => exact.contains((t._1, t._3))).toDouble / a.length
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("residual IVFADC: indexed probe ≡ direct over a materialized index") {
    val queries = emb.filter($"vec_id" < 3)
    val direct = Similarity.ivfadcResidualTopK(emb, queries,
        "vec_id", "embedding", k = 10, nCentroids = 8, nProbe = 2,
        m = 4, ksub = 8)
      .select($"query_id", $"rank", $"neighbor_id", $"adc_dist")
      .as[(Long, Int, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
    val cb = Similarity.coarseCodebook(emb, "vec_id", "embedding", 8)
    val rcbs = Similarity.residualCodebooks(emb, "vec_id", "embedding",
      cb, m = 4, ksub = 8)
    val idx = Similarity.ivfadcResidualIndex(emb, "vec_id", "embedding",
      cb, rcbs).localCheckpoint()
    val viaIndex = Similarity.ivfadcResidualTopKIndexed(idx, queries,
        "vec_id", "embedding", k = 10, cb, rcbs, nProbe = 2)
      .select($"query_id", $"rank", $"neighbor_id", $"adc_dist")
      .as[(Long, Int, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
    assert(viaIndex == direct)
  }

  test("production ANN chain: composed stages bit-stable, recall ≥ both parent forms") {
    import graft.functions.sketches.vec_dist2_long
    val queries = emb.filter($"vec_id" < 5)
    // ground truth: exact integer-micro L2 top-10
    val micro = (c: org.apache.spark.sql.Column) =>
      transform(c, x => floor(x.cast("double") * 1e6).cast("long"))
    val q = queries.select($"vec_id".as("query_id"), micro($"embedding").as("qv"))
    val c = emb.select($"vec_id".as("neighbor_id"), micro($"embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
      .orderBy($"d2_micro".asc, $"neighbor_id".asc)
    val exact = q.crossJoin(c).filter($"query_id" =!= $"neighbor_id")
      .withColumn("d2_micro", vec_dist2_long($"qv", $"cv"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val hits = df.select($"query_id", $"neighbor_id")
        .as[(Long, Long)].collect()
      hits.count(exact.contains).toDouble / hits.length
    }
    // the q102 composition: trained coarse + residual PQ +
    // materialized index + exact rerank
    val cbT = Similarity.coarseCodebookFromLong(
      Similarity.kmeansMicro(emb, "vec_id", "embedding", k = 8, iters = 2))
    val rcbsT = Similarity.residualCodebooks(emb, "vec_id", "embedding",
      cbT, m = 4, ksub = 8)
    val idxT = Similarity.ivfadcResidualIndex(emb, "vec_id", "embedding",
      cbT, rcbsT).localCheckpoint()
    def chain() = Similarity.ivfadcResidualRerankTopKIndexed(idxT, emb,
        queries, "vec_id", "embedding", k = 10, shortlist = 30,
        cbT, rcbsT, nProbe = 2)
      .select($"query_id", $"rank", $"neighbor_id", $"d2_micro")
      .as[(Long, Int, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
    val a = chain()
    assert(a == chain()) // composed pipeline is bit-stable end-to-end
    val rChain = recallOf(Similarity.ivfadcResidualRerankTopKIndexed(idxT,
      emb, queries, "vec_id", "embedding", k = 10, shortlist = 30,
      cbT, rcbsT, nProbe = 2))
    // parent 1 (q100 form): trained coarse + trained raw-vector PQ
    val cbsP = Similarity.pqCodebooksTrained(emb, "vec_id", "embedding",
      m = 4, ksub = 4, iters = 2)
    val r100 = recallOf(Similarity.ivfadcTopKIndexed(
      Similarity.ivfadcIndex(emb, "vec_id", "embedding", cbT, cbsP),
      queries, "vec_id", "embedding", k = 10, cbT, cbsP, nProbe = 2))
    // parent 2 (q101 form): id-seeded coarse + residual PQ, indexed
    val cbS = Similarity.coarseCodebook(emb, "vec_id", "embedding", 8)
    val rcbsS = Similarity.residualCodebooks(emb, "vec_id", "embedding",
      cbS, m = 4, ksub = 8)
    val r101 = recallOf(Similarity.ivfadcResidualTopKIndexed(
      Similarity.ivfadcResidualIndex(emb, "vec_id", "embedding", cbS, rcbsS),
      queries, "vec_id", "embedding", k = 10, cbS, rcbsS, nProbe = 2))
    // the composed chain stacks every refinement the parents split:
    // it must not lose recall against either
    assert(rChain >= r100 && rChain >= r101,
      s"chain recall $rChain vs trained-raw $r100 / seeded-residual $r101")
  }

  test("trained residual codebooks: valid shape, deterministic, distortion ≤ id-seeded") {
    import graft.functions.sketches.{vec_dist2_long, vec_sub_long, vec_top_cells_dist2}
    val queries = emb.filter($"vec_id" < 5)
    val cb = Similarity.coarseCodebookFromLong(
      Similarity.kmeansMicro(emb, "vec_id", "embedding", k = 8, iters = 2))
    val trained = Similarity.residualCodebooksTrained(emb, "vec_id",
      "embedding", cb, m = 4, ksub = 8, iters = 2)
    val seeded = Similarity.residualCodebooks(emb, "vec_id", "embedding",
      cb, m = 4, ksub = 8)
    // shape: m subspaces × ksub centroids × dsub dims, same as seeded
    assert(trained.length == 4 && trained.forall(_.length == 8) &&
      trained.forall(_.forall(_.length == seeded.head.head.length)))
    // deterministic: training twice yields the identical codebooks
    val again = Similarity.residualCodebooksTrained(emb, "vec_id",
      "embedding", cb, m = 4, ksub = 8, iters = 2)
    assert(trained.map(_.map(_.toSeq).toSeq).toSeq ==
      again.map(_.map(_.toSeq).toSeq).toSeq)
    // Lloyd's invariant is QUANTIZATION DISTORTION, not end-task
    // recall (a 500-vector corpus with k=10 can rank either way):
    // total Σ min-dist² from each residual subvector to its codebook
    // must not increase vs the iters=0 seeds the training starts from
    val cmicro = cb.map(_.map(d => math.floor(d * 1e6).toLong))
    val centDf = broadcast(spark.createDataFrame(
        cmicro.zipWithIndex.toSeq.map { case (c2, i) => (i, c2.toSeq) })
      .toDF("cell", "cmv"))
    val resDf = emb.select($"vec_id",
        transform($"embedding", x => floor(x.cast("double") * 1e6).cast("long"))
          .as("mv"),
        element_at(vec_top_cells_dist2($"embedding", cb, 1), 1).as("cell"))
      .join(centDf, Seq("cell"))
      .select($"vec_id", vec_sub_long($"mv", $"cmv").as("rv"))
      .localCheckpoint()
    def distortionOf(rcbs: Array[Array[Array[Long]]]): Long = {
      val dsub = rcbs.head.head.length
      val perSub = (0 until rcbs.length).map { s =>
        val sv = slice($"rv", s * dsub + 1, dsub)
        least(rcbs(s).map(c2 =>
          vec_dist2_long(sv, array(c2.map(lit(_)): _*))): _*)
      }
      resDf.select(perSub.reduce(_ + _).as("d"))
        .agg(sum($"d")).head().getLong(0)
    }
    val dt = distortionOf(trained)
    val ds = distortionOf(seeded)
    assert(dt <= ds, s"trained distortion $dt > seeded distortion $ds")
    // and the full trained chain still retrieves well above the
    // ~2% chance floor
    val hits = Similarity.ivfadcResidualRerankTopKIndexed(
        Similarity.ivfadcResidualIndex(emb, "vec_id", "embedding", cb, trained),
        emb, queries, "vec_id", "embedding", k = 10, shortlist = 30,
        cb, trained, nProbe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    val micro = (c: org.apache.spark.sql.Column) =>
      transform(c, x => floor(x.cast("double") * 1e6).cast("long"))
    val q = queries.select($"vec_id".as("query_id"), micro($"embedding").as("qv"))
    val cc = emb.select($"vec_id".as("neighbor_id"), micro($"embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
      .orderBy($"d2_micro".asc, $"neighbor_id".asc)
    val exact = q.crossJoin(cc).filter($"query_id" =!= $"neighbor_id")
      .withColumn("d2_micro", vec_dist2_long($"qv", $"cv"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = hits.count(exact.contains).toDouble / hits.length
    assert(recall >= 0.15, s"trained-chain recall $recall below floor")
  }

  test("contaminationFuzzy: planted leaks flagged with best match; clean docs absent") {
    val holdout = Seq(
      (100L, "what is the capital of france paris obviously"),
      (101L, "what is the capital of france paris obviously")) // dup text, higher id
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "what is the capital of france paris obviously"),   // exact copy
      (2L, "what is the capital of france rome obviously"),    // near-dup
      (3L, "completely unrelated text about databases here"))  // clean
      .toDF("doc_id", "text")
    val rep = Dedup.contaminationFuzzy(train, holdout, "doc_id", "text",
        k = 3, threshold = 0.5)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // doc 3 shares no trigram -> absent; 1 and 2 flagged
    assert(rep.map(_._1) == Seq(1L, 2L))
    // best match ties (holdout 100/101 identical) break to the lower id
    assert(rep.forall(_._2 == 100L))
    // exact copy: jaccard = 1 -> 1e6 micros exactly
    assert(rep.head._3 == 1000000L)
    // near-dup: 8 tokens -> 6 trigrams per doc; grams touching the
    // changed token 6 differ, the first 4 are shared =>
    // inter=4, union=6+6-4=8, floor(1e6*4/8)=500000
    assert(rep(1)._3 == 500000L)
  }

  test("scrubDuplicatedSpans: hand-computed masks, within-doc repeats, short docs") {
    val df = Seq(
      (1L, "a b c d e"),            // canonical holder of 'a b c'
      (2L, "x y a b c z"),          // non-canonical 'a b c' at pos 2
      (3L, "p q"),                  // shorter than k: untouched
      (4L, "m n o m n o m n o"))    // within-doc repeats
      .toDF("doc_id", "text")
    val out = Dedup.scrubDuplicatedSpans(df, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L))
    // doc 1 holds every canonical occurrence it shares -> untouched
    assert(out(0) == ((1L, 5L, 0L, "a b c d e")))
    // doc 2: 'a b c' at tpos 2-4 is non-canonical (doc 1 pos 0 wins)
    assert(out(1) == ((2L, 6L, 3L, "x y z")))
    // doc 3: no trigram spans at all
    assert(out(2) == ((3L, 2L, 0L, "p q")))
    // doc 4: gram starts 3..6 all repeat earlier starts -> tokens 3-8
    // masked, the first 'm n o' survives as canonical
    assert(out(3) == ((4L, 9L, 6L, "m n o")))
  }

  test("scrubDuplicatedSpans minSpan: short runs survive, chained runs scrubbed") {
    val df = Seq(
      (1L, "p q r s t u v w x y"),       // canonical holder of all grams
      // one shared 5-gram -> masked run of exactly 5 tokens (pos 2-6)
      (2L, "m n p q r s t o"),
      // ten shared positions: grams at pos 2..7 chain -> run of 10
      (3L, "a b p q r s t u v w x y c"))
      .toDF("doc_id", "text")
    // default minSpan=1 (≤ k): the q97 behavior — both docs scrubbed
    val plain = Dedup.scrubDuplicatedSpans(df, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(plain(1) == ((2L, 8L, 5L, "m n o")))
    assert(plain(2) == ((3L, 13L, 10L, "a b c")))
    // minSpan=8: doc 2's 5-token run is below the span floor and
    // survives untouched; doc 3's chained 10-token run still goes
    val spanned = Dedup.scrubDuplicatedSpans(df, "doc_id", "text",
        k = 5, minSpan = 8)
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(spanned(0) == ((1L, 10L, 0L, "p q r s t u v w x y")))
    assert(spanned(1) == ((2L, 8L, 0L, "m n p q r s t o")))
    assert(spanned(2) == ((3L, 13L, 10L, "a b c")))
  }

  test("semDeDup: least-similar-to-centroid survives; non-clustered rows pass through") {
    val cb = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // cell 0: ids 1,2 near-dups (cos ≈ 0.998) — id 1 IS the centroid
    // direction (cos=1 to centroid), id 2 slightly off => id 2 is the
    // LESS-typical member and must survive. id 5 in cell 0 but far
    // from both (orthogonal-ish mix) => no pair, passes through.
    // cell 1: ids 3,4 near-dups — id 4 less similar to [0,1], survives.
    val e = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.9, 0.05)),
      (3L, Seq(0.0, 1.0)),
      (4L, Seq(0.05, 0.9)),
      (5L, Seq(0.7, -0.7))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDeDup(e, "vec_id", "embedding", cb, threshold = 0.9)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((2L, 0), (4L, 1), (5L, 0)),
      s"expected atypical members to survive, got $out")
    // determinism + no-pairs identity: at an unreachable threshold
    // every row survives with its cell attached
    val all = Similarity.semDeDup(e, "vec_id", "embedding", cb, threshold = 1.1)
    assert(all.count() == 5)
  }

  test("bloom filter: no false negatives, merge ≡ rebuild, increment ≡ plain") {
    val corpus = docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"text")
    val keys = Dedup.corpusTextKeys(corpus, "text")
    // no false negatives at ANY geometry, even a saturated 64-bit one
    for (m <- Seq(64, 1 << 12)) {
      val words = Dedup.bloomBuild(keys, "text", m, 5)
      val misses = keys.filter(
        !Dedup.bloomMightContain(words, $"text", m, 5)).count()
      assert(misses == 0, s"m=$m: $misses corpus keys tested negative")
    }
    // a large filter over few keys separates member from non-member
    val big = Dedup.bloomBuild(keys, "text", 1 << 16, 5)
    val fresh = docs.filter($"doc_id" % 2 === 1)
      .select(regexp_replace($"text", "(\\S+)", "qz$1").as("text"))
    val freshHits = fresh.filter(
      Dedup.bloomMightContain(big, $"text", 1 << 16, 5)).count()
    assert(freshHits < fresh.count() / 10,
      s"$freshHits/${fresh.count()} rewritten texts false-positive at 2^16")
    // append path: OR-merging the batch's bits == rebuild from union
    val batchKeys = Dedup.corpusTextKeys(fresh, "text")
    val merged = Dedup.bloomMerge(big,
      Dedup.bloomBuild(batchKeys, "text", 1 << 16, 5))
    val rebuilt = Dedup.bloomBuild(
      keys.unionByName(batchKeys).distinct(), "text", 1 << 16, 5)
    assert(merged.sameElements(rebuilt), "merge != rebuild-from-union")
  }

  test("dedupIncrementFullIndexedBloom ≡ plain form at dense-FP and clean geometries") {
    val corpus = docs.select($"doc_id", $"text")
    val fresh = regexp_replace($"text", "(\\S+)", "zq$1")
    val incoming = corpus.filter($"doc_id" % 11 === 3)
      .select(($"doc_id" + 1000000).as("doc_id"),
        concat($"text", lit(" zzqx")).as("text"))
      .unionByName(corpus.filter($"doc_id" % 11 === 5)
        .select(($"doc_id" + 2000000).as("doc_id"), $"text"))
      .unionByName(corpus.filter($"doc_id" % 11 === 1)
        .select(($"doc_id" + 3000000).as("doc_id"), fresh.as("text")))
    val idx = Dedup.corpusShingleIndex(corpus, "doc_id", "text", k = 3)
      .localCheckpoint()
    val keys = Dedup.corpusTextKeys(corpus, "text").localCheckpoint()
    val plain = Dedup.dedupIncrementFullIndexed(idx, keys, incoming,
        "doc_id", "text", k = 3, threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    // m=64: nearly every bit set -> the anti-join sees ~the whole
    // batch (false positives are routed through it, never mis-kept);
    // m=2^16: most fresh rows skip the join entirely. Same answer.
    for (m <- Seq(64, 1 << 16)) {
      val words = Dedup.bloomBuild(keys, "text", m, 5)
      val viaBloom = Dedup.dedupIncrementFullIndexedBloom(idx, keys, words,
          incoming, "doc_id", "text", k = 3, threshold = 0.5,
          mBits = m, kHashes = 5)
        .select($"doc_id").as[Long].collect().toSet
      assert(viaBloom == plain,
        s"m=$m: bloom=${viaBloom.size} plain=${plain.size}")
    }
    assert(plain.nonEmpty)
  }

  test("prototypePrune: hardest-per-cell kept, exact ceil quotas, rank order") {
    val cb = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // cell 0: 3 members with distinct centroid-cosines -> quota
    // ceil(3·0.3) = 1: only the most orthogonal (id 13) survives.
    // cell 1: 4 members -> quota ceil(4·0.3) = 2.
    val e = Seq(
      (11L, Seq(1.0, 0.0)),    // cos 1.0 to [1,0]
      (12L, Seq(0.9, 0.1)),    // cos ≈ 0.994
      (13L, Seq(0.6, 0.55)),   // cos ≈ 0.737 — hardest in cell 0
      (21L, Seq(0.0, 1.0)),    // cos 1.0 to [0,1]
      (22L, Seq(0.1, 0.9)),    // cos ≈ 0.994
      (23L, Seq(0.45, 0.6)),   // cos ≈ 0.8 — 2nd hardest in cell 1
      (24L, Seq(0.55, 0.6))    // cos ≈ 0.737 — hardest in cell 1
    ).toDF("vec_id", "embedding")
    val out = Similarity.prototypePrune(e, "vec_id", "embedding", cb,
        keepMilli = 300)
      .select($"vec_id", $"cell", $"hard_rank")
      .as[(Long, Int, Int)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((13L, 0, 1), (23L, 1, 2), (24L, 1, 1)),
      s"expected per-cell ceil quotas over hardness ranks, got $out")
    // keepMilli = 1000 keeps everything, ranks a permutation per cell
    val full = Similarity.prototypePrune(e, "vec_id", "embedding", cb,
        keepMilli = 1000)
    assert(full.count() == 7)
  }

  test("containment catches a prefix-subset pair that Jaccard misses") {
    import spark.implicits._
    // doc 2 = first half of doc 1's tokens: every trigram of 2 is a
    // trigram of 1 -> containment 1.0; Jaccard = n2/n1 ≈ 0.44, below
    // any near-dup threshold. doc 3 is unrelated.
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj kk ll"),
      (2L, "aa bb cc dd ee ff"),
      (3L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val cont = graft.ops.Dedup.ngramContainmentPairs(
        docs, "doc_id", "text", k = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(cont == Seq((1L, 2L, 1.0)), s"got $cont")
    val jac = graft.ops.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", k = 3, threshold = 0.9)
    assert(jac.count() == 0, "Jaccard at 0.9 must miss the subset pair")
    // containment respects the maxDf pruning one-sided guarantee:
    // pruning can only remove pairs, never add
    val pruned = graft.ops.Dedup.ngramContainmentPairs(
        docs, "doc_id", "text", k = 3, threshold = 0.9, maxDf = 1)
    assert(pruned.count() == 0)
  }

  test("pageRankMicro: hand-unrolled cyclic graph, exact integers") {
    import spark.implicits._
    // 1→2, 2→1, 1→3 (+ a duplicate edge that must collapse): node 3
    // dangling. Hand unroll of r'(v) = 150000 + (85·Σ r(u) div deg) div 100:
    //   r1 = (1000000, 575000, 575000)
    //   r2 = ( 638750, 575000, 575000)
    //   r3 = ( 638750, 421468, 421468)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 2L))
      .toDF("src", "dst")
    val got = graft.ops.Graph.pageRankMicro(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 638750L, 2L -> 421468L, 3L -> 421468L),
      s"got $got")
    // one iteration, undamped: pure mass passing (base 1000000/0? —
    // dampingPct=100 means base 0, rank = full summed contribution)
    val undamped = graft.ops.Graph.pageRankMicro(edges, "src", "dst",
        iters = 1, dampingPct = 100)
      .as[(Long, Long)].collect().toMap
    assert(undamped == Map(1L -> 1000000L, 2L -> 500000L, 3L -> 500000L))
  }
}
