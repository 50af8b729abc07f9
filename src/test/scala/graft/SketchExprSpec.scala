package graft

import org.apache.spark.sql.functions._
import graft.functions.sketches
import graft.ops.{Dedup, Similarity}

/** Differential tests for the codegen'd sketch/vector expressions
  * against the interpreted SQL higher-order-function forms they
  * replaced (bit-identical FP + null semantics required, since the
  * DuckDB oracles were written against the HOF forms). */
class SketchExprSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("vec_dot is bit-identical to the aggregate/zip_with fold on real embeddings") {
    val diff = emb.as("a").join(emb.as("b"), $"a.vec_id" === $"b.vec_id" + 1)
      .select(
        sketches.vec_dot($"a.embedding", $"b.embedding").as("fast"),
        Similarity.dotHof($"a.embedding", $"b.embedding").as("slow"))
      .filter(!($"fast" <=> $"slow"))
    assert(diff.count() == 0)
  }

  test("vec_dot null semantics: null array, null element, length mismatch -> null") {
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),      // 11.0
      (2L, Seq(1.0), Seq(3.0, 4.0)),           // length mismatch -> null
      (3L, null, Seq(3.0))                     // null array -> null
    ).toDF("id", "a", "b")
      .withColumn("a", when($"id" === 4, $"a").otherwise($"a"))
    val withNullElem = df.union(
      Seq((4L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 1.0)))
        .toDF("id", "a", "b"))
    val got = withNullElem
      .select($"id", sketches.vec_dot($"a", $"b").as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(11.0))
    assert(got(2L).isEmpty)
    assert(got(3L).isEmpty)
    assert(got(4L).isEmpty)
  }

  test("vec_dist2 is bit-identical to the HOF fold; mixed float/double works") {
    val planes = array((0 until 64).map(i => lit(if (i % 2 == 0) 1.0 else -1.0)): _*)
    val hof = org.apache.spark.sql.functions.aggregate(
      zip_with(transform($"embedding", x => x.cast("double")), planes,
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
    val diff = emb.select(
        sketches.vec_dist2($"embedding", planes).as("fast"), hof.as("slow"))
      .filter(!($"fast" <=> $"slow"))
    assert(diff.count() == 0)
  }

  test("simhash64 expression equals the grouped (explode+agg) simhash form") {
    val byExpr = Dedup.simhash(docs, "doc_id", "text")
      .select($"doc_id", $"simhash")
    val byGroup = Dedup.simhashGrouped(docs, "doc_id", "text")
      .withColumnRenamed("simhash", "simhash_g")
    val joined = byExpr.join(byGroup, "doc_id")
    assert(joined.count() == docs.count())
    assert(joined.filter($"simhash" =!= $"simhash_g").count() == 0)
  }

  test("minhash_sig: lane mins ignore duplicate shingles; empty array -> null") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "b")),
      (2L, Seq("a", "b")),
      (3L, Seq.empty[String])).toDF("id", "sh")
    val sig = df.select($"id", sketches.minhash_sig($"sh", 8).as("s"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(sig(1L) == sig(2L))          // multiset min == set min
    assert(sig(3L).isEmpty)             // no shingles -> no signature
    assert(sig(1L).get.length == 8)
  }

  test("shingle_set matches array_distinct over the Column-combinator shingles") {
    val combinator = array_distinct(Dedup.shingles($"text", 3))
    val diff = docs.select(
        sketches.shingle_set($"text", 3).as("fast"), combinator.as("slow"))
      .filter(!($"fast" <=> $"slow"))
    assert(diff.count() == 0)
    // edge cases: empty text, fewer-than-k tokens, duplicate shingles,
    // messy internal/leading whitespace (split keeps a leading empty
    // token — the expression must too)
    val edge = Seq("", "one two", "a b a b a b a b", "  x\t\ty  z ", "\nlead")
      .toDF("text")
    val ediff = edge.select(
        sketches.shingle_set($"text", 2).as("fast"),
        array_distinct(Dedup.shingles($"text", 2)).as("slow"))
      .filter(!($"fast" <=> $"slow"))
    assert(ediff.count() == 0)
    // multiset variant == the raw combinator (no distinct)
    val mdiff = docs.select(
        sketches.shingles_all($"text", 2).as("fast"),
        Dedup.shingles($"text", 2).as("slow"))
      .filter(!($"fast" <=> $"slow"))
    assert(mdiff.count() == 0)
    // withSize variant carries the distinct count on every element
    val n = docs.select(explode(sketches.shingle_set_n($"text", 3)).as("e"))
      .select($"e.shingle", $"e.n_sh")
    val direct = docs.select(size(sketches.shingle_set($"text", 3)).as("n"))
      .filter($"n" > 0).agg(sum($"n")).as[Long].head()
    assert(n.count() == direct)
  }

  test("create_ids expression matches the zip_with combinator on all edge cases") {
    import graft.functions.parsers
    val edge = Seq(
      ("1|2|3", "1|2|3"),   // equal lengths
      ("1|2", "1|2|3"),          // ids shorter -> null pad
      ("1|2|3", "1"),                 // nums shorter -> null pad
      ("1", "1234"),                            // >3 digits: lpad truncates
      ("", ""),                                 // empty strings -> [""] tokens
      ("a||b", "1|2|3"),    // empty id token in middle
      (null, "1"), ("1", null)                  // null propagation
    ).toDF("ids", "nums")
    val diff = edge.select(
        parsers.createIds($"ids", $"nums").as("fast"),
        parsers.createIdsHof($"ids", $"nums").as("slow"))
      .filter(!($"fast" <=> $"slow"))
    assert(diff.count() == 0)
    // and on real data at volume
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(concat_ws("|", $"l_partkey", $"l_suppkey").as("ids"),
        concat_ws("|", $"l_linenumber", $"l_linenumber" + 1).as("nums"))
    val rdiff = li.select(
        parsers.createIds($"ids", $"nums").as("fast"),
        parsers.createIdsHof($"ids", $"nums").as("slow"))
      .filter(!($"fast" <=> $"slow"))
    assert(rdiff.count() == 0)
  }

  test("fingerprint64 and avg_token_len are bit-identical to their HOF forms") {
    import graft.ops.TextAnalysis
    // real corpus + adversarial edges: empty, whitespace-only, non-ASCII
    // (code points, not bytes: Spark ascii('é')=233), surrogate
    // pair, repeated whitespace, null
    val edges = Seq("", "   ", "a", "héllo wörld",
      "日本語 テスト", "one  two\tthree\nfour",
      "emoji 😀 pair", null.asInstanceOf[String]).toDF("text")
    val all = docs.select($"text").unionByName(edges)
    val diff = all.select(
        TextAnalysis.fingerprint($"text").as("fp_fast"),
        TextAnalysis.fingerprintHof($"text").as("fp_slow"),
        TextAnalysis.avgTokenLen($"text").as("atl_fast"),
        TextAnalysis.avgTokenLenHof($"text").as("atl_slow"))
      .filter(!($"fp_fast" <=> $"fp_slow") || !($"atl_fast" <=> $"atl_slow"))
    assert(diff.count() == 0)
    // pinned values from the interpreted form (spark-shell probe), so a
    // regression in BOTH forms at once cannot slip through
    val pinned = Seq("héllo wérld", "plain ascii text",
      "日日 x", "").toDF("text")
      .select(TextAnalysis.fingerprint($"text")).as[Long].collect().toSeq
    assert(pinned == Seq(309323298L, 279672311L, 802167032L, 0L))
  }

  test("simhash_md5_60 expression equals the grouped md5 bit-vote form") {
    val byExpr = docs.select($"doc_id",
      sketches.simhash_md5_60(split(trim($"text"), "\\s+")).as("simhash"))
    val byGroup = Dedup.simhashGroupedPortable(docs, "doc_id", "text")
    val diff = byExpr.as("a").join(byGroup.as("b"), "doc_id")
      .filter(!($"a.simhash" <=> $"b.simhash"))
    assert(diff.count() == 0)
  }

  test("minhash_md5 expression equals the grouped min(md5) lane form") {
    val n = 8
    val byExpr = docs.select($"doc_id",
        sketches.minhash_md5(sketches.shingle_set($"text", 2), n).as("__sig"))
      .filter($"__sig".isNotNull)
      .select($"doc_id" +: (0 until n).map(i =>
        element_at($"__sig", i + 1).as(s"h$i")): _*)
    val byGroup = docs.select($"doc_id",
        explode(sketches.shingle_set($"text", 2)).as("shingle"))
      .groupBy($"doc_id").agg(
        (0 until n).map(i =>
          min(md5(concat_ws(":", lit(i), $"shingle"))).as(s"h$i")).head,
        (0 until n).map(i =>
          min(md5(concat_ws(":", lit(i), $"shingle"))).as(s"h$i")).tail: _*)
    val cond = (0 until n).map(i => !(col(s"a.h$i") <=> col(s"b.h$i")))
      .reduce(_ || _)
    val diff = byExpr.as("a").join(byGroup.as("b"), "doc_id").filter(cond)
    assert(diff.count() == 0)
    assert(byExpr.count() == byGroup.count())
  }

  test("token_set_count (stopword ratio / lang-id) equals the HOF forms") {
    import graft.ops.TextAnalysis
    val edges = Seq("", "the the THE of", "no stop words here",
      "el de la y the und", null.asInstanceOf[String]).toDF("text")
    val all = docs.select($"text").unionByName(edges)
    val langCols = TextAnalysis.langScores($"text")
      .zip(TextAnalysis.langScoresHof($"text"))
      .map { case ((l, fast), (_, slow)) => !(fast <=> slow) }
    val diff = all.filter(
      !(TextAnalysis.stopwordRatio($"text") <=> TextAnalysis.stopwordRatioHof($"text")) ||
        langCols.reduce(_ || _))
    assert(diff.count() == 0)
  }

  test("vec_sub_long equals zip_with subtraction; null/mismatch -> null") {
    val df = Seq(
      (1L, Seq(10L, 20L, 30L), Seq(1L, 2L, 3L)),   // (9, 18, 27)
      (2L, Seq(10L), Seq(1L, 2L)),                 // length mismatch -> null
      (3L, null, Seq(1L))                          // null array -> null
    ).toDF("id", "a", "b")
    val got = df.select($"id", sketches.vec_sub_long($"a", $"b").as("k"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(got(1L).contains(Seq(9L, 18L, 27L)))
    assert(got(2L).isEmpty)   // zip_with pads with null instead; the
                              // kernel keeps VecDist2Long's semantics
    assert(got(3L).isEmpty)
    // equal-length rows match the zip_with fold exactly
    val both = df.filter($"id" === 1)
      .select(sketches.vec_sub_long($"a", $"b").as("k"),
        zip_with($"a", $"b", (x, y) => x - y).as("h"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(both._1 == both._2)
  }

  test("vec_argmin_long equals the unrolled least(struct(dist, idx)) rule") {
    // deterministic pseudo-random micro vectors + codebook; the kernel
    // must match the k-way least(struct) ordering it replaced,
    // including ties (strict < keeps the lowest index)
    val rng = new scala.util.Random(7)
    val dim = 16
    val codebook = Array.fill(8)(Array.fill(dim)(rng.nextInt(2000001).toLong - 1000000L))
    val vecs = (0L until 200L).map { i =>
      // plant exact-centroid hits (guaranteed 0-distance ties when a
      // codebook row repeats) alongside random vectors
      if (i % 10 == 0) (i, codebook((i / 10 % 8).toInt).toSeq)
      else (i, Seq.fill(dim)(rng.nextInt(2000001).toLong - 1000000L))
    }.toDF("id", "v")
    val unrolled = codebook.zipWithIndex.map { case (c, j) =>
      struct(sketches.vec_dist2_long($"v", typedLit(c.toSeq)).as("d"),
        lit(j).as("cid"))
    }
    val diff = vecs.select(
        sketches.vec_argmin_long($"v", codebook).as("fast"),
        least(unrolled.toSeq: _*).getField("cid").as("slow"))
      .filter(!($"fast" <=> $"slow"))
    assert(diff.count() == 0)
  }

  test("token_stats equals the HOF combinator form (n_tokens/n_distinct/top_freq)") {
    val t = split(trim($"text"), "\\s+")
    // struct(...) is non-null even when all children are null, so the
    // null-text row must collapse to a null struct explicitly
    val hof = when($"text".isNotNull, struct(
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct"),
      array_max(transform(array_distinct(t),
        w => size(filter(t, x => x === w)))).as("top_freq")))
    // edges: empty -> [""] -> (1,1,1); whitespace runs; leading \n and
    // trailing space (trim convention must match SQL trim + split);
    // null propagates
    val edges = Seq("", "   ", "a", "a a a b", "one  two\tthree\nfour",
      "\nlead", "trail ", null.asInstanceOf[String]).toDF("text")
    val all = docs.select($"text").unionByName(edges)
    val diff = all.select(
        sketches.token_stats($"text").as("fast"), hof.as("slow"))
      .filter(!($"fast" <=> $"slow"))
    assert(diff.count() == 0)
    // pinned values so a regression in BOTH forms cannot slip through
    val got = Seq("a a a b", "").toDF("text")
      .select(sketches.token_stats($"text").as("s"))
      .select($"s.n_tokens", $"s.n_distinct", $"s.top_freq")
      .as[(Int, Int, Int)].collect().toSeq
    assert(got == Seq((4, 2, 3), (1, 1, 1)))
  }

  test("nfc normalization: NFD folds to NFC, ASCII untouched, null propagates") {
    import graft.ops.TextAnalysis
    val nfdCafe = "cafe\u0301"  // e + combining acute (NFD)
    val nfcCafe = "caf\u00e9"   // precomposed (NFC)
    assert(nfdCafe != nfcCafe && nfdCafe.length == 5 && nfcCafe.length == 4)
    val rows = Seq(
      (1L, nfdCafe), (2L, nfcCafe), (3L, "plain ascii"),
      (4L, "  MiXeD   Case\t\ttext "), (5L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = rows.select($"id", sketches.nfc($"text").as("n"),
        TextAnalysis.normalizeText($"text").as("norm"))
      .as[(Long, Option[String], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._1.contains(nfcCafe))          // NFD -> NFC
    assert(got(2L)._1.contains(nfcCafe))          // idempotent
    assert(got(1L)._2 == got(2L)._2)              // normalized forms agree
    assert(got(3L)._1.contains("plain ascii"))    // ASCII identity
    assert(got(4L)._2.contains("mixed case text")) // lower + collapse + trim
    assert(got(5L)._1.isEmpty && got(5L)._2.isEmpty)
  }

  test("oracle assumption guard: documents corpus is pure ASCII") {
    // the q24/q32/q33 oracles equate DuckDB character positions with
    // UTF-8 bytes (ascii(c) folds, octet_length); that only holds for
    // an ASCII corpus. If the generator ever emits non-ASCII text this
    // fails loudly instead of the oracles silently diverging.
    assert(docs.filter($"text".rlike("[^\\x00-\\x7F]")).count() == 0,
      "documents.text contains non-ASCII — switch the q24/q32/q33 " +
        "oracles to fold over BLOB octets")
  }

  test("cdc_bounds matches the interpreted md5/conv combinator on the real corpus") {
    // q115's boundary rule: the compiled CdcBounds must be bit-equal
    // to the HOF form the DuckDB oracle replays, across (window,
    // modulus) shapes — including modulus 1 (every candidate passes)
    // and a window larger than most documents (sentinels only).
    for ((w, m) <- Seq((4, 8), (3, 4), (2, 1), (5, 16), (64, 8))) {
      val diff = docs
        .select(split(trim($"text"), "\\s+").as("__toks"))
        .select(
          sketches.cdc_bounds($"__toks", w, m).as("fast"),
          graft.ops.TrainingPrep.cdcBoundsHof($"__toks", w, m).as("slow"))
        .filter(!($"fast" <=> $"slow"))
      assert(diff.count() == 0, s"cdc_bounds diverged at window=$w modulus=$m")
    }
  }

  test("cdc_bounds edge cases: short/empty token arrays, null tokens, null array") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),            // n-1 < window -> [0, n]
      (2L, Seq("a")),                      // single token
      (3L, Seq("a", "b", "c", "d", "e", "f", "g", "h"))
    ).toDF("id", "toks")
    val got = df.select($"id",
        sketches.cdc_bounds($"toks", 4, 8).as("fast"),
        graft.ops.TrainingPrep.cdcBoundsHof($"toks", 4, 8).as("slow"))
      .as[(Long, Seq[Int], Seq[Int])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._1 == Seq(0, 3) && got(1L)._1 == got(1L)._2)
    assert(got(2L)._1 == Seq(0, 1) && got(2L)._1 == got(2L)._2)
    assert(got(3L)._1 == got(3L)._2)
    // null tokens are skipped like concat_ws (both forms agree)
    val withNulls = Seq((4L, Seq[String]("a", null, "b", "c", "d", null, "e")))
      .toDF("id", "toks")
      .select(
        sketches.cdc_bounds($"toks", 3, 2).as("fast"),
        graft.ops.TrainingPrep.cdcBoundsHof($"toks", 3, 2).as("slow"))
      .as[(Seq[Int], Seq[Int])].collect().head
    assert(withNulls._1 == withNulls._2)
    // null array -> null (expression contract)
    val nullArr = Seq(Tuple1(Option.empty[Seq[String]])).toDF("toks")
      .select(sketches.cdc_bounds($"toks", 4, 8).as("b"))
      .collect().head
    assert(nullArr.isNullAt(0))
  }

  test("cdc_bounds participates in whole-stage codegen (no fallback in the plan)") {
    import org.apache.spark.sql.execution.debug._
    val qe = docs.select(
        sketches.cdc_bounds(split(trim($"text"), "\\s+"), 4, 8).as("b"))
      .queryExecution
    val cg = codegenString(qe.executedPlan)
    assert(cg.contains("Found 1 WholeStageCodegen"), s"no codegen stage in:\n$cg")
    assert(!cg.contains("CdcBounds.eval"), "cdc_bounds fell back to interpreted eval")
  }

  test("vec_dot participates in whole-stage codegen (no fallback in the plan)") {
    import org.apache.spark.sql.execution.debug._
    val qe = emb.select(sketches.vec_dot($"embedding", $"embedding").as("d"))
      .queryExecution
    val cg = codegenString(qe.executedPlan)
    assert(cg.contains("Found 1 WholeStageCodegen"), s"no codegen stage in:\n$cg")
    // the generated Java must contain the inlined dot loop, not an
    // interpreted-eval bridge to the expression class
    assert(!cg.contains("VecDot.eval"), "vec_dot fell back to interpreted eval")
  }
}
