package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE training semantics vs a sequential JVM reference: exact merge
  * choices and counts, left-to-right non-overlapping application
  * (incl. the `ababab` run), self-pair exclusion, and the post-merge
  * dict collision. The q177/q178 gates prove the full
  * character-exact DuckDB replay at scale. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Sequential reference: dict as token-lists with frequencies. */
  private def refTrain(words: Map[String, Long], iters: Int)
      : (Seq[(String, String, Long)], Map[String, Long]) = {
    var dict: Map[List[String], Long] =
      words.map { case (w, f) => w.toList.map(_.toString) -> f }
    val merges = scala.collection.mutable.ListBuffer
      .empty[(String, String, Long)]
    var exhausted = false
    for (_ <- 1 to iters if !exhausted) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((toks, f) <- dict; Seq(a, b) <- toks.sliding(2))
        counts((a, b)) += f
      val eligible = counts.filter { case ((a, b), _) => a != b }
      if (eligible.isEmpty) { exhausted = true }
      else {
      val ((a, b), c) =
        eligible.minBy { case ((a, b), c) => (-c, a, b) }
      merges += ((a, b, c))
      dict = dict.toSeq.map { case (toks, f) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += a + b; i += 2
          } else { out += toks(i); i += 1 }
        }
        out.toList -> f
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    val tokenFreq = dict.toSeq
      .flatMap { case (toks, f) => toks.map(_ -> f) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    (merges.toSeq, tokenFreq)
  }

  private def docsOf(words: Map[String, Long]) =
    words.toSeq.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")

  private def check(words: Map[String, Long], iters: Int): Unit = {
    val (refMerges, refTokens) = refTrain(words, iters)
    val (merges, dict) = Bpe.train(docsOf(words), "text", iters)
    val gotMerges = merges.orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(gotMerges == refMerges, s"merges: $gotMerges vs $refMerges")
    val gotTokens = Bpe.tokenCounts(dict).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(gotTokens == refTokens, s"tokens: $gotTokens vs $refTokens")
  }

  test("planted merges: overlap runs, self-pair exclusion, collisions") {
    // 'ababab': (a,b) dominates; merging must produce [ab,ab,ab]
    // (left-to-right non-overlap); 'ab' then collides with merged
    // pairs in the dict; 'aaaa' may never be chosen (self-pair)
    check(Map("ababab" -> 5L, "abc" -> 3L, "ab" -> 2L, "aaaa" -> 10L,
      "bc" -> 1L), iters = 3)
  }

  test("exhausted merges leave the dict intact (no eligible pair)") {
    // only self-pairs exist: every bestPair is empty; the dict (and
    // token counts) must survive unchanged, never be annihilated
    check(Map("aa" -> 4L, "bbb" -> 2L), iters = 2)
    // ...and a corpus that runs out of eligible pairs MID-training:
    // 'ab'x3 merges once, after which only single-token words remain
    check(Map("ab" -> 3L), iters = 3)
  }

  test("differential vs reference on the sf0.001 documents corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // reference dict from the same cleaning rules
    val words = docs.select(explode(split(lower(col("text")), "\\s+"))
        .as("w"))
      .select(regexp_replace(col("w"), "[^a-z]", "").as("w"))
      .filter(length(col("w")).between(2, 12))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (refMerges, refTokens) = refTrain(words, 3)
    val (merges, dict) = Bpe.train(docs, "text", 3)
    val gotMerges = merges.orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(gotMerges == refMerges)
    val gotTokens = Bpe.tokenCounts(dict).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(gotTokens == refTokens)
  }

  test("tokenizeWith applies frozen merges per document") {
    val docs = Seq((1L, "abab abc zz"), (2L, "ab aaaa"))
      .toDF("doc_id", "text")
    // merges (a,b) then (ab,c): doc1 = [ab,ab] + [abc] + [z,z] = 5
    // (no (z,z) merge — 'zz' stays two chars); doc2 = [ab] + [a,a,a,a]
    val out = Bpe.tokenizeWith(docs, "doc_id", "text",
        Seq(("a", "b"), ("ab", "c")))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 5L), (2L, 5L)))
  }
}
