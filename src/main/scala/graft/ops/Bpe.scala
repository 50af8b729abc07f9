package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE-merge training (Sennrich et al. 2016, the
  * byte-pair-encoding tokenizer-training loop) — exact and
  * engine-portable:
  *
  *  - the corpus compresses to the WORD-FREQUENCY DICT (the classic
  *    BPE training input): pair statistics weight by word frequency,
  *    so each iteration aggregates |dict| rows, not the corpus;
  *  - words travel in PADDED DOUBLED-SPACE form — tokens joined by
  *    two spaces with one at each end (` t1  t2  t3 `). In this form
  *    a plain (non-regex) global `replace` of ` a  b ` with ` ab `
  *    IS the exact left-to-right non-overlapping merge: every match
  *    consumes one space from each neighbor gap and the replacement
  *    restores it, so the form is self-preserving and consecutive
  *    matches cannot share separators. The same `replace` runs
  *    verbatim in any engine — the oracle replays whole training
  *    runs character-for-character;
  *  - each iteration = one keyed pair-count aggregate + one 1-row
  *    best-pair (total order: count desc, pair asc; self-pairs
  *    excluded — with a == b the left-to-right fold and a global
  *    replace diverge on runs like `a a a`) broadcast back by cross
  *    join + one scan applying the merge. No driver state, no
  *    collect; iteration count bounds plan depth (checkpoint every
  *    ~10 merges at real vocab sizes).
  */
object Bpe {

  /** The word-frequency dict of a text column, words in padded
    * doubled-space character form: (pw, freq). Words are lowercased,
    * alpha-only, length 2..12 (the standard pre-tokenization cut,
    * bounded so gate strings stay small). */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("__w"))
      .select(regexp_replace(col("__w"), "[^a-z]", "").as("__w"))
      .filter(length(col("__w")).between(2, 12))
      .select(concat(lit(" "),
        array_join(expr("filter(split(__w, ''), x -> x != '')"), "  "),
        lit(" ")).as("pw"))
      .groupBy(col("pw")).agg(count(lit(1)).as("freq"))

  /** Adjacent-pair statistics of a dict: (a, b, cnt), every adjacent
    * position counted, weighted by word frequency. */
  def pairCounts(dict: DataFrame): DataFrame =
    dict
      .select(expr("split(trim(pw), '  ')").as("__t"), col("freq"))
      .select(explode(expr(
        """zip_with(slice(__t, 1, size(__t) - 1),
          |         slice(__t, 2, size(__t) - 1),
          |         (x, y) -> named_struct('a', x, 'b', y))""".stripMargin))
        .as("__p"), col("freq"))
      .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** The best merge candidate: highest count, ties by (a, b); self
    * pairs excluded (see class doc). One row. */
  def bestPair(dict: DataFrame): DataFrame =
    pairCounts(dict).filter(col("a") =!= col("b"))
      .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)

  /** Apply one merge to the dict (best = 1 row, broadcast): the
    * self-preserving padded replace, then re-aggregate — distinct
    * pre-merge words can collide post-merge (`a b` → `ab` meets the
    * word `ab`). */
  def applyMerge(dict: DataFrame, best: DataFrame): DataFrame =
    // LEFT join on a constant key, not a cross join: a corpus with no
    // eligible pair (all self-pairs, or fully merged before `iters`
    // ran out) yields an EMPTY best frame, and a cross join would
    // annihilate the dict instead of leaving it unchanged
    dict.withColumn("__k", lit(1))
      .join(broadcast(best.select(lit(1).as("__k"), col("a"), col("b"))),
        Seq("__k"), "left")
      .select(when(col("a").isNull, col("pw")).otherwise(expr(
        "replace(pw, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ')"))
        .as("pw"), col("freq"))
      .groupBy(col("pw")).agg(sum(col("freq")).as("freq"))

  /** Train `iters` merges. Returns (merges, finalDict): merges =
    * (iter, a, b, cnt) one row per learned merge, in order. */
  def train(docs: DataFrame, textCol: String,
      iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1)
    // each 1-row best is consumed by two lineages (the merges union +
    // every later iteration's dict) — caching the BESTS alone keeps
    // the expensive pair-count aggregates to one run each (O(iters)
    // total) while pinning only iters single-row frames in the
    // session cache; the dict chain itself replays as cheap scans and
    // is deliberately NOT cached (a per-corpus vocabulary-sized cache
    // entry would outlive the call — ADVICE-class leak).
    var dict = wordDict(docs, textCol)
    var merges: DataFrame = null
    for (i <- 1 to iters) {
      val best = bestPair(dict).cache()
      val tagged = best.select(lit(i).as("iter"), col("a"), col("b"),
        col("cnt"))
      merges = if (merges == null) tagged else merges.unionByName(tagged)
      dict = applyMerge(dict, best)
    }
    (merges, dict)
  }

  /** Corpus token frequencies under a (trained) dict: (token, freq). */
  def tokenCounts(dict: DataFrame): DataFrame =
    dict.select(explode(expr("split(trim(pw), '  ')")).as("token"),
        col("freq"))
      .groupBy(col("token")).agg(sum(col("freq")).as("freq"))

  /** Tokenize per document with a FROZEN ordered merge list (the
    * steady-state form: merges are bounded trained state — ≤ vocab
    * size rows, the codebook-collect precedent): per doc, the number
    * of tokens its (filtered) words produce under the merges. */
  def tokenizeWith(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+"))
        .as("__w"))
      .select(col(idCol), regexp_replace(col("__w"), "[^a-z]", "")
        .as("__w"))
      .filter(length(col("__w")).between(2, 12))
      .select(col(idCol), concat(lit(" "),
        array_join(expr("filter(split(__w, ''), x -> x != '')"), "  "),
        lit(" ")).as("pw"))
    // merge constants travel as bound literals, never spliced into
    // SQL text — a token containing a quote must not break (or
    // inject into) the expression
    val merged = merges.foldLeft(words) { case (df, (a, b)) =>
      df.withColumn("pw", call_function("replace", col("pw"),
        lit(s" $a  $b "), lit(s" $a$b ")))
    }
    merged
      .select(col(idCol), size(expr("split(trim(pw), '  ')")).as("__n"))
      .groupBy(col(idCol)).agg(sum(col("__n")).as("n_tokens"))
  }
}
