package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (builder-prompt north star; SURVEY.md §7.6). Every operator is a
  * pure per-row Column expression — no UDFs, no shuffles, fully inside
  * whole-stage codegen, so they stream over 100 TB of documents at
  * scan speed.
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Token count (whitespace). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token estimate: count of letter-runs and digit-runs plus
    * standalone punctuation — a cheap, deterministic proxy for subword
    * token counts. */
  def regexTokenCount(c: Column): Column =
    call_function("regexp_count", c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Mean token length, as double (exact int/int division both here and
    * in the oracle). Compiled [[graft.functions.AvgTokenLen]] expression
    * — the HOF fold ran interpreted per character on the scan path. */
  def avgTokenLen(c: Column): Column =
    graft.functions.sketches.avg_token_len(c)

  /** The original higher-order-function form of [[avgTokenLen]], kept
    * for differential testing (bit-identical by contract). */
  def avgTokenLenHof(c: Column): Column = {
    val t = tokens(c)
    val totalLen = aggregate(transform(t, w => length(w)), lit(0),
      (acc, x) => acc + x)
    totalLen.cast("double") / size(t)
  }

  /** Punctuation ratio over characters. */
  def punctRatio(c: Column): Column =
    call_function("regexp_count", c, lit("[\\.,;:!?]")).cast("double") /
      length(c)

  private val enStopwords =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  /** Stopword ratio (English list) over tokens. Compiled
    * [[graft.functions.TokenSetCount]] — the filter/array_contains
    * combinator ran as interpreted lambdas per token on the scan
    * path. */
  def stopwordRatio(c: Column): Column = {
    val t = tokens(c)
    graft.functions.sketches.token_set_count(t, enStopwords).cast("double") / size(t)
  }

  /** The original higher-order-function form of [[stopwordRatio]],
    * kept for differential testing. */
  def stopwordRatioHof(c: Column): Column = {
    val t = tokens(c)
    val sw = array(enStopwords.map(lit): _*)
    size(filter(t, w => array_contains(sw, w))).cast("double") / size(t)
  }

  /** Composite quality heuristic: length-bounded, some stopwords, sane
    * mean word length — the usual cheap pre-filter before expensive
    * dedup/scoring stages. */
  def qualityOk(c: Column): Column = {
    val n = tokenCount(c)
    n >= 5 && n <= 10000 &&
      avgTokenLen(c) >= 2.0 && avgTokenLen(c) <= 15.0 &&
      stopwordRatio(c) >= 0.0
  }

  /** Language-ID by stopword voting: score = number of tokens found in
    * each language's tiny stopword list; strict-majority winner, ties
    * (including all-zero) → "und". N-gram-free so it stays a pure
    * projection; good enough for coarse corpus routing. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est"))

  def langScores(c: Column): Seq[(String, Column)] = {
    val t = tokens(c)
    langStopwords.map { case (lang, words) =>
      lang -> graft.functions.sketches.token_set_count(t, words)
    }
  }

  /** The original higher-order-function form of [[langScores]], kept
    * for differential testing. */
  def langScoresHof(c: Column): Seq[(String, Column)] = {
    val t = tokens(c)
    langStopwords.map { case (lang, words) =>
      val sw = array(words.map(lit): _*)
      lang -> size(filter(t, w => array_contains(sw, w)))
    }
  }

  def langId(c: Column): Column = {
    val scores = langScores(c)
    val winner = scores.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      val others = scores.filter(_._1 != lang).map(_._2)
      when(s > greatest(others: _*), lit(lang)).otherwise(acc)
    }
    winner
  }

  /** Canonical text normalization for corpus prep: Unicode NFC (the
    * compiled [[graft.functions.NfcNormalize]] — Spark's one missing
    * built-in here, with an ASCII no-op fast path), then lowercase,
    * collapse whitespace runs to single spaces, and trim. Everything
    * after NFC is built-in codegen'd functions — the whole pipeline is
    * a scan-speed projection. Composition order matters: NFC first so
    * case-folding sees precomposed characters. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      lower(graft.functions.sketches.nfc(c)), "\\s+", " "))

  /** Gopher-style repetition/diversity gate over the single-pass
    * compiled [[graft.functions.TokenStats]] kernel — the cheap
    * pre-filter that runs before any dedup stage: drop documents that
    * are too short, too repetitive (low distinct-token fraction), or
    * dominated by one token. Ratios are floor'd integer micros and the
    * verdict is integer comparisons, so the whole report is
    * shuffle-free, scan-speed, and engine-portable. Returns
    * (id, n_tokens, distinct_micro, top_micro, gopher_ok). */
  def gopherRepetitionReport(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 20, minDistinctMicro: Long = 350000L,
      maxTopMicro: Long = 125000L): DataFrame =
    df.select(col(idCol),
        // single-eval Generate barrier (q73/q75 precedent): the stats
        // struct feeds four consumers
        inline(array(graft.functions.sketches.token_stats(col(textCol)))))
      .select(col(idCol), col("n_tokens"),
        floor(col("n_distinct").cast("double") * 1e6 / col("n_tokens"))
          .cast("long").as("distinct_micro"),
        floor(col("top_freq").cast("double") * 1e6 / col("n_tokens"))
          .cast("long").as("top_micro"))
      .withColumn("gopher_ok",
        col("n_tokens") >= minTokens &&
          col("distinct_micro") >= minDistinctMicro &&
          col("top_micro") <= maxTopMicro)

  /** Document fingerprint: rolling polynomial hash over characters,
    * `h = (h*31 + codepoint) mod 1e9+7` — deterministic, oracle-
    * replicable, and a stable cheap identity for exact-dup detection
    * when the full text is too wide to shuffle. Compiled
    * [[graft.functions.Fingerprint64]] expression — the HOF fold ran
    * interpreted per character on the scan path. */
  def fingerprint(c: Column): Column =
    graft.functions.sketches.fingerprint64(c)

  /** The original higher-order-function form of [[fingerprint]], kept
    * for differential testing (bit-identical by contract). */
  def fingerprintHof(c: Column): Column =
    aggregate(
      filter(split(trim(c), ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L)
}
