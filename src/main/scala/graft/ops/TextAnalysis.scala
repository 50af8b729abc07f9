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

  /** ZIPF rank-frequency spectrum (r15) — the head of the corpus'
    * term-frequency distribution: the `topK` most frequent terms with
    * their counts and exact corpus share
    * (share_micro = (10⁶·freq) div total_tokens). The classic first
    * look at a crawl (is it boilerplate-dominated? is the head one
    * stop-word deep?) and the vocabulary side of q53's TF-IDF.
    * Scale shape: one map-side-combinable term count, then a
    * TakeOrdered top-K (the dsirSelect discipline — bounded by K,
    * never a global sort) + the 1-row total attach. Rank is implicit
    * in the (freq DESC, term ASC) output order — no window over the
    * unpartitioned spectrum. */
  def termSpectrum(df: DataFrame, textCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, "termSpectrum: topK must be >= 1")
    val toks = df.filter(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("term"))
    val total = toks.agg(count(lit(1)).as("__total"))
    toks.groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc)
      .limit(topK)
      .crossJoin(broadcast(total)) // 1-row total attach
      .select(col("term"), col("freq"),
        expr("(1000000 * freq) div __total").as("share_micro"))
  }

  /** HEAPS-law vocabulary growth (r15): how fast NEW terms appear as
    * the corpus grows — per id-order decile (bucket i = docs with
    * id·buckets div (max_id+1) = i), the count of terms whose FIRST
    * occurrence falls in that bucket, beside the bucket's token
    * volume. A sublinear new-term curve is the Heaps signature; a
    * bucket with a new-term spike is a contamination/source-shift
    * signal. Scale shape: first-occurrence = one min-aggregate per
    * term (map-side combinable), bucket arithmetic rides the 1-row
    * max attach, output is `buckets` rows. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2, "vocabGrowth: buckets must be >= 2")
    val base = df.filter(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        tokens(col(textCol)).as("__toks"))
    val mx = base.agg(max(col("__id")).as("__mx"))
    val firstDoc = base
      .select(col("__id"), explode(col("__toks")).as("term"))
      .groupBy(col("term")).agg(min(col("__id")).as("__fd"))
    val newTerms = firstDoc.crossJoin(broadcast(mx)) // 1-row attach
      .select(expr(s"(__fd * $buckets) div (__mx + 1)").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_terms"))
    val tokensPerBucket = base.crossJoin(broadcast(mx))
      .select(expr(s"(__id * $buckets) div (__mx + 1)").as("bucket"),
        size(col("__toks")).cast("long").as("__n"))
      .groupBy(col("bucket")).agg(sum(col("__n")).as("n_tokens"))
    tokensPerBucket.join(newTerms, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("new_terms"), lit(0L))
        .as("new_terms"), col("n_tokens"))
  }

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

  // -----------------------------------------------------------------
  // PII scrubbing (the CCNet/Pile/Gopher redaction pass): replace
  // emails, IPv4 addresses, and international-format phone numbers
  // with typed placeholder tokens before training. Patterns restrict
  // themselves to the regex subset with IDENTICAL semantics in Java
  // regex (Spark codegen) and RE2 (DuckDB): character classes,
  // bounded quantifiers, \b word boundaries, alternation — no
  // lookaround, no backreferences — so the scrub is oracle-replayable
  // character-for-character.
  // -----------------------------------------------------------------

  /** Email: local part per the practical RFC 5322 subset, domain with
    * at least one dot and an alphabetic TLD. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4 dotted quad. Octet-range checking (0-255) is deliberately
    * omitted: it needs alternation that explodes the pattern, and an
    * over-scrub of 999.1.1.1 is harmless where an under-scrub of a
    * real address is not. */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Phone: optional +, then digit groups separated by single spaces,
    * dots, or dashes (E.164-ish length band). \b keeps the match off
    * the tails of longer digit runs. */
  val PhonePattern = "\\+?\\b[0-9]{2,4}([ .-]?[0-9]{2,4}){2,4}\\b"

  /** Scrub order matters and is part of the contract: emails first
    * (their local parts contain digits a phone pass would mangle),
    * then IPs (dotted digits a phone pass would eat), then phones.
    * Pure codegen'd projection — scan speed, like every operator
    * here. */
  def piiScrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Per-row scrub + per-type match counts (id, scrubbed, n_email,
    * n_ip, n_phone) — the redaction-rate monitoring a pipeline runs
    * alongside the scrub. Each count is computed on the SAME
    * intermediate its replacement pass saw (emails pre-scrub, IPs on
    * the email-scrubbed text, phones on the IP-scrubbed text), so
    * Σcounts = replacements exactly. */
  def piiReport(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, "<IP>")
    df.select(col(idCol),
      piiScrub(col(textCol)).as("scrubbed"),
      regexp_count(col(textCol), lit(EmailPattern)).cast("int").as("n_email"),
      regexp_count(afterEmail, lit(Ipv4Pattern)).cast("int").as("n_ip"),
      regexp_count(afterIp, lit(PhonePattern)).cast("int").as("n_phone"))
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

  /** Hashing-trick linear text classifier INFERENCE — the execution
    * shape of a fastText / "educational quality" filter (Joulin et al.
    * 2016 §2.1 model; the filter role as in DCLM / FineWeb-Edu): each
    * whitespace token hashes into one of `buckets` feature slots (md5
    * 'f:'-prefix, the engine-portable idiom of the q70/q71 twins) and
    * the document score is the bag-of-words dot product — the SUM of
    * the weight entries at those slots, one addend per occurrence.
    *
    * The trained weight vector rides the plan as a buckets-long array
    * literal (4096 integer buckets = 32 KiB — the same broadcast-
    * literal discipline as the Bloom bitmap), so scoring is a pure
    * per-row expression: zero shuffles, no UDF, no weight-table join,
    * stays inside whole-stage codegen on the scan. Integer weights
    * keep the sum exact in 64 bits (production quantizes model
    * weights anyway; a fixed-point milli scale loses nothing a rank
    * threshold cares about). Train elsewhere, broadcast here — the
    * same contract as loading a fastText .bin. */
  def hashedLinearScore(text: Column, weights: Array[Long],
      buckets: Int): Column = {
    require(buckets > 0 && weights.length == buckets,
      s"weights must have exactly $buckets entries, got ${weights.length}")
    val w = typedLit(weights.toSeq)
    aggregate(split(trim(text), "\\s+"), lit(0L), (acc, t) =>
      acc + element_at(w,
        (conv(substring(md5(concat(lit("f:"), t)), 1, 15), 16, 10)
          .cast("long") % buckets).cast("int") + 1))
  }

  /** Deterministic stand-in weight vector for [[hashedLinearScore]]
    * gates and tests: slot b gets `(int(md5('w:b')[0,15 hex]) mod
    * 2001) - 1000` ∈ [-1000, 1000] — reproducible in SQL so an oracle
    * can replay scoring without shipping a model artifact. */
  def md5StandInWeights(buckets: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until buckets).map { b =>
      val hex = md.digest(s"w:$b".getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L
    }.toArray
  }

  /** CCNet-style LM quality filter (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data", LREC
    * 2020): score every document by its cross-entropy under a bigram
    * language model trained on a trusted reference slice (`refPred`),
    * keep documents whose per-token cost stays under a threshold —
    * CCNet's "head/middle" cut with the cutoff as an explicit
    * parameter (CCNet too precomputes its per-language cutoffs from a
    * reference run). The LM is a hashed stand-in for CCNet's KenLM:
    * bigram and context counts live in `buckets` hash slots and
    * P(cur|prev) = (c_bigram+1)/(c_context+buckets), add-1 smoothing
    * over the hashed vocabulary.
    *
    * Exactness: each bigram's negative log-probability is floored to
    * integer micro-nats from its (count, count) pair; per-document
    * totals are exact integer sums, and the keep decision
    * `nll_sum ≤ threshold · n_bigrams` is an integer cross-multiply —
    * no division, no float accumulation, bit-identical to the DuckDB
    * replay.
    *
    * Scale shape: training IS the two count aggregations — both
    * frames are ≤ `buckets` rows and BROADCAST into the scoring join
    * (a deployment runs them once and persists, like any model
    * artifact; inlined here so the gate replays end-to-end). The only
    * data-scale shuffle is the per-doc sum, map-side combined.
    * Documents with no bigram (≤ 1 token) keep=false with n_bigrams=0.
    * Returns (id, n_bigrams, nll_sum_micro, keep), one row per input. */
  def lmPerplexityFilter(df: DataFrame, idCol: String, textCol: String,
      refPred: Column, buckets: Int, thresholdMicroPerTok: Long): DataFrame =
    lmScoreWith(lmModel(df, idCol, textCol, refPred, buckets),
      df, idCol, textCol, buckets, thresholdMicroPerTok)

  /** Bigrams of every row with their event/context buckets:
    * (id, __hb, __hp). Buckets via [[TrainingPrep.hashBucket]] — the
    * single home of the portable md5-mod idiom (a second verbatim
    * copy lived here until ADVICE r9 flagged the drift risk). */
  private def lmBigrams(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, extra: Column*): DataFrame = {
    import graft.functions.sketches
    df.select((col(idCol) +: extra) :+
        explode(sketches.shingles_all(trim(col(textCol)), 2)).as("__bg"): _*)
      .withColumn("__hb", TrainingPrep.hashBucket("b:", col("__bg"), buckets))
      .withColumn("__hp", TrainingPrep.hashBucket("c:",
        substring_index(col("__bg"), " ", 1), buckets))
      .drop("__bg")
  }

  /** The trained LM artifact for [[lmPerplexityFilter]]: a DENSE
    * `buckets`-row frame (__b, __cb, __cp) — per bucket, its count as
    * a bigram-event bucket and as a context bucket over the reference
    * slice; buckets nothing hashed into carry 0 (the smoothing
    * handles them), so scoring joins never miss. Train once, persist
    * (a few KB), broadcast into every scoring run. */
  def lmModel(df: DataFrame, idCol: String, textCol: String,
      refPred: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val bg = lmBigrams(df, idCol, textCol, buckets, refPred.as("__r"))
      .filter(col("__r"))
    val cb = bg.groupBy(col("__hb").as("__b")).agg(count(lit(1)).as("__cb"))
    val cp = bg.groupBy(col("__hp").as("__b")).agg(count(lit(1)).as("__cp"))
    df.sparkSession.range(buckets).select(col("id").cast("int").as("__b"))
      .join(broadcast(cb), Seq("__b"), "left")
      .join(broadcast(cp), Seq("__b"), "left")
      .select(col("__b"), coalesce(col("__cb"), lit(0L)).as("__cb"),
        coalesce(col("__cp"), lit(0L)).as("__cp"))
  }

  /** Score rows against an already-trained [[lmModel]] frame (the
    * steady-state form: the model arrives as one ≤`buckets`-row
    * parquet scan, joined twice — event and context legs — both
    * BROADCAST; no counting over the reference corpus is recomputed).
    * `buckets` must match the model's hash width. Output matches
    * [[lmPerplexityFilter]]. */
  def lmScoreWith(model: DataFrame, df: DataFrame, idCol: String,
      textCol: String, buckets: Int, thresholdMicroPerTok: Long): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val perDoc = lmBigrams(df, idCol, textCol, buckets)
      .join(broadcast(model.select(col("__b").as("__hb"), col("__cb"))),
        Seq("__hb"), "left")
      .join(broadcast(model.select(col("__b").as("__hp"), col("__cp"))),
        Seq("__hp"), "left")
      .select(col(idCol), floor(lit(-1e6) * log(
          (coalesce(col("__cb"), lit(0L)) + 1).cast("double") /
            (coalesce(col("__cp"), lit(0L)) + buckets)))
        .cast("long").as("__nll"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_bigrams"), sum("__nll").as("nll_sum_micro"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_sum_micro"), lit(0L)).as("nll_sum_micro"))
      .withColumn("keep", col("n_bigrams") > 0 &&
        col("nll_sum_micro") <= lit(thresholdMicroPerTok) * col("n_bigrams"))
  }

  /** ROUGE-N overlap eval (r16; Lin 2004, "ROUGE: A Package for
    * Automatic Evaluation of Summaries" — public literature) over
    * (candidate, reference) TEXT PAIRS — the corpus-scale
    * summarization/generation scorer: per pair, the CLIPPED n-gram
    * overlap Σ_g min(count_cand(g), count_ref(g)) and the three
    * integer-micro scores
    * precision = (10⁶·overlap) div n_cand_grams,
    * recall    = (10⁶·overlap) div n_ref_grams,
    * f1        = (2·10⁶·overlap) div (n_cand + n_ref)
    * (the harmonic mean collapses to 2o/(nc+nr) — NO floats
    * anywhere). Pairs where a side has fewer than n tokens score 0
    * with the gram count 0 (nothing to match), not null — the
    * aggregate consumer averages without null rules.
    *
    * Scale shape: ONE side-tagged explode of the compiled k-gram
    * expression + one map-side-combinable (pair, gram) count, then
    * one (pair) sum of the per-gram mins — both shuffles keyed by
    * the pair id, so a 10⁹-pair eval set spreads evenly; no join of
    * two exploded frames (the naive two-frame shape shuffles the
    * gram space twice and meets in a worst-case-skewed gram join).
    * Per-pair gram totals are per-row arithmetic in the base scan.
    *
    * Preconditions: no NULL texts (the [[graft.ops.Dedup
    * .dedupIncrement]] rule; filter upstream — a null side would
    * silently score 0 against a real summary), and `idCol` unique —
    * it IS the pair identity; duplicate ids would merge two pairs'
    * clipped overlaps into one nonsense row. */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, n: Int): DataFrame = {
    require(n > 0, "rougeN: n must be positive")
    import graft.functions.sketches.shingles_all
    def grams(c: Column) = shingles_all(c, n)
    def side(textCol: String, cc: Long, cr: Long) =
      pairs.select(col(idCol),
        explode(grams(col(textCol))).as("__gram"),
        lit(cc).as("__c"), lit(cr).as("__r"))
    val overlap = side(candCol, 1L, 0L).unionByName(side(refCol, 0L, 1L))
      .groupBy(col(idCol), col("__gram"))
      .agg(sum(col("__c")).as("__cc"), sum(col("__r")).as("__cr"))
      .groupBy(col(idCol))
      .agg(sum(least(col("__cc"), col("__cr"))).as("__o"))
    val totals = pairs.select(col(idCol),
      greatest(size(grams(col(candCol))), lit(0)).cast("long")
        .as("n_cand_grams"),
      greatest(size(grams(col(refCol))), lit(0)).cast("long")
        .as("n_ref_grams"))
    totals.join(overlap, Seq(idCol), "left")
      .select(col(idCol), col("n_cand_grams"), col("n_ref_grams"),
        coalesce(col("__o"), lit(0L)).as("n_overlap"))
      .withColumn("precision_micro",
        when(col("n_cand_grams") > 0,
          expr("(1000000 * n_overlap) div n_cand_grams"))
          .otherwise(0L))
      .withColumn("recall_micro",
        when(col("n_ref_grams") > 0,
          expr("(1000000 * n_overlap) div n_ref_grams"))
          .otherwise(0L))
      .withColumn("f1_micro",
        when(col("n_cand_grams") + col("n_ref_grams") > 0,
          expr("(2000000 * n_overlap) div (n_cand_grams + n_ref_grams)"))
          .otherwise(0L))
  }

  /** Distinct-n generation-diversity profile (r16; Li et al. 2016,
    * "A Diversity-Promoting Objective Function for Neural
    * Conversation Models" — public literature): per group (source,
    * model arm, language…), the number of DISTINCT n-grams over the
    * total n-gram count, distinct_micro = (10⁶·distinct) div total —
    * the standard mode-collapse/templating detector for generated
    * corpora (a low ratio = the corpus repeats itself). Fully
    * rational; groups whose texts are all shorter than n tokens drop
    * (no grams — nothing to measure).
    *
    * Scale shape: one explode + one map-side-combinable
    * (group, gram) count, then a (group) rollup of that
    * spectrum-sized frame — exact distinct without
    * countDistinct's internal expand, and the same two-shuffle
    * ladder every spectrum op in this file rides. */
  def distinctNGramDiversity(df: DataFrame, groupCols: Seq[String],
      textCol: String, n: Int): DataFrame = {
    require(n > 0, "distinctNGramDiversity: n must be positive")
    require(groupCols.nonEmpty,
      "distinctNGramDiversity: need at least one group column " +
        "(use a literal for a whole-corpus profile)")
    require(!groupCols.contains("__gram"),
      "distinctNGramDiversity: group column '__gram' collides with " +
        "the internal gram label")
    import graft.functions.sketches.shingles_all
    val g = groupCols.map(col)
    df.filter(col(textCol).isNotNull)
      .select(g :+ explode(shingles_all(col(textCol), n)).as("__gram"): _*)
      .groupBy(g :+ col("__gram"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("__cnt")).as("n_total"))
      .withColumn("distinct_micro",
        expr("(1000000 * n_distinct) div n_total"))
  }

  // -----------------------------------------------------------------
  // Language identification (r17, VERDICT r16 "what's missing #3") —
  // hashed character-n-gram naive Bayes: Cavnar & Trenkle 1994's
  // n-gram profiles in the fastText hashed-feature form (Joulin et
  // al. 2016), on the repo's exact-integer discipline. The model is
  // a DENSE (lang x buckets) frame of per-bucket log-probs in
  // integer micro-nats — Laplace +1 smoothing, ln via the ONE fixed
  // IEEE expression per row (the q116/q117 floor rule:
  // floor(10^6 * ln((c+1)/(n+B)))), so DuckDB replays every score
  // bit-exactly. Train once over a labeled slice, persist a few KB,
  // broadcast into every scoring run; per-batch cost at 100 TB is
  // one char-gram explode + one (id, lang)-keyed combinable sum.
  // -----------------------------------------------------------------

  /** Trained language-ID model: (lang, __b, lp_micro), DENSE over
    * langs x buckets so scoring never misses the broadcast join —
    * unseen buckets carry the smoothed default ln(1/(n_L+B)). */
  def langIdModel(train: DataFrame, langCol: String, textCol: String,
      k: Int = 3, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "langIdModel: buckets must be positive")
    require(k >= 1, "langIdModel: k must be >= 1")
    val grams = charGramsKeyed(train, langCol, textCol, k, buckets)
    val perBucket = grams.groupBy(col("lang"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val perLang = perBucket.groupBy(col("lang"))
      .agg(sum(col("__c")).as("__n"))
    perLang.crossJoin(
        train.sparkSession.range(buckets)
          .select(col("id").cast("int").as("__b")))
      .join(broadcast(perBucket), Seq("lang", "__b"), "left")
      .select(col("lang"), col("__b"),
        floor(log((coalesce(col("__c"), lit(0L)) + 1).cast("double") /
          (col("__n") + buckets)) * 1e6)
          .cast("long").as("lp_micro"))
  }

  /** [[charGrams]] keyed by the LABEL column (training side). */
  private def charGramsKeyed(train: DataFrame, langCol: String,
      textCol: String, k: Int, buckets: Int): DataFrame =
    train.filter(col(textCol).isNotNull && col(langCol).isNotNull)
      .select(col(langCol).as("lang"), trim(col(textCol)).as("__t"))
      .filter(length(col("__t")) >= k)
      .withColumn("__i", explode(sequence(lit(1),
        length(col("__t")) - (k - 1))))
      .withColumn("__b", graft.ops.TrainingPrep.hashBucket("lg:",
        expr(s"substring(__t, __i, $k)"), buckets))
      .select(col("lang"), col("__b"))

  /** Predict against an already-trained [[langIdModel]] frame (the
    * steady-state form — the model arrives as a tiny parquet scan
    * and is BROADCAST). Output: (id, pred_lang, score_micro,
    * n_grams); rows with no k-gram (shorter than k chars) drop —
    * langid is undefined there, the caller routes them as `und`.
    * Argmax tie-break: lexicographically smallest lang (total
    * order, replayed by the oracle verbatim). The per-doc argmax is
    * a rank-1 row_number over <= |langs| rows per doc — the
    * WindowGroupLimit path, never a window over raw grams. */
  def langIdPredictWith(model: DataFrame, df: DataFrame,
      idCol: String, textCol: String, k: Int = 3,
      buckets: Int = 1024): DataFrame = {
    val grams = df.filter(col(textCol).isNotNull)
      .select(col(idCol), trim(col(textCol)).as("__t"))
      .filter(length(col("__t")) >= k)
      .withColumn("__i", explode(sequence(lit(1),
        length(col("__t")) - (k - 1))))
      .withColumn("__b", graft.ops.TrainingPrep.hashBucket("lg:",
        expr(s"substring(__t, __i, $k)"), buckets))
      .select(col(idCol), col("__b"))
    val perLang = grams.join(broadcast(model), Seq("__b"))
      .groupBy(col(idCol), col("lang"))
      .agg(sum(col("lp_micro")).as("score_micro"),
        count(lit(1)).as("n_grams"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("lang").asc)
    perLang.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("lang").as("pred_lang"),
        col("score_micro"), col("n_grams"))
  }

  /** Train-in-query composition of [[langIdModel]] +
    * [[langIdPredictWith]]. */
  def langIdPredict(train: DataFrame, langCol: String, df: DataFrame,
      idCol: String, textCol: String, k: Int = 3,
      buckets: Int = 1024): DataFrame =
    langIdPredictWith(langIdModel(train, langCol, textCol, k, buckets),
      df, idCol, textCol, k, buckets)
}
