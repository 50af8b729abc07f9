package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (builder-prompt
  * north star). Four tiers, cheapest first:
  *
  *  1. exact     — hash-groupBy on the text (one shuffle)
  *  2. ngram     — shingle → inverted-index self-join → exact Jaccard
  *  3. minhash   — shingle → minhash signature → LSH band bucketing
  *  4. simhash   — per-row 64-bit sketch → banded hamming candidates
  *
  * Scale notes: every stage is expressed as joins/aggregations on
  * shingle or band keys — no driver-side state, no crossJoin of the
  * full corpus. Candidate generation is always keyed (inverted index /
  * LSH bucket), so the quadratic blowup is bounded per key; at 100 TB
  * the hot shingles are the skew risk and get handled by the distinct
  * (doc, shingle) projection + AQE skew splitting.
  */
object Dedup {

  /** Tier 1: exact duplicate groups — texts appearing more than once,
    * with the canonical (minimum) id and the sorted member list. */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_copies"),
        sort_array(collect_list(col(idCol))).as("member_ids"))
      .filter(col("n_copies") > 1)

  /** Keep one row per distinct text (canonical = min id): the dedup
    * *apply* step. Window-free form: semi-join on (text, min id). */
  def deduplicated(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val canon = df.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol))
    df.join(canon, Seq(textCol, idCol), "left_semi")
  }

  /** Word k-shingles of a text column as an array (per-row expression,
    * no shuffle). Empty array when fewer than k tokens. */
  def shingles(textCol: Column, k: Int): Column = {
    val toks = split(trim(textCol), "\\s+")
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct (id, shingle) inverted-index projection. Requires `idCol`
    * unique per row (true of any document corpus), which lets the
    * distinct run per-row (inside the compiled ShingleSet expression) —
    * a narrow op — instead of a corpus-wide `.distinct()` shuffle. */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.sketches.shingle_set(col(textCol), k)).as("shingle"))

  /** Tier 2: exact n-gram Jaccard over candidate pairs that share at
    * least one shingle — single-scan inverted-index form: group the
    * index by shingle, emit in-bucket pairs via a double explode (same
    * row count as the self-join, but the index is computed once instead
    * of four times and the per-doc sizes ride along in the struct, so
    * no extra sizes join). Bucket arrays are bounded by per-shingle doc
    * frequency, so this EXACT form is for corpora where the hottest
    * shingle's doc list fits an aggregation buffer; at open-corpus
    * scale use [[ngramJaccardPairsPruned]] (q63), the designated
    * capped form. Pruning by document frequency is deliberately chosen
    * over truncating `collect_list` buckets at some N: a truncated
    * bucket drops an ARBITRARY subset of a hot shingle's pairs (which
    * pairs survive depends on shuffle order — nondeterministic, and a
    * silent cap), whereas the maxDf filter removes whole shingles from
    * the intersection count with a clean one-sided guarantee — scores
    * can only decrease, so no false positives ever cross the
    * threshold, and the result stays deterministic. A shingle hot
    * enough to overflow a buffer is shared by so many documents that
    * it carries no near-dup signal anyway (it's corpus boilerplate). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame =
    ngramJaccardPairsPruned(df, idCol, textCol, k, threshold, maxDf = Int.MaxValue)

  /** PPJoin-style PREFIX-FILTERED exact Jaccard pairs (r15; Xiao et
    * al. 2008 / Chaudhuri et al. 2006, public literature): identical
    * OUTPUT to [[ngramJaccardPairs]] — the gate pins losslessness —
    * from a candidate set generated off each document's PREFIX only.
    * Under any common total order of the shingle vocabulary, two sets
    * with J ≥ t = tNum/tDen share ≥ ⌈t·max(|A|,|B|)⌉ elements, so
    * they must collide inside their first |X| − ⌈t·|X|⌉ + 1 shingles
    * — index ONLY those. The order used is ascending document
    * frequency (rarest first, ties by shingle), the classic choice:
    * prefix postings are the RAREST shingles, so candidate buckets
    * are small BY CONSTRUCTION rather than by a maxDf cap — this is
    * the exact-form scale path where [[ngramJaccardPairsPruned]]'s
    * df cap would change scores. The prefix bound runs in exact
    * integer arithmetic (⌈t·n⌉ = (tNum·n + tDen − 1) div tDen — a
    * float ceil would misround representable-fraction thresholds);
    * verification joins candidates back to the FULL shingle sets
    * (keyed equi joins, cost ∝ Σ candidate |A|), and the final
    * jaccard/threshold arithmetic is bit-identical to the unfiltered
    * form. One extra shuffle vs tier 2 (the df count) buys the
    * candidate collapse. */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      "prefixJaccardPairs: threshold must sit in (0, 1]")
    // shingled once, consumed by df-count, prefix ranking, and both
    // verification sides — checkpoint the blocks
    val withN = df.select(col(idCol),
        inline(graft.functions.sketches.shingle_set_n(col(textCol), k)))
      .localCheckpoint()
    val dfreq = withN.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("__df"), col("shingle"))
    val pref = withN.join(dfreq, Seq("shingle"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <=
        col("n_sh") - expr(s"($tNum * n_sh + $tDen - 1) div $tDen") + 1)
      .select(col(idCol), col("shingle"))
    val cand = pref.as("pa")
      .join(pref.as("pb"),
        col("pa.shingle") === col("pb.shingle") &&
          col(s"pa.$idCol") < col(s"pb.$idCol"))
      .select(col(s"pa.$idCol").as("id_a"),
        col(s"pb.$idCol").as("id_b"))
      .distinct()
    val ia = withN.select(col(idCol).as("__ia"),
      col("shingle").as("__sa"), col("n_sh").as("n_a"))
    val ib = withN.select(col(idCol).as("__ib"),
      col("shingle").as("__sb"), col("n_sh").as("n_b"))
    cand.join(ia, col("id_a") === col("__ia"))
      .join(ib, col("id_b") === col("__ib") && col("__sa") === col("__sb"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"), first(col("n_a")).as("n_a"),
        first(col("n_b")).as("n_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= lit(tNum.toDouble / tDen))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** [[ngramJaccardPairs]] with hot-shingle pruning: shingles appearing
    * in more than `maxDf` documents are dropped from candidate
    * generation — the standard skew defense for inverted-index joins
    * at corpus scale (a shingle shared by 10% of a 100 TB corpus
    * generates ~(0.1N)² candidate pairs and carries no near-dup
    * signal). NOTE the exact-Jaccard consequence: intersections are
    * counted over surviving shingles only, while per-doc set sizes
    * n_sh still count all shingles — scores can only decrease, so
    * pruning never creates false positives above the threshold. */
  def ngramJaccardPairsPruned(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double, maxDf: Int): DataFrame = {
    // per-doc shingle-set size rides on every array element (struct
    // <shingle,n_sh>) so ONE inline() explodes both — no sizes
    // aggregation, no sizes join, no corpus-wide distinct, and the
    // ShingleSet expression is evaluated exactly once per row (a
    // Generate evaluates its child once; a projection would have been
    // inlined into each consumer by CollapseProject). The only
    // shuffles left are the two the algorithm actually needs
    // (bucket-by-shingle, group-by-pair). Docs with no shingles vanish
    // in the explode, as before.
    val withN = df.select(col(idCol),
      inline(graft.functions.sketches.shingle_set_n(col(textCol), k)))
    jaccardPairsFromIndex(withN, idCol, threshold, maxDf)
  }

  /** The candidate-pair + exact-Jaccard stage of
    * [[ngramJaccardPairsPruned]] over an ALREADY-BUILT (id, shingle,
    * n_sh) index frame (the [[corpusShingleIndex]] schema) — lets a
    * materialized or checkpointed index feed the pair pipeline without
    * re-shingling its documents. Semantics identical to the fused
    * form; same two keyed shuffles. */
  def jaccardPairsFromIndex(withN: DataFrame, idCol: String,
      threshold: Double, maxDf: Int = Int.MaxValue): DataFrame =
    pairIntersections(withN, idCol, maxDf)
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Candidate pairs with intersection counts (id_a, id_b, n_a, n_b,
    * inter) — the shared stage under the Jaccard and containment
    * scorers. Pruning happens BEFORE the bucket collect, so a hot
    * shingle never materializes its doc list in an aggregation
    * buffer: a window count over the shingle partition filters in the
    * same single shuffle the bucket groupBy needs (the groupBy reuses
    * the window's partitioning) — no second scan, no join. */
  private def pairIntersections(withN: DataFrame, idCol: String,
      maxDf: Int): DataFrame = {
    val index = if (maxDf == Int.MaxValue) withN else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))
      withN.withColumn("__df", count(lit(1)).over(w))
        .filter(col("__df") > 1 && col("__df") <= maxDf)
        .drop("__df")
    }
    val buckets = index
      .groupBy(col("shingle"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"),
        col("n_sh").as("n")))).as("docs"))
      .filter(size(col("docs")) > 1)
    buckets
      .select(posexplode(col("docs")).as(Seq("i", "a")), col("docs"))
      .select(col("a"), explode(slice(col("docs"), col("i") + 2,
        size(col("docs")))).as("b"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
  }

  /** CONTAINMENT-scored near-dup pairs: score = |A∩B| / min(|A|,|B|)
    * (Broder's containment; the Dolma-style one-sided rule). Catches
    * a short document wholly embedded in a longer one — a case
    * symmetric Jaccard dilutes below any practical threshold (a doc
    * half another's length scores containment 1.0 but Jaccard ~0.5).
    * Same inverted-index machinery, shuffles, and maxDf pruning
    * guarantee as [[ngramJaccardPairsPruned]] (pruned shingles only
    * remove intersection counts, so containment also only decreases —
    * no false positives cross the threshold). */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double, maxDf: Int = Int.MaxValue): DataFrame = {
    val withN = df.select(col(idCol),
      inline(graft.functions.sketches.shingle_set_n(col(textCol), k)))
    pairIntersections(withN, idCol, maxDf)
      .withColumn("containment",
        col("inter").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** Per-document duplicated-span rate — the diagnostic behind
    * substring-level dedup ("Deduplicating Training Data Makes
    * Language Models Better"-style repeated-passage detection, at
    * k-gram granularity): for each document, the fraction of its
    * k-gram POSITIONS (non-distinct — a passage repeated within one
    * long page still counts every occurrence) whose k-gram also
    * appears in at least one OTHER document. High rates flag mirror
    * pages, quote farms, and template boilerplate that survive
    * whole-document dedup.
    *
    * Returns (id, n_spans, n_dup, rate_micro = floor(1e6·n_dup/
    * n_spans)); documents with fewer than k tokens have no spans and
    * are absent. Exact integer counts end-to-end — oracle-replicable.
    *
    * Scale shape: the same inverted-index discipline as
    * [[ngramJaccardPairsPruned]] — positions collapse to distinct
    * (doc, shingle) pairs with their occurrence counts in the first
    * map-side-combined aggregation (a million-occurrence boilerplate
    * shingle shuffles one row per containing doc, not per position),
    * and doc frequency rides a count-only window in the pair frame's
    * own shingle partitioning. Never all-pairs, never a corpus-wide
    * distinct over positions, one corpus scan for the heavy path. */
  def duplicatedSpanRate(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    // ONE corpus explode of the compiled multiset expression (the
    // interpreted HOF form was the dominant cost — the ShingleSet
    // motivation note); per-doc occurrence counts collapse the
    // position multiset to distinct (doc, shingle) pairs with map-side
    // partial aggregation, so the shuffle carries pairs, not positions.
    // n_spans needs no shingle strings at all: it is token arithmetic.
    val pair = df
      .select(col(idCol),
        explode(graft.functions.sketches.shingles_all(col(textCol), k))
          .as("shingle"))
      .groupBy(col(idCol), col("shingle"))
      .agg(count(lit(1)).as("__cnt"))
    // doc frequency = row count per shingle over the distinct pairs —
    // a count-only window in the same shingle partitioning the pair
    // frame already needs (the q63 single-shuffle df trick); hot
    // boilerplate shingles are the same skew case as there and take
    // the same upstream defense (prune/normalize before diagnosing)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))
    val dups = pair
      .withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") > 1)
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_dup"))
    val nToks = size(split(trim(col(textCol)), "\\s+"))
    df.select(col(idCol),
        when(nToks >= k, nToks - (k - 1)).otherwise(0)
          .cast("long").as("n_spans"))
      .filter(col("n_spans") > 0)
      .join(dups, Seq(idCol), "left")
      .select(col(idCol), col("n_spans"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("rate_micro",
        floor(col("n_dup").cast("double") * 1e6 / col("n_spans")).cast("long"))
  }

  /** The near-dup APPLY step: remove every document whose near-dup
    * component label differs from its own id — canonical survivor =
    * min id per component, the same rule as [[deduplicated]] uses for
    * exact duplicates, applied to the transitive closure of
    * [[ngramJaccardPairs]] candidates. Documents in no near-dup pair
    * never enter the component labeling and always survive; all input
    * columns pass through.
    *
    * Scale shape: the loser list is only the clustered docs (tiny
    * relative to the corpus — near-dup components over a deduped
    * corpus are sparse by construction), applied with an id-keyed
    * anti-join; AQE broadcasts it when it is as small as expected. */
  def nearDupDeduplicated(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame =
    dedupByPairs(df, idCol,
      ngramJaccardPairs(df, idCol, textCol, k, threshold), "id_a", "id_b")

  /** Incremental dedup — the daily-crawl shape: dedup an INCOMING
    * batch against an already-deduped CORPUS, never corpus-vs-corpus.
    * Drops incoming docs that (a) exactly duplicate a corpus text, or
    * (b) share a k-gram Jaccard ≥ threshold with ANY corpus doc.
    * Within-batch duplicates are NOT handled here (run the batch
    * through [[deduplicated]]/[[nearDupDeduplicated]] first or after);
    * keeping the operator asymmetric is what makes it incremental.
    *
    * Scale shape: the exact arm is a text-keyed anti-join (hash of the
    * text is the join key Spark builds anyway). The near-dup arm is
    * the inverted-index discipline with the CORPUS side dedup'ed to
    * distinct shingles per doc and the join keyed on the shingle —
    * candidate pairs are (incoming × corpus-sharing-a-shingle), never
    * all-pairs, and a doc pair is scored once via the same
    * sizes-in-struct trick as [[ngramJaccardPairsPruned]]. The
    * candidate-pair space is proportional to the BATCH — but THIS
    * in-query form still re-shingles the corpus every call; the form a
    * real ingest loop runs is [[dedupIncrementIndexed]] over a
    * persisted [[corpusShingleIndex]], whose per-batch corpus cost is
    * the index scan alone.
    *
    * Precondition: no NULL texts on either side. The exact arm is an
    * anti-join on the text key, and NULL never equi-joins — a
    * NULL-text incoming row always survives it and a NULL corpus text
    * can never match anything (SQL `NOT IN` over a corpus containing a
    * NULL text would instead drop EVERY row — the two formulations
    * only agree NULL-free, which is also what the q86 oracle assumes).
    * Filter NULL texts upstream if the source allows them. */
  def dedupIncrement(corpus: DataFrame, incoming: DataFrame, idCol: String,
      textCol: String, k: Int, threshold: Double): DataFrame =
    dedupIncrementIndexed(corpusShingleIndex(corpus, idCol, textCol, k),
      corpusTextKeys(corpus, textCol), incoming, idCol, textCol, k, threshold)

  /** The materialized corpus index behind [[dedupIncrementIndexed]]:
    * the distinct (id, shingle, n_sh) inverted-index frame of the
    * corpus near-dup arm as a first-class, PERSISTABLE dataset.
    * [[dedupIncrement]] computes this in-query — which re-scans and
    * re-shingles the whole corpus on every batch (VERDICT r7 #1); a
    * real ingest loop writes it (plus [[corpusTextKeys]]) to parquet
    * once, appends each accepted batch's rows via [[indexAppend]], and
    * feeds the indexed operator — per-batch cost then depends on the
    * corpus only through the shingle-keyed join, exactly like the
    * reference's own incremental merge never re-reads history
    * (bagh/batch.py:112-130, README.md:28). */
  def corpusShingleIndex(corpus: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    corpus.select(col(idCol),
      inline(graft.functions.sketches.shingle_set_n(col(textCol), k)))

  /** Distinct corpus text keyset — the exact-duplicate arm's anti-join
    * side, persisted alongside [[corpusShingleIndex]]. */
  def corpusTextKeys(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(col(textCol)).distinct()

  /** Fold an ACCEPTED batch into a materialized (index, textKeys)
    * pair: the batch's shingle rows append to the index, its texts
    * union-distinct into the keyset. append-then-query ≡
    * recompute-from-union (spec-pinned) — at scale the two frames are
    * parquet tables and this is an append write + compacted keys. */
  def indexAppend(index: DataFrame, textKeys: DataFrame, accepted: DataFrame,
      idCol: String, textCol: String, k: Int): (DataFrame, DataFrame) =
    (index.unionByName(corpusShingleIndex(accepted, idCol, textCol, k)),
      textKeys.unionByName(accepted.select(col(textCol))).distinct())

  /** [[dedupIncrement]] against a MATERIALIZED corpus index (the
    * [[corpusShingleIndex]] frame + [[corpusTextKeys]] keyset) instead
    * of the corpus itself: identical result, but the corpus side is an
    * index scan — no corpus tokenize/shingle/explode per batch, the
    * one remaining cost-∝-corpus shape of the in-query form. Same
    * no-NULL-text precondition (the keyset side of the anti-join). */
  def dedupIncrementIndexed(corpusIndex: DataFrame, corpusKeys: DataFrame,
      incoming: DataFrame, idCol: String, textCol: String, k: Int,
      threshold: Double): DataFrame = {
    val exactSurvivors = incoming.join(
      corpusKeys.select(col(textCol)), Seq(textCol), "left_anti")
    val inc = exactSurvivors.select(col(idCol).as("__inc_id"),
      inline(graft.functions.sketches.shingle_set_n(col(textCol), k)))
    incrementNearDupArm(corpusIndex, exactSurvivors, inc, idCol, threshold)
  }

  /** Shared near-dup arm of the increment: score (incoming × corpus
    * sharing a shingle) candidate pairs by exact Jaccard, drop
    * incoming docs at/above the threshold. `incIndex` columns:
    * (__inc_id, shingle, n_sh). */
  private def incrementNearDupArm(corpusIndex: DataFrame,
      exactSurvivors: DataFrame, incIndex: DataFrame, idCol: String,
      threshold: Double): DataFrame = {
    val corp = corpusIndex.select(col(idCol).as("__corp_id"), col("shingle"),
      col("n_sh").as("__corp_n"))
    val losers = incIndex.join(corp, Seq("shingle"))
      .groupBy(col("__inc_id"), col("__corp_id"), col("n_sh"), col("__corp_n"))
      .agg(count(lit(1)).as("__inter"))
      .filter(col("__inter").cast("double") /
        (col("n_sh") + col("__corp_n") - col("__inter")) >= threshold)
      .select(col("__inc_id").as(idCol)).distinct()
    exactSurvivors.join(losers, Seq(idCol), "left_anti")
  }

  /** [[dedupIncrement]] composed with within-batch dedup — the call a
    * real ingest makes on every batch: (1) batch-internal exact dedup
    * (min-id canonical survives, [[deduplicated]]), (2) batch-internal
    * near-dup dedup (min-id component canonical survives,
    * [[nearDupDeduplicated]]), then (3) the batch-vs-corpus increment
    * (exact + k-gram Jaccard anti-joins, [[dedupIncrement]]).
    * Batch-THEN-corpus order is part of the contract (spec-pinned):
    * a row dropped in favor of its within-batch canonical stays
    * dropped even when that canonical then loses to the corpus — the
    * cluster's content is already represented there; re-offering a
    * member next batch is the ingest loop's decision, not this
    * operator's. Scale shape: steps 1-2 cost ∝ batch² bounded by the
    * shingle index (batches are small relative to the corpus), step 3
    * stays ∝ batch as documented on [[dedupIncrement]]. Same no-NULL
    * -text precondition as [[dedupIncrement]]. */
  def dedupIncrementFull(corpus: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, k: Int, threshold: Double): DataFrame =
    dedupIncrementFullIndexed(corpusShingleIndex(corpus, idCol, textCol, k),
      corpusTextKeys(corpus, textCol), incoming, idCol, textCol, k, threshold)

  /** [[dedupIncrementFull]] against a materialized corpus index — the
    * form a daily ingest actually runs (build the index once, append
    * per batch). Beyond the corpus-side win of
    * [[dedupIncrementIndexed]], the BATCH is shingled exactly once:
    * the stage-2 within-batch pair stage and the stage-3 corpus arm
    * share one locally-checkpointed batch index (the r7 plan shingled
    * the batch twice — VERDICT r7 #3). That checkpointed frame is
    * precisely the index delta [[indexAppend]] would persist for the
    * accepted survivors.
    *
    * NOTE: the checkpoint makes this call EAGER — building the result
    * frame runs a batch-scale Spark job immediately (not at first
    * action), and the checkpointed blocks are non-replicated executor
    * memory held until the frame is garbage-collected. On a real
    * cluster, persist the batch index to storage instead (it is the
    * [[indexAppend]] delta anyway) and prefer reliable `checkpoint`;
    * local-mode gates accept the localCheckpoint trade. */
  def dedupIncrementFullIndexed(corpusIndex: DataFrame, corpusKeys: DataFrame,
      incoming: DataFrame, idCol: String, textCol: String, k: Int,
      threshold: Double): DataFrame =
    incrementFullIndexedImpl(corpusIndex, corpusKeys, incoming, idCol,
      textCol, k, threshold, bloom = None)

  /** [[dedupIncrementFullIndexed]] with a [[bloomBuild]]-built Bloom
    * filter over the corpus text keyset pre-filtering the exact arm:
    * batch rows the filter proves ABSENT from the corpus (a Bloom
    * filter has no false negatives) skip the keyset anti-join
    * entirely; only the bloom-positive remainder — true duplicates
    * plus the filter's false-positive tail — joins. Result is
    * hash-identical to the plain form for ANY (mBits, kHashes).
    *
    * Scale shape: the bitmap is mBits/8 bytes broadcast in the plan
    * (16 KiB at the gate's 2^17 default), the membership test is a
    * per-row expression, and the anti-join's left side shrinks from
    * the whole batch to its duplicate-rate fraction — on a fresh-data
    * ingest the exact arm's shuffle all but disappears, while the
    * corpus keyset is only ever READ by the residual join's build
    * side. The bitmap persists beside the corpus index and is
    * maintained on append by OR-ing the accepted batch's
    * [[bloomBuild]] via [[bloomMerge]] (spec-pinned ≡ rebuild).
    * Same no-NULL-text precondition as the whole increment family
    * (a NULL text evaluates the membership test to NULL and would be
    * dropped from both arms). */
  def dedupIncrementFullIndexedBloom(corpusIndex: DataFrame,
      corpusKeys: DataFrame, bloomWords: Array[Long], incoming: DataFrame,
      idCol: String, textCol: String, k: Int, threshold: Double,
      mBits: Int, kHashes: Int): DataFrame =
    incrementFullIndexedImpl(corpusIndex, corpusKeys, incoming, idCol,
      textCol, k, threshold, bloom = Some((bloomWords, mBits, kHashes)))

  private def incrementFullIndexedImpl(corpusIndex: DataFrame,
      corpusKeys: DataFrame, incoming: DataFrame, idCol: String,
      textCol: String, k: Int, threshold: Double,
      bloom: Option[(Array[Long], Int, Int)]): DataFrame = {
    // batch-scale materialization #1: the exact-deduped batch rows.
    // Downstream this frame sits under the shingle checkpoint, the
    // within-batch anti-join, AND the final exact-survivor arm — left
    // lazy, each of those re-derives the caller's whole batch lineage
    // (for the gate batches, five corpus scans + a window apiece;
    // measured ~35% of q105's per-batch cost). One row per doc — two
    // orders smaller than the shingle frame checkpointed below.
    val batchExact = deduplicated(incoming, idCol, textCol).localCheckpoint()
    // batch-scale materialization #2: shingle the deduped batch ONCE,
    // lineage-free, shared by both consumers below (on a cluster,
    // persist instead — it is the batch's index delta)
    val bsh = batchExact.select(col(idCol),
      inline(graft.functions.sketches.shingle_set_n(col(textCol), k)))
      .localCheckpoint()
    val batchNear = dedupByPairs(batchExact, idCol,
      jaccardPairsFromIndex(bsh, idCol, threshold), "id_a", "id_b")
    val exactSurvivors = bloom match {
      case None =>
        batchNear.join(corpusKeys.select(col(textCol)), Seq(textCol),
          "left_anti")
      case Some((words, m, kh)) =>
        // the two filter branches would each re-run the component
        // labeling above — pin batchNear (one row per surviving doc,
        // batch-scale) so it is computed once
        val near = batchNear.localCheckpoint()
        val hit = bloomMightContain(words, col(textCol), m, kh)
        near.filter(!hit).unionByName(
          near.filter(hit).join(corpusKeys.select(col(textCol)),
            Seq(textCol), "left_anti"))
    }
    val inc = bsh
      .join(exactSurvivors.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol).as("__inc_id"), col("shingle"), col("n_sh"))
    incrementNearDupArm(corpusIndex, exactSurvivors, inc, idCol, threshold)
  }

  /** The k bit positions of a key in an mBits-wide Bloom filter, as an
    * array column — Kirsch-Mitzenmacher double hashing p_i =
    * (h1 + i·h2) mod m over two independent 60-bit halves of the key's
    * md5 (hex chars 1-15 and 17-31, each < 2^60, so h1 + i·h2 stays
    * far inside a signed 64-bit for any practical kHashes). md5 +
    * hex-parse is the engine-portable idiom of the q70/q71 twins: the
    * same positions fall out of DuckDB's
    * `CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)`. Production
    * would swap in xxhash64 halves (one mix vs an md5 per row) without
    * touching the surrounding operator. */
  def bloomPositions(key: Column, mBits: Int, kHashes: Int): Column = {
    val h1 = conv(substring(md5(key), 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(md5(key), 17, 15), 16, 10).cast("long")
    transform(sequence(lit(0), lit(kHashes - 1)),
      i => (h1 + i.cast("long") * h2) % mBits.toLong)
  }

  /** Build the Bloom bitmap over a key frame as mBits/64 words.
    * Distributed shape: the only shuffle is the distinct over SET BIT
    * POSITIONS — bounded by mBits rows regardless of corpus size (the
    * map side partial-aggregates each partition's positions down to
    * its distinct set first), and the driver collect is bounded the
    * same way. The result is filter state (≤ mBits/8 bytes), not
    * data-scale rows. */
  def bloomBuild(keys: DataFrame, keyCol: String, mBits: Int,
      kHashes: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    require(kHashes > 0, s"kHashes must be positive, got $kHashes")
    val words = new Array[Long](mBits / 64)
    keys.select(explode(bloomPositions(col(keyCol), mBits, kHashes)).as("p"))
      .distinct().collect().foreach { r =>
        val p = r.getLong(0)
        words((p >> 6).toInt) |= 1L << (p & 63).toInt
      }
    words
  }

  /** OR-merge two same-shape bitmaps — the [[indexAppend]] counterpart
    * for the persisted filter: merge(build(corpus), build(batch)) ≡
    * build(corpus ∪ batch), so an ingest loop never rebuilds the
    * filter from the full keyset. */
  def bloomMerge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length,
      s"bitmap widths differ: ${a.length} vs ${b.length} words")
    a.zip(b).map { case (x, y) => x | y }
  }

  /** Persist a bitmap as an (idx, word) parquet — the on-disk form
    * shared by the steady-state gates and the streaming ingest commit
    * (mBits/64 rows; rides inside the same staging dir as the index
    * it guards, so the commit swap keeps them consistent). */
  def bloomWrite(words: Array[Long],
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    words.toSeq.zipWithIndex.map { case (w, i) => (i, w) }
      .toDF("idx", "word")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[bloomWrite]]-persisted bitmap (driver-bounded:
    * mBits/64 rows). */
  def bloomRead(spark: org.apache.spark.sql.SparkSession, path: String,
      mBits: Int): Array[Long] = {
    val words = new Array[Long](mBits / 64)
    spark.read.parquet(path).collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Membership test against a [[bloomBuild]] bitmap as a per-row
    * boolean expression (the bitmap rides the plan as a ≤ mBits/8-byte
    * array literal): true iff all kHashes positions are set. False
    * means DEFINITELY absent; true means present-or-false-positive. */
  def bloomMightContain(words: Array[Long], key: Column, mBits: Int,
      kHashes: Int): Column = {
    require(words.length * 64 == mBits,
      s"bitmap has ${words.length} words, expected ${mBits / 64}")
    val bm = typedLit(words.toSeq)
    forall(bloomPositions(key, mBits, kHashes), p =>
      element_at(bm, shiftright(p, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % 64).cast("int"))) =!= lit(0L))
  }

  /** The generic APPLY step over ANY candidate-pair source (exact
    * Jaccard, MinHash-LSH, SimHash, embedding cosine): component-label
    * the pair graph, drop every doc whose label is not its own id.
    * Lets each sketch family share one dedup decision rule. */
  def dedupByPairs(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val losers = nearDupComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** [[dedupByPairs]] with a caller-chosen survivor: within each
    * component the row with the highest `priority` wins (id asc
    * tiebreak) — keep the longest / highest-quality member instead of
    * the lowest id, which is what production near-dup dedup usually
    * wants. Non-clustered rows never enter the component window (they
    * are routed around it with an anti-join), so the window sorts only
    * cluster members — at corpus scale the clustered fraction is
    * small by construction. */
  def dedupByPairsPriority(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String,
      priority: org.apache.spark.sql.Column): DataFrame = {
    require(idCol != "component", "idCol 'component' collides with labels")
    // a pre-existing column with either internal name would make the
    // component join ambiguous and the final drop() would silently
    // remove the caller's column (ADVICE r6)
    require(!df.columns.contains("component") && !df.columns.contains("__rk"),
      "df must not already have 'component' or '__rk' columns " +
        "(internal labels of the survivor window)")
    val comp = nearDupComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", idCol)
    val members = df.join(comp, Seq(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(priority.desc, col(idCol).asc)
    val survivors = members.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "component")
    df.join(comp, Seq(idCol), "left_anti").unionByName(survivors)
  }

  /** Near-duplicate connected components: turn a candidate-pair list
    * into dedup groups by iterative min-label propagation — each node's
    * label converges to the smallest id reachable through the pair
    * graph (= the canonical survivor of its component). The loop is
    * driver-controlled but every step is a distributed join+agg;
    * iterations needed = graph diameter (near-dup components are
    * shallow — chains longer than a few hops are rare). Lineage is cut
    * with `localCheckpoint` every `checkpointEvery` iterations — each
    * loop otherwise stacks another join+agg on the plan tree and the
    * optimizer re-plans the whole history per step (on a real cluster
    * prefer reliable `checkpoint` + checkpoint dir, which survives
    * executor loss). Throws if the graph has not converged after
    * `maxIter` iterations (component diameter too large) rather than
    * silently returning wrong components; the returned frame is
    * lineage-free and NOT cached — callers hold no hidden executor
    * memory.
    *
    * Adaptive execution (same spirit as AQE): near-dup candidate
    * graphs are SPARSE by construction — thresholded pairs over a
    * deduped corpus are orders of magnitude smaller than the corpus —
    * so when the materialized pair count is at most
    * `localEdgeThreshold`, the whole graph is solved by a single-task
    * union-find (one coalesced partition, path-compressed, ~tens of
    * bytes per edge) instead of the iterative join loop, whose
    * per-iteration planning + shuffle overhead exceeds the actual work
    * on small graphs (measured: 2-iteration convergence on 512 edges
    * cost ~3 s of pure overhead at sf0.1). Graphs above the threshold
    * take the distributed loop unchanged. Returns (id, component). */
  def nearDupComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, checkpointEvery: Int = 5,
      localEdgeThreshold: Long = 1L << 20): DataFrame = {
    require(checkpointEvery > 0,
      s"checkpointEvery must be positive, got $checkpointEvery")
    // materialize the (possibly expensive) pair pipeline ONCE before
    // symmetrizing — the union's two branches would otherwise each
    // evaluate the full upstream plan (measured 2x on the Jaccard
    // pipeline feeding q64)
    val p = pairs.select(col(aCol).as("src"), col(bCol).as("dst")).cache()
    val nPairs = p.count()

    val idOrdering = localIdOrdering(p.schema.head.dataType)
    if (nPairs <= localEdgeThreshold && idOrdering != null) {
      val out = localComponents(p, idOrdering).localCheckpoint()
      p.unpersist()
      return out
    }
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    // `owner` is the handle holding the current iteration's cache (a
    // projection of it would NOT release the cache on unpersist)
    var owner = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    var labels = owner
    // A checkpointed iteration frame must NOT be unpersisted while a
    // later merely-cached frame still depends on its checkpoint blocks
    // for recomputation (cache eviction / executor loss would then fail
    // with missing-checkpoint-block instead of recomputing) — defer
    // those unpersists until the final result is materialized.
    var ownerCheckpointed = false
    val deferred = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      // min incoming label per node, then fold into the old label with
      // a keyed left join. Equivalent to min over (labels ∪ prop) —
      // every id occurs exactly once in labels — but carries the
      // changed-flag in the SAME pass, so convergence detection costs
      // no extra join over the labels: one count() on the cached result.
      val prop = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("id")).agg(min(col("label")).as("p"))
      val merged = labels.join(prop, Seq("id"), "left").select(
        col("id"),
        least(col("label"), coalesce(col("p"), col("label"))).as("label"),
        (col("p") < col("label")).as("chg"))
      val checkpointNow = (i + 1) % checkpointEvery == 0
      val next = if (checkpointNow) merged.localCheckpoint() else merged.cache()
      val changed = next.filter(col("chg")).count()
      if (ownerCheckpointed) deferred += owner else owner.unpersist()
      owner = next
      ownerCheckpointed = checkpointNow
      labels = next.select(col("id"), col("label"))
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    p.unpersist()
    if (!converged) {
      owner.unpersist()
      deferred.foreach(_.unpersist())
      throw new IllegalStateException(
        s"nearDupComponents: not converged after $maxIter iterations — " +
          "component diameter exceeds maxIter; raise maxIter (labels would " +
          "be silently wrong, so failing instead)")
    }
    // eager localCheckpoint: result survives the unpersists below with
    // no lineage back into the loop's cached intermediates
    val out = labels.localCheckpoint()
    owner.unpersist()
    deferred.foreach(_.unpersist())
    out.select(col("id"), col("label").as("component"))
  }

  /** Ordering for the id type on the union-find path — must agree with
    * Spark's `min()` over the same column so both paths label a
    * component identically. Null → unsupported type, caller falls back
    * to the distributed loop. */
  private def localIdOrdering(dt: org.apache.spark.sql.types.DataType): Ordering[Any] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => Ordering.by((x: Any) => x.asInstanceOf[Long])
      case IntegerType => Ordering.by((x: Any) => x.asInstanceOf[Int])
      case StringType => new Ordering[Any] {
        // Spark's min() on StringType compares UTF8String bytes
        // (unsigned, = code-point order); Java String.compareTo is
        // UTF-16 code-unit order, which disagrees for supplementary-
        // plane characters (e.g. U+1F600 sorts below U+FFFD in UTF-16
        // but above it in UTF-8) — compare encoded bytes so both
        // component paths pick the same canonical label
        def compare(a: Any, b: Any): Int = {
          val x = a.asInstanceOf[String]
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val y = b.asInstanceOf[String]
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var i = 0
          val n = math.min(x.length, y.length)
          while (i < n) {
            val c = (x(i) & 0xff) - (y(i) & 0xff)
            if (c != 0) return c
            i += 1
          }
          x.length - y.length
        }
      }
      case _ => null
    }
  }

  /** Single-task connected components: coalesce the (small) pair list
    * into one partition and run path-compressed union-find, labeling
    * each component with its minimum id. No symmetrization, no
    * distinct, no iteration — one narrow task. */
  private def localComponents(p: DataFrame, ord: Ordering[Any]): DataFrame = {
    import org.apache.spark.sql.types._
    val idType = p.schema.head.dataType
    val outSchema = StructType(Seq(
      StructField("id", idType, nullable = true),
      StructField("component", idType, nullable = true)))
    p.coalesce(1).mapPartitions { it =>
      val parent = new java.util.HashMap[Any, Any]()
      def findRoot(x: Any): Any = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      it.foreach { row =>
        val a = row.get(0); val b = row.get(1)
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = findRoot(a); val rb = findRoot(b)
        if (ra != rb) parent.put(ra, rb)
      }
      val minOf = new java.util.HashMap[Any, Any]()
      val keys = parent.keySet().iterator()
      while (keys.hasNext) {
        val k = keys.next()
        val r = findRoot(k)
        val cur = minOf.get(r)
        if (cur == null || ord.lt(k, cur)) minOf.put(r, k)
      }
      val out = parent.keySet().iterator()
      new Iterator[org.apache.spark.sql.Row] {
        def hasNext: Boolean = out.hasNext
        def next(): org.apache.spark.sql.Row = {
          val k = out.next()
          org.apache.spark.sql.Row(k, minOf.get(findRoot(k)))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    .toDF()
  }

  /** Minhash signature columns h0..h{n-1}: per doc, the lane-wise min
    * of a salted hash over its shingles, computed entirely per-row by
    * the [[graft.functions.MinHashSig]] expression — ZERO shuffles
    * (the previous explode→groupBy form shuffled the whole shingle
    * index; min over the multiset equals min over the set, so neither
    * the explode nor any distinct is needed). Docs with no shingles
    * (< k tokens) are dropped, matching the explode form. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int): DataFrame = {
    // repartition = exchange barrier (same trick as simhashPairs), and
    // it sits BELOW the null filter: otherwise CollapseProject /
    // predicate pushdown inline the sketch expression into the filter
    // condition plus every one of the numHashes lane extractions
    // (measured: the whole sketch recomputed 2x+ per row). The shuffle
    // carries only (id, numHashes longs) — the natural persistence
    // point of a sketch pipeline at any scale.
    val sig = df.select(col(idCol),
        graft.functions.sketches.minhash_sig(
          graft.functions.sketches.shingle_set(col(textCol), k), numHashes)
          .as("__sig"))
      .repartition(col(idCol))
      .filter(col("__sig").isNotNull)
    sig.select(col(idCol) +:
      (0 until numHashes).map(i => element_at(col("__sig"), i + 1).as(s"h$i")): _*)
  }

  /** Tier 3: MinHash + LSH candidate pairs. Signature split into
    * `bands` bands of `numHashes/bands` rows; docs sharing any band
    * hash become candidates; candidates are scored by estimated
    * Jaccard (fraction of matching minhashes) and thresholded.
    * All joins are keyed on (band, bandHash) — the LSH bucket. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 2, numHashes: Int = 16, bands: Int = 4,
      estThreshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = minhashSignatures(df, idCol, textCol, k, numHashes)
    val banded = lshBanded(sigs, idCol, numHashes, bands)
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
    val cand = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // estimate Jaccard = fraction of matching signature positions
    val sa = sigs.toDF(sigs.columns.toSeq.map(c => if (c == idCol) "id_a" else s"a_$c"): _*)
    val sb = sigs.toDF(sigs.columns.toSeq.map(c => if (c == idCol) "id_b" else s"b_$c"): _*)
    val matches = (0 until numHashes)
      .map(i => when(col(s"a_h$i") === col(s"b_h$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est_jaccard", matches.cast("double") / numHashes)
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** The (id, band, band_hash) bucket frame of [[minhashLshPairs]]:
    * signature lanes grouped into `bands` bands, each hashed to its
    * LSH bucket key. `sigs` is the [[minhashSignatures]] frame. */
  private def lshBanded(sigs: DataFrame, idCol: String, numHashes: Int,
      bands: Int): DataFrame = {
    val r = numHashes / bands
    val bandCols = (0 until bands).map { bIdx =>
      val cols = (bIdx * r until (bIdx + 1) * r).map(i => col(s"h$i"))
      xxhash64(cols: _*)
    }
    sigs.select(col(idCol),
      posexplode(array(bandCols: _*)).as(Seq("band", "band_hash")))
  }

  /** LSH bucket-size telemetry (carried round-6 ask): per band, the
    * bucket tail a pipeline gates on BEFORE letting the candidate
    * join run — bucket count, the largest bucket, and the EXACT
    * candidate-pair count the band would emit (Σ n·(n-1)/2 over its
    * buckets). An all-boilerplate corpus is visible here as one
    * bucket holding ~the whole corpus (pairs ≈ N²/2) while the join
    * is still unexecuted; gate on max_bucket / candidate_pairs and
    * prune (maxDf, re-shingle, drop the band) first. Same banding as
    * [[minhashLshPairs]]; two keyed aggregations, nothing quadratic —
    * the diagnostic is always safe to run. */
  def lshBandStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 2, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = minhashSignatures(df, idCol, textCol, k, numHashes)
    lshBanded(sigs, idCol, numHashes, bands)
      .groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("bucket_size"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("bucket_size")).as("max_bucket"),
        // exact in decimal end to end: Column `/` would route
        // n·(n-1)/2 through double (loses integer exactness past 2^53
        // — i.e. exactly the pathological bucket this diagnostic
        // exists to expose), and a long n·(n-1) wraps at n ~ 3e9;
        // n·(n-1) is even so the final /2 is an integral value that
        // the decimal cast preserves exactly
        (sum(col("bucket_size").cast("decimal(38,0)") *
            (col("bucket_size") - lit(1))) / lit(2))
          .cast("decimal(38,0)").as("candidate_pairs"))
      .orderBy(col("band"))
  }

  /** [[minhashLshPairs]] with an ENGINE-PORTABLE hash: lane i's
    * permutation is `md5(i ':' shingle)` and the lane signature is the
    * lexicographic MIN of the hex digests (fixed-width lowercase hex,
    * so string order == unsigned numeric order). md5 is bit-identical
    * across engines, which makes this the oracle-checkable twin of the
    * xxhash64 pipeline (q27 is rows-only because DuckDB has no
    * xxhash64): same banding, same candidate join, same
    * estimated-Jaccard logic, exact hash-match against DuckDB. Use the
    * xxhash64 form in production (one 64-bit mix vs an md5 per lane);
    * use this one to PROVE the LSH plumbing. Est-Jaccard = matching
    * lanes / numHashes — an exact binary fraction, no rounding
    * hazards. */
  def minhashLshPairsPortable(df: DataFrame, idCol: String, textCol: String,
      k: Int = 2, numHashes: Int = 8, bands: Int = 2,
      estThreshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // per-row compiled signature (MinHashMd5 — bit-identical to the
    // grouped min(md5('i:'||shingle)) form, proved in SketchExprSpec);
    // the repartition barrier materializes the signature once instead
    // of once per lane extraction (same trick as minhashSignatures)
    val sigs = df.select(col(idCol),
        graft.functions.sketches.minhash_md5(
          graft.functions.sketches.shingle_set(col(textCol), k), numHashes)
          .as("__sig"))
      .repartition(col(idCol))
      .filter(col("__sig").isNotNull)
      .select(col(idCol) +:
        (0 until numHashes).map(i => element_at(col("__sig"), i + 1).as(s"h$i")): _*)
    val bandCols = (0 until bands).map { b =>
      md5(concat((b * r until (b + 1) * r).map(i => col(s"h$i")): _*))
    }
    val banded = sigs.select(col(idCol),
      posexplode(array(bandCols: _*)).as(Seq("band", "band_hash")))
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
    val cand = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sa = sigs.toDF(sigs.columns.toSeq.map(c => if (c == idCol) "id_a" else s"a_$c"): _*)
    val sb = sigs.toDF(sigs.columns.toSeq.map(c => if (c == idCol) "id_b" else s"b_$c"): _*)
    val matches = (0 until numHashes)
      .map(i => when(col(s"a_h$i") === col(s"b_h$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est_jaccard", matches.cast("double") / numHashes)
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** Tier 4: 64-bit SimHash sketch, computed entirely per-row (zero
    * shuffles) by the [[graft.functions.SimHash64]] expression — a
    * tight compiled loop (one xxhash64 + 64 bit-votes per token). The
    * previous SQL higher-order-function fold ran interpreted and was
    * the single hottest expression in the bench. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("simhash",
      graft.functions.sketches.simhash64(split(trim(col(textCol)), "\\s+")))

  /** Alternative SimHash formulation: explode tokens → hash → 64
    * codegen'd conditional sums in one hash aggregate → recombine bits.
    * Same result as [[simhash]]; trades one shuffle on the doc id for
    * fully codegen'd arithmetic (the per-row fold runs as interpreted
    * higher-order lambdas). Prefer this when a shuffle on the id is
    * acceptable; prefer [[simhash]] when the corpus is too hot to
    * shuffle. */
  def simhashGrouped(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .withColumn("__h", xxhash64(col("__w")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"__b$i")
    }
    val agg = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sketch = (0 until 64).map { i =>
      when(col(s"__b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(idCol), sketch.as("simhash"))
  }

  /** Engine-portable SimHash twin (the q28 pipeline is xxhash64-based
    * and rows-only): a 60-bit sketch whose per-token hash is the first
    * 15 hex chars of md5 parsed as an integer — `conv(hex,16,10)` here,
    * `('0x'||hex)::BIGINT` in DuckDB, bit-identical — aggregated with
    * the same ±1 bit votes as [[simhashGrouped]]. 60 bits keeps the
    * value inside a signed BIGINT in both engines. Use the xxhash64
    * form in production; use this one to PROVE the banded-hamming
    * logic against an independent engine. */
  def simhashGroupedPortable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .withColumn("__h",
        conv(substring(md5(col("__w")), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until 60).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"__b$i")
    }
    val agg = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sketch = (0 until 60).map { i =>
      when(col(s"__b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(idCol), sketch.as("simhash"))
  }

  /** Banded candidate pairs over the portable sketch: 4 bands of 15
    * bits, hamming over the full 60 bits — structurally identical to
    * [[simhashPairs]], exact-hash-checkable against DuckDB. The sketch
    * comes from the per-row [[graft.functions.SimHashMd5_60]]
    * expression (bit-identical to [[simhashGroupedPortable]], proved
    * differentially in SketchExprSpec) — zero shuffles where the
    * grouped form pays an explode + 60-aggregate pass. */
  def simhashPairsPortable(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 15): DataFrame = {
    val sk = df.select(col(idCol),
        graft.functions.sketches.simhash_md5_60(
          split(trim(col(textCol)), "\\s+")).as("simhash"))
      .repartition(col(idCol))
    val banded = sk.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(bIdx =>
        shiftright(col("simhash"), bIdx * 15).bitwiseAND(lit(0x7FFFL))): _*))
        .as(Seq("band", "band_bits")))
    val a = banded.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("band"), col("band_bits"))
    val b = banded.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("band"), col("band_bits"))
    a.join(b, Seq("band", "band_bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** SimHash near-dup candidates: 4 bands of 16 bits — any shared band
    * makes a candidate pair; pairs kept when hamming distance of the
    * full 64-bit sketch ≤ maxDist. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    // repartition = exchange barrier: without it, CollapseProject
    // inlines the interpreted sketch fold into all 4 band expressions
    // plus the output column (measured 5x the sketch cost). The
    // materialized sketch table is also what a 100 TB pipeline would
    // persist anyway.
    val sk = simhash(df, idCol, textCol).select(col(idCol), col("simhash"))
      .repartition(col(idCol))
    val banded = sk.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(bIdx =>
        shiftright(col("simhash"), bIdx * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "band_bits")))
    val a = banded.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("band"), col("band_bits"))
    val b = banded.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("band"), col("band_bits"))
    a.join(b, Seq("band", "band_bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      // filter BEFORE distinct: the dedup shuffle then carries only
      // matching pairs, not every band collision
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** FUZZY train→holdout decontamination report — the near-dup
    * extension of [[graft.ops.TrainingPrep.contamination]]'s exact
    * k-gram check: for every train document whose k-gram Jaccard
    * against ANY holdout document reaches `threshold`, the single
    * best-matching holdout document and the score. Exact-k-gram
    * decontamination misses light paraphrases (token swaps, inserted
    * boilerplate) that still leak the eval answer; Jaccard over short
    * shingles catches them — the standard fuzzy decontamination pass
    * before a training run. Returns (train idCol, holdout_id,
    * jaccard_micro = floor(1e6·|∩|/|∪|)); best match = highest
    * jaccard, holdout id tiebreak; clean train docs are absent. Drop
    * the flagged ids from the train side with an anti-join (or keep
    * the report for audit — both are one join away).
    *
    * Scale shape: the [[dedupIncrement]] inverted-index discipline
    * with the HOLDOUT as the indexed side — holdout sets are tiny
    * relative to train corpora, so the shingle-keyed join carries
    * (train doc, holdout doc) candidates only where a shingle is
    * shared, never train×holdout; the per-pair aggregation is
    * map-side combinable and the best-match window partitions on the
    * train id. Same no-NULL-text precondition as [[dedupIncrement]]
    * (a NULL train text joins no shingle and passes silently). */
  def contaminationFuzzy(train: DataFrame, holdout: DataFrame,
      idCol: String, textCol: String, k: Int,
      threshold: Double): DataFrame = {
    val t = train.select(col(idCol).as("__t_id"),
      inline(graft.functions.sketches.shingle_set_n(col(textCol), k)))
    // (id, shingle, n_sh) on both sides; a (train, holdout) pair is
    // scored ONCE from its shared-shingle count — |∩| = count, |∪| =
    // n_t + n_h − |∩|, all exact integers
    val scored = t.join(
        holdout.select(col(idCol).as("holdout_id"),
          inline(graft.functions.sketches.shingle_set_n(col(textCol), k)))
          .withColumnRenamed("n_sh", "__h_n"),
        Seq("shingle"))
      .groupBy(col("__t_id"), col("holdout_id"), col("n_sh"), col("__h_n"))
      .agg(count(lit(1)).as("__inter"))
      .filter(col("__inter").cast("double") /
        (col("n_sh") + col("__h_n") - col("__inter")) >= threshold)
      .withColumn("jaccard_micro",
        floor(col("__inter").cast("double") * 1e6 /
          (col("n_sh") + col("__h_n") - col("__inter"))).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__t_id"))
      .orderBy(col("jaccard_micro").desc, col("holdout_id").asc)
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("__t_id").as(idCol), col("holdout_id"), col("jaccard_micro"))
  }

  /** Exact duplicated-span SCRUB — the apply step of substring-level
    * dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better": repeated substrings are removed, not the
    * whole document). [[duplicatedSpanRate]] measures the problem;
    * this removes it: every token covered by a NON-canonical
    * occurrence of a duplicated k-gram is dropped, where an occurrence
    * is duplicated when its k-gram appears ≥ 2 times anywhere in the
    * corpus (other docs OR elsewhere in the same doc — the ExactSubstr
    * rule, a superset of the cross-doc-only q78 diagnostic) and the
    * canonical occurrence is the globally first one (min doc id, then
    * min position). Returns one row per input document:
    * (id, n_tokens, n_masked, scrubbed_text) with surviving tokens
    * rejoined by single spaces in original order; documents with
    * nothing masked pass through with n_masked = 0.
    *
    * Scale shape: one corpus explode of the compiled position-level
    * shingle expression; the canonical occurrence AND the duplicate
    * verdict come from ONE map-side-combinable aggregation per shingle
    * (count + lexicographic min(doc,pos) — no window over the
    * position multiset, so a million-occurrence boilerplate shingle
    * partial-aggregates inside each task); the occurrence→mask
    * explode is ×k on the duplicated occurrences only; the rebuild
    * groups each doc's surviving tokens (per-doc arrays, the q13
    * sorted-collect discipline). Hot shingles skew the canon JOIN,
    * which AQE skew-split handles — same defense as q63/q78.
    *
    * `minSpan` (Lee et al. scrub ~50-token spans, §4): masking every
    * repeated k-gram over-scrubs short NATURAL repeats (idioms, names,
    * common phrases), so adjacent masked positions coalesce into
    * maximal runs and only runs of at least `minSpan` tokens are
    * scrubbed. A single duplicated k-gram masks exactly k consecutive
    * tokens, so `minSpan` ≤ k (the default 1) changes nothing and the
    * run machinery is skipped entirely — q97's plan is untouched;
    * `minSpan` > k requires duplicated grams to CHAIN (overlap or
    * abut) into a span that long, the signature of real boilerplate/
    * verbatim duplication rather than a reused phrase. The run
    * windows partition on (doc, run) — per-document scale, the
    * rebuild-groupBy discipline, never a global sort.
    *
    * Precondition: no NULL texts (the [[dedupIncrement]] rule — a NULL
    * text would surface as n_tokens = −1 from `size(null)` rather than
    * erroring; filter upstream if the source allows them). */
  def scrubDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int, minSpan: Int = 1): DataFrame = {
    require(k > 0, "k must be positive")
    require(minSpan > 0, "minSpan must be positive")
    val toks = split(trim(col(textCol)), "\\s+")
    // (doc, pos, shingle) for every k-gram START position, 0-based
    val occ = df.select(col(idCol),
      posexplode(graft.functions.sketches.shingles_all(col(textCol), k))
        .as(Seq("pos", "shingle")))
    // per shingle: total occurrences + first occurrence, one combinable agg
    val canon = occ
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("__n"),
        min(struct(col(idCol).as("cid"), col("pos").as("cpos"))).as("__c"))
      .filter(col("__n") > 1)
    // every token position covered by a non-canonical duplicated occurrence
    val maskedAll = occ.join(canon, Seq("shingle"))
      .filter(!(col(idCol) === col("__c.cid") && col("pos") === col("__c.cpos")))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("__tpos"))
      .distinct()
    // gaps-and-islands over the per-doc masked positions: consecutive
    // positions share (__tpos − row_number) — runs shorter than
    // minSpan are unmasked (kept)
    val masked = if (minSpan <= k) maskedAll else {
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol)).orderBy(col("__tpos"))
      val runKey = org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol), col("__grp"))
      maskedAll
        .withColumn("__grp", col("__tpos") - row_number().over(wDoc))
        .withColumn("__runlen", count(lit(1)).over(runKey))
        .filter(col("__runlen") >= minSpan)
        .select(col(idCol), col("__tpos"))
    }
    val tokens = df.select(col(idCol), posexplode(toks).as(Seq("__tpos", "__tok")))
    val kept = tokens.join(masked, Seq(idCol, "__tpos"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__kept"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("__tpos"), col("__tok")))),
          s => s.getField("__tok"))).as("scrubbed_text"))
    df.select(col(idCol), size(toks).cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__kept"), lit(0L))).as("n_masked"),
        coalesce(col("scrubbed_text"), lit("")).as("scrubbed_text"))
  }
}
