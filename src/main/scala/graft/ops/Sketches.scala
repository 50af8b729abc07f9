package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches. Spark's own `approx_count_distinct`
  * (HLL++) is gated by q49's bounded-error contract, but its register
  * state is opaque and its hash is engine-private — it cannot be
  * persisted alongside the other incremental state frames (the
  * Bloom bitmap, the shingle index) or replayed by an external
  * engine. This is the ENGINE-PORTABLE HyperLogLog (Flajolet 2007):
  * the md5 lane hash (the q70/q71/q120 portability idiom) drives both
  * the bucket split and the rank, every step is integer/string
  * arithmetic, so the register table is bit-identical in any engine —
  * a DuckDB oracle re-derives it hash-exactly — and register-wise
  * `max` is a lossless union (merge ≡ rebuild), which makes the
  * sketch an appendable state frame: keep one 2^p-row parquet per
  * corpus, max-merge each ingest batch, estimate without ever
  * rescanning — count-distinct at 100 TB for 256 rows of state.
  */
object Sketches {

  /** HLL register table over the distinct values of `keyCol`:
    * one row per non-empty bucket, `(bucket: int, rho_max: int)`.
    *
    * Hash: md5("hll:" || key). The first 2 hex chars (8 bits) pick
    * the bucket (p = 8, m = 256); the next 13 hex chars are a 52-bit
    * rank window and rho = (leading zero bits) + 1, capped at 53 for
    * an all-zero window. The rank is derived purely by STRING
    * arithmetic — strip leading '0' hex digits, classify the first
    * nonzero nibble — no log2/bit-ops, so the same expression runs
    * verbatim in DuckDB (`ltrim(s,'0')` + a 4-way CASE) with no
    * float in sight.
    *
    * Plan shape: scan → project (codegen'd md5 + string ops) →
    * partial max per partition → 256-row exchange. The shuffle is
    * bounded by m·partitions rows regardless of input size; nulls
    * are excluded (COUNT DISTINCT semantics). */
  def hllRegisters(df: DataFrame, keyCol: String): DataFrame =
    hllRegistersBy(df, Nil, keyCol)

  /** Grouped register tables: one HLL per group key — the "distinct
    * X per Y" form (distinct users per host, distinct docs per
    * source) that at 100 TB replaces a |Y|·|X|-sized exact
    * count-distinct shuffle with |Y|·m rows of state, still
    * hash-exact, still mergeable per group (the same register-wise
    * max; [[hllMerge]] generalizes by adding the group columns to
    * its GROUP BY). */
  def hllRegistersBy(df: DataFrame, groupCols: Seq[String],
      keyCol: String): DataFrame = {
    val packed = md5LanePacked(col(keyCol))
    df.filter(col(keyCol).isNotNull)
      .select(groupCols.map(col) :+ packed.as("packed"): _*)
      .select(groupCols.map(col) :+
        expr("packed div 64").cast("int").as("bucket") :+
        (col("packed") % 64).cast("int").as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho_max"))
  }

  /** The portable md5 HLL lane of a key, packed as `bucket·64 + rho`
    * (rho ≤ 53 < 64) — the ONE definition shared by
    * [[hllRegistersBy]] and [[Profile.profileApproxStats]] so the
    * gate-protected lane and the profile lane can never drift. The
    * first 2 hex chars (8 bits) pick the bucket (p = 8, m = 256);
    * the next 13 hex chars are a 52-bit rank window and rho =
    * leading zero bits + 1 (capped 53). The rank arithmetic runs as
    * ONE compiled expression over the md5 hex
    * ([[graft.functions.Md5LanePack]] — the Column-level string form
    * referenced the md5 ~13 times, which a Generate stage recomputes
    * per reference); the VALUE is pure md5-hex string arithmetic, so
    * DuckDB replays it hash-exactly. Null key → null. */
  private[ops] def md5LanePacked(key: Column): Column =
    graft.functions.sketches.md5_lane_pack(
      md5(concat(lit("hll:"), key.cast("string"))))

  /** Production-speed HLL registers — IDENTICAL (bucket, rho_max)
    * layout to [[hllRegisters]] (same p = 8, same 52-bit rank window,
    * same register-wise-max merge via [[hllMerge]], same
    * [[hllEstimate]]), but the lane comes from the compiled
    * [[graft.functions.HllLaneXx]] kernel: one xxhash64 + 4 ALU ops
    * per row instead of an md5 hex string + 6 string ops. This is the
    * form a 100 TB scan would run (VERDICT r10 #2); the md5 form
    * stays the DuckDB-gated oracle twin, and WebCorpusSpec pins the
    * two estimates to the same accuracy band. */
  def hllRegistersFast(df: DataFrame, keyCol: String): DataFrame =
    hllRegistersByFast(df, Nil, keyCol)

  /** Grouped fast registers — the [[hllRegistersBy]] twin. */
  def hllRegistersByFast(df: DataFrame, groupCols: Seq[String],
      keyCol: String): DataFrame = {
    val packed = graft.functions.sketches.hll_lane_xx(
      col(keyCol).cast("string"))
    df.filter(col(keyCol).isNotNull)
      .select(groupCols.map(col) :+ packed.as("packed"): _*)
      .select(groupCols.map(col) :+
        expr("packed div 64").cast("int").as("bucket") :+
        (col("packed") % 64).cast("int").as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho_max"))
  }

  /** Lossless union of two register tables: register-wise max.
    * `hllMerge(hllRegisters(A), hllRegisters(B)) ≡ hllRegisters(A ∪ B)`
    * bucket-for-bucket (gated hash-exact by q128) — the property that
    * lets a persisted sketch absorb ingest batches without a corpus
    * rescan, exactly like the Bloom bitmap's OR-merge. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("bucket")).agg(max(col("rho_max")).as("rho_max"))

  /** Integer sufficient statistics of a register table — (occupied
    * buckets, 2^53-scaled harmonic sum), the q189 representation:
    * both exact integers, so the md5-portable lane stays hash-exact
    * in DuckDB while still determining the Flajolet estimate
    * ([[hllEstimateFromStats]]). Empty register table → (0, 0). */
  def hllStats(registers: DataFrame, label: String): DataFrame =
    registers.agg(
        coalesce(count(lit(1)).cast("int"), lit(0)).as("nd_buckets"),
        coalesce(sum(expr("shiftleft(1L, 53 - rho_max)")), lit(0L))
          .as("nd_s53"))
      .select(lit(label).as("set_name"), col("nd_buckets"), col("nd_s53"))

  /** SLIDING-window distinct counts (r15): per observed hour h, the
    * HLL sufficient statistics of the distinct `keyCol` values over
    * the trailing `windowHours` hours (h−W+1 .. h) — "distinct users
    * per trailing 3 h", the dashboard/monitoring staple exact
    * distinct cannot afford at scale. Register algebra makes the
    * window MERGE free: each hour's ≤2⁸-row register table explodes
    * to the ≤W windows it feeds (a per-ROW generator over
    * sketch-sized state, never over the data) and register-wise max
    * re-folds per window; windows anchor at OBSERVED hours (a
    * semi-join against the hour set). Emits the q189 integer
    * sufficient statistics — (occupied buckets, 2⁵³-scaled harmonic
    * sum) per window — so the md5-portable lane is oracle-exact;
    * [[hllEstimateFromStats]] turns them into the estimate. Scale
    * shape: one scan → per-(hour, bucket) max (map-side combined,
    * ≤ hours·2⁸ rows) → ×W explode of that sketch frame → two keyed
    * reductions. */
  def slidingDistinctStats(df: DataFrame, tsCol: String,
      keyCol: String, windowHours: Int): DataFrame =
    slidingDistinctFromRegisters(
      hourLaneRows(df, tsCol, keyCol)
        .groupBy(col("__h"), col("bucket"))
        .agg(max(col("rho")).as("rho_max")),
      windowHours)

  /** The per-row (hour, bucket, rho) md5 lanes under
    * [[slidingDistinctStats]] — also the ingest rows of the streaming
    * per-hour register state ([[graft.streaming.StreamingIngest
    * .slidingDistinctIngestBatch]]): the per-(hour, bucket) MAX is an
    * incremental aggregate, so hourly state absorbs batches through
    * the aggIngest ledger exactly like the flat HLL state. */
  private[graft] def hourLaneRows(df: DataFrame, tsCol: String,
      keyCol: String): DataFrame =
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(unix_micros(date_trunc("hour", col(tsCol))).as("__h"),
        md5LanePacked(col(keyCol)).as("packed"))
      .select(col("__h"), expr("packed div 64").cast("int").as("bucket"),
        (col("packed") % 64).cast("int").as("rho"))

  /** The window half of [[slidingDistinctStats]] over an
    * already-built per-hour register frame `(__h, bucket, rho_max)`
    * — lets the PERSISTED streaming state feed the same windows
    * without rescanning events (q302, standing rule 1). */
  private[graft] def slidingDistinctFromRegisters(perHour: DataFrame,
      windowHours: Int): DataFrame = {
    require(windowHours >= 1 && windowHours <= 168,
      s"slidingDistinct: windowHours must sit in [1, 168]")
    val hours = perHour.select(col("__h")).distinct()
    val windowed = perHour
      .select(explode(sequence(col("__h"),
          col("__h") + lit(3600000000L) * (windowHours - 1),
          lit(3600000000L))).as("__w"),
        col("bucket"), col("rho_max"))
      .join(hours.withColumnRenamed("__h", "__w"), Seq("__w"),
        "left_semi")
      .groupBy(col("__w"), col("bucket"))
      .agg(max(col("rho_max")).as("__rm"))
    windowed.groupBy(col("__w"))
      .agg(count(lit(1)).cast("int").as("nd_buckets"),
        sum(expr("shiftleft(1L, 53 - __rm)")).as("nd_s53"))
      .select(
        date_format(timestamp_micros(col("__w")),
          "yyyy-MM-dd HH:mm:ss").as("window_end_s"),
        col("nd_buckets"), col("nd_s53"))
  }

  /** The Flajolet estimate recovered from [[hllStats]] integers:
    * harmonic sum = s53/2^53 + one per empty register (rho 0 →
    * 2^-0 = 1), then the same alpha/linear-counting rules as
    * [[hllEstimate]] — the two paths agree exactly (spec-pinned). */
  def hllEstimateFromStats(occupied: Int, s53: Long, p: Int = 8): Double = {
    val m = 1 << p
    val zeros = m - occupied
    val sum = s53.toDouble / math.pow(2.0, 53) + zeros.toDouble
    val alpha = m match {
      case 16 => 0.673; case 32 => 0.697; case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  /** Set-algebra estimate over register tables: |A ∩ B| by
    * inclusion–exclusion, est(A) + est(B) − est(A ∪ B), clamped at 0
    * (tiny true intersections can go negative within sketch error).
    * The union is the lossless register-wise max ([[hllMerge]]), so
    * the whole algebra runs on ≤ 3·2^p rows of state — the 100 TB
    * "how many ids appear in BOTH corpora" answer without a join. */
  def hllIntersectEstimate(a: DataFrame, b: DataFrame, p: Int = 8): Double =
    math.max(0.0,
      hllEstimate(a, p) + hllEstimate(b, p) - hllEstimate(hllMerge(a, b), p))

  /** Persist a register table. `coalesce(1)` is correct here for the
    * same reason as the Bloom bitmap's: the artifact is ≤ 2^p rows of
    * bounded state, never data. */
  def hllWrite(registers: DataFrame, path: String): Unit =
    registers.coalesce(1).write.mode("overwrite").parquet(path)

  /** Read a persisted register table. */
  def hllRead(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Cardinality estimate from a register table (Flajolet 2007 §4 with
    * the small-range linear-counting correction). The collect is the
    * sketch itself — at most 2^p = 256 rows of bounded state, never
    * data. Bias constant alpha_m for m ≥ 128: 0.7213/(1 + 1.079/m). */
  def hllEstimate(registers: DataFrame, p: Int = 8): Double = {
    val m = 1 << p
    val regs = registers.select(col("bucket"), col("rho_max"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    require(regs.keys.forall(b => b >= 0 && b < m),
      s"register bucket out of range for p=$p")
    val sum = (0 until m).map(b => math.pow(2.0, -regs.getOrElse(b, 0))).sum
    val alpha = m match {
      case 16 => 0.673; case 32 => 0.697; case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / sum
    val zeros = m - regs.size
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  // -------------------------------------------------------------------
  // Count-Min sketch (Cormode/Muthukrishnan 2005) — frequency
  // estimation with the same portability discipline: md5 lane hashes
  // pick the cell per depth row, counts are exact integers, so the
  // counter matrix is hash-exact in any engine and ADDITIVE under
  // union (merge = cell-wise sum). Point estimates never undercount.
  // -------------------------------------------------------------------

  /** The depth hash positions of `key` as an exploded (row, pos)
    * pair column — one definition, shared by build and probe so the
    * two can never disagree. */
  private def cmsCells(key: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map { r =>
      struct(lit(r).as("r"),
        pmod(conv(substring(md5(concat(lit(s"cms$r:"), key.cast("string"))),
          1, 15), 16, 10).cast("long"), lit(width.toLong)).cast("int")
          .as("pos"))
    }: _*))

  /** Count-Min counter matrix over `keyCol` occurrences (with
    * multiplicity — this sketches FREQUENCIES, where [[hllRegisters]]
    * sketches distincts): one row per non-empty cell,
    * `(r, pos, cnt)` (`r` = depth row; `row` is a reserved word downstream). Shuffle bounded by depth·width·partitions
    * rows at any input size; map-side partial counts do the heavy
    * lifting. */
  def cmsSketch(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(cmsCells(col(keyCol), depth, width).as("h"))
      .groupBy(col("h.r").as("r"), col("h.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge two counter matrices: cell-wise sum (the additive dual of
    * the HLL's max — merge ≡ rebuild, spec-pinned). */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("r"), col("pos")).agg(sum(col("cnt")).as("cnt"))

  /** Per-depth inner products of two counter matrices — Σ_pos
    * cntA·cntB for each depth row r (Cormode–Muthukrishnan 2005
    * §4.3). Each row's dot product never UNDERcounts the true inner
    * product Σ_k fA(k)·fB(k) — hash collisions only add — so the min
    * over rows ([[cmsJoinSizeEstimate]]) is a one-sided equi-join
    * cardinality estimate: |A ⋈ B| on the sketched key answered from
    * ≤ 2·depth·width counter rows, the planner's join-size question
    * without touching the data. All integer arithmetic (counts and
    * products), so the md5-laned matrices make it hash-exact in any
    * engine. */
  def cmsInnerProductByDepth(a: DataFrame, b: DataFrame): DataFrame = {
    val aa = a.select(col("r"), col("pos"), col("cnt").as("cnt_a"))
    val bb = b.select(col("r"), col("pos"), col("cnt").as("cnt_b"))
    val dots = aa.join(bb, Seq("r", "pos"))
      .groupBy(col("r"))
      .agg(sum(col("cnt_a") * col("cnt_b")).as("dot"))
    // Densify: a depth row present in either sketch but with NO
    // overlapping (r,pos) cells has true dot 0 — dropping it (the old
    // inner-join-only form) loses the tightest possible min and, with
    // zero overlap at every depth, left min(dot) null downstream.
    val rs = aa.select(col("r")).union(bb.select(col("r"))).distinct()
    rs.join(dots, Seq("r"), "left")
      .select(col("r"), coalesce(col("dot"), lit(0L)).as("dot"))
  }

  /** Equi-join size estimate: min over the per-depth dot products;
    * ≥ the true join row count always (spec-pinned). Two empty
    * sketches → no depth rows at all → the true join is empty → 0. */
  def cmsJoinSizeEstimate(a: DataFrame, b: DataFrame): Long = {
    val row = cmsInnerProductByDepth(a, b)
      .agg(min(col("dot"))).collect()(0)
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** Grouped Count-Min matrices — one frequency sketch per group key
    * (completing the grouped triad with [[hllRegistersBy]] and
    * [[histSketchBy]]): per-group hash-exact counter state, per-group
    * cell-wise-sum merge, shuffle ≤ |groups|·depth·width·partitions. */
  def cmsSketchBy(df: DataFrame, groupCols: Seq[String], keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(groupCols.map(col) :+
        cmsCells(col(keyCol), depth, width).as("h"): _*)
      .select(groupCols.map(col) :+ col("h.r").as("r") :+
        col("h.pos").as("pos"): _*)
      .groupBy(groupCols.map(col) :+ col("r") :+ col("pos"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Production-speed Count-Min — IDENTICAL (r, pos, cnt) counter
    * layout to [[cmsSketch]] (same additive [[cmsMerge]]), lanes from
    * the compiled [[graft.functions.CmsPosXx]] kernel: ONE xxhash64
    * per row split Kirsch–Mitzenmacher-style into all depth
    * positions, vs depth md5 hex strings per row in the portable
    * form. The md5 form stays the oracle twin; WebCorpusSpec gates
    * the fast form's no-undercount invariant and error band. */
  def cmsSketchFast(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    cmsSketchByFast(df, Nil, keyCol, depth, width)

  /** Grouped fast Count-Min — the [[cmsSketchBy]] twin (per-group
    * xxhash64 counter matrices, identical (group, r, pos, cnt)
    * layout and cell-wise-sum merge), completing the production-hash
    * twin matrix: ungrouped HLL/CMS got fast twins in r10
    * ([[hllRegistersFast]]/[[cmsSketchFast]]), grouped HLL in r11
    * ([[hllRegistersByFast]]); this is the last cell. */
  def cmsSketchByFast(df: DataFrame, groupCols: Seq[String],
      keyCol: String, depth: Int = 4, width: Int = 256): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(groupCols.map(col) :+
        posexplode(graft.functions.sketches.cms_pos_xx(
          col(keyCol).cast("string"), depth, width)).as(Seq("r", "pos")): _*)
      .groupBy(groupCols.map(col) :+ col("r") :+ col("pos"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Fast point estimates against a [[cmsSketchFast]] matrix — the
    * [[cmsEstimate]] probe with the same one-sided guarantee. */
  def cmsEstimateFast(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    probes.select(col(keyCol)).distinct()
      .select(col(keyCol), posexplode(graft.functions.sketches.cms_pos_xx(
        col(keyCol).cast("string"), depth, width)).as(Seq("r", "pos")))
      .join(broadcast(sketch), Seq("r", "pos"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))

  /** Point-estimate the frequency of every distinct key in `probes`
    * against a [[cmsSketch]]: est = min over depth rows of the key's
    * cell counts (missing cell = 0). Count-Min guarantees
    * est ≥ true frequency — q134 gates the invariant alongside the
    * exact counts. Output: (key-named col, est_cnt). */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    probes.select(col(keyCol)).distinct()
      .select(col(keyCol), cmsCells(col(keyCol), depth, width).as("h"))
      .select(col(keyCol), col("h.r").as("r"), col("h.pos").as("pos"))
      .join(broadcast(sketch), Seq("r", "pos"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))

  // -------------------------------------------------------------------
  // Fixed-bin integer histogram — the deterministic quantile sketch.
  // Spark's percentile_approx is gated by q49's error bands, but its
  // result depends on engine internals; this sketch trades a declared
  // value range for full determinism: integer bin arithmetic, counts
  // additive under union, quantiles reconstruct to a bin (error ≤ one
  // bin width) identically in any engine.
  // -------------------------------------------------------------------

  /** Histogram of an INTEGER column over [lo, hi): bins of equal
    * integer width via `(x-lo)·bins div (hi-lo)`, outliers clamped to
    * the edge bins. Output (bin, cnt); shuffle bounded by
    * bins·partitions. Callers scale doubles to integer units first
    * (the repo's cents/micros idiom) — determinism is the point. */
  def histSketch(df: DataFrame, valueCol: String,
      lo: Long, hi: Long, bins: Int): DataFrame =
    histSketchBy(df, Nil, valueCol, lo, hi, bins)

  /** Merge two histograms: bin-wise sum. */
  def histMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))

  /** Grouped histograms — one fixed-bin histogram per group key (the
    * [[hllRegistersBy]] move for distributions: per-source value
    * profiles at sketch cost). Same integer bin arithmetic; shuffle
    * bounded by |groups|·bins·partitions; per-group merge stays
    * bin-wise sum. */
  def histSketchBy(df: DataFrame, groupCols: Seq[String],
      valueCol: String, lo: Long, hi: Long, bins: Int): DataFrame = {
    require(hi > lo && bins > 0)
    val x = col(valueCol).cast("long")
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        ((x - lit(lo)) * lit(bins.toLong)).as("__n"): _*)
      .select(groupCols.map(col) :+
        least(lit(bins - 1L), greatest(lit(0L),
          expr(s"__n div ${hi - lo}L"))).cast("int").as("bin"): _*)
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile bins from a [[histSketch]]: for each p (in milli-units)
    * the first bin whose cumulative count reaches ceil(p·N/1000),
    * with its floor-arithmetic value edges. All integer. The
    * cumulative sum is a self-join over ≤ bins² cell pairs (bounded
    * state — deliberately NOT an unpartitioned window; the repo bans
    * those in gated plans). */
  def histQuantileBins(hist: DataFrame, lo: Long, hi: Long, bins: Int,
      pMillis: Seq[Int]): DataFrame = {
    // cumulative by suffix-explode + EQUI aggregation (each bin's
    // count contributes to every bin ≥ it: ≤ bins² rows of bounded
    // state, hash-aggregated — no theta join, no window)
    val cum = hist
      .select(explode(sequence(col("bin"), lit(bins - 1))).as("bin2"),
        col("cnt"))
      .groupBy(col("bin2")).agg(sum(col("cnt")).as("cum"))
    // the single-ROW total attaches by the allowlisted 1-row broadcast
    // cross (the q95/q99 Σw idiom); each cum row then explodes over
    // the literal p list and the winner per p is a plain min
    val total = hist.agg(sum(col("cnt")).as("total"))
    cum.crossJoin(broadcast(total))
      .select(col("bin2").as("bin"), col("cum"), col("total"),
        explode(array(pMillis.map(lit): _*)).as("p_milli"))
      // (p·N + 999) div 1000 = ceil(p·N / 1000), exact integers
      .withColumn("target", expr("(p_milli * total + 999) div 1000"))
      .filter(col("cum") >= col("target"))
      .groupBy(col("p_milli")).agg(min(col("bin")).as("bin"))
      .select(col("p_milli"), col("bin"),
        expr(s"${lo}L + (CAST(bin AS BIGINT) * ${hi - lo}L) div ${bins}L")
          .as("lo_val"),
        expr(s"${lo}L + (CAST(bin + 1 AS BIGINT) * ${hi - lo}L) div ${bins}L")
          .as("hi_val"))
  }

  // ----- KMV (k-minimum-values) distinct sketch ---------------------
  //
  // The order-statistics complement to the HLL registers above
  // (Bar-Yossef et al. 2002; union/Jaccard estimators per Beyer et
  // al., SIGMOD 2007). Same portability discipline: a 60-bit
  // domain-separated md5 hash lane both engines derive identically,
  // so the sketch ROWS gate hash-exactly — and unlike HLL, KMV's
  // k-min set also answers SET OVERLAP (Jaccard, intersection size)
  // between two sketches without touching the data again.

  /** The portable KMV hash lane: first 15 hex chars of
    * md5("kmv:" ‖ key) as a 60-bit non-negative long — uniform on
    * [0, 2⁶⁰). DuckDB replays it verbatim as
    * `CAST(('0x' || substr(md5('kmv:' || key), 1, 15)) AS BIGINT)`. */
  def kmvHash(key: Column): Column =
    conv(substring(md5(concat(lit("kmv:"), key.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** KMV sketch of `keyCol`'s distinct values: the k smallest
    * distinct hash lanes, one row per kept hash — `(pos: int
    * (1..k ascending), h: long)`. Deterministic (a pure function of
    * the value SET), so the rows themselves are gate-able.
    *
    * Plan shape: scan → codegen'd md5 lane → ONE typed-Aggregator
    * pass ([[KmvMinK]]) whose map-side partials hold ≤ k sorted
    * longs and reject saturated rows in O(1) — the exchange carries
    * one ≤ k-element state per task, NOT the distinct value set
    * (that full-width shuffle is exactly what the sketch avoids at
    * 100 TB). Nulls excluded (COUNT DISTINCT semantics). */
  def kmvSketch(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.filter(col(keyCol).isNotNull)
      .select(kmvHash(col(keyCol)).as("h")).as[Long]
      .select(KmvMinK(k).toColumn)
      .flatMap(_.iterator.zipWithIndex.map { case (h, i) => (i + 1, h) })
      .toDF("pos", "h")
  }

  /** Lossless union of two KMV sketches at the same k: re-runs the
    * k-min fold over the two sketches' hash rows. By the union
    * property k-min(S ∪ T) = k-min(k-min(S) ∪ k-min(T)) this is
    * IDENTICAL to sketching the concatenated data (merge ≡ rebuild,
    * gated by q254) — the persisted sketch absorbs ingest batches
    * without a corpus rescan, like the HLL register max-merge. */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val s = a.sparkSession
    import s.implicits._
    a.select(col("h")).unionByName(b.select(col("h"))).as[Long]
      .select(KmvMinK(k).toColumn)
      .flatMap(_.iterator.zipWithIndex.map { case (h, i) => (i + 1, h) })
      .toDF("pos", "h")
  }

  /** Grouped Misra–Gries heavy hitters — "top keys per segment" at
    * bounded state (the [[graft.ops.MisraGries]] aggregator run per
    * group key): one `(group, key, est)` row per surviving counter.
    * Per-group guarantees are the aggregator's own (est ≤ true,
    * undercount ≤ n_g/(k+1), every key with true > n_g/(k+1)
    * present — n_g the GROUP's row count); the candidate set stays
    * merge-order-dependent, so gates must emit the guarantees, not
    * the raw counters (the q154 discipline). State: ≤ k counters per
    * group per task, map-side combined. `groupCol` string-typed;
    * `keyCol` must be an integral dtype (a lossy cast of a
    * non-numeric key would turn rows into encoder-breaking nulls
    * AFTER the null filter — cast upstream if the key is a string
    * code). */
  def misraGriesBy(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    // match on DataType values, not simpleString names — Spark
    // prints ByteType/ShortType/LongType as tinyint/smallint/bigint,
    // so a name list silently rejects working byte/short keys
    // (ADVICE r15)
    val kt = df.schema(keyCol).dataType
    require(kt == org.apache.spark.sql.types.ByteType ||
        kt == org.apache.spark.sql.types.ShortType ||
        kt == org.apache.spark.sql.types.IntegerType ||
        kt == org.apache.spark.sql.types.LongType,
      s"misraGriesBy: keyCol '$keyCol' must be integral, got $kt — " +
        "cast or hash it upstream")
    df.filter(col(keyCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), col(keyCol).cast("long").as("x"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MisraGries(k).toColumn)
      .flatMap { case (g, counters) =>
        counters.iterator.map { case (key, est) => (g, key, est) }
      }
      .toDF(groupCol, "key", "est")
  }

  /** Grouped KMV sketches — the "distinct X per Y" form at bounded
    * state (the [[hllRegistersBy]] parallel, but with the k-min set's
    * extra powers: per-group overlap and exact-when-unsaturated):
    * one `(group, pos, h)` row per kept hash per group. The typed
    * aggregator runs per group key with the same ≤ k map-side state,
    * so the exchange carries |groups|·k rows at most — never the
    * distinct value set. `groupCol` must be string-typed (cast
    * upstream); null groups are excluded like null keys. */
  def kmvSketchBy(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.filter(col(keyCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), kmvHash(col(keyCol)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(KmvMinK(k).toColumn)
      .flatMap { case (g, mins) =>
        mins.iterator.zipWithIndex.map { case (h, i) => (g, i + 1, h) }
      }
      .toDF(groupCol, "pos", "h")
  }

  /** Per-group distinct estimates from a [[kmvSketchBy]] frame —
    * `(group, k_used, kth_h, nd_est)` with the same two branches as
    * [[kmvEstimate]] (exact below saturation, Bar-Yossef above). */
  def kmvEstimateBy(sketchBy: DataFrame, groupCol: String,
      k: Int): DataFrame =
    sketchBy.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("int").as("k_used"),
        max(col("h")).as("kth_h"))
      .select(col(groupCol), col("k_used"), col("kth_h"),
        when(col("k_used") < k, col("k_used").cast("long"))
          .otherwise(expr(s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * " +
            "1152921504606846976) div kth_h AS BIGINT)"))
          .as("nd_est"))

  /** Distinct-count estimate from a KMV sketch, one labeled row:
    * `(label, k_used, kth_h, nd_est)`. Unsaturated sketch (k_used <
    * k) ⇒ every distinct hash was kept ⇒ nd_est = k_used EXACTLY;
    * saturated ⇒ the Bar-Yossef estimator (k−1)·2⁶⁰ div h_(k), all
    * integral (the ×2⁶⁰ product rides DECIMAL(38,0) / HUGEINT). */
  def kmvEstimate(sketch: DataFrame, k: Int, label: String): DataFrame =
    sketch
      .agg(count(lit(1)).cast("int").as("k_used"),
        max(col("h")).as("kth_h"))
      .select(lit(label).as("label"), col("k_used"), col("kth_h"),
        when(col("k_used") < k, col("k_used").cast("long"))
          .otherwise(expr(s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * " +
            "1152921504606846976) div kth_h AS BIGINT)"))
          .as("nd_est"))

  /** Set-overlap estimate between two KMV sketches (Beyer 2007), one
    * row: `(k_union, matches, jaccard_micro, inter_est)`. The union
    * sketch's k_union hashes are a uniform sample of A ∪ B's distinct
    * values; `matches` counts those present in BOTH input sketches,
    * so Ĵ = matches / k_union (integer micros) and the intersection
    * size re-scales Ĵ by the union estimate. Unsaturated union ⇒ all
    * three sets are complete ⇒ matches IS |A ∩ B| exactly. Cost:
    * two sketch-sized semi-joins + 1-row attach — the data is never
    * rescanned. */
  def kmvJaccard(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val u = kmvMerge(a, b, k)
    val matches = u
      .join(a.select(col("h")), Seq("h"), "left_semi")
      .join(b.select(col("h")), Seq("h"), "left_semi")
      .agg(count(lit(1)).as("matches"))
    val uTot = u.agg(count(lit(1)).as("k_union"),
      max(col("h")).as("kth_h"))
    matches.crossJoin(uTot) // 1-row × 1-row attach (allowlisted)
      .select(col("k_union").cast("int").as("k_union"), col("matches"),
        expr("(1000000 * matches) div k_union").as("jaccard_micro"),
        when(col("k_union") < k, col("matches"))
          .otherwise(expr(s"CAST((CAST(matches AS DECIMAL(38,0)) * " +
            s"${k - 1} * 1152921504606846976) div " +
            "(k_union * CAST(kth_h AS DECIMAL(38,0))) AS BIGINT)"))
          .as("inter_est"))
  }
}
