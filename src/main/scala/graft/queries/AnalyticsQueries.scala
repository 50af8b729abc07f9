package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{IncrementalAgg, Multimodal}
import QuerySpec.table

/** Batch 15 (round 10, third leg): the analytics-engine surface a
  * corpus/warehouse team reaches for next — the video half of the
  * multimodal contract (q143, completing the image/audio/video
  * triad), incremental aggregate maintenance, time-series features,
  * and graph/event analytics. Every gate stays on the repo's exact
  * arithmetic discipline (integer micros / decimal sums) so every
  * oracle is hash-exact. */
object AnalyticsQueries {

  /** Deterministic BMFF/MP4 fixture from documents arithmetic (the
    * q33/q129 move: the encode half controls the bytes, so the oracle
    * re-derives every attribute from doc_id formulas). Lanes:
    * %11 → truncated (cut inside the ftyp box the length prefix
    * promises), %13 → bad_magic (first box type clobbered), %17 →
    * bad_header (zero mvhd timescale); truncation wins on overlap,
    * then bad_magic — matching the CASE order in the oracle. */
  private def mp4Fixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents").select(col("doc_id")).as[Long]
      .map { id =>
        val brand = if (id % 2 == 0) "isom" else "mp42"
        val ts = if (id % 17 == 0) 0L
          else (id % 3) match { case 0 => 600L; case 1 => 1000L; case _ => 90000L }
        val dur = 1L + id % 997
        val w = 16 * (1 + (id % 113).toInt)
        val h = 16 * (1 + (id % 97).toInt)
        val nTracks = 1 + (id % 3).toInt
        val bytes = Multimodal.encodeMp4(brand, ts, dur, w, h, nTracks)
        val out =
          if (id % 11 == 0) bytes.take(9)
          else if (id % 13 == 0) { val c = bytes.clone(); c(4) = 'X'.toByte; c }
          else bytes
        (id, out)
      }
      .toDF("media_id", "media").withColumn("kind", lit("video"))
  }

  def all: Seq[QuerySpec] = Seq(

    // Multimodal video: REAL ISO-BMFF (MP4) header decode — ftyp
    // brand, mvhd timescale/duration, tkhd 16.16 dimensions, track
    // count — over payloads built by the spec-conformant encode half.
    // The oracle never parses bytes: every attribute (and all three
    // dead-letter lanes) re-derives from the fixture's doc_id
    // arithmetic. duration_micros is integer floor, so engine-exact.
    QuerySpec("q143_video_features",
      (s, dir) => Multimodal.mp4Headers(s, mp4Fixture(s, dir))
        .orderBy(col("media_id")),
      Some("""WITH p AS (SELECT doc_id,
        |    doc_id % 11 <> 0 AND doc_id % 13 <> 0 AND doc_id % 17 <> 0 AS ok,
        |    CASE WHEN doc_id % 11 = 0 THEN 'truncated'
        |         WHEN doc_id % 13 = 0 THEN 'bad_magic'
        |         WHEN doc_id % 17 = 0 THEN 'bad_header' END AS reason,
        |    CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
        |    CAST(1 + doc_id % 3 AS INTEGER) AS n_tracks,
        |    CAST(CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
        |         ELSE 90000 END AS BIGINT) AS ts,
        |    CAST(1 + doc_id % 997 AS BIGINT) AS dur,
        |    CAST(16 * (1 + doc_id % 113) AS INTEGER) AS w,
        |    CAST(16 * (1 + doc_id % 97) AS INTEGER) AS h
        |  FROM documents)
        |SELECT doc_id AS media_id, ok, reason,
        |  CASE WHEN ok THEN brand END AS brand,
        |  CASE WHEN ok THEN n_tracks END AS n_tracks,
        |  CASE WHEN ok THEN ts END AS timescale,
        |  CASE WHEN ok THEN dur END AS duration_ticks,
        |  CASE WHEN ok THEN (dur * 1000000) // ts END AS duration_micros,
        |  CASE WHEN ok THEN w END AS width,
        |  CASE WHEN ok THEN h END AS height
        |FROM p ORDER BY media_id""".stripMargin)),

    // Incremental aggregate maintenance, in-query form: the corpus
    // summary (keyed count / decimal sums / min-max) is built on the
    // mod-97 "history" slice, the mod-97 batch is aggregated alone,
    // and the two states MERGE — the oracle recomputes over the full
    // table, so the gate proves merge ≡ recompute exactly.
    QuerySpec("q144_incr_agg",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val merged = IncrementalAgg.mergeState(
          Seq(
            IncrementalAgg.aggState(
              li.filter(pmod(col("l_orderkey"), lit(97)) =!= 0),
              AggKeys, AggSums, AggMins, AggMaxs),
            IncrementalAgg.aggState(
              li.filter(pmod(col("l_orderkey"), lit(97)) === 0),
              AggKeys, AggSums, AggMins, AggMaxs)),
          AggKeys, AggSums, AggMins, AggMaxs)
        presentAggState(merged)
      },
      Some(aggStateOracle)),

    // Steady-state twin (standing rule 1): the history summary is a
    // FixtureCache-persisted parquet artifact; the probe aggregates
    // ONLY the batch and merges — the bench measures per-batch upkeep
    // cost, with the history scan gone from the plan entirely
    // (PlanSpec: exactly one lineitem scan). Same oracle as q144.
    QuerySpec("q145_incr_agg_steady",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val state = s.read.parquet(s"${aggStateRoot(s, dir)}/state")
        val merged = IncrementalAgg.mergeState(
          Seq(state,
            IncrementalAgg.aggState(
              li.filter(pmod(col("l_orderkey"), lit(97)) === 0),
              AggKeys, AggSums, AggMins, AggMaxs)),
          AggKeys, AggSums, AggMins, AggMaxs)
        presentAggState(merged)
      },
      Some(aggStateOracle))
  )

  private val AggKeys = Seq("l_returnflag", "l_linestatus", "l_suppkey")
  private val AggSums = Seq("l_quantity", "l_extendedprice")
  private val AggMins = Seq("l_shipdate")
  private val AggMaxs = Seq("l_shipdate")

  /** Gate-boundary projection of the summary state: exact decimal
    * sums surface as doubles (the repo's oracle-parity idiom), keys
    * totally ordered. */
  private def presentAggState(state: DataFrame): DataFrame =
    state.select(
      col("l_returnflag"), col("l_linestatus"), col("l_suppkey"),
      col("n"),
      col("sum_l_quantity").cast("double").as("sum_qty"),
      col("sum_l_extendedprice").cast("double").as("sum_price"),
      col("min_l_shipdate").as("min_ship"),
      col("max_l_shipdate").as("max_ship"))
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("l_suppkey"))

  private val aggStateOracle: String =
    """SELECT l_returnflag, l_linestatus, l_suppkey, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
      |FROM lineitem GROUP BY 1, 2, 3
      |ORDER BY l_returnflag, l_linestatus, l_suppkey""".stripMargin

  /** Build-once persisted summary state over the mod-97 history slice
    * (the q103/q118/q119 steady-state discipline, via FixtureCache's
    * locked atomic-publish). */
  private def aggStateRoot(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val fp = FixtureCache.fingerprint(s"$dir/lineitem.parquet")
    FixtureCache.ensure(s"/tmp/graft_agg_state/${tag}_$fp") { tmp =>
      IncrementalAgg.aggState(
          table(s, dir, "lineitem")
            .filter(pmod(col("l_orderkey"), lit(97)) =!= 0),
          AggKeys, AggSums, AggMins, AggMaxs)
        .write.mode("overwrite").parquet(s"$tmp/state")
    }
  }
}
