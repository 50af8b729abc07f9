package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Temporal
import QuerySpec.{table, events, eventsSql}

/** Batch 7: history construction from change events (the inverse of the
  * reference loader) and pivot (wide aggregation). */
object HistoryQueries {

  val all: Seq[QuerySpec] = Seq(

    // Change events -> SCD2 versions: each user event opens a version,
    // closing the previous one; last stays open.
    QuerySpec("q46_build_history",
      (s, dir) => Temporal.buildHistory(events(s, dir),
          keyCol = "user_id", tsCol = "ts",
          payloadCols = Seq("event_type", "value"),
          tiebreak = Seq(col("event_id")))
        .orderBy(col("identificatie"), col("volgnummer")),
      Some(s"""WITH e AS ($eventsSql),
        |h AS (SELECT CAST(user_id AS VARCHAR) AS identificatie, ts, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS volgnummer,
        |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eind
        |  FROM e)
        |SELECT identificatie || '_' || lpad(CAST(volgnummer AS VARCHAR), 3, '0') AS id,
        |  identificatie, volgnummer, ts AS begin_geldigheid,
        |  eind AS eind_geldigheid, event_type, value
        |FROM h ORDER BY identificatie, volgnummer""".stripMargin)),

    // Approx aggregates (HLL++ distinct, GK quantiles) — sketch
    // INTERNALS differ across engines, so the raw approx values can
    // never hash-match an oracle; what IS oracle-checkable is the
    // accuracy CONTRACT (VERDICT r8 #4, the q49 graduation): the gate
    // emits exact values plus bounded-error booleans — HLL++ at
    // rsd=0.01 within 5% of the exact distinct count, GK at
    // accuracy=1000 (rank error ≤ 0.001) landing inside a ±0.01 rank
    // bracket (10× the guarantee) — and the oracle computes the exact
    // twin and asserts every contract holds, so a sketch regression
    // past tolerance turns the hash red. The GK check is by RANK
    // FRACTION: a second hash-agg pass counts values strictly-below /
    // at-or-below each estimate (tie-robust two-sided bound), rather
    // than an exact `percentile()` aggregate — that form buffers
    // every value in one aggregation buffer (benched 4.5-5.5 s at
    // sf0.1 and would not survive 100 TB); two scans + two hash aggs
    // is the shape that does.
    QuerySpec("q49_approx_stats",
      (s, dir) => {
        val e = events(s, dir)
        // exact-distinct and the sketches aggregate SEPARATELY, joined
        // on the (tiny) group key: countDistinct plans a distinct
        // expand, and an expand drops every TypedImperative agg beside
        // it to sort-based aggregation — with HLL++ at rsd=0.01 (2^14
        // registers per buffer) that benched 1.7-4.7 s at sf0.1, vs
        // ~0.4 s for the same aggs in two expand-free hash passes
        val exact = e.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_users"))
        val sketch = e.groupBy(col("event_type"))
          .agg(approx_count_distinct(col("user_id"), 0.01).as("__approx"),
            percentile_approx(col("value"), array(lit(0.5), lit(0.99)),
              lit(1000)).as("__pa"),
            count(col("value")).as("__nv"))
        val agg = exact.join(sketch, Seq("event_type"))
          .localCheckpoint() // one row per event type — computed once,
                             // feeds both the rank pass and the output
        val p50 = element_at(col("__pa"), 1)
        val p99 = element_at(col("__pa"), 2)
        val ranks = e.join(
            broadcast(agg.select(col("event_type"), col("__pa"))),
            Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(
            sum(when(col("value") < p50, 1L).otherwise(0L)).as("__lt50"),
            sum(when(col("value") <= p50, 1L).otherwise(0L)).as("__le50"),
            sum(when(col("value") < p99, 1L).otherwise(0L)).as("__lt99"),
            sum(when(col("value") <= p99, 1L).otherwise(0L)).as("__le99"))
        val n = col("__nv").cast("double")
        agg.join(ranks, Seq("event_type"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("__approx") - col("exact_users")).cast("double") /
              col("exact_users") <= 0.05).as("users_ok"),
            (col("__lt50") <= lit(0.51) * n && col("__le50") >= lit(0.49) * n)
              .as("p50_ok"),
            // ±0.01 rank bracket, same 10× margin as p50 (a ±0.001
            // bracket IS the GK guarantee — zero slack; sf0.1's p99
            // landed at rank 0.98899, exactly on the edge). The upper
            // side (rank ≤ 0.99 + 0.01 = 1.0) cannot bind, so only
            // the lower bound remains meaningful.
            (col("__le99") >= lit(0.98) * n).as("p99_ok"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH e AS ($eventsSql)
        |SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |  TRUE AS users_ok, TRUE AS p50_ok, TRUE AS p99_ok
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Pivot: explicit value list so the column set is deterministic.
    QuerySpec("q47_pivot",
      (s, dir) => table(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .withColumnsRenamed(Map(
          "1-URGENT" -> "p1", "2-HIGH" -> "p2", "3-MEDIUM" -> "p3",
          "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
        |  COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS p1,
        |  COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS p2,
        |  COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
        |  COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
        |  COUNT(*) FILTER (o_orderpriority = '5-LOW') AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))
  )
}
