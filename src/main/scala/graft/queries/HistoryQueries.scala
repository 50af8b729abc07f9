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
    // accuracy=1000 (rank error ≤ 0.001) inside the exact 0.49–0.51 /
    // 0.98–max rank brackets (10× the guarantee) — and the oracle
    // computes the exact twins and asserts every contract holds, so a
    // sketch regression past tolerance turns the hash red.
    QuerySpec("q49_approx_stats",
      (s, dir) => events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.01).as("__approx"),
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("__p50"),
          percentile_approx(col("value"), lit(0.99), lit(1000)).as("__p99"),
          expr("percentile(value, 0.49)").as("__q49"),
          expr("percentile(value, 0.51)").as("__q51"),
          expr("percentile(value, 0.98)").as("__q98"),
          max(col("value")).as("__vmax"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("__approx") - col("exact_users")).cast("double") /
            col("exact_users") <= 0.05).as("users_ok"),
          (col("__p50") >= col("__q49") && col("__p50") <= col("__q51"))
            .as("p50_ok"),
          (col("__p99") >= col("__q98") && col("__p99") <= col("__vmax"))
            .as("p99_ok"))
        .orderBy(col("event_type")),
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
