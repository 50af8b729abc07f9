package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import graft.functions.parsers
import graft.ops.{IntervalUnionDays, Relational, Temporal}
import QuerySpec.{table, events, eventsSql}

/** Batch 5: merge-audit counters, top-k, literal source, sliding
  * windows, stats, the typed Aggregator UDAF, and skew-salted
  * aggregation (SURVEY.md §2.4/§2.6/§2.10 + S6). */
object AuditQueries {

  import parsers.dec2

  private def liveStaged(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val orders = table(s, dir, "orders")
    val live = orders
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
    val staged = orders
      .filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderstatus") === "O",
          (dec2(col("o_totalprice")) * lit(BigDecimal("1.1"))).cast("double"))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderdate"))
    (live, staged)
  }

  private val liveStagedSql =
    """live AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
      |staged AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderstatus = 'O'
      |      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE)
      |      ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-07-01')""".stripMargin

  private val distinctSql =
    """t.o_orderstatus IS DISTINCT FROM e.o_orderstatus
      | OR t.o_totalprice IS DISTINCT FROM e.o_totalprice
      | OR t.o_orderdate IS DISTINCT FROM e.o_orderdate""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    // A2/J2-J4: the reference's insert/update/delete counters as one row.
    QuerySpec("q36_merge_audit",
      (s, dir) => {
        val (live, staged) = liveStaged(s, dir)
        val a = Temporal.mergeAudit(live, staged, "o_orderkey")
        a.inserted.agg(count(lit(1)).as("n_inserted"))
          .crossJoin(a.updated.agg(count(lit(1)).as("n_updated")))
          .crossJoin(a.deleted.agg(count(lit(1)).as("n_deleted")))
      },
      Some(s"""WITH $liveStagedSql
        |SELECT
        |  (SELECT COUNT(*) FROM staged t WHERE NOT EXISTS
        |    (SELECT 1 FROM live e WHERE e.o_orderkey = t.o_orderkey)) AS n_inserted,
        |  (SELECT COUNT(*) FROM staged t JOIN live e ON t.o_orderkey = e.o_orderkey
        |    WHERE $distinctSql) AS n_updated,
        |  (SELECT COUNT(*) FROM live e WHERE NOT EXISTS
        |    (SELECT 1 FROM staged t WHERE t.o_orderkey = e.o_orderkey)) AS n_deleted""".stripMargin)),

    // J4 alone: the changed-row key set (null-safe whole-row compare).
    QuerySpec("q37_update_changed",
      (s, dir) => {
        val (live, staged) = liveStaged(s, dir)
        Temporal.mergeAudit(live, staged, "o_orderkey")
          .updated.orderBy(col("o_orderkey"))
      },
      Some(s"""WITH $liveStagedSql
        |SELECT t.o_orderkey FROM staged t JOIN live e ON t.o_orderkey = e.o_orderkey
        |WHERE $distinctSql
        |ORDER BY t.o_orderkey""".stripMargin)),

    // §2.6 top-k with deterministic tiebreak.
    QuerySpec("q38_topk",
      (s, dir) => table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // S6 inline literal source: the gemeente seed row
    // (bagh/batch.py:296-317) through the scalar parsers.
    QuerySpec("q39_literal_source",
      (s, dir) => {
        import s.implicits._
        Seq(("0363", 1, "1900-01-01 00:00:00", "1900-01-01", "", "Amsterdam", "J"))
          .toDF("identificatie", "volgnummer", "registratiedatum",
            "beginGeldigheid", "eindGeldigheid", "naam", "verzorgingsgebied")
          .select(
            parsers.createId(col("identificatie"), col("volgnummer")).as("id"),
            col("identificatie"), col("volgnummer"),
            parsers.parseDateTime(col("registratiedatum")).as("registratiedatum"),
            parsers.parseDate(col("beginGeldigheid")).as("begin_geldigheid"),
            parsers.parseDate(col("eindGeldigheid")).as("eind_geldigheid"),
            col("naam"),
            parsers.parseYesNo(col("verzorgingsgebied")).as("verzorgingsgebied"))
      },
      Some("""SELECT '0363_001' AS id, '0363' AS identificatie, 1 AS volgnummer,
        |  TIMESTAMP '1900-01-01 00:00:00' AS registratiedatum,
        |  DATE '1900-01-01' AS begin_geldigheid,
        |  CAST(NULL AS DATE) AS eind_geldigheid,
        |  'Amsterdam' AS naam, TRUE AS verzorgingsgebied""".stripMargin)),

    // §2.9 sliding window (1h window, 30m slide): every event lands in
    // exactly two windows.
    QuerySpec("q40_sliding_window",
      (s, dir) => events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("win_start"), col("n"))
        .orderBy(col("win_start")),
      Some(s"""WITH e AS ($eventsSql)
        |SELECT ws AS win_start, COUNT(*) AS n
        |FROM (SELECT UNNEST([time_bucket(INTERVAL 30 MINUTE, ts),
        |                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS ws
        |      FROM e)
        |GROUP BY ws ORDER BY win_start""".stripMargin)),

    // A2 stats pack: counts, exact distinct, min/max, exact sums.
    QuerySpec("q41_stats",
      (s, dir) => events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
          sum(dec2(col("value"))).cast("double").as("sum_value"))
        .orderBy(col("event_type")),
      Some(s"""WITH e AS ($eventsSql)
        |SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
        |  MIN(ts) AS min_ts, MAX(ts) AS max_ts,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // §2.10 typed Aggregator UDAF: days covered by the union of each
    // key's validity intervals (open intervals truncated at 1999-01-01
    // = epoch day 10592), vs a gaps-and-islands SQL oracle. The
    // oracle's `d` CTE must be DISTINCT: with duplicate (s,e) rows the
    // two window passes (prev_max, grp) may order ties differently and
    // double-count an island — observed as a nondeterministic DuckDB
    // result at sf0.1. Union-of-intervals is set semantics, so the
    // dedup changes nothing else; the Spark aggregator is
    // duplicate-safe by construction.
    QuerySpec("q42_interval_union_days",
      (s, dir) => {
        val horizon = java.time.LocalDate.of(1999, 1, 1).toEpochDay.toInt
        val f = udaf(IntervalUnionDays(horizon),
          Encoders.product[(Int, Option[Int])])
        CoreQueries.lineitemVersioned(s, dir)
          .select(col("identificatie"),
            datediff(col("begin_geldigheid").cast("date"),
              lit("1970-01-01").cast("date")).as("s_day"),
            datediff(col("eind_geldigheid").cast("date"),
              lit("1970-01-01").cast("date")).as("e_day"))
          // drop degenerate intervals (start at/after the horizon) so
          // keys with nothing left vanish, like the oracle's WHERE e > s
          .filter(coalesce(col("e_day"), lit(horizon)) > col("s_day"))
          .groupBy(col("identificatie"))
          .agg(f(col("s_day"), col("e_day")).as("covered_days"))
          .orderBy(col("identificatie"))
      },
      Some("""WITH v AS (SELECT CAST(l_orderkey AS VARCHAR) AS identificatie,
        |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS s,
        |    COALESCE(datediff('day', DATE '1970-01-01',
        |      CASE WHEN l_linestatus = 'O' THEN NULL
        |           ELSE CAST(l_shipdate + INTERVAL 30 DAY AS DATE) END), 10592) AS e
        |  FROM lineitem),
        |d AS (SELECT DISTINCT * FROM v WHERE e > s),
        |m AS (SELECT *, MAX(e) OVER (PARTITION BY identificatie ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM d),
        |fl AS (SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max
        |        THEN 1 ELSE 0 END AS brk FROM m),
        |g AS (SELECT *, SUM(brk) OVER (PARTITION BY identificatie ORDER BY s, e
        |        ROWS UNBOUNDED PRECEDING) AS grp FROM fl),
        |islands AS (SELECT identificatie, grp, MIN(s) AS mn, MAX(e) AS mx
        |  FROM g GROUP BY identificatie, grp)
        |SELECT identificatie, CAST(SUM(mx - mn) AS BIGINT) AS covered_days
        |FROM islands GROUP BY identificatie
        |ORDER BY identificatie""".stripMargin)),

    // Skew-salted two-stage aggregation — result identical to a plain
    // groupBy; the salt spreads a hot key over reducers.
    QuerySpec("q43_salted_agg",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
          .withColumn("__q", dec2(col("l_quantity")))
        Relational.saltedAgg(li, "l_returnflag", "l_orderkey", 8, Some("__q"))
          .select(col("l_returnflag"), col("n"),
            col("total").cast("double").as("total"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )
}
