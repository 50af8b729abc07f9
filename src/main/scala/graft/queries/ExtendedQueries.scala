package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.parsers
import graft.ops.Relational
import QuerySpec.{table, events, eventsSql}

/** Batch 2: scalar parser fidelity, array/zip operators, set ops,
  * grouping sets, JSON, and the events-table window operators
  * (SURVEY.md §2.6-§2.9, F1-F9, north-star extensions). */
object ExtendedQueries {

  import parsers._

  val all: Seq[QuerySpec] = Seq(

    // F1/F2/F3/F7/F9 parser fidelity over engineered inputs.
    QuerySpec("q11_parse_functions",
      (s, dir) => {
        val o = table(s, dir, "orders")
        val dateStr = col("o_orderdate").cast("string")
        val ynStr = when(col("o_orderkey") % 3 === 0, lit("J"))
          .when(col("o_orderkey") % 3 === 1, lit("N")).otherwise(lit(""))
        val intStr = when(col("o_orderkey") % 4 === 0, col("o_orderkey").cast("string"))
          .when(col("o_orderkey") % 4 === 1, lit("-5"))
          .when(col("o_orderkey") % 4 === 2, lit("x12")).otherwise(lit(""))
        val pStr = when(col("o_orderkey") % 5 === 0, lit(""))
          .otherwise(col("o_orderpriority"))
        o.select(
          col("o_orderkey"),
          parseDate(dateStr).as("d"),
          parseDateTime(dateStr).as("t"),
          parseYesNo(ynStr).as("b"),
          intOrNone(intStr).as("i"),
          emptyToNull(pStr).as("p"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
        |  CAST(substr(CAST(o_orderdate AS VARCHAR), 1, 10) AS DATE) AS d,
        |  CAST(CAST(o_orderdate AS VARCHAR) AS TIMESTAMP) AS t,
        |  CASE WHEN yn IN ('J','Y') THEN TRUE WHEN yn = 'N' THEN FALSE END AS b,
        |  CASE WHEN regexp_full_match(istr, '[0-9]+') THEN CAST(istr AS INTEGER) END AS i,
        |  NULLIF(trim(pstr), '') AS p
        |FROM (SELECT *,
        |    CASE WHEN o_orderkey % 3 = 0 THEN 'J'
        |         WHEN o_orderkey % 3 = 1 THEN 'N' ELSE '' END AS yn,
        |    CASE WHEN o_orderkey % 4 = 0 THEN CAST(o_orderkey AS VARCHAR)
        |         WHEN o_orderkey % 4 = 1 THEN '-5'
        |         WHEN o_orderkey % 4 = 2 THEN 'x12' ELSE '' END AS istr,
        |    CASE WHEN o_orderkey % 5 = 0 THEN '' ELSE o_orderpriority END AS pstr
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin)),

    // F6 create_ids: parallel pipe-list zip → versioned ids (exploded).
    QuerySpec("q12_create_ids",
      (s, dir) => table(s, dir, "lineitem")
        .filter(col("l_orderkey") % 4 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          explode(createIds(
            concat_ws("|", col("l_partkey"), col("l_suppkey")),
            concat_ws("|", col("l_linenumber"), col("l_linenumber") + 1)))
            .as("rel_id"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("rel_id")),
      Some("""SELECT l_orderkey, l_linenumber, i || '_' || lpad(v, 3, '0') AS rel_id
        |FROM (SELECT l_orderkey, l_linenumber,
        |    UNNEST(string_split(CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR), '|')) AS i,
        |    UNNEST(string_split(CAST(l_linenumber AS VARCHAR) || '|' || CAST(l_linenumber + 1 AS VARCHAR), '|')) AS v
        |  FROM lineitem WHERE l_orderkey % 4 = 0)
        |ORDER BY l_orderkey, l_linenumber, rel_id""".stripMargin)),

    // A3 grouped sorted list-collect (deterministic collect_list).
    // The list is emitted CSV-joined: the driver's comparator sorts
    // result cells in pandas, and array cells (numpy.ndarray) are
    // unsortable/unhashable there — strings carry the same information.
    QuerySpec("q13_collect_sorted",
      (s, dir) => Relational.collectSorted(
          table(s, dir, "lineitem"), "l_orderkey", "l_partkey")
        .select(col("l_orderkey"),
          array_join(col("l_partkeys").cast("array<string>"), ",").as("l_partkeys"))
        .orderBy(col("l_orderkey")),
      Some("""SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_partkey)), ',') AS l_partkeys
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // A4 distinct key-set materialization.
    QuerySpec("q14_distinct_keyset",
      (s, dir) => Relational.keySet(table(s, dir, "orders"), "o_custkey")
        .orderBy(col("o_custkey")),
      Some("SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey")),

    // §2.7 set operations: except + intersect, tagged and unioned.
    QuerySpec("q15_set_ops",
      (s, dir) => {
        val o = table(s, dir, "orders")
        def yr(y: Int) = o
          .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
            col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
          .select(col("o_custkey")).distinct()
        val a = yr(1995); val b = yr(1996)
        a.except(b).withColumn("tag", lit("only_1995"))
          .unionByName(a.intersect(b).withColumn("tag", lit("both")))
          .orderBy(col("tag"), col("o_custkey"))
      },
      Some("""WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
        |b AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT o_custkey, 'only_1995' AS tag FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |UNION ALL
        |SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |ORDER BY tag, o_custkey""".stripMargin)),

    // §2.4-absent-made-present: rollup with grouping id.
    QuerySpec("q16_rollup",
      (s, dir) => table(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_last,
          col("o_orderpriority").asc_nulls_last),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin)),

    // Cube with exact-decimal measure.
    QuerySpec("q17_cube",
      (s, dir) => table(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"), grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_last,
          col("l_linestatus").asc_nulls_last),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin)),

    // JSON extraction (events.props) — SURVEY.md §2.8 note.
    QuerySpec("q18_json_extract",
      (s, dir) => events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // §2.9 streaming-shaped: tumbling-window aggregation (batch form of
    // groupBy(window(...)); the readStream form is in StreamingSpec).
    QuerySpec("q19_tumbling_window",
      (s, dir) => events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("sum_value"))
        .select(col("w.start").as("hour_start"), col("n"), col("sum_value"))
        .orderBy(col("hour_start")),
      Some(s"""WITH e AS ($eventsSql)
        |SELECT date_trunc('hour', ts) AS hour_start, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY 1 ORDER BY hour_start""".stripMargin)),

    // §2.9 sessionization: session_window vs gaps-and-islands oracle.
    QuerySpec("q20_session_window",
      (s, dir) => events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("sum_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start")),
      Some(s"""WITH e AS ($eventsSql),
        |m AS (SELECT user_id, ts, value, event_id,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin)),

    // §2.4-absent-made-present: PIVOT with an explicit value list (no
    // value-discovery collect job — the schema is declared, which is
    // also the only scalable form) and count measure; missing cells
    // filled to 0 to match the oracle's FILTER counts.
    QuerySpec("q141_pivot",
      (s, dir) => table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),

    // Ordered-step funnel (view → click → purchase): first completion
    // of each step STRICTLY after the previous one, per user — keyed
    // aggregates + keyed joins only, integer-microsecond timestamps,
    // null = drop-off. The event-analytics dual of q20's
    // gaps-and-islands sessionization.
    QuerySpec("q137_funnel",
      (s, dir) => graft.ops.EventAnalytics.funnel(events(s, dir),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("user_id")),
      Some(s"""WITH e AS ($eventsSql),
        |v AS (SELECT user_id, MIN(epoch_us(ts)) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
        |  FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
        |  GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
        |  FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
        |  GROUP BY 1)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY v.user_id""".stripMargin)),

    // Weekly retention cohorts: users by ISO week of first event ×
    // weeks-later activity — exact integer day arithmetic (both
    // endpoints week-truncated, div 7 exact), distinct-user counts.
    QuerySpec("q138_retention",
      (s, dir) => graft.ops.EventAnalytics.retentionWeeks(
          events(s, dir), "user_id", "ts")
        .orderBy(col("cohort_week"), col("week_offset")),
      Some(s"""WITH e AS ($eventsSql),
        |f AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE)
        |    AS cohort_week FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE)
        |    AS w FROM e)
        |SELECT f.cohort_week,
        |  CAST(date_diff('day', f.cohort_week, a.w) // 7 AS INTEGER)
        |    AS week_offset,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin))
  )
}
