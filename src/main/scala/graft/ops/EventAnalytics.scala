package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream analytics over the (user, ts, type) shape — the
  * funnel/cohort layer a product pipeline runs beside the ingest.
  * Both operators are pure keyed aggregate/join compositions: shuffle
  * on the user key only, no windows, no driver state — a billion-user
  * event log runs them at join speed. */
object EventAnalytics {

  /** Ordered-step funnel: for every user who reached `steps.head`,
    * the first time they completed each subsequent step STRICTLY
    * after the previous one (the classic conversion definition —
    * out-of-order events don't count). Output: (userCol,
    * t_<step>...) in integer microseconds, null = dropped off at
    * that step. Each step is one keyed aggregate + one keyed join;
    * nothing is ordered globally. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val m = unix_micros(col(tsCol))
    def stepTimes(st: String) =
      events.filter(col(typeCol) === st).select(col(userCol), m.as("__t"))
    val first = stepTimes(steps.head)
      .groupBy(col(userCol)).agg(min(col("__t")).as(s"t_${steps.head}"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (st, i)) =>
      val prev = s"t_${steps(i - 1)}"
      val nxt = stepTimes(st)
        .join(acc.select(col(userCol), col(prev)), Seq(userCol))
        .filter(col("__t") > col(prev))
        .groupBy(col(userCol)).agg(min(col("__t")).as(s"t_$st"))
      acc.join(nxt, Seq(userCol), "left")
    }
  }

  /** Weekly retention cohorts: users grouped by the ISO week of their
    * first event; `n_users` = distinct users from that cohort active
    * in week `cohort + week_offset`. Week truncation is ISO-Monday in
    * both Spark and DuckDB, and the offset is exact integer day
    * arithmetic (both endpoints are week-truncated, so div 7 is
    * always exact). */
  def retentionWeeks(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val cohorts = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__first"))
      .select(col(userCol),
        date_trunc("week", col("__first")).cast("date").as("cohort_week"))
    val active = events.select(col(userCol),
        date_trunc("week", col(tsCol)).cast("date").as("__w"))
      .distinct()
    active.join(cohorts, Seq(userCol))
      .select(col("cohort_week"),
        expr("datediff(__w, cohort_week) div 7").cast("int")
          .as("week_offset"),
        col(userCol))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
