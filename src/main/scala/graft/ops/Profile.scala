package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the ANALYZE surface of an analytics engine:
  * per-column row/null/distinct counts and min/max, computed in ONE
  * pass over the table (a single multi-aggregate job; Spark plans the
  * distinct aggregates through one Expand, not one scan per column)
  * and unpivoted to a row per column. At 100 TB profiling cost is one
  * scan, not #columns scans. */
object Profile {

  /** One profile row per listed column:
    * (col_name, n, n_nonnull, n_distinct, min_s, max_s). min/max are
    * computed in the column's native type, THEN cast to string (a
    * string-space min would order "10" < "9"). Callers pre-shape
    * engine-divergent types to portable ones first — doubles to
    * integer units, timestamps to ISO strings (which sort
    * chronologically). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackExpr = s"stack(${cols.size}, " + cols.map { c =>
      s"'$c', `${c}__nn`, `${c}__nd`, `${c}__min`, `${c}__max`"
    }.mkString(", ") +
      ") AS (col_name, n_nonnull, n_distinct, min_s, max_s)"
    wide.select(expr(stackExpr), col("__n").as("n"))
      .select(col("col_name"), col("n"), col("n_nonnull"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
