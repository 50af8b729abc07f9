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

  /** Per-group z-score outliers WITHOUT square roots: flag x when
    * (x − μ)² > z²·σ², which over integer units rewrites exactly to
    *
    *   (n·x − S)² > z² · (n·Q − S²)      with S = Σx, Q = Σx²
    *
    * — all integer, so both engines agree bit-for-bit. The squared
    * terms are compared in DECIMAL(38,0) (n·x at planetary group
    * sizes squares past int64; 38 digits cover n ≈ 1e9 groups of
    * 1e6-unit values). One aggregate for the per-group moment frame
    * (≤ |groups| rows, broadcast back), one scan to flag — no
    * window, no second pass over values. Emits ONLY the outliers. */
  def groupOutliers(df: DataFrame, groupCol: String, idCols: Seq[String],
      valueCentiCol: String, z: Int): DataFrame = {
    val d38 = "decimal(38,0)"
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(d38).as("__n"),
      sum(col(valueCentiCol).cast(d38)).cast(d38).as("__s"),
      sum((col(valueCentiCol) * col(valueCentiCol)).cast(d38))
        .cast(d38).as("__q"))
    val dev = col("__n") * col(valueCentiCol) - col("__s")
    val varTerm = col("__n") * col("__q") - col("__s") * col("__s")
    df.join(broadcast(stats), Seq(groupCol))
      .filter(dev * dev > lit(z * z) * varTerm)
      .select((col(groupCol) +: idCols.map(col)) :+
        col(valueCentiCol): _*)
  }
}
