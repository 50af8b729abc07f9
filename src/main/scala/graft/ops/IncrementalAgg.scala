package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (materialized-view upkeep): a
  * persisted per-key summary frame absorbs each ingest batch by a
  * keyed union+re-aggregate MERGE instead of re-scanning history —
  * the warehouse counterpart of the dedup/ANN steady-state indexes.
  *
  * Only algebraic (mergeable) aggregates participate: count and
  * decimal sums merge by addition, min/max by min/max — so the merge
  * is exact under ANY partitioning of the input into batches, and
  * averages derive downstream as sum/n. min/max are insert-only
  * mergeable: a deletion would need the full group re-scanned (the
  * standard IVM caveat), which matches the engine's append-only
  * ingest model (SCD2 closes versions, never removes rows).
  *
  * Scale: the state is ≤ |distinct keys| rows, partitioned by its
  * grouping key; absorbing a batch costs one map-side-combined
  * aggregation of the batch (≤ |keys| rows out) plus a state-sized
  * keyed merge. History size never appears in the plan — the property
  * that makes a 100 TB fact table maintainable.
  */
object IncrementalAgg {

  /** The mergeable summary of `rows` grouped by `keys`: row count
    * `n`, `sum_<c>` as DECIMAL(38,2) (exact, engine-portable — the
    * repo's money discipline, widened so persisted and re-merged
    * states share one schema), `min_<c>`/`max_<c>` native-typed. */
  def aggState(rows: DataFrame, keys: Seq[String], sumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      (count(lit(1)).as("n") +:
        sumCols.map(c => sum(col(c).cast("decimal(18,2)"))
          .cast("decimal(38,2)").as(s"sum_$c"))) ++
        minCols.map(c => min(col(c)).as(s"min_$c")) ++
        maxCols.map(c => max(col(c)).as(s"max_$c"))
    rows.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** MERGE of summary frames produced by [[aggState]] with the same
    * shape: union + one keyed re-aggregate. Exact: merge(aggState(A),
    * aggState(B)) ≡ aggState(A ∪ B) for any split (spec-pinned). */
  def mergeState(states: Seq[DataFrame], keys: Seq[String],
      sumCols: Seq[String], minCols: Seq[String],
      maxCols: Seq[String]): DataFrame = {
    require(states.nonEmpty)
    val all = states.reduce(_ unionByName _)
    val aggs: Seq[Column] =
      (sum(col("n")).as("n") +:
        sumCols.map(c => sum(col(s"sum_$c"))
          .cast("decimal(38,2)").as(s"sum_$c"))) ++
        minCols.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
        maxCols.map(c => max(col(s"max_$c")).as(s"max_$c"))
    all.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
