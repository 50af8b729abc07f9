package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Temporal
import graft.pipeline.ImportPipeline

/** Streaming SCD2 ingest — the reference's incremental temporal merge
  * (README.md:28 "second and later runs are incremental";
  * bagh/batch.py:111-131) re-expressed as a Structured Streaming sink.
  *
  * Shape: `readStream` (any source) → `foreachBatch`: per micro-batch
  * validate → `mergeScd2` against the live snapshot → atomic
  * snapshot-dir commit (write + pointer swap, §7.4.3). Correctness
  * under replay: foreachBatch may re-deliver an epoch after failure,
  * and `mergeScd2` is idempotent (property-tested in PropertySpec), so
  * re-merging the same batch leaves the snapshot unchanged — the sink
  * is effectively exactly-once without a transactional store.
  *
  * Scale: the merge is one full-outer join keyed on `idCol` per
  * micro-batch (broadcast the batch side when small); the snapshot
  * rewrite is the cost — at 100 TB the same operator lands on a table
  * format with real MERGE, but the plan shape is identical.
  */
object StreamingIngest {

  /** The committed snapshot, if any commit has happened yet. */
  def currentSnapshot(spark: SparkSession, snapshotDir: String): Option[DataFrame] =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(snapshotDir)))
      Some(spark.read.parquet(snapshotDir))
    else None

  /** Start the ingest. `validateBatch` is the fail-fast gate (reference
    * abort semantics: throwing fails the streaming query BEFORE any
    * mutation of the snapshot — e.g. pass
    * `b => require(Temporal.duplicateOpenVersions(b).isEmpty, ...)`).
    * Deltas are partial by nature, so the batch pipeline's deleted-row
    * audit intentionally does NOT apply here. */
  def scd2Ingest(stream: DataFrame, idCol: String, snapshotDir: String,
      checkpointDir: String,
      validateBatch: DataFrame => Unit = _ => ()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.{col, max, struct}
        // in-batch dedup: at most one staged row per id per epoch.
        // DETERMINISTIC pick: dropDuplicates keeps whichever row a
        // partition delivers first, so a foreachBatch replay of the
        // same epoch could commit a different survivor for conflicting
        // same-id payloads. Taking max over the payload struct is a
        // total order on row content (lexicographic over the non-key
        // columns) — the same survivor wins on every replay regardless
        // of partitioning or scheduling.
        val others = batch.columns.filterNot(_ == idCol)
        val staged = batch.groupBy(col(idCol))
          .agg(max(struct(others.toSeq.map(col): _*)).as("__row"))
          .select(batch.columns.toSeq.map(c =>
            if (c == idCol) col(c) else col(s"__row.`$c`").as(c)): _*)
          .cache()
        try {
          validateBatch(staged)
          val merged = currentSnapshot(spark, snapshotDir) match {
            case Some(live) => Temporal.mergeScd2(live, staged, idCol)
            case None => staged.toDF()
          }
          ImportPipeline.commitSnapshot(merged, snapshotDir)
        } finally staged.unpersist()
      }
      .start()
}
