package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair (r19 optimization round, guide §2.5 "input
  * skew: one huge unsplittable file — repartition immediately after
  * the read").
  *
  * The driver's testdata tables are single-file parquet with ONE row
  * group each, so a scan — and with it every per-row expression
  * fused above it (md5 sketch lanes, shingling, codec decode,
  * canonicalization) — runs as ONE task regardless of
  * `maxPartitionBytes`: profiled gates showed one 1.0–1.5 s job using
  * one of 32 cores. [[spread]] fans that work out with a round-robin
  * repartition to the context's default parallelism, APPLIED ONLY
  * when the frame's own scan parallelism is below it — at data scale
  * a real input has at least cores-many splits and the call is a
  * no-op, so no production plan gains an exchange (and the shuffled
  * volume, when the call does fire, is bounded by what the too-few
  * splits hold). Row-multiset semantics are untouched; use above
  * per-row work whose operators are order-independent (every exact
  * integer/decimal aggregate in this engine is, by design).
  *
  * Opt-in per call site where per-row CPU dominates bytes — NOT wired
  * into `table()`: a repartition under a gate whose scan work is
  * trivial costs more than it saves (measured; the same reason the
  * ordered-dump rewrite is whitelist-scoped). */
object Scans {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val n =
      try df.rdd.getNumPartitions
      catch { case _: Exception => target }
    if (n < target) df.repartition(target) else df
  }
}
