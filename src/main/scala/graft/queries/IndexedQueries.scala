package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}
import QuerySpec.table

/** Batch 10 (round 8): the materialized-index forms of the flagship
  * incremental operators — incremental dedup over a persisted corpus
  * shingle index (q90) and IVFADC ANN (q91). Each is the 100 TB shape
  * of an operator whose in-query form already has a hash-exact gate:
  * the new query must reproduce the SAME result, so the oracles are
  * shared/derived from the existing ones. */
object IndexedQueries {

  val all: Seq[QuerySpec] = Seq(

    // Incremental dedup against a MATERIALIZED corpus index: the
    // corpus's (doc_id, shingle, n_sh) inverted index + text keyset
    // are built once and checkpointed (standing in for the persisted
    // parquet a real ingest loop keeps), then the q89 batch is deduped
    // against the index — the corpus is never re-shingled in-query.
    // Same inputs as q89 -> must produce the IDENTICAL result, so the
    // oracle is q89's three-stage replay verbatim.
    QuerySpec("q90_dedup_increment_indexed",
      (s, dir) => {
        val corpus = table(s, dir, "documents")
        // localCheckpoint = the local-mode materialization of the
        // persisted index (PlanSpec proves the parquet-backed form
        // reads pure index scans on the corpus side)
        val idx = Dedup.corpusShingleIndex(corpus, "doc_id", "text", k = 3)
          .localCheckpoint()
        val keys = Dedup.corpusTextKeys(corpus, "text").localCheckpoint()
        Dedup.dedupIncrementFullIndexed(idx, keys,
            MlPrepQueries.incrementFullBatch(corpus), "doc_id", "text",
            k = 3, threshold = 0.5)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      MlPrepQueries.all.find(_.name == "q89_dedup_increment_full").get.oracle)
  )
}
