package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** JSON-Lines source with malformed-row capture — the S1/S2 contract
  * (typed scan + dead-letter split) for the format training corpora
  * actually ship in (one JSON document per line: The Pile, Dolma, RedPajama,
  * every HuggingFace `jsonl.zst` dump). Spark's native json reader
  * does the heavy lifting (distributed line-splittable scan, typed
  * projection pushdown into the parse); this wrapper pins the
  * PERMISSIVE + corrupt-record-column configuration and splits the
  * result the way [[CsvSource.read]] does, so a pipeline routes
  * rejects-with-raw-line without a second scan.
  */
object JsonlSource {

  case class JsonlRead(clean: DataFrame, rejected: DataFrame)

  private val BadCol = "_graft_bad_record"

  /** Scan `path` as JSONL against an explicit `schema` (never infer in
    * a pipeline: inference costs an extra pass and a corrupt first
    * block can silently retype a column). Returns every input line:
    * parsed rows carry null `_graft_bad_record`; unparseable lines
    * carry the raw line there with all schema columns null. */
  def readAll(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(BadCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", BadCol)
      .json(path)

  /** [[readAll]] split into (clean typed rows, rejected raw lines
    * with provenance) — the [[CsvSource.read]] dead-letter contract
    * for JSONL. The scan is cached: both splits come from one pass,
    * and Spark refuses to filter a raw-file scan whose only
    * referenced column is the corrupt record
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    * cache is its documented resolution, same as the CSV source. */
  def read(spark: SparkSession, path: String, schema: StructType): JsonlRead = {
    val all = readAll(spark, path, schema).cache()
    JsonlRead(
      clean = all.filter(col(BadCol).isNull).drop(BadCol),
      rejected = all.filter(col(BadCol).isNotNull)
        .select(col(BadCol).as("raw_record"),
          org.apache.spark.sql.functions.lit(path).as("source_path"),
          org.apache.spark.sql.functions.lit("malformed_jsonl")
            .as("reject_reason")))
  }
}
