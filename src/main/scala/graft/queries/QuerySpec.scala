package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan builder over the testdata
  * dir, plus (when SQL-expressible) the equivalent DuckDB oracle SQL.
  * Column names/aliases MUST match between the two — the driver sorts
  * columns by name and hash-compares values. */
case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  /** Read one driver testdata table (TESTDATA.md). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table, with its TIMESTAMP(NANOS) parquet column (which
    * Spark refuses to read natively) surfaced as a microsecond
    * TimestampType via the nanosAsLong legacy read + exact integer
    * division. Oracle side mirrors with
    * `make_timestamp(epoch_ns(ts) // 1000)`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.expr
    table(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  /** DuckDB view of events with ts truncated to the same microseconds. */
  val eventsSql: String =
    """SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |       user_id, event_type, value, props FROM events""".stripMargin
}
