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

  /** The events table, with `ts` surfaced as a microsecond
    * TimestampType regardless of how the driver generated the parquet:
    * TIMESTAMP(NANOS) (which Spark refuses to read natively — handled
    * via the nanosAsLong legacy read + exact integer division) or a
    * native TIMESTAMP/TIMESTAMP_NTZ microsecond column (cast under the
    * UTC session zone, value-preserving). Oracle side mirrors both with
    * `make_timestamp(epoch_ns(ts) // 1000)`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.LongType
    val raw = table(spark, dir, "events")
    val tsExpr = raw.schema("ts").dataType match {
      case LongType => expr("timestamp_micros(ts DIV 1000)") // nanos-as-long
      case _        => expr("CAST(ts AS TIMESTAMP)")         // native micros
    }
    raw.withColumn("ts", tsExpr)
  }

  /** DuckDB view of events with ts truncated to the same microseconds. */
  val eventsSql: String =
    """SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |       user_id, event_type, value, props FROM events""".stripMargin
}
