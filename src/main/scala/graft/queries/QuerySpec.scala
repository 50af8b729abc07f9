package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan builder over the testdata
  * dir, plus (when SQL-expressible) the equivalent DuckDB oracle SQL.
  * Column names/aliases MUST match between the two — the driver sorts
  * columns by name and hash-compares values.
  *
  * `rowsOnlyReason` is REQUIRED metadata for any gate registered
  * without an oracle (VERDICT r9 #6: the correctness report's `err
  * no_oracle` rows must carry their own explanation — which hash-exact
  * TWIN gate proves the same logic, and why this form itself cannot be
  * replayed in DuckDB) — Verify emits it beside oracle_sql.json so the
  * report is self-documenting instead of requiring COVERAGE.md
  * archaeology. */
case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    rowsOnlyReason: Option[String] = None) {
  require(oracle.nonEmpty || rowsOnlyReason.nonEmpty,
    s"$name has no oracle and no rowsOnlyReason — a rows-only gate " +
      "must say which twin proves its logic and why it has no oracle")
}

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
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, dir, "events")
    // CLOSED enumeration of accepted physical shapes: the r9 testdata
    // regeneration flipped ts nanos→micros once already (BASELINE.md),
    // and a silent catch-all cast would turn a THIRD variant (strings,
    // doubles, int96 surfacing differently...) into seven queries of
    // ANALYSIS errors or — worse — quietly wrong timestamps. Fail here
    // with the shape in hand instead (VERDICT r9 #7).
    val tsExpr = raw.schema("ts").dataType match {
      case LongType => expr("timestamp_micros(ts DIV 1000)") // nanos-as-long
      case TimestampType | TimestampNTZType =>
        expr("CAST(ts AS TIMESTAMP)")                        // native micros
      case other => throw new IllegalStateException(
        s"events.ts has physical type $other — the loader accepts " +
          "TIMESTAMP(NANOS) (read as long via nanosAsLong) or native " +
          "TIMESTAMP/TIMESTAMP_NTZ micros. The driver testdata shape " +
          "changed again: extend QuerySpec.events (and its DuckDB " +
          "mirror eventsSql) deliberately, don't cast blindly.")
    }
    raw.withColumn("ts", tsExpr)
  }

  /** DuckDB view of events with ts truncated to the same microseconds. */
  val eventsSql: String =
    """SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |       user_id, event_type, value, props FROM events""".stripMargin
}
