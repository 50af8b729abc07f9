package graft

import org.apache.spark.sql.types._
import graft.queries.QuerySpec

/** Driver-testdata shape guard (VERDICT r9 #7): the r9 regeneration
  * changed events.ts physical type under the suite once (nanos →
  * native micros; seven queries would have ANALYSIS-erred without the
  * dual-branch loader). This spec pins the accepted shapes and the
  * loader's behavior on each, so a THIRD variant fails one focused
  * test with a clear message — not a scatter of query failures. */
class TestdataShapeSpec extends SparkSuite {

  test("events.ts physical type is one of the two accepted shapes") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val t = spark.read.parquet(s"$sf0001/events.parquet").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType).contains(t),
      s"events.ts is $t — a NEW testdata shape; extend QuerySpec.events " +
        "and its DuckDB mirror deliberately (see loader scaladoc)")
  }

  test("events loader yields microsecond timestamps on the current data") {
    val df = QuerySpec.events(spark, sf0001)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.selectExpr("count(ts)").head.getLong(0) > 0)
  }

  test("loader rejects an unenumerated shape with an actionable message") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evshape").toString
    Seq((1L, "oops")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { QuerySpec.events(spark, dir) }
    assert(e.getMessage.contains("events.ts has physical type"))
    assert(e.getMessage.contains("QuerySpec.events"))
  }

  test("every driver table is present with its contract key column") {
    val keyOf = Map(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey", "events" -> "event_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id")
    keyOf.foreach { case (tbl, key) =>
      val schema = spark.read.parquet(s"$sf0001/$tbl.parquet").schema
      assert(schema.fieldNames.contains(key),
        s"$tbl.parquet lacks contract column $key (has: ${schema.fieldNames.mkString(",")})")
    }
  }
}
