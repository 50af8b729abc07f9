package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.geo.geofunctions
import graft.sources.CsvSource

/** S3 WKT-file scan and S7 JDBC sink/source parity (embedded Derby —
  * the closest local stand-in for the reference's Postgres sink). */
class SinkSpec extends SparkSuite {
  import spark.implicits._

  test("S3: |-delimited (id, WKT) file scan + parse expression") {
    val dir = Files.createTempDirectory("graftwkt")
    val lines = Seq(
      "G1|POLYGON ((0 0, 4 0, 4 4, 0 0))",
      "G2|POINT (1 2)",
      "G3|not wkt at all")
    Files.write(dir.resolve("geo.txt"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val df = CsvSource.readWktFile(spark, dir.resolve("geo.txt").toString)
      .withColumn("gtype", geofunctions.st_geometrytype($"wkt"))
    val out = df.select($"id", $"gtype").as[(String, String)]
      .collect().toMap
    assert(out == Map("G1" -> "POLYGON", "G2" -> "POINT", "G3" -> null))
  }

  test("S7: JDBC batched-append sink + read-back (embedded Derby)") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .limit(200)
    orders.write.mode("append")
      .option("batchsize", "50") // reference BATCH_SIZE shape (batch/batch.py:7)
      .jdbc(url, "graft_orders", props)
    val back = spark.read.jdbc(url, "graft_orders", props)
    assert(back.count() == 200)
    assert(back.agg(sum($"o_orderkey")).head().getLong(0) ==
      orders.agg(sum($"o_orderkey")).head().getLong(0))
    // append twice = 400 rows (sink is append, dedup is the merge's job)
    orders.write.mode("append").jdbc(url, "graft_orders", props)
    assert(spark.read.jdbc(url, "graft_orders", props).count() == 400)
  }
}
