package graft
import org.apache.spark.sql.SparkSession

/** Scratch exploration main — not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    import org.apache.spark.sql.functions._
    val fixed = ev.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    fixed.printSchema()
    fixed.show(3, false)
  }
}
