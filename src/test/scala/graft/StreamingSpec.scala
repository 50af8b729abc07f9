package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(ts: Timestamp, user_id: Long, value: Double)

/** §2.9: the tumbling-window aggregation in its readStream form —
  * same plan as q19's batch form, driven through a MemoryStream and the
  * memory sink (spark_guide: processAllAvailable for synchronous local
  * smoke). Streaming result must equal the batch result. */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("streaming tumbling-window counts equal the batch form") {
    implicit val sqlCtx = spark.sqlContext
    val data = (0 until 100).map { i =>
      Ev(Timestamp.valueOf(f"2024-01-01 ${i / 20}%02d:${i % 20}%02d:00"),
        i % 7, i * 1.5)
    }
    val stream = MemoryStream[Ev]
    stream.addData(data)
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .select($"w.start".as("h"), $"n", $"v")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("win_out").orderBy($"h")
      .as[(Timestamp, Long, Double)].collect().toSeq
    val batch = data.toDF()
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .select($"w.start".as("h"), $"n", $"v")
      .orderBy($"h").as[(Timestamp, Long, Double)].collect().toSeq
    assert(streamed == batch)
    assert(streamed.map(_._2).sum == 100)
  }
}
