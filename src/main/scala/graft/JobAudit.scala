package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-count audit behind the shared-GK-bounds SCALE.md row
  * (VERDICT r12 #3 / r13 next #3): runs named gate queries and
  * reports the TOTAL Spark job count per query. The GK
  * `approxQuantile` boundary pass is one job per call, so a chain
  * that shares `EventAnalytics.sliceBoundsFor` bounds across its
  * stages (emd/cvm/driftReport tails, the NonOverlapping
  * expectation) drops exactly the saved passes from this total —
  * run the tool against the pre-sharing tree for the before number
  * (per-job attribution is NOT possible here: under AQE every
  * stage's callsite is the async materialization thunk, so only the
  * total discriminates). Each query runs once UNCOUNTED first
  * (FixtureCache builds would otherwise attribute their jobs to the
  * measured run), then counted; the async listener bus is drained
  * before reading.
  *
  * Usage: JobAudit [sfDir] [namePrefix...] — prints one JSON line
  * per query: {"query":..., "jobs":N}. */
object JobAudit {
  private class JobCounter extends SparkListener {
    val total = new java.util.concurrent.atomic.AtomicInteger(0)
    override def onJobStart(j: SparkListenerJobStart): Unit =
      total.incrementAndGet()
    def reset(): Unit = total.set(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counter = new JobCounter
    spark.sparkContext.addSparkListener(counter)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => names.isEmpty || names.exists(kv._1.startsWith))
      .foreach { case (name, fn) =>
        fn(spark, sfDir).collect() // uncounted warmup (fixtures)
        org.apache.spark.sql.graftshim.GraftShim
          .drainListenerBus(spark.sparkContext)
        counter.reset()
        fn(spark, sfDir).collect()
        org.apache.spark.sql.graftshim.GraftShim
          .drainListenerBus(spark.sparkContext)
        println(s"""{"query":"$name","jobs":${counter.total.get}}""")
      }
    spark.stop()
  }
}
