package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted sweep for the exact-Kendall scale CONTRACT (VERDICT r14
  * #4): `kendallTauExact`'s total work is O(n²/B + n·B), so its
  * 100 TB configuration is B ∝ n for a FIXED cell width c = n/B —
  * cells stay c-sized (per-cell work flat), cell count and lane count
  * grow linearly, total cost grows ∝ n. A fixed-B sweep measures the
  * deliberate n²/B quadratic instead. This main measures BOTH arms
  * against the same synthesized corpus so SCALE.md can carry numbers
  * rather than a promise:
  *
  *   arm A: 1×  data, B = 32   (the q246 gate shape; c₁ = n₁/32)
  *   arm B: f×  data, B = 32·f (B ∝ n — same cell width c₁)
  *   arm C: f×  data, B = 32   (fixed B — cells f× wider, work ∝ n²)
  *
  * Expected: B costs ≈ f× arm A (honest linear), C costs ≈ f²× (the
  * quadratic the contract avoids). Synthesis mirrors ScaleStress's
  * graph-shaped orders copies: o_orderkey offset keeps composite
  * ranks unique across copies, o_orderpriority is untouched so the 5
  * groups absorb f× members — the mega-key shape q246's scale story
  * assumes. Default factor 4 keeps arm C measurable (~16× a ~7 s
  * point); at factor 10 arm C alone would be a ~100× pathology run,
  * demonstrating nothing the 16×-vs-4× contrast doesn't. */
object KendallScale {

  private class ShuffleBytes extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxTaskPeak = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        maxTaskPeak.getAndAccumulate(
          t.taskMetrics.peakExecutionMemory, Math.max(_, _))
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 4
    val synth = if (args.length > 2) args(2) else "/tmp/graft_kendall_scale"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-kendall-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new ShuffleBytes
    spark.sparkContext.addSparkListener(listener)

    val orders = spark.read.parquet(s"$base/orders.parquet")
    (0 until factor).map(i => orders.withColumn("o_orderkey",
        col("o_orderkey") + lit(i.toLong * 12000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$synth/orders.parquet")

    def kendall(dir: String, buckets: Int, tall: Boolean) = {
      val o = spark.read.parquet(s"$dir/orders.parquet").select(
        col("o_orderpriority"), col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("x"),
        datediff(col("o_orderdate"), lit("1970-01-01"))
          .cast("long").as("y"))
      if (tall)
        graft.ops.Profile.kendallTauExactTall(o, "o_orderpriority",
          "o_orderkey", "x", "y", buckets = buckets)
      else
        graft.ops.Profile.kendallTauExact(o, "o_orderpriority",
          "o_orderkey", "x", "y", buckets = buckets)
    }

    // default arms: the gate shape, the (falsified — see SCALE.md
    // round-15) B∝n arm, and fixed-B; override with
    // SPARK_GRAFT_KENDALL_ARMS="1x:8,4x:16T,..." to bracket the
    // optimum (a trailing T = the r16 TALL count-frame form, which
    // is how B > 128 becomes expressible at all)
    val arms = sys.env.get("SPARK_GRAFT_KENDALL_ARMS") match {
      case Some(spec) => spec.split(',').toSeq.map { a =>
        val Array(sc, bs) = a.split(':')
        val tall = bs.endsWith("T")
        val b = (if (tall) bs.dropRight(1) else bs).toInt
        (s"${sc}_B$b${if (tall) "_tall" else ""}",
          if (sc == "1x") base else synth, b, tall)
      }
      case None => Seq(
        ("1x_B32_gate", base, 32, false),
        (s"${factor}x_B${32 * factor}_contract", synth, 32 * factor,
          false),
        (s"${factor}x_B32_fixed_quadratic", synth, 32, false))
    }
    // warm pass (JVM/codegen startup bills to no arm)
    kendall(base, 32, tall = false).queryExecution.toRdd.count()
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    for ((label, dir, b, tall) <- arms) {
      org.apache.spark.sql.graftshim.GraftShim
        .drainListenerBus(spark.sparkContext)
      listener.bytes.set(0L)
      listener.maxTaskPeak.set(0L)
      var n = 0L
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        n = kendall(dir, b, tall).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      org.apache.spark.sql.graftshim.GraftShim
        .drainListenerBus(spark.sparkContext)
      println(String.format(java.util.Locale.ROOT,
        """{"arm":"%s","buckets":%d,"rows":%d,"sec":%.3f,"shuffle_mb":%.1f,"max_task_peak_mb":%.1f,"reps":%d}""",
        label, Int.box(b), Long.box(n),
        Double.box(times(times.length / 2)),
        Double.box(listener.bytes.get / 1e6 / reps),
        Double.box(listener.maxTaskPeak.get / 1e6), Int.box(reps)))
    }
    spark.stop()
  }
}
