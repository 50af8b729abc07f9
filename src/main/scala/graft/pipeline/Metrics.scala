package graft.pipeline

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** A2 counters as engine infrastructure (SURVEY.md §2.4: the
  * reference's `cursor.rowcount` insert/update logging →
  * `QueryExecutionListener`): every completed action is recorded with
  * its output row count (from the executed plan's SQL metrics) and
  * wall time, without touching the queries themselves — the listener
  * runs driver-side on already-aggregated metrics, nothing is
  * collected from executors beyond what Spark ships anyway.
  */
final class MetricsListener extends QueryExecutionListener {

  case class ActionMetric(action: String, outputRows: Option[Long],
      wallNanos: Long, failed: Boolean)

  private val log = new ConcurrentLinkedQueue[ActionMetric]()

  private def outputRows(qe: QueryExecution): Option[Long] =
    qe.executedPlan.metrics.get("numOutputRows").map(_.value)

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    log.add(ActionMetric(funcName, outputRows(qe), durationNs, failed = false))

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    log.add(ActionMetric(funcName, None, 0L, failed = true))

  def metrics: Seq[ActionMetric] = log.asScala.toSeq
  def clear(): Unit = log.clear()
}

object MetricsListener {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
