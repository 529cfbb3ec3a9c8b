package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Runtime telemetry (SURVEY §2.5): the reference dumps per-chain request
  * counts + wall time at exit (/root/reference/chainservice/chainservice.go:
  * 293-307). Spark-side: a QueryExecutionListener accumulating per-action
  * wall time and output rows, dumpable on demand.
  */
final case class QueryMetric(action: String, durationNs: Long, outputRows: Option[Long])

class MetricsListener extends QueryExecutionListener {
  private val metrics = new ConcurrentLinkedQueue[QueryMetric]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
    metrics.add(QueryMetric(funcName, durationNs, rows))
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    metrics.add(QueryMetric(s"$funcName!${exception.getClass.getSimpleName}", 0L, None))

  def snapshot(): Seq[QueryMetric] = {
    val out = Seq.newBuilder[QueryMetric]
    metrics.forEach(m => out += m)
    out.result()
  }

  /** The reference's exit dump, one line per action. */
  def dump(): String =
    snapshot().map(m =>
      f"${m.action}%-12s ${m.durationNs / 1e9}%8.3f s rows=${m.outputRows.getOrElse(-1L)}")
      .mkString("\n")
}

object Metrics {
  /** Register a fresh listener on the session and return it. */
  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
