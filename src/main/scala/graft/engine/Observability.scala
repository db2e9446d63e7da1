package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** §2.7: observability counters — the reference exports
  * received/sent/failed/ignored sample counters at /metrics
  * (reference: main.go:77-113, clickhouse/client.go:70-82).
  *
  * Spark-native translation: `df.observe` metrics ride the existing job
  * (zero extra pass — an accumulator-backed aggregate evaluated as rows
  * flow), surfaced per micro-batch through StreamingQueryProgress;
  * sent/failed per sink come from FanOut outcomes. `prometheusText`
  * re-exports everything in the Prometheus exposition format the
  * reference serves.
  */
object Observability {

  val IngestMetricsName = "graft_ingest"

  private def ingestMetricExprs(valueCol: String) = Seq(
    count(lit(1)).as("received_samples_total"),
    sum(when(isnan(col(valueCol)) ||
      col(valueCol) === Double.PositiveInfinity ||
      col(valueCol) === Double.NegativeInfinity, 1L).otherwise(0L))
      .as("ignored_samples_total"))

  /** Attach received/ignored counters to the flat sample stream — count
    * BEFORE the F1 filter drops non-finite values, exactly where the
    * reference increments receivedSamples (main.go:309) and
    * ignored_samples_total (clickhouse/client.go:137-141).
    */
  def observedIngest(flat: DataFrame, valueCol: String = "value"): DataFrame = {
    val m = ingestMetricExprs(valueCol)
    flat.observe(IngestMetricsName, m.head, m.tail: _*)
  }

  /** Batch variant: same counters bound to an [[org.apache.spark.sql.Observation]]
    * handle, readable after the first action (streaming reads them from
    * StreamingQueryProgress instead).
    */
  def observedIngest(flat: DataFrame, obs: org.apache.spark.sql.Observation,
                     valueCol: String): DataFrame = {
    val m = ingestMetricExprs(valueCol)
    flat.observe(obs, m.head, m.tail: _*)
  }

  case class IngestStats(received: Long, ignored: Long)

  /** Sum the observed ingest counters across a streaming query's
    * progress history (one entry per micro-batch).
    */
  def ingestStats(q: StreamingQuery): IngestStats = {
    val rows = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get(IngestMetricsName)))
    IngestStats(
      rows.map(r => Option(r.getAs[Long]("received_samples_total")).getOrElse(0L)).sum,
      rows.map(r => Option(r.getAs[Long]("ignored_samples_total")).getOrElse(0L)).sum)
  }

  /** Prometheus text exposition of the engine's counters ≙ the /metrics
    * surface (reference: main.go:77-117). Labels rendered sorted for a
    * deterministic body.
    */
  def prometheusText(counters: Seq[(String, Map[String, String], Long)]): String =
    counters.map { case (name, labels, v) =>
      val lbl =
        if (labels.isEmpty) ""
        else labels.toSeq.sorted
          .map { case (k, lv) => s"""$k="$lv"""" }
          .mkString("{", ",", "}")
      s"$name$lbl $v"
    }.mkString("", "\n", "\n")

  /** FanOut outcomes → the reference's per-remote sent/failed counters
    * (main.go:396-406).
    */
  def fanOutCounters(outcomes: Seq[graft.sinks.FanOut.SinkOutcome])
  : Seq[(String, Map[String, String], Long)] =
    outcomes.flatMap { o =>
      Seq(
        ("sent_samples_total", Map("remote" -> o.sink), o.sent),
        ("failed_samples_total", Map("remote" -> o.sink), o.failed))
    }

  /** sent_batch_duration_seconds ≙ prometheus.DefBuckets histogram
    * (reference: main.go:104-113, observed at main.go:399). Thread-safe
    * cumulative-bucket accumulator + text exposition.
    */
  final class DurationHistogram {
    private val buckets =
      Array(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)
    private val counts = new Array[Long](buckets.length + 1) // last = +Inf
    private var sum = 0.0
    private var n = 0L

    def observe(seconds: Double): Unit = synchronized {
      var i = 0
      while (i < buckets.length && seconds > buckets(i)) i += 1
      counts(i) += 1
      sum += seconds
      n += 1
    }

    /** Prometheus histogram exposition: cumulative `_bucket` lines,
      * `_sum`, `_count`. Labels are rendered sorted like the counters.
      */
    def text(name: String, labels: Map[String, String]): String = {
      def lbl(extra: (String, String)*): String = {
        val all = (labels.toSeq ++ extra).sorted
        if (all.isEmpty) ""
        else all.map { case (k, v) => s"""$k="$v"""" }.mkString("{", ",", "}")
      }
      val cumulative = counts.scanLeft(0L)(_ + _).drop(1)
      val bucketLines = buckets.zip(cumulative).map { case (le, c) =>
        s"${name}_bucket${lbl("le" -> le.toString)} $c"
      } :+ s"${name}_bucket${lbl("le" -> "+Inf")} $n"
      (bucketLines :+ s"${name}_sum${lbl()} $sum" :+ s"${name}_count${lbl()} $n")
        .mkString("", "\n", "\n")
    }
  }
}
