package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** DELTA→CUMULATIVE temporality conversion — the opt-in bridge for OTel
  * SDKs exporting delta sums/histograms (the Prometheus 3.x OTLP
  * receiver's otlp-deltatocumulative feature, re-expressed Spark-first).
  * A delta point carries the INCREMENT since the previous export; the
  * store's canonical samples are counter LEVELS — the conversion is a
  * per-series running sum with staleness-bounded state:
  *
  *   - per series, points accumulate in time order:
  *     cumulative(tᵢ) = Σ delta(t≤ᵢ) within the series' current run;
  *   - RESET ON GAP: a point arriving more than `maxStaleMs` after the
  *     series' previous point starts a fresh run at its own delta value
  *     (the receiver drops idle state after max_stale; downstream PromQL
  *     reads the level drop as an ordinary counter reset);
  *   - an out-of-order point (ts ≤ the series' last seen ts) is DROPPED,
  *     the receiver rule — summing it would corrupt every later level.
  *
  * Two equivalent forms, one contract ([[StreamingRate]]'s discipline
  * inverted — that op differentiates cumulative levels, this one
  * integrates deltas):
  *
  *   - [[statefulCumulate]]: Structured Streaming, one (ts, runningSum)
  *     pair of keyed state per live series — constant-size, partitioned
  *     by series key across executors, checkpointed. The 100 TB path:
  *     state never scales with history, only with live cardinality.
  *   - [[convertBatch]]: the batch twin over at-rest deltas — gap-break
  *     islands via lag(), running sum per island. Replay/backfill tool
  *     and the oracle the streaming form must match.
  */
object DeltaToCumulative {

  /** One flat delta sample: `series` is the full sorted `k=v` label
    * join (the series identity), `ts` epoch milliseconds, `value` the
    * interval increment.
    */
  case class In(series: String, ts: Long, value: Double)
  case class RunState(lastTs: Long, running: Double)
  case class Out(series: String, ts: Long, value: Double)

  /** Streaming form: per-series keyed state across micro-batches, with
    * an EventTimeTimeout TTL so state tracks LIVE cardinality, not
    * all-time: each update arms a timeout `maxStaleMs` past the
    * series' own last event time (never at or below the watermark —
    * GroupState rejects that), and a fired timeout removes the state.
    * Semantics are unchanged by eviction: a post-gap point restarts
    * the run either way, and the eviction deadline is PER SERIES (its
    * own lastTs), so a live-but-lagging exporter never loses its run
    * to another series' clock — the watermark only gates when a silent
    * series' state may be dropped. Duplicate timestamps within a
    * series keep the smallest value (deterministic tiebreak shared
    * with [[convertBatch]]); later same-ts points drop as out-of-order.
    */
  def statefulCumulate(deltas: DataFrame, maxStaleMs: Long): Dataset[Out] = {
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas
      .withColumn("_ets", timestamp_millis(col("ts")))
      .withWatermark("_ets", s"$maxStaleMs milliseconds")
      .as[In]
      .groupByKey(_.series)
      .flatMapGroupsWithState[RunState, Out](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, _, state: GroupState[RunState]) if state.hasTimedOut =>
          state.remove()
          Iterator.empty
        case (series, rows, state: GroupState[RunState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts, r.value))
          var st = state.getOption
          val out = Seq.newBuilder[Out]
          sorted.foreach { r =>
            st match {
              case Some(s) if r.ts <= s.lastTs => // out-of-order: drop
              case Some(s) if r.ts - s.lastTs <= maxStaleMs =>
                val run = s.running + r.value
                st = Some(RunState(r.ts, run))
                out += Out(series, r.ts, run)
              case _ => // fresh series or stale gap: restart the run
                st = Some(RunState(r.ts, r.value))
                out += Out(series, r.ts, r.value)
            }
          }
          st.foreach { s =>
            state.update(s)
            // every invocation clears the registered timeout — re-arm
            // the series' own staleness deadline each time
            state.setTimeoutTimestamp(math.max(s.lastTs + maxStaleMs,
              state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }

  /** One flat delta EXP-HISTOGRAM sample: per-interval increments of
    * the count/sum/zero companions and the sparse positive buckets
    * (OTLP/native index → increment). The conversion twins below apply
    * the scalar state rules PER BUCKET under one series-level run.
    */
  case class HistIn(series: String, ts: Long, count: Long, sum: Double,
                    zero: Long, buckets: Map[Int, Long])
  case class HistRunState(lastTs: Long, count: Long, sum: Double,
                          zero: Long, buckets: Map[Int, Long])
  case class HistOut(series: String, ts: Long, count: Long, sum: Double,
                     zero: Long, buckets: Map[Int, Long])

  /** [[statefulCumulate]]'s exponential-histogram twin: the identical
    * keyed-state discipline (gap reset, out-of-order drop, per-series
    * EventTimeTimeout eviction), with the running value a sparse bucket
    * map merged per point instead of one double. Duplicate timestamps
    * keep the smallest (count, sum) — [[convertBatchExpHist]]'s rule.
    */
  def statefulCumulateExpHist(deltas: DataFrame,
                              maxStaleMs: Long): Dataset[HistOut] = {
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas
      .withColumn("_ets", timestamp_millis(col("ts")))
      .withWatermark("_ets", s"$maxStaleMs milliseconds")
      .as[HistIn]
      .groupByKey(_.series)
      .flatMapGroupsWithState[HistRunState, HistOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, _, state: GroupState[HistRunState]) if state.hasTimedOut =>
          state.remove()
          Iterator.empty
        case (series, rows, state: GroupState[HistRunState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts, r.count, r.sum))
          var st = state.getOption
          val out = Seq.newBuilder[HistOut]
          sorted.foreach { r =>
            st match {
              case Some(s) if r.ts <= s.lastTs => // out-of-order: drop
              case Some(s) if r.ts - s.lastTs <= maxStaleMs =>
                val merged = r.buckets.foldLeft(s.buckets) {
                  case (acc, (i, c)) =>
                    acc + (i -> (acc.getOrElse(i, 0L) + c))
                }
                val n = HistRunState(r.ts, s.count + r.count,
                  s.sum + r.sum, s.zero + r.zero, merged)
                st = Some(n)
                out += HistOut(series, r.ts, n.count, n.sum, n.zero,
                  n.buckets)
              case _ => // fresh series or stale gap: restart the run
                st = Some(HistRunState(r.ts, r.count, r.sum, r.zero,
                  r.buckets))
                out += HistOut(series, r.ts, r.count, r.sum, r.zero,
                  r.buckets)
            }
          }
          st.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(math.max(s.lastTs + maxStaleMs,
              state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }

  /** [[convertBatch]]'s exponential-histogram twin over columns
    * (series, ts, count, sum, zero, buckets map<int,long>): islands
    * from the series-level gap rule, then running sums of the scalar
    * companions and a map_zip_with fold of the bucket maps per island.
    */
  def convertBatchExpHist(deltas: DataFrame,
                          maxStaleMs: Long): DataFrame = {
    val wOrd = Window.partitionBy(col("series")).orderBy(col("ts").asc)
    val base = deltas
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("series"), col("ts"))
          .orderBy(col("count").asc, col("sum").asc)))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("_gap", col("ts") - lag(col("ts"), 1).over(wOrd))
      .withColumn("_isl", sum(when(col("_gap").isNull ||
        col("_gap") > maxStaleMs, 1L).otherwise(0L)).over(wOrd))
    val wRun = Window.partitionBy(col("series"), col("_isl"))
      .orderBy(col("ts").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val maps = collect_list(col("buckets")).over(wRun)
    base.select(col("series"), col("ts"),
      sum(col("count")).over(wRun).as("count"),
      sum(col("sum")).over(wRun).as("sum"),
      sum(col("zero")).over(wRun).as("zero"),
      aggregate(slice(maps, lit(2), greatest(size(maps) - 1, lit(0))),
        element_at(maps, 1),
        (acc, mm) => map_zip_with(acc, mm, (_, a, b) =>
          coalesce(a, lit(0L)) + coalesce(b, lit(0L)))).as("buckets"))
  }

  /** Batch twin over columns (series, ts, value): same contract, window
    * functions instead of keyed state. Islands break where the gap to
    * the previous point exceeds `maxStaleMs`; the running sum restarts
    * per island. Duplicate-ts points within a series keep the SMALLEST
    * value — a deterministic tiebreak shared with the streaming form
    * (later ones are out-of-order by the streaming rule).
    */
  def convertBatch(deltas: DataFrame, maxStaleMs: Long): DataFrame = {
    val wOrd = Window.partitionBy(col("series")).orderBy(col("ts").asc)
    deltas
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("series"), col("ts"))
          .orderBy(col("value").asc)))
      .filter(col("_rn") === 1)
      .withColumn("_gap", col("ts") - lag(col("ts"), 1).over(wOrd))
      .withColumn("_isl", sum(when(col("_gap").isNull ||
        col("_gap") > maxStaleMs, 1L).otherwise(0L)).over(wOrd))
      .withColumn("value", sum(col("value")).over(
        Window.partitionBy(col("series"), col("_isl"))
          .orderBy(col("ts").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("series"), col("ts"), col("value"))
  }
}
