package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming counter increase — the PromQL rate pipeline AT
  * INGEST: per series, the reset-adjusted delta of every arriving sample
  * against the series' last seen sample, maintained as keyed streaming
  * state across micro-batches. The streaming twin of
  * [[graft.operators.TimeSeriesOps.counterIncrease]]'s window pass: what
  * the batch form gets from `lag()` over sorted history, the stream gets
  * from ONE (ts, value) pair of state per live series — constant-size,
  * partitioned by series key across executors, checkpointed.
  *
  * Emission is per sample (the adjusted fixed-point delta + reset flag);
  * bucket aggregation composes downstream — batch over the emitted rows
  * here, or a watermarked streaming agg in a deployment. Because each
  * delta is a pure function of (previous sample, this sample) and state
  * hands the previous sample across batch boundaries, the composed
  * result is EXACTLY the batch operator's output when batches arrive in
  * time order — the equality the `ts_stream_rate` entry pins by sharing
  * the batch oracle verbatim. Late (out-of-order ACROSS batches) samples
  * would compute deltas against the newer state — the documented
  * at-ingest trade; stores needing late tolerance run the batch
  * compaction form instead.
  *
  * Arithmetic contract: same as the batch form — the adjusted delta
  * floors onto the 1e-6 grid per sample (IEEE subtract then floor, the
  * exact expressions Spark and DuckDB evaluate), so downstream sums are
  * exact longs.
  */
object StreamingRate {

  case class In(event_type: String, user_id: Long, event_id: Long,
                ts: Long, value: Double)
  case class Last(ts: Long, value: Double)
  case class Out(event_type: String, user_id: Long, ts: Long,
                 adj_fp: Option[Long], reset: Long)

  /** Per-sample reset-adjusted increases over a (event_type, user_id)
    * keyed stream. Input columns must match [[In]].
    */
  def statefulIncrease(samples: DataFrame): Dataset[Out] = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples.as[In]
      .groupByKey(r => (r.event_type, r.user_id))
      .flatMapGroupsWithState[Last, Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((et, uid), rows, state: GroupState[Last]) =>
          // within a batch, replay the batch window's (ts, tie) order
          val sorted = rows.toSeq.sortBy(r => (r.ts, r.event_id))
          var last = state.getOption
          val out = sorted.map { r =>
            val (adj, reset) = last match {
              case None => (None, 0L)
              case Some(l) =>
                val d = r.value - l.value
                if (d >= 0) (Some(math.floor(d * 1000000L).toLong), 0L)
                else (Some(math.floor(r.value * 1000000L).toLong), 1L)
            }
            last = Some(Last(r.ts, r.value))
            Out(et, uid, r.ts, adj, reset)
          }
          last.foreach(state.update)
          out.iterator
      }
  }
}
