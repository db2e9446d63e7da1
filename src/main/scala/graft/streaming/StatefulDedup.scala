package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming exact-dedup: admit a document only the FIRST time
  * its content hash is seen across the whole stream's lifetime — the
  * streaming form of `Dedup.exactGroups` for continuously-arriving
  * training data.
  *
  * State design for scale: the stream is grouped by content hash, so
  * state lives per distinct content (not per document); each group's
  * state is ONE boolean flag (seen). Spark partitions state by the group
  * key across executors and checkpoints it, so the dedup survives
  * restarts and grows with corpus *novelty*, not corpus size. A real
  * deployment bounds state with `GroupStateTimeout` eviction (accepting
  * re-admission of content unseen for the timeout window); this uses
  * NoTimeout — the keep-forever policy — deliberately: a timeout mode
  * makes the engine schedule continuous timeout-evaluation micro-batches
  * even when no timeout is ever registered.
  */
object StatefulDedup {

  case class Doc(content_hash: String, doc_id: Long, text: String)

  /** First occurrence of each content hash wins; later arrivals (same or
    * later micro-batch) are dropped. Emits admitted docs.
    */
  def firstSeen(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(md5(col(textCol)).as("content_hash"),
        col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[Doc]
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[Boolean, Doc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // within one batch, the smallest doc_id is the canonical copy
            val first = rows.minBy(_.doc_id)
            Iterator.single(first)
          }
      }
  }

  case class TsDoc(content_hash: String, doc_id: Long, text: String,
                   ts: java.sql.Timestamp)

  /** BOUNDED-state [[firstSeen]]: per-hash state is evicted once the
    * EVENT-TIME watermark passes the admitted occurrence's timestamp +
    * `ttl` — the production answer to the keep-forever policy's unbounded
    * state growth (at crawl scale, state = all content ever seen; with a
    * TTL, state = content seen in the sliding recency window, a constant
    * for a steady-state crawl). The accepted trade is documented
    * re-admission: content unseen for `ttl` of event time dedups afresh.
    *
    * Event-time (not processing-time) timeout keeps the semantics a pure
    * function of the DATA — replaying the same files through the same
    * watermark schedule admits the same documents, which is what makes
    * the contract testable and the pipeline reproducible. The watermark
    * on `tsCol` is applied HERE (`watermarkDelay`), after the
    * projection — a caller's upstream watermark would be severed by the
    * column rewrite, and event-time timeout without a live watermark is
    * an analysis error. Eviction happens at the first micro-batch whose
    * watermark exceeds the deadline.
    */
  def firstSeenWithTtl(docs: DataFrame, ttl: String,
                       watermarkDelay: String = "0 seconds",
                       textCol: String = "text", idCol: String = "doc_id",
                       tsCol: String = "ts"): Dataset[TsDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ttlMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
    // a month has no fixed millisecond length; silently dropping it would
    // turn "1 month" into a zero TTL (every duplicate re-admitted)
    require(ttlMs.months == 0,
      s"ttl '$ttl' uses months — specify the TTL in days or smaller units")
    val ttlMillis = ttlMs.days * 86400000L + ttlMs.microseconds / 1000L
    require(ttlMillis > 0, s"ttl '$ttl' must be positive")
    docs
      .select(md5(col(textCol)).as("content_hash"),
        col(idCol).cast("long").as("doc_id"), col(textCol).as("text"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[TsDoc]
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[Long, TsDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, _, state: GroupState[Long]) if state.hasTimedOut =>
          state.remove()
          Iterator.empty
        case (_, rows, state: GroupState[Long]) =>
          // data is processed BEFORE timeouts within a batch, so a
          // re-arrival in the very batch whose watermark passed the
          // deadline still sees the stale state — treat it as expired
          // here (re-admit), and never register a deadline at or below
          // the watermark (GroupState rejects that with an exception
          // that would kill the whole query)
          val wm = state.getCurrentWatermarkMs()
          val live = state.exists && state.get + ttlMillis > wm
          if (live) {
            // every invocation CLEARS the group's registered timeout
            // (GroupState contract) — re-arm the original deadline here,
            // or a hash that keeps arriving would never be evicted and
            // the drop path would silently revert to keep-forever state
            state.setTimeoutTimestamp(state.get + ttlMillis)
            Iterator.empty
          } else {
            val first = rows.minBy(d => (d.ts.getTime, d.doc_id))
            state.update(first.ts.getTime)
            state.setTimeoutTimestamp(
              math.max(first.ts.getTime + ttlMillis, wm + 1))
            Iterator.single(first)
          }
      }
  }
}
