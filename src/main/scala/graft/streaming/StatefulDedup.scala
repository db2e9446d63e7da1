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
}
