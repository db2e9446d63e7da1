package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Harness-side access to one `private[sql]` seam.
  *
  * A finished streaming query does NOT release its state stores: the
  * process-wide `StateStore.loadedProviders` cache keeps every
  * provider — and the in-memory version maps the HDFS-backed provider
  * retains — loaded until the maintenance thread decides otherwise,
  * which for this suite's fresh-checkpoint-per-trial queries is never
  * (nothing ever reuses a finished trial's checkpoint). Across ~14
  * streaming entries × trials that is a monotone driver-heap leak the
  * per-entry `clearCache + GC` cannot touch; it surfaced as multi-second
  * GC walls billed to whichever entry triggered collection (r17:
  * llm_stream_quality logged 4.5-7.5 s gc_ms per 3.4 s trial, and the
  * untouched pure-map llm_quality_filter read 10.4 s in-suite vs 2.9 s
  * isolated). `unloadAll()` closes and drops every cached provider —
  * safe between entries because providers reload on demand from their
  * checkpoint, and no entry resumes another trial's checkpoint.
  */
object StreamInternals {
  def unloadStateStores(): Unit = StateStore.unloadAll()
}
