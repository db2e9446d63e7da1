package org.apache.spark.graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Bench-side access to two `private[spark]` seams.
  *
  * [[TaskMetricsListener]] accumulates the per-task JVM GC time,
  * shuffle read/write bytes and memory/disk spill bytes the status API
  * does not expose per-query; `graft.Bench`'s isolated pass snapshots
  * it around each trial so an inflated wall time carries its own
  * explanation (GC pause vs shuffle volume vs spill vs pure ambient
  * CPU). [[BenchInternals.flushListenerBus]] drains the asynchronous
  * listener bus first, so a snapshot taken right after an action has
  * seen every task-end event of that action — without it, metric
  * deltas bleed between adjacent trials.
  */
final class TaskMetricsListener extends SparkListener {
  private val gcMs = new AtomicLong
  private val shufRead = new AtomicLong
  private val shufWrite = new AtomicLong
  private val spillMem = new AtomicLong
  private val spillDisk = new AtomicLong

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      gcMs.addAndGet(m.jvmGCTime)
      shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spillMem.addAndGet(m.memoryBytesSpilled)
      spillDisk.addAndGet(m.diskBytesSpilled)
    }
  }

  /** (gc_ms, shuffle_read_b, shuffle_write_b, spill_mem_b, spill_disk_b) */
  def snap: Vector[Long] =
    Vector(gcMs.get, shufRead.get, shufWrite.get, spillMem.get,
      spillDisk.get)
}

object BenchInternals {
  /** Block until every queued listener event is delivered (bounded). */
  def flushListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: Throwable => () }
}
