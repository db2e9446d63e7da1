package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** TEMPORARY dev profiler (not part of the driver contract): runs one
  * entry with a listener printing per-job wall times and inter-job gaps,
  * so driver-side time (HTTP round-trips, proto encode, commit protocol)
  * separates from executor time.
  *
  * Usage: runMain graft.Prof <sfDir> <entry> [trials]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val trials = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the shared engine definition — profiles the exact session Bench
    // times (override the AQE floor via SPARK_GRAFT_MIN_PART if a sweep
    // needs it; the old PROF_MIN_PART divergence is gone)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var lastEnd = 0L
    @volatile var enabled = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.headOption.map(si =>
            si.name + " nstages=" + js.stageInfos.size + " ntasks=" +
              js.stageInfos.map(_.numTasks).sum))
          .getOrElse("?")
        starts.put(js.jobId, (js.time, desc))
        if (enabled && lastEnd > 0) {
          val gap = js.time - lastEnd
          if (gap > 30) println(f"        [gap ${gap}%5d ms before job ${js.jobId}]")
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(je.jobId, (je.time, "?"))
        lastEnd = je.time
        if (enabled)
          println(f"  job ${je.jobId}%4d ${je.time - t0}%6d ms  ${desc.take(120)}")
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        if (enabled && ms > 800) {
          println(f"    SLOW STAGE ${si.stageId} ${ms}%d ms ntasks=${si.numTasks} ${si.name.take(80)}")
          si.rddInfos.take(12).foreach(r =>
            println(s"      rdd ${r.id} ${r.name} scope=${
              r.scope.map(_.toString).getOrElse("-").take(120)} ${
              r.callSite.take(60)}"))
          si.details.split('\n').filter(_.contains("graft")).take(8)
            .foreach(l => println(s"      at $l"))
        }
      }
    })

    // warm up
    SparkEntry.queries("a1_bucket_quantile")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    (1 to trials).foreach { t =>
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      println(s"=== trial $t of $name ===")
      enabled = true
      lastEnd = 0L
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      enabled = false
      println(f"=== trial $t total ${sec}%.3f s ===")
    }
    spark.stop()
  }
}
