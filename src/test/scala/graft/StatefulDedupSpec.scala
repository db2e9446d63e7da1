package graft

import graft.streaming.StatefulDedup
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stateful streaming dedup: first occurrence of each content hash wins
  * across micro-batches (flatMapGroupsWithState keyed by content hash).
  */
class StatefulDedupSpec extends SparkSpec {
  import spark.implicits._

  test("first-seen dedup drops duplicates within and across micro-batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = Files.createTempDirectory("graft_sd").toString
    val q = StatefulDedup.firstSeen(input.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sd_out")
      .outputMode("append").option("checkpointLocation", ckpt)
      .start()

    input.addData((1L, "aaa"), (2L, "bbb"), (3L, "aaa")) // in-batch dup: 3
    q.processAllAvailable()
    input.addData((4L, "aaa"), (5L, "ccc")) // cross-batch dup: 4
    q.processAllAvailable()
    q.stop()

    val admitted = spark.table("sd_out").collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(admitted == Set(1L, 2L, 5L))
  }
}
