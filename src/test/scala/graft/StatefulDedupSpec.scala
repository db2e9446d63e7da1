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

  test("TTL dedup evicts state once the watermark passes ts+ttl and " +
       "re-admits; inside the window it still dedups") {
    implicit val ctx = spark.sqlContext
    import java.sql.Timestamp
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val input = MemoryStream[(Long, String, Timestamp)]
    val ckpt = Files.createTempDirectory("graft_sdttl").toString
    val src = input.toDF.toDF("doc_id", "text", "ts")
    val q = StatefulDedup.firstSeenWithTtl(src, ttl = "10 minutes")
      .writeStream.format("memory").queryName("sdttl_out")
      .outputMode("append").option("checkpointLocation", ckpt)
      .start()

    input.addData((1L, "aaa", t(0)), (2L, "bbb", t(0)))
    q.processAllAvailable()
    // inside the window (watermark ~10:05 < 10:00+10min): still a dup
    input.addData((3L, "aaa", t(5)))
    q.processAllAvailable()
    // watermark jumps past 10:10 -> "aaa" state evicted, re-admitted;
    // "bbb" deadline also passed, its re-arrival re-admits too
    input.addData((4L, "zzz", t(30)))
    q.processAllAvailable()
    input.addData((5L, "aaa", t(31)), (6L, "bbb", t(31)))
    q.processAllAvailable()
    q.stop()

    val admitted = spark.table("sdttl_out").collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(admitted == Set(1L, 2L, 4L, 5L, 6L))
  }

  test("TTL dedup survives a duplicate arriving in the same batch that " +
       "pushes the watermark past its deadline (no verbatim re-arm of a " +
       "stale deadline)") {
    implicit val ctx = spark.sqlContext
    import java.sql.Timestamp
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val input = MemoryStream[(Long, String, Timestamp)]
    val ckpt = Files.createTempDirectory("graft_sdrearm").toString
    val q = StatefulDedup.firstSeenWithTtl(
        input.toDF.toDF("doc_id", "text", "ts"), ttl = "10 minutes")
      .writeStream.format("memory").queryName("sdrearm_out")
      .outputMode("append").option("checkpointLocation", ckpt)
      .start()
    input.addData((1L, "eee", t(0))) // deadline 10:10
    q.processAllAvailable()
    // one batch whose rows BOTH advance the watermark far past the
    // deadline and re-present the hash — the data path sees stale state
    // while the deadline is behind the advancing watermark; the expired
    // check + forward clamp must keep the query alive
    input.addData((2L, "adv", t(40)), (3L, "eee", t(41)))
    q.processAllAvailable()
    // and once the state is definitely evicted, the hash re-admits
    input.addData((4L, "eee", t(42)))
    q.processAllAvailable()
    q.stop()
    val admitted = spark.table("sdrearm_out").collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    // 1 admitted; 2 admitted (new hash); exactly ONE of 3/4 re-admits
    // depending on whether eviction lands before or after 3's batch —
    // both orders are correct TTL semantics; dying is the bug
    assert(admitted.contains(1L) && admitted.contains(2L))
    assert(admitted.contains(3L) || admitted.contains(4L))
  }
}
