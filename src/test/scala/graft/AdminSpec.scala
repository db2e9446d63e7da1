package graft

import graft.engine.Admin
import java.nio.file.{Files, Paths}

/** Partition-level admin file ops: retention boundary, snapshot links. */
class AdminSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def mkStore(): String = {
    val table = Files.createTempDirectory("graft_adm_spec").toString + "/m"
    Seq(
      ("m", Seq("__name__=m"), 1.0, 86400L * 19723),      // 2024-01-01
      ("m", Seq("__name__=m"), 2.0, 86400L * 19724),      // 2024-01-02
      ("m", Seq("__name__=m"), 3.0, 86400L * 19725)       // 2024-01-03
    ).toDF("name", "tags", "val", "ts")
      .select(to_date(timestamp_seconds(col("ts"))).as("date"),
        col("name"), col("tags"), col("val"),
        timestamp_seconds(col("ts")).as("ts"),
        timestamp_seconds(col("ts")).as("updated"))
      .write.partitionBy("date").parquet(table)
    table
  }

  test("retention drops a partition only when its END crosses the horizon") {
    val table = mkStore()
    val jan3 = 86400L * 19725
    // horizon exactly at 2024-01-02T00:00: only Jan01 (end = Jan02) drops
    val s1 = Admin.enforceRetention(table, retentionSec = 86400L,
      nowSec = jan3 + 86400L - 86400L) // now = Jan03, retention 1d → horizon Jan02
    assert(s1 == Admin.Sweep(1, 2))
    assert(!Files.exists(Paths.get(table, "date=2024-01-01")))
    assert(Files.exists(Paths.get(table, "date=2024-01-02")))
    // nothing else crosses on a repeat sweep
    assert(Admin.enforceRetention(table, 86400L, jan3) ==
      Admin.Sweep(0, 2))
    assert(spark.read.parquet(table).count() == 2)
  }

  test("snapshot hardlinks the store; immutable names; traversal rejected") {
    val table = mkStore()
    val n = Admin.snapshot(table, "s1")
    assert(n > 0)
    val snap = spark.read.parquet(s"${table}_snapshots/s1")
    assert(snap.count() == 3)
    // immutable: the same name refuses
    intercept[IllegalArgumentException](Admin.snapshot(table, "s1"))
    intercept[IllegalArgumentException](Admin.snapshot(table, "../evil"))
    intercept[IllegalArgumentException](Admin.snapshot(table, "a/b"))
    // a later retention sweep must not disturb the snapshot
    Admin.enforceRetention(table, 1L, 86400L * 30000)
    assert(spark.read.parquet(s"${table}_snapshots/s1").count() == 3)
  }
}
