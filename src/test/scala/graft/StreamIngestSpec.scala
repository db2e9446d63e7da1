package graft

import graft.codec.Prompb
import graft.codec.Prompb._
import graft.engine.{ReadPipeline, ResponseEdge, WritePipeline}
import graft.streaming.RemoteWriteStream
import java.nio.file.Files

/** S1 streaming ingest + S11 response edge, end-to-end over real bytes. */
class StreamIngestSpec extends SparkSpec {

  private def payload(name: String, samples: Seq[PSample]): Array[Byte] =
    Prompb.snappyCompress(Prompb.encodeWriteRequest(PWriteRequest(Seq(
      PTimeSeries(Seq(PLabel("__name__", name), PLabel("job", "t")), samples)))))

  test("S1: streaming ingest drains payload files into the metrics table") {
    val in = Files.createTempDirectory("graft_in").toString
    val table = Files.createTempDirectory("graft_tbl").toString + "/metrics"
    val ckpt = Files.createTempDirectory("graft_ckpt").toString

    Files.write(java.nio.file.Paths.get(s"$in/b1.bin"),
      payload("m1", Seq(PSample(1.0, 123456789123L), PSample(Double.NaN, 123456789123L))))
    Files.write(java.nio.file.Paths.get(s"$in/b2.bin"),
      payload("m2", Seq(PSample(2.5, 123456790000L))))

    val q = RemoteWriteStream.ingestStream(spark, in, table, ckpt)
    q.awaitTermination()

    // §2.7: received counts the wire samples BEFORE the F1 drop
    val stats = graft.engine.Observability.ingestStats(q)
    assert(stats == graft.engine.Observability.IngestStats(received = 3, ignored = 1))

    val rows = spark.read.parquet(table).collect()
    // NaN dropped (F1), 2 finite samples stored, ts truncated to seconds
    assert(rows.length == 2)
    val m1 = rows.find(_.getAs[String]("name") == "m1").get
    assert(m1.getAs[java.sql.Timestamp]("ts").getTime == 123456789000L)
    assert(m1.getAs[scala.collection.Seq[String]]("tags").toSeq ==
      Seq("__name__=m1", "job=t"))

    // restart with no new files: checkpoint prevents re-ingest
    val q2 = RemoteWriteStream.ingestStream(spark, in, table, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(table).count() == 2)
  }

  test("streaming windowed rollup: tumbling avg per series under a watermark") {
    val in = Files.createTempDirectory("graft_win").toString
    val ckpt = Files.createTempDirectory("graft_wckpt").toString
    // two samples in one 10s window (avg 2.0), one in the next
    Files.write(java.nio.file.Paths.get(s"$in/w.bin"),
      payload("m", Seq(PSample(1.0, 123456780000L), PSample(3.0, 123456783000L),
        PSample(7.0, 123456791000L))))

    val flat = RemoteWriteStream.decodeFlat(
      spark.readStream.format("binaryFile")
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType))))
        .load(in))
    val q = RemoteWriteStream.streamingRollup(flat, 10, "10 minutes")
      .writeStream
      .format("memory")
      .queryName("win_rollup")
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = spark.table("win_rollup").orderBy("bucket_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("val") == 2.0) // avg(1, 3)
    assert(rows(0).getAs[Long]("cnt") == 2L)
    assert(rows(1).getAs[Double]("val") == 7.0)
    assert(rows(0).getAs[java.sql.Timestamp]("bucket_start").getTime == 123456780000L)
  }

  test("a malformed payload fails its task instead of being swallowed") {
    // the reference returns HTTP 400 per bad request (main.go:294-302);
    // here the decode failure surfaces through the query
    import spark.implicits._
    val bad = Seq(Array[Byte](9, 9, 9)).toDF("content")
    intercept[org.apache.spark.SparkException] {
      RemoteWriteStream.decodeFlat(bad).collect()
    }
  }

  test("S11: response edge emits decodable snappy+proto wire bytes") {
    import spark.implicits._
    import graft.compile.Matchers._
    val metrics = WritePipeline.toMetricRows(WritePipeline.dropNonFinite(Seq(
      graft.model.Schema.Sample("m", Map("__name__" -> "m", "k" -> "v"), 1.5, 123456789123L),
      graft.model.Schema.Sample("m", Map("__name__" -> "m", "k" -> "v"), 2.5, 123456799123L)
    ).toDF()))
    val q = PromQuery(123456789123L - 60000, 123456789123L + 60000000, Nil)
    val assembled = ReadPipeline.read(metrics, q, exact = true)
    val resp = Prompb.decodeReadResponse(
      Prompb.snappyUncompress(ResponseEdge.encode(assembled)))
    assert(resp.results.length == 1)
    val ts = resp.results.head.timeseries
    assert(ts.length == 1)
    assert(ts.head.labels.contains(PLabel("__name__", "m")))
    assert(ts.head.labels.contains(PLabel("k", "v")))
    assert(ts.head.samples.length == 2)
    // samples sorted by timestamp, values = the single-sample quantiles
    assert(ts.head.samples.map(_.value) == Seq(1.5, 2.5))
    assert(ts.head.samples.map(_.timestampMs) ==
      ts.head.samples.map(_.timestampMs).sorted)
  }
}
