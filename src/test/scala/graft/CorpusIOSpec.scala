package graft

import graft.sources.CorpusIO
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** JSONL corpus interchange: round-trip fidelity, shard balance, and the
  * malformed-line quarantine contract.
  */
class CorpusIOSpec extends SparkSpec {
  import spark.implicits._

  test("jsonl: write/read round-trips rows exactly, including unicode " +
       "and embedded newlines") {
    val docs = Seq(
      (1L, "plain ascii text", "en", "webA", 16L),
      (2L, "unicode é中文 \"quoted\"", "zh", "webB", 12L),
      (3L, "line\nbreak\ttab\\slash", "en", "webA", 20L),
      (4L, null.asInstanceOf[String], "und", "webC", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = Files.createTempDirectory("graft_jsonl_spec").toString + "/d"
    CorpusIO.writeJsonl(docs, tmp, shards = 2)
    val back = CorpusIO.readJsonl(spark, tmp)
    assert(back.filter(col(CorpusIO.CorruptCol).isNotNull).count() == 0)
    val got = back.select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect()
    val want = docs.orderBy("doc_id").collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
    // shard balance: the repartition actually produced 2 data files
    assert(Files.list(Paths.get(tmp)).toArray
      .map(_.toString).count(_.endsWith(".json")) == 2)
  }

  test("jsonl: malformed lines are quarantined with the raw line, not fatal") {
    val tmp = Files.createTempDirectory("graft_jsonl_bad").toString
    Files.createDirectories(Paths.get(tmp, "d"))
    Files.write(Paths.get(tmp, "d", "part-00000.json"),
      ("""{"doc_id": 1, "text": "good one", "lang": "en", "source": "a", "n_chars": 8}""" + "\n" +
       """{"doc_id": 2, "text": "also good", "lang": "en", "source": "b", "n_chars": 9}""" + "\n" +
       "this is not json at all\n" +
       """{"doc_id": 3, "text": "truncated""" + "\n").getBytes(StandardCharsets.UTF_8))
    val parsed = CorpusIO.readJsonl(spark, s"$tmp/d")
    val stats = CorpusIO.ingestStats(parsed).collect().head
    assert(stats.getAs[Long]("n_good") == 2L)
    assert(stats.getAs[Long]("n_bad") == 2L)
    // quarantined rows carry the raw line for forensics
    val bad = parsed.filter(col(CorpusIO.CorruptCol).isNotNull)
      .select(CorpusIO.CorruptCol).as[String].collect().toSet
    assert(bad.exists(_.startsWith("this is not json")))
    // good rows parse every column
    val good = parsed.filter(col(CorpusIO.CorruptCol).isNull)
      .orderBy("doc_id").collect()
    assert(good.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(good.head.getAs[String]("text") == "good one")
  }

  test("csv: write/read round-trips rows exactly, including commas, " +
       "quotes and unicode in fields") {
    val docs = Seq(
      (1L, "plain ascii text", "en", "webA", 16L),
      (2L, "comma, inside \"quoted\" field", "en", "webB", 28L),
      (3L, "unicode é中文", "zh", "webC", 10L),
      (4L, null.asInstanceOf[String], "und", "webC", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = Files.createTempDirectory("graft_csv_spec").toString + "/d"
    CorpusIO.writeCsv(docs, tmp, shards = 2)
    val back = CorpusIO.readCsv(spark, tmp)
    assert(back.filter(col(CorpusIO.CorruptCol).isNotNull).count() == 0)
    val got = back.select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect()
    val want = docs.orderBy("doc_id").collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
    assert(Files.list(Paths.get(tmp)).toArray
      .map(_.toString).count(_.endsWith(".csv")) == 2)
  }

  test("csv: type-invalid and short lines are quarantined with the raw " +
       "line, not fatal and not null-filled") {
    val tmp = Files.createTempDirectory("graft_csv_bad").toString
    Files.createDirectories(Paths.get(tmp, "d"))
    Files.write(Paths.get(tmp, "d", "part-00000.csv"),
      ("1,good one,en,a,8\n" +
       "2,also good,en,b,9\n" +
       "notanumber,text,en,src,7\n" +
       "3,short row,en\n").getBytes(StandardCharsets.UTF_8))
    val parsed = CorpusIO.readCsv(spark, s"$tmp/d")
    val bad = parsed.filter(col(CorpusIO.CorruptCol).isNotNull)
      .select(CorpusIO.CorruptCol).as[String].collect().sorted
    assert(bad.length == 2)
    assert(bad.exists(_.startsWith("notanumber")))
    assert(bad.exists(_.startsWith("3,short row")))
    val good = parsed.filter(col(CorpusIO.CorruptCol).isNull)
      .orderBy("doc_id").collect()
    assert(good.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(good.head.getAs[String]("text") == "good one")
  }

  test("jsonl: the streaming reader admits the same rows as the batch " +
       "reader over the same shards, in bounded micro-batches") {
    val docs = (1L to 20L).map(i => (i, s"doc number $i", "en", "web", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = Files.createTempDirectory("graft_jsonl_stream").toString
    CorpusIO.writeJsonl(docs, s"$base/in", shards = 4)
    val stream = CorpusIO.readJsonlStream(spark, s"$base/in",
      maxFilesPerTrigger = 1)
    assert(stream.isStreaming)
    val q = stream.filter(col(CorpusIO.CorruptCol).isNull)
      .writeStream.format("memory").queryName("jsonl_stream_spec")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // 4 shards at 1 file/trigger → at least 4 micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) == 4)
    val got = spark.table("jsonl_stream_spec")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect()
    assert(got.map(_.toSeq).toSeq ==
      docs.orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }
  test("shardManifest: digest is repartition-invariant and moves on " +
       "corruption or duplication") {
    val docs = (1L to 40L).map(i => (i, s"document body $i"))
      .toDF("doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) =
      CorpusIO.shardManifest(df, 4).orderBy("shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    val base = m(docs)
    // different physical layout, identical digest
    assert(m(docs.repartition(7, col("text"))) == base)
    // one corrupted row moves exactly its shard's digest, counts intact
    val bad = docs.withColumn("text",
      when(col("doc_id") === 6L, lit("tampered")).otherwise(col("text")))
    val badM = m(bad)
    assert(badM.map(x => (x._1, x._2)) == base.map(x => (x._1, x._2)))
    assert(badM.zip(base).count { case (a, b) => a._3 != b._3 } == 1)
    assert(badM.zip(base).find { case (a, b) => a._3 != b._3 }
      .exists(_._1._1 == 6L % 4))
    // a duplicated row changes both the count and the digest
    val dupM = m(docs.unionByName(docs.filter(col("doc_id") === 9L)))
    val shard9 = (9L % 4).toInt
    assert(dupM(shard9)._2 == base(shard9)._2 + 1)
    assert(dupM(shard9)._3 != base(shard9)._3)
    // null and empty text are distinct content (concat_ws skips nulls:
    // the null row hashes the bare id)
    val oneNull = m(Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val oneEmpty = m(Seq((1L, "")).toDF("doc_id", "text"))
    assert(oneNull.head._3 != oneEmpty.head._3)
  }
}
