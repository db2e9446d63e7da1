package graft.engine

import graft.codec.XorChunk
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chunked at-rest tier — the metrics table with samples stored as
  * Gorilla [[XorChunk]]s instead of one row per sample: one row per
  * (date, series) holding the day's time-sorted samples as a single
  * compressed chunk plus its min/max/count metadata. The
  * Thanos/Cortex/Mimir block layout expressed as a parquet table.
  *
  * Why a second tier: at 100 TB the raw row form costs ~16+ bytes a
  * sample BEFORE parquet encodings; the XOR chunk carries dense scrape
  * data at ~2-4 bits. More importantly the READ unit becomes the
  * series-day — a dashboard query for one series touches row-group
  * stats on (name, tags) and decodes only its own chunks, and the
  * response edge can forward chunk bytes VERBATIM into the
  * STREAMED_XOR_CHUNKS wire format (see
  * [[ResponseEdge.encodeChunked]]) without ever materializing samples.
  *
  * Scale shape: chunking is one partial-combined groupBy per
  * (date, series) — the same key the compaction pipeline already
  * shuffles on — then a per-row encode kernel; no driver involvement,
  * no second pass. Decode is the map-side inverse (explode). Chunks
  * are bounded by the uint16 sample cap; a >65k-samples series-day is
  * split at encode.
  *
  * The chunk is EXACT: XOR encoding preserves double bit patterns and
  * second timestamps verbatim, so chunk→decode round-trips are
  * bit-identical to the row form — pinned by the a7_chunk_roundtrip
  * entry against the raw-rows oracle.
  */
object ChunkStore {

  private val MaxPerChunk = 65535

  case class Pt(t: Long, v: Double)
  case class SeriesDay(date: String, name: String, tags: Seq[String],
                       samples: Seq[Pt])
  case class ChunkRow(date: String, name: String, tags: Seq[String],
                      n_samples: Long, min_ts: Long, max_ts: Long,
                      chunk: Array[Byte])
  case class SampleRow(name: String, tags: Seq[String], ts_sec: Long,
                       value: Double)

  /** Canonical 6-column metric rows → chunked rows
    * (date, name, tags, n_samples, min_ts, max_ts, chunk).
    */
  def toChunked(metrics: DataFrame): DataFrame = {
    val spark = metrics.sparkSession
    import spark.implicits._
    metrics
      .groupBy(col("date"), col("name"), col("tags"))
      .agg(sort_array(collect_list(struct(
        unix_timestamp(col("ts")).as("t"),
        col("val").as("v")))).as("samples"))
      .select(col("date").cast("string").as("date"), col("name"),
        col("tags"), col("samples"))
      .as[SeriesDay]
      .flatMap { sd =>
        sd.samples.grouped(MaxPerChunk).map { grp =>
          ChunkRow(sd.date, sd.name, sd.tags, grp.size.toLong,
            grp.head.t, grp.last.t,
            XorChunk.encode(grp.map(p => (p.t, p.v))))
        }
      }
      .toDF()
  }

  /** Chunked rows → canonical sample rows (name, tags, ts_sec, value). */
  def fromChunked(chunked: DataFrame): DataFrame = {
    val spark = chunked.sparkSession
    import spark.implicits._
    chunked
      .select(col("name"), col("tags"), col("chunk"))
      .as[(String, Seq[String], Array[Byte])]
      .flatMap { case (name, tags, chunk) =>
        XorChunk.decode(chunk).map { case (t, v) =>
          SampleRow(name, tags, t, v)
        }
      }
      .toDF()
  }

  /** Write the chunked tier, date-partitioned like the row tier. */
  def write(metrics: DataFrame, path: String): Unit =
    toChunked(metrics)
      .repartitionByRange(col("date"), col("name"), col("tags"))
      .sortWithinPartitions(col("name"), col("tags"), col("min_ts"))
      .write.mode("overwrite").partitionBy("date").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    fromChunked(spark.read.parquet(path))
}
