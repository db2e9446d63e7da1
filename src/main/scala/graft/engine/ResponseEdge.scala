package graft.engine

import graft.codec.Prompb
import graft.codec.Prompb._
import org.apache.spark.sql.{DataFrame, Row}

/** S11: the read-response edge — assembled series collected at the driver
  * and marshalled to the snappy+protobuf `ReadResponse` wire bytes
  * (reference: clickhouse/client.go:212-223 assembly, main.go:359-371
  * marshal+compress).
  *
  * The collect here is CORRECT at scale, not a smell: A1's divStep bounds
  * every series to ≤ 8192 buckets, and the matcher set bounds the series
  * count — the response is the one place the data MUST converge to a
  * single HTTP body. Everything before this point stays distributed.
  */
object ResponseEdge {

  /** Thrown when an assembled read result exceeds the configured series
    * budget — the LOUD alternative to collecting an unbounded
    * match-everything result into driver memory.
    */
  final class SeriesLimitExceeded(val limit: Int)
    extends RuntimeException(
      s"read result exceeds $limit series; narrow the matchers or raise " +
        "--read.max-series")

  /** tags array → prompb labels. Malformed entries are dropped and empty
    * values are treated as absent labels, the reference's response-edge
    * rule (reference: clickhouse/tagvalue.go:32-49).
    */
  private[engine] def tagsToLabels(tags: Seq[String]): Seq[PLabel] =
    tags.flatMap { t =>
      t.split("=", 2) match {
        case Array(k, v) if v.nonEmpty => Some(PLabel(k, v))
        case _ => None
      }
    }

  /** Assembled-series DataFrame (tags, samples[(t, value)]) → one
    * QueryResult. Series are sorted by tag array for a deterministic wire
    * body (the reference iterates a Go map — nondeterministic; determinism
    * is strictly more testable and costs one small driver-side sort).
    */
  def toQueryResult(assembled: DataFrame): PQueryResult =
    toQueryResult(assembled, 0)

  /** Same, with a series budget: `maxSeries > 0` guards the collect — the
    * bound goes INTO the plan as limit(maxSeries + 1), so CollectLimit
    * truncates on the executors before anything reaches the driver; an
    * over-limit (match-everything) query costs one extra row of driver
    * memory and a clean [[SeriesLimitExceeded]], never an OOM. The A1
    * divStep already bounds rows per series (≤ 8192 buckets); this bounds
    * the series count, the other axis of the product. 0 = unlimited
    * (embedded/batch callers that own their input).
    */
  def toQueryResult(assembled: DataFrame, maxSeries: Int): PQueryResult = {
    val bounded =
      if (maxSeries > 0) assembled.limit(maxSeries + 1) else assembled
    val rows = bounded.select("tags", "samples").collect()
    if (maxSeries > 0 && rows.length > maxSeries)
      throw new SeriesLimitExceeded(maxSeries)
    val series = rows.map { r =>
      val tags = r.getAs[scala.collection.Seq[String]]("tags").toSeq
      val samples = r.getAs[scala.collection.Seq[Row]]("samples").toSeq
        .map(x => PSample(x.getAs[Double]("value"), x.getAs[Long]("t")))
        .sortBy(_.timestampMs)
      (tags, PTimeSeries(tagsToLabels(tags), samples))
    }.sortBy(_._1.mkString("\u0000")).map(_._2)
    PQueryResult(series.toSeq)
  }

  /** One QueryResult per prompb query, like the reference's per-query loop
    * (reference: clickhouse/client.go:167-211).
    */
  def toReadResponse(assembled: DataFrame): PReadResponse =
    PReadResponse(Seq(toQueryResult(assembled)))

  def toReadResponse(perQuery: Seq[DataFrame]): PReadResponse =
    PReadResponse(perQuery.map(toQueryResult))

  def toReadResponse(perQuery: Seq[DataFrame], maxSeries: Int): PReadResponse =
    PReadResponse(perQuery.map(toQueryResult(_, maxSeries)))

  /** Full wire body: proto marshal + snappy, ready for the HTTP edge. */
  def encode(assembled: DataFrame): Array[Byte] =
    Prompb.snappyCompress(Prompb.encodeReadResponse(toReadResponse(assembled)))

  /** STREAMED_XOR_CHUNKS response body: each query's series become
    * framed `ChunkedReadResponse` messages whose samples ride Gorilla
    * [[graft.codec.XorChunk]]s (one frame per series — constant driver
    * memory per frame at real scale, where the SAMPLES form must
    * materialize the whole result; here both forms share the bounded
    * collect because the series budget already applies). Chunks split at
    * `maxSamplesPerChunk` samples, the TSDB's ~120-sample convention.
    * Uncompressed on the wire per the remote-read spec (the chunk data
    * is already Gorilla-compressed).
    */
  def encodeChunked(perQuery: Seq[DataFrame], maxSeries: Int,
                    maxSamplesPerChunk: Int = 120): Array[Byte] = {
    import graft.codec.{ChunkedRead, XorChunk}
    val out = new java.io.ByteArrayOutputStream()
    perQuery.zipWithIndex.foreach { case (assembled, qi) =>
      toQueryResult(assembled, maxSeries).timeseries.foreach { ts =>
        val chunks = ts.samples.grouped(maxSamplesPerChunk).map { grp =>
          ChunkedRead.PChunk(grp.head.timestampMs, grp.last.timestampMs,
            ChunkedRead.EncodingXor,
            XorChunk.encode(grp.map(s => (s.timestampMs, s.value))))
        }.toSeq
        out.write(ChunkedRead.frame(ChunkedRead.encodeResponse(
          Seq(ChunkedRead.PChunkedSeries(ts.labels, chunks)), qi.toLong)))
      }
    }
    out.toByteArray
  }
}
