package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** JSONL corpus interchange — the de-facto wire format of LLM training
  * corpora (one JSON document per line; every public corpus release and
  * every crawler emits it). The engine's working format stays parquet;
  * this is the ingest/export edge.
  *
  * Scale design:
  *  - `readJsonl` takes an EXPLICIT schema — schema inference is a full
  *    extra pass over the data before the real one, a 100 TB scan spent
  *    guessing what the pipeline already knows. Splittable text input
  *    parallelizes by HDFS-style line splits, so one giant file still
  *    fans out across executors.
  *  - malformed lines are QUARANTINED, not fatal: PERMISSIVE mode parks
  *    the raw line in a corrupt-record column; crawler output at corpus
  *    scale always contains some garbage, and one bad line must not kill
  *    a 1000-executor job (FAILFAST is for curated inputs only).
  *  - `writeJsonl` shards via a round-robin repartition so downstream
  *    dataloaders get balanced files — the shard count is the lever that
  *    matches file size to the consumer, decoupled from the upstream
  *    partitioning.
  */
object CorpusIO {

  /** The canonical document-corpus schema (mirrors the `documents`
    * table); `_bad_line` is the quarantine column `readJsonl` adds.
    */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  val CorruptCol = "_bad_line"

  /** Export a corpus slice as `shards` balanced JSONL files. */
  def writeJsonl(df: DataFrame, path: String, shards: Int): Unit = {
    require(shards >= 1, "need at least one shard")
    df.repartition(shards).write.mode("overwrite").json(path)
  }

  /** Read a JSONL corpus with a known schema. Rows that fail to parse
    * come back with every data column null and the raw line in
    * `_bad_line`; well-formed rows have `_bad_line` null. Callers split
    * on `col(CorruptCol).isNull`.
    *
    * Spelled as a text scan + per-line `from_json` rather than the json
    * source: the json source forbids filtering on its corrupt-record
    * column without first caching the whole parse
    * (QueryCompilationErrors.queryFromRawFilesIncludeCorruptRecordColumn),
    * and a mandatory cache of a 100 TB ingest is not a contract this
    * reader can impose. A text scan has the same line-based splits (one
    * giant file still fans out), JSON documents never contain raw
    * newlines (the writer escapes control characters), and `from_json`
    * is a codegen-friendly per-row expression with the identical
    * PERMISSIVE + corrupt-column semantics.
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = DocumentSchema): DataFrame =
    parseJsonl(spark.read.text(path), schema)

  /** Streaming form of [[readJsonl]]: the same parse/quarantine contract
    * over a file-source text stream — the continuously-arriving-crawl
    * ingest path. `maxFilesPerTrigger` bounds micro-batch size so one
    * dump of a million shards doesn't become one giant batch.
    */
  def readJsonlStream(spark: SparkSession, path: String,
                      schema: StructType = DocumentSchema,
                      maxFilesPerTrigger: Int = 0): DataFrame = {
    val reader = spark.readStream
    val opted = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
    parseJsonl(opted.text(path), schema)
  }

  /** The shared line→row parse: PERMISSIVE `from_json` with the raw line
    * quarantined in `_bad_line`. Works on any (streaming or batch)
    * single-column `value: string` frame.
    *
    * Lines `from_json` parses to a NULL struct — blank/whitespace lines
    * and the JSON literal `null`, both routine in crawler output — carry
    * no corrupt-record marker of their own (every field of a null struct
    * reads as null, including `_bad_line`), so the raw line is coalesced
    * into the quarantine column explicitly: they must count as bad
    * input, not be admitted as phantom all-null documents.
    */
  def parseJsonl(lines: DataFrame, schema: StructType = DocumentSchema): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"$CorruptCol is reserved for the quarantine column")
    val withCorrupt = schema.add(StructField(CorruptCol, StringType, nullable = true))
    val parsed = lines
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol).asJava).as("rec"))
    val dataCols = schema.fieldNames.toSeq.map(n => col(s"rec.`$n`").as(n))
    val badCol = when(col("rec").isNull, col("value"))
      .otherwise(col(s"rec.`$CorruptCol`")).as(CorruptCol)
    parsed.select(dataCols :+ badCol: _*)
  }

  /** Export a corpus slice as `shards` balanced headerless CSV files —
    * the schema travels out of band (as it must: a header line breaks
    * line-based splitting, since every split but the first would need to
    * know it isn't looking at data). Quoting/escaping is the Spark CSV
    * writer's standard contract, which [[readCsv]] inverts exactly.
    */
  def writeCsv(df: DataFrame, path: String, shards: Int): Unit = {
    require(shards >= 1, "need at least one shard")
    df.repartition(shards).write.mode("overwrite")
      .option("header", "false").csv(path)
  }

  /** CSV twin of [[readJsonl]]: text scan + per-line `from_csv` with the
    * PERMISSIVE corrupt-record quarantine — same rationale (the csv
    * source imposes the same cache-before-filtering restriction on its
    * corrupt column as json, and schema inference would be a wasted full
    * pass). Targets line-safe CSV (no embedded newlines — the big-data
    * interchange contract; the writer's escaping keeps control characters
    * out of the stream). Type-invalid fields AND token-count mismatches
    * both quarantine the raw line (`from_csv` PERMISSIVE treats a short
    * row as malformed — stricter than the csv file source's null-fill,
    * and the right call for ingest: a truncated record is damage, not
    * data).
    */
  def readCsv(spark: SparkSession, path: String,
              schema: StructType = DocumentSchema): DataFrame =
    parseCsvLines(spark.read.text(path), schema)

  /** The shared CSV line→row parse (see [[parseJsonl]] for the null-struct
    * quarantine rationale — blank lines must count as bad input, not
    * phantom all-null documents).
    */
  def parseCsvLines(lines: DataFrame, schema: StructType = DocumentSchema): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"$CorruptCol is reserved for the quarantine column")
    val withCorrupt = schema.add(StructField(CorruptCol, StringType, nullable = true))
    val parsed = lines
      .select(col("value"), from_csv(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("rec"))
    val dataCols = schema.fieldNames.toSeq.map(n => col(s"rec.`$n`").as(n))
    // blank lines: from_csv("") yields an all-null row with NO corrupt
    // marker (unlike short rows, which it rejects) — same phantom-document
    // hazard parseJsonl handles for the JSON literal `null`
    val badCol = when(col("rec").isNull || trim(col("value")) === "", col("value"))
      .otherwise(col(s"rec.`$CorruptCol`")).as(CorruptCol)
    parsed.select(dataCols :+ badCol: _*)
  }

  /** Ingest report: good/quarantined line counts — the first number a
    * corpus ingest job publishes. One partial-combined aggregation.
    */
  def ingestStats(parsed: DataFrame): DataFrame =
    parsed.agg(
      sum(when(col(CorruptCol).isNull, 1L).otherwise(0L)).as("n_good"),
      sum(when(col(CorruptCol).isNotNull, 1L).otherwise(0L)).as("n_bad"))

  /** Per-shard integrity manifest — the attestation a corpus publisher
    * ships beside the data: row count, id range, and an
    * ORDER-INDEPENDENT content hash: the sum of each row's 48-bit md5
    * prefix (keyed id:text, the ':' keeping id/text splits
    * unambiguous; a null text hashes the bare id — concat_ws skips
    * nulls — so null and empty stay distinct), accumulated in exact decimal so no corpus size can
    * overflow it, then folded mod 2^61-1 into a compact digest.
    * Addition commutes, so the digest is invariant
    * under repartitioning, task retries, and merge order — the property
    * that makes a manifest checkable at 100 TB, where physical row
    * order is never stable, without a global sort. Hash collisions
    * need an adversary, not an accident: any corruption, loss, or
    * duplication of a row moves the sum.
    *
    * One partial-combined aggregation; shard = id mod `shards`, so the
    * manifest is reproducible from the logical content alone.
    */
  def shardManifest(df: DataFrame, shards: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(shards >= 1, "need at least one shard")
    df.groupBy(pmod(col(idCol), lit(shards.toLong)).as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col(idCol)).cast("long").as("min_id"),
        max(col(idCol)).cast("long").as("max_id"),
        (sum(conv(substring(md5(concat_ws(":",
            col(idCol).cast("string"), col(textCol))), 1, 12), 16, 10)
          .cast("decimal(38,0)")) % lit(2305843009213693951L))
          .cast("long").as("content_hash"))
  }
}
