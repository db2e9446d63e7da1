package graft.serve

import graft.engine.WritePipeline
import graft.sinks.{Formatters, Transport}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §3.3 startup surface: the reference's kingpin flag set re-expressed
  * (reference: main.go:128-187), with the same flag NAMES, defaults and
  * env-password convention, minus what has no meaning here (TLS CA
  * registration, ClickHouse DSN plumbing — the "ClickHouse" of this
  * engine is the Spark-managed parquet table, addressed by
  * `--clickhouse.table` for the catalog name plus `--table-path` for its
  * storage location).
  *
  * Passwords ride environment variables exactly like the reference
  * (INFLUXDB_PW, main.go:133): secrets never appear in argv.
  */
final case class CliConfig(
    graphiteAddress: String = "",
    graphiteTransport: String = "tcp",
    graphitePrefix: String = "",
    opentsdbUrl: String = "",
    influxdbUrl: String = "",
    influxdbRetentionPolicy: String = "autogen",
    influxdbUsername: String = "",
    influxdbDatabase: String = "prometheus",
    influxdbPassword: String = "",
    clickhouseDatabase: String = "prometheus",
    clickhouseTable: String = "metrics",
    tablePath: String = "spark-warehouse/prometheus/metrics",
    sendTimeoutMs: Long = 30000,
    listenAddress: String = ":9201",
    telemetryPath: String = "/metrics") {

  /** Qualified catalog name, ≙ database.table in the reference DSN. */
  def tableName: String = s"${clickhouseDatabase}.${clickhouseTable}"

  def listenPort: Int = {
    val p = listenAddress.substring(listenAddress.lastIndexOf(':') + 1)
    p.toInt
  }
}

object CliConfig {

  private val Usage: String =
    """usage: graft-adapter [<flags>]
      |
      |Spark-native remote storage adapter
      |
      |  --graphite-address=""          host:port of the Graphite server. None, if empty.
      |  --graphite-transport="tcp"     Transport to Graphite ('tcp' or 'udp').
      |  --graphite-prefix=""           Prefix prepended to exported metrics.
      |  --opentsdb-url=""              URL of the OpenTSDB server. None, if empty.
      |  --influxdb-url=""              URL of the InfluxDB server. None, if empty.
      |  --influxdb.retention-policy="autogen"
      |  --influxdb.username=""         Password via env INFLUXDB_PW.
      |  --influxdb.database="prometheus"
      |  --clickhouse.database="prometheus"  Catalog database for the metrics table.
      |  --clickhouse.table="metrics"   Catalog table name.
      |  --table-path="spark-warehouse/prometheus/metrics"  Parquet location.
      |  --send-timeout=30s             Timeout when sending samples to remotes.
      |  --web.listen-address=":9201"   Address for web endpoints.
      |  --web.telemetry-path="/metrics"
      |""".stripMargin

  def usage(): String = Usage

  private val DurationRe = "^(\\d+)(ms|s|m|h)$".r

  private[serve] def parseDurationMs(s: String): Either[String, Long] = s match {
    case DurationRe(n, "ms") => Right(n.toLong)
    case DurationRe(n, "s") => Right(n.toLong * 1000)
    case DurationRe(n, "m") => Right(n.toLong * 60000)
    case DurationRe(n, "h") => Right(n.toLong * 3600000)
    case other => Left(s"invalid duration '$other' (want e.g. 10s, 500ms, 1m)")
  }

  /** kingpin-style parse: `--flag=value` or `--flag value`; unknown flags
    * are errors (main.go:181-186 exits 2 with usage). `env` is injectable
    * for tests; production uses sys.env.
    */
  def parse(args: Seq[String],
            env: Map[String, String] = sys.env): Either[String, CliConfig] = {
    var cfg = CliConfig(influxdbPassword = env.getOrElse("INFLUXDB_PW", ""))
    var rest = args.toList
    while (rest.nonEmpty) {
      val (flag, value, tail) = rest match {
        case f :: t if f.startsWith("--") && f.contains('=') =>
          val i = f.indexOf('=')
          (f.substring(2, i), Some(f.substring(i + 1)), t)
        case f :: v :: t if f.startsWith("--") && !v.startsWith("--") =>
          (f.substring(2), Some(v), t)
        case f :: t if f.startsWith("--") => (f.substring(2), None, t)
        case f :: _ => return Left(s"unexpected argument '$f'")
        case Nil => return Left("unreachable")
      }
      if (flag == "help" || flag == "h") return Left(Usage)
      value match {
        case None => return Left(s"flag --$flag needs a value")
        case Some(v) =>
          flag match {
            case "graphite-address" => cfg = cfg.copy(graphiteAddress = v)
            case "graphite-transport" => cfg = cfg.copy(graphiteTransport = v)
            case "graphite-prefix" => cfg = cfg.copy(graphitePrefix = v)
            case "opentsdb-url" => cfg = cfg.copy(opentsdbUrl = v)
            case "influxdb-url" => cfg = cfg.copy(influxdbUrl = v)
            case "influxdb.retention-policy" => cfg = cfg.copy(influxdbRetentionPolicy = v)
            case "influxdb.username" => cfg = cfg.copy(influxdbUsername = v)
            case "influxdb.database" => cfg = cfg.copy(influxdbDatabase = v)
            case "clickhouse.database" => cfg = cfg.copy(clickhouseDatabase = v)
            case "clickhouse.table" => cfg = cfg.copy(clickhouseTable = v)
            case "table-path" => cfg = cfg.copy(tablePath = v)
            case "send-timeout" => parseDurationMs(v) match {
              case Right(ms) => cfg = cfg.copy(sendTimeoutMs = ms)
              case Left(e) => return Left(e)
            }
            case "web.listen-address" => cfg = cfg.copy(listenAddress = v)
            case "web.telemetry-path" => cfg = cfg.copy(telemetryPath = v)
            case other => return Left(s"unknown long flag '--$other'")
          }
      }
      rest = tail
    }
    if (cfg.graphiteAddress.nonEmpty &&
        cfg.graphiteTransport != "tcp" && cfg.graphiteTransport != "udp")
      return Left(s"graphite-transport '${cfg.graphiteTransport}' not supported (tcp or udp)")
    if (cfg.graphiteAddress.nonEmpty && !cfg.graphiteAddress.contains(':'))
      return Left(s"graphite-address '${cfg.graphiteAddress}' is not host:port")
    Right(cfg)
  }
}

/** Sink construction ≙ buildClients (main.go:199-283): one transport-backed
  * writer per configured backend, each isolated through FanOut.
  */
object Cli {

  def buildSinks(cfg: CliConfig): Seq[(String, DataFrame => Transport.WriteStats)] = {
    val graphite = if (cfg.graphiteAddress.isEmpty) Nil else {
      val i = cfg.graphiteAddress.lastIndexOf(':')
      val (host, port) = (cfg.graphiteAddress.substring(0, i),
        cfg.graphiteAddress.substring(i + 1).toInt)
      Seq("graphite" -> ((df: DataFrame) => Transport.totals(
        Transport.graphitePush(Formatters.graphiteLines(df, cfg.graphitePrefix),
          host, port, cfg.sendTimeoutMs.toInt, cfg.graphiteTransport))))
    }
    val opentsdb = if (cfg.opentsdbUrl.isEmpty) Nil else
      Seq("opentsdb" -> ((df: DataFrame) => Transport.totals(
        Transport.opentsdbPut(Formatters.opentsdbJson(df), cfg.opentsdbUrl,
          cfg.sendTimeoutMs.toInt))))
    val influxdb = if (cfg.influxdbUrl.isEmpty) Nil else
      Seq("influxdb" -> ((df: DataFrame) => Transport.totals(
        Transport.influxPush(Formatters.influxLines(df), cfg.influxdbUrl,
          cfg.influxdbDatabase, cfg.influxdbRetentionPolicy,
          cfg.sendTimeoutMs.toInt))))
    graphite ++ opentsdb ++ influxdb
  }

  /** Full bootstrap: DDL-ensure the metrics table (≙ NewClient → initDb,
    * clickhouse/client.go:45-83), then serve.
    */
  def buildServer(spark: SparkSession, cfg: CliConfig): Server = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cfg.tablePath))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${cfg.clickhouseDatabase}")
    WritePipeline.ensureTable(spark, cfg.tableName, cfg.tablePath)
    new Server(spark, cfg.tablePath, buildSinks(cfg), cfg.listenPort,
      metricsPath = cfg.telemetryPath)
  }
}

/** The adapter's `main` (reference: main.go:115-126): parse flags, build
  * the session, bootstrap storage, serve until killed.
  */
object Main {
  def main(args: Array[String]): Unit =
    CliConfig.parse(args.toSeq) match {
      case Left(err) =>
        System.err.println(err)
        if (!err.startsWith("usage:")) System.err.println(CliConfig.usage())
        sys.exit(2)
      case Right(cfg) =>
        val spark = SparkSession.builder()
          .appName("graft-adapter")
          // spark-submit provides the real master on a cluster; standalone
          // runs (sbt runMain) fall back to all local cores
          .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
          .config("spark.sql.extensions", "graft.GraftExtensions")
          .getOrCreate()
        val server = Cli.buildServer(spark, cfg).start()
        println(s"listening on :${server.boundPort}, storing to ${cfg.tablePath}")
        // serve forever, like ListenAndServe (main.go:374)
        this.synchronized { this.wait() }
    }
}
