package graft.serve

import org.apache.spark.sql.SparkSession

/** The PULL side of federation: GET a text-exposition page (a target's
  * /metrics, or an adapter's /federate) and append it through the
  * canonical write pipeline — what a parent Prometheus does to a child,
  * here so graft instances stack hierarchically without a Prometheus in
  * between.
  *
  * Samples WITH timestamps keep them (federation pages carry each
  * sample's own ms timestamp — honor_timestamps); samples without get
  * the scrape time, the scrape contract.
  */
object Scraper {

  def fetch(url: String, timeoutMs: Int = 30000,
            accept: Option[String] = None): String = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setConnectTimeout(math.min(5000, timeoutMs))
      conn.setReadTimeout(timeoutMs)
      accept.foreach(conn.setRequestProperty("Accept", _))
      val code = conn.getResponseCode
      if (code != 200)
        throw new java.io.IOException(s"scrape of $url returned $code")
      new String(conn.getInputStream.readAllBytes(), "UTF-8")
    } finally conn.disconnect()
  }

  /** One scrape: fetch, parse, append. Returns the sample count.
    * `openMetrics = true` negotiates the OM render (Accept header) and
    * parses under OM rules — seconds timestamps, required `# EOF`;
    * inline exemplars are parsed but not stored on this pull path.
    */
  def scrapeInto(spark: SparkSession, url: String, tablePath: String,
                 nowMs: Long = System.currentTimeMillis(),
                 openMetrics: Boolean = false): Long = {
    val dec =
      if (openMetrics) {
        val om = graft.codec.TextExposition.decodeOpenMetrics(
          fetch(url, accept =
            Some("application/openmetrics-text; version=1.0.0")), nowMs)
        graft.codec.TextExposition.Decoded(om.request, om.metadata)
      } else graft.codec.TextExposition.decode(fetch(url), nowMs)
    val samples = for {
      ts <- dec.request.timeseries
      s <- ts.samples
    } yield {
      val labels = ts.labels.map(l => l.name -> l.value).toMap
      graft.model.Schema.Sample(labels.getOrElse("__name__", ""),
        labels, s.value, s.timestampMs)
    }
    if (samples.nonEmpty) {
      import spark.implicits._
      graft.engine.WritePipeline.append(
        graft.engine.WritePipeline.toMetricRows(
          graft.engine.WritePipeline.dropNonFinite(samples.toDF())),
        tablePath)
    }
    samples.size.toLong
  }
}
