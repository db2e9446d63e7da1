package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-side curation operators: URL canonicalization and host-level
  * rollups — the steps between "raw crawl" and "document corpus" that the
  * content-side operators ([[Dedup]], [[TextAnalysis]]) assume have
  * already happened. The same page is typically fetched under dozens of
  * URL spellings (scheme/host case, default ports, tracking parameters,
  * fragments, parameter order); canonicalization collapses them BEFORE
  * fetch dedup, which at crawl scale is the difference between fetching a
  * page once and fetching it forty times.
  *
  * Everything is built-in string/array Catalyst expressions (codegen'd,
  * no UDFs), per-row map-side only — the canonical form is a pure
  * function of the URL string, so the pass scales linearly and the
  * DuckDB oracle reproduces it verbatim.
  */
object CrawlOps {

  /** WARC container split ([[graft.GraftExtensions.warcRecords]]): one
    * (rec_no, off, len, content_off, content_len, warc_type,
    * target_uri) row per record of a concatenated `WARC/1.x` archive —
    * crawl ingest starts here; consumers substring each record's
    * content out of the archive payload (no per-record copies) and
    * feed response bodies to [[htmlText]].
    */
  def warcRecords(payload: Column): Column =
    graft.GraftExtensions.warcRecords(payload)

  /** HTML→text for response-record content: HTTP-header strip,
    * script/style/comment removal, tag→line-break, entity decode,
    * per-line trim — the text that feeds the boilerplate/quality/dedup
    * chain.
    */
  def htmlText(content: Column): Column =
    graft.GraftExtensions.htmlText(content)

  /** HTTP payload normalization ahead of [[htmlText]]: header strip +
    * `Content-Encoding` reversal (gzip, zlib/raw deflate) + declared
    * charset (Content-Type param or `<meta charset>`) transcoded to
    * UTF-8 bytes. Real Common Crawl bodies are mostly compressed and
    * mixed-charset; this is the stage that makes them readable.
    * Lenient — an undecodable body passes through unchanged.
    */
  def httpBody(content: Column): Column =
    graft.GraftExtensions.httpBody(content)

  /** Outbound anchor hrefs of an HTML response record, in document
    * order ([[graft.GraftExtensions.htmlLinks]]) — raw as authored
    * (entity-decoded only); feed through [[resolveUrl]] +
    * [[canonicalizeUrl]] to get graph-ready absolute URLs.
    */
  def htmlLinks(content: Column): Column =
    graft.GraftExtensions.htmlLinks(content)

  /** Resolve an href against the page URL it was found on (the
    * RFC 3986 reference-resolution cases a crawl frontier actually
    * meets), as pure codegen'd string expressions:
    *
    *  - absolute (`scheme://…`) — taken as-is;
    *  - scheme-relative (`//host/…`) — the base's scheme is prepended;
    *  - root-relative (`/…`) — joined to the base's origin
    *    (scheme://host[:port]);
    *  - fragment-only, empty, and non-hierarchical schemes
    *    (`javascript:`, `mailto:`, `data:`) — null: they never name a
    *    fetchable page (the frontier's drop policy, applied here so
    *    the extractor stays policy-free);
    *  - anything else — relative: joined to the base path's directory.
    *
    * The link's own fragment is dropped first (never sent on the
    * wire), and `/./` + up to two levels of `/segment/../` dot
    * segments are collapsed after the join (bounded — crawl-page
    * relative links nest shallow; deeper chains keep their residue
    * rather than resolving wrong).
    */
  def resolveUrl(base: Column, link: Column): Column = {
    val l = substring_index(link, "#", 1)
    val scheme = lower(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val origin = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1)
    val basePath0 = regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val baseDir = when(basePath0 === "", lit("/"))
      .otherwise(regexp_replace(basePath0, "[^/]*$", ""))
    val joined = when(l.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), l)
      .when(l.startsWith("//"), concat(scheme, lit(":"), l))
      .when(l.startsWith("/"), concat(origin, l))
      .when(l === "" || l.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), lit(null))
      .otherwise(concat(origin, baseDir, l))
    val noDot = regexp_replace(joined, "/\\./", "/")
    regexp_replace(regexp_replace(noDot,
      "/[^/.][^/]*/\\.\\./", "/"), "/[^/.][^/]*/\\.\\./", "/")
  }

  /** Multi-member gzip inflate — `.warc.gz` archives (one gzip member
    * per record, the Common Crawl layout) decompress to the exact
    * concatenated-record stream [[warcRecords]] walks.
    */
  def gunzipAll(payload: Column): Column =
    graft.GraftExtensions.gunzipAll(payload)

  /** Query parameters that identify a CLICK, not a PAGE — the standard
    * tracking families (Google Analytics utm_*, Facebook fbclid, Google
    * gclid, Mailchimp mc_*) plus the bare `ref` referrer tag. Dropped by
    * [[canonicalizeUrl]]; extend per deployment.
    */
  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")

  private def isTracking(p: Column): Column =
    p.startsWith("utm_") || substring_index(p, "=", 1).isin(TrackingParams: _*) ||
      p === ""

  /** Canonical URL form:
    *
    *  - scheme and host lowercased; a leading `www.` host label dropped
    *    (the near-universal alias — `www.x.com` and `x.com` serve the
    *    same page);
    *  - default ports stripped (`:80` for http, `:443` for https; other
    *    ports kept — they address different servers);
    *  - fragment dropped entirely (client-side only, never reaches the
    *    server);
    *  - tracking query parameters dropped ([[TrackingParams]] + `utm_*`),
    *    remaining parameters sorted by byte order (parameter order is
    *    irrelevant to virtually all servers but splits hash keys);
    *  - empty path becomes `/`; a trailing slash on a non-root path is
    *    dropped (`/a/b/` ≡ `/a/b`, the common server behavior).
    *
    * Inputs that don't look like `scheme://host...` are returned
    * unchanged (canonicalization must never invent structure).
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))
    val hostClean = when(hostRaw.startsWith("www."), substring(hostRaw, 5, 1000000))
      .otherwise(hostRaw)
    val port = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]+:([0-9]+)", 1)
    val pathRaw = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    // anchored before any '#': a '?' inside the fragment is not a query
    val queryRaw = regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)

    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443") || port === ""
    val portPart = when(defaultPort, lit("")).otherwise(concat(lit(":"), port))

    val path0 = when(pathRaw === "", lit("/")).otherwise(pathRaw)
    val path = when(path0 =!= "/" && path0.endsWith("/"),
      path0.substr(lit(1), length(path0) - 1))
      .otherwise(path0)

    val params = array_sort(filter(split(queryRaw, "&"), p => !isTracking(p)))
    val queryPart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))

    when(scheme === "" || hostRaw === "", url)
      .otherwise(concat(scheme, lit("://"), hostClean, portPart, path, queryPart))
  }

  /** Host of a URL under the same normalization as [[canonicalizeUrl]]
    * (lowercase, `www.` dropped) — the grouping key for host-level
    * curation policy. Empty string for non-URL inputs.
    */
  def hostOf(url: Column): Column = {
    val hostRaw = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))
    when(hostRaw.startsWith("www."), substring(hostRaw, 5, 1000000))
      .otherwise(hostRaw)
  }

  /** The (allow, pattern) robots.txt rules applying to `agent`
    * ([[graft.GraftExtensions.robotsRules]], RFC 9309 group selection).
    */
  def robotsRules(robotsTxt: Column, agent: String): Column =
    graft.GraftExtensions.robotsRules(robotsTxt, agent)

  /** RFC 9309 pattern match length against a URL path (−1 = no match;
    * else the rule's longest-match specificity).
    */
  def robotsMatchLen(path: Column, pattern: Column): Column =
    graft.GraftExtensions.robotsMatchLen(path, pattern)

  /** The `<loc>` URLs of a sitemap (urlset or sitemapindex — the two
    * XML shapes share the element), whitespace-trimmed and
    * entity-decoded (sitemap URLs are XML-escaped, `&amp;` above all) —
    * the crawl frontier's OTHER source beside extracted links, and pure
    * built-in expressions: one `regexp_extract_all` + a decode chain,
    * row-local at scan speed.
    */
  def sitemapUrls(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("<loc>\\s*([^<]+?)\\s*</loc>"), lit(1)),
      u => xmlEntityDecode(u))

  private def xmlEntityDecode(u: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(u, "&lt;", "<"), "&gt;", ">"),
      "&quot;", "\""), "&apos;", "'"), "&amp;", "&")

  /** Page entries of a `<urlset>` sitemap as (url, lastmod) structs —
    * `<url>` blocks walked with one regexp pass, `<loc>` entity-decoded
    * and whitespace-trimmed, `<lastmod>` surfaced verbatim (empty
    * string when the optional tag is absent) for recrawl
    * prioritization.
    */
  def sitemapEntries(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?s)<url>(.*?)</url>"), lit(1)),
      b => struct(
        xmlEntityDecode(
          regexp_extract(b, "(?s)<loc>\\s*([^<]+?)\\s*</loc>", 1))
          .as("url"),
        regexp_extract(b, "(?s)<lastmod>\\s*([^<]+?)\\s*</lastmod>", 1)
          .as("lastmod")))

  /** Child sitemap URLs of a `<sitemapindex>` document (`<sitemap>`
    * blocks' `<loc>`, entity-decoded). Empty for a plain urlset. */
  def sitemapChildUrls(xml: Column): Column =
    transform(
      regexp_extract_all(xml,
        lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1)),
      b => xmlEntityDecode(
        regexp_extract(b, "(?s)<loc>\\s*([^<]+?)\\s*</loc>", 1)))

  /** Full sitemap COMPOSITION: top-level documents that are either a
    * plain `<urlset>` or a `<sitemapindex>` expand — through the
    * crawler's fetched child bodies (commonly `.xml.gz`; gzip reversed
    * via [[gunzipAll]], non-gzip bodies pass through) — to one row per
    * page URL with its `<lastmod>` (null when undeclared). One level of
    * recursion is COMPLETE by spec: sitemaps.org forbids an index from
    * listing another index.
    *
    * Scale shape: both join sides are sitemap-cardinality (hosts ×
    * children), minute next to the page frontier this feeds — the
    * expansion never touches frontier-sized data, and the child join
    * broadcasts its smaller side under AQE.
    *
    * @param tops    (host, sitemap_xml) top-level sitemap documents
    * @param fetched (url, content BINARY) fetched child sitemap bodies
    * @return (host, url, lastmod) page rows
    */
  def sitemapExpand(tops: DataFrame, fetched: DataFrame): DataFrame = {
    def pages(hostCol: Column, xml: Column, src: DataFrame): DataFrame =
      src.select(hostCol.as("host"),
          explode(sitemapEntries(xml)).as("e"))
        .select(col("host"), col("e.url").as("url"),
          when(col("e.lastmod") === "", lit(null))
            .otherwise(col("e.lastmod")).as("lastmod"))
    val direct = pages(col("host"), col("sitemap_xml"), tops)
    val childXml = tops
      .select(col("host"),
        explode(sitemapChildUrls(col("sitemap_xml"))).as("child_url"))
      .join(fetched, col("child_url") === fetched("url"))
      .select(col("host"),
        decode(coalesce(graft.GraftExtensions.gunzipAll(col("content")),
          col("content")), "UTF-8").as("xml"))
    direct.unionByName(pages(col("host"), col("xml"), childXml))
  }

  /** Crawl-compliance screen: classify every frontier URL as allowed or
    * not under its host's robots.txt for the given crawler product
    * token. RFC 9309 decision rule: among the applicable group's rules
    * whose pattern matches the URL's path (+query), the LONGEST pattern
    * wins; Allow wins length ties; no matching rule — or no robots.txt
    * for the host at all — means allowed.
    *
    * Scale shape: the rules side is (hosts × rules-per-host) — minute
    * next to any real frontier — so it BROADCASTS onto the frontier
    * scan and the per-URL fold is one partial-combined groupBy(url):
    * the frontier is read once, never re-shuffled by host. The
    * longest-match fold is `max(struct(match_len, allow))` — struct
    * ordering encodes "longest, then Allow on ties" exactly.
    *
    * @param frontier one row per candidate URL (column `urlCol`)
    * @param robots   (host, robots_txt) — host under the [[hostOf]]
    *                 normalization
    * @return one row per distinct URL: (url, allowed)
    */
  def robotsFilter(frontier: DataFrame, urlCol: String,
                   robots: DataFrame, agent: String): DataFrame = {
    val rules = robots.select(col("host"),
      explode(robotsRules(col("robots_txt"), agent)).as("r"))
      .select(col("host"), col("r.allow").as("allow"),
        col("r.pattern").as("pattern"))
    val withPath = frontier
      .select(col(urlCol).as("url"),
        hostOf(col(urlCol)).as("host"),
        // the match target is path + query (RFC 9309), never fragment
        when(regexp_extract(col(urlCol),
            "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1) === "", "/")
          .otherwise(regexp_extract(col(urlCol),
            "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)).as("path"))
    withPath
      .join(broadcast(rules), Seq("host"), "left")
      .groupBy(col("url"))
      .agg(max(struct(
        coalesce(robotsMatchLen(col("path"), col("pattern")), lit(-1))
          .as("len"),
        coalesce(col("allow"), lit(false)).as("allow"))).as("best"))
      .select(col("url"),
        (col("best.len") < 0 || col("best.allow")).as("allowed"))
  }

  /** `Crawl-delay` seconds for `agent` (−1 = none declared;
    * [[graft.GraftExtensions.robotsCrawlDelay]]).
    */
  def robotsCrawlDelay(robotsTxt: Column, agent: String): Column =
    graft.GraftExtensions.robotsCrawlDelay(robotsTxt, agent)

  /** Politeness scheduling: assign every frontier URL a fetch offset
    * honoring its host's `Crawl-delay` (hosts without robots.txt — or
    * without a declared delay — get `defaultDelaySec`). Within a host,
    * URLs fetch in lexicographic order, one per delay interval:
    * `fetch_at = slot × delay`, slot = the URL's rank on its host.
    *
    * Scale shape: the delay table broadcasts like the rules side of
    * [[robotsFilter]]; the slot assignment is ONE window per host —
    * politeness is inherently per-host SEQUENTIAL, so the per-host
    * partition is the schedule itself, not an implementation accident
    * (a host's fetch lane can't parallelize without violating the
    * delay; hosts parallelize freely against each other).
    *
    * @return one row per URL: (url, host, delay_sec, slot, fetch_at_sec)
    */
  def crawlSchedule(frontier: DataFrame, urlCol: String,
                    robots: DataFrame, agent: String,
                    defaultDelaySec: Int): DataFrame =
    crawlSchedule(frontier, urlCol, robots, agent, defaultDelaySec, None)

  /** Same, with an optional RECRAWL-PRIORITY column (typically the
    * sitemap `<lastmod>` via [[sitemapExpand]]): within a host's fetch
    * lane, fresher pages take the earlier slots (descending, nulls —
    * pages with no declared modification time — last), the URL as the
    * deterministic tiebreak. The lane stays host-sequential either way;
    * priority only reorders WITHIN the lane.
    */
  def crawlSchedule(frontier: DataFrame, urlCol: String,
                    robots: DataFrame, agent: String,
                    defaultDelaySec: Int,
                    priorityCol: Option[String]): DataFrame = {
    require(defaultDelaySec >= 0)
    val delays = robots.select(col("host"),
      robotsCrawlDelay(col("robots_txt"), agent).as("declared"))
    val order = priorityCol
      .map(p => Seq(col(p).desc_nulls_last, col("url")))
      .getOrElse(Seq(col("url")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(order: _*)
    frontier
      .select((Seq(col(urlCol).as("url"), hostOf(col(urlCol)).as("host"))
        ++ priorityCol.map(col)): _*)
      .join(broadcast(delays), Seq("host"), "left")
      .select((Seq(col("url"), col("host"),
        when(col("declared").isNull || col("declared") < 0,
          lit(defaultDelaySec)).otherwise(col("declared"))
          .as("delay_sec")) ++ priorityCol.map(col)): _*)
      .withColumn("slot", row_number().over(w).cast("long") - 1L)
      .withColumn("fetch_at_sec", col("slot") * col("delay_sec").cast("long"))
  }

  /** Corpus snapshot diff — the recrawl bookkeeping pass: classify every
    * document id across two corpus versions as `added` (new snapshot
    * only), `removed` (old only), `changed` (both, content hash differs)
    * or `same`. Drives incremental downstream work (re-embed/re-dedup
    * only `added`+`changed`; retract `removed` from indexes via the
    * at-rest tombstone path).
    *
    * Scale shape: text is hashed map-side on each scan and DROPPED — the
    * full-outer join moves only (id, hash) pairs, two narrow shuffles on
    * the id regardless of document size. No window, no driver state.
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val o = oldDocs.select(col(idCol).as("id"), md5(col(textCol)).as("h_old"))
    val n = newDocs.select(col(idCol).as("id"), md5(col(textCol)).as("h_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") === col("h_new"), lit("same"))
          .otherwise(lit("changed")).as("status"))
  }

  /** URL-level fetch dedup + host rollup in one pass: canonicalize,
    * collapse to one row per canonical URL (keeper = min id — first
    * fetch wins), and report per-host page and alias counts. This is the
    * crawl-frontier curation table: hosts with huge alias fan-out are
    * crawler traps; hosts with one page are tail noise.
    *
    * Scale shape: one groupBy on the canonical URL (partial combine
    * collapses alias groups map-side), then a host-level re-agg over the
    * already-deduped rows — host cardinality ≪ URL cardinality, so the
    * second shuffle is small. No window, no driver state.
    */
  def hostReport(urls: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val canon = urls.select(col(idCol).as("id"),
      canonicalizeUrl(col(urlCol)).as("canonical_url"))
    val perUrl = canon.groupBy(col("canonical_url")).agg(
      min(col("id")).as("keeper_id"),
      count(lit(1)).as("n_aliases"))
    perUrl
      .withColumn("host", hostOf(col("canonical_url")))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_pages"),
        sum(col("n_aliases")).as("n_fetches"),
        min(col("keeper_id")).as("first_id"))
  }
}
