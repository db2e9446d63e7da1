package graft.compile

import graft.model.Schema
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The matcher → predicate compiler (SURVEY §2.2 F2-F7).
  *
  * Where the reference concatenates backend SQL strings
  * (reference: clickhouse/query.go:72-127), we build a Catalyst `Column`
  * predicate tree — the plan stays declarative so predicate pushdown,
  * partition pruning on `date`, and parquet row-group skipping all apply
  * for free at any scale.
  */
object Matchers {

  sealed trait MatchType
  case object EQ extends MatchType
  case object NEQ extends MatchType
  case object RE extends MatchType
  case object NRE extends MatchType

  /** One prompb.LabelMatcher. */
  case class LabelMatcher(mtype: MatchType, name: String, value: String)

  /** One prompb.Query: time range (epoch ms) + matchers. */
  case class PromQuery(startMs: Long, endMs: Long, matchers: Seq[LabelMatcher])

  /** Max buckets returned per read (reference: clickhouse/query.go:13). */
  val MaxSample: Long = 8192
  /** Minimum bucket width, seconds (reference: clickhouse/query.go:14). */
  val Period: Long = 10
  /** Read-time aggregation quantile (reference: clickhouse/query.go:15). */
  val Quantile: Double = 0.75

  /** A1 adaptive bucket width.
    *
    * Intended semantics: max((end-start)/8192, 10) seconds, so a read never
    * returns more than ~8192 buckets per series regardless of range — the
    * reference's result-size bound in place of LIMIT.
    *
    * The reference as-written computes `(sTime - eTime)/maxSample` — always
    * negative, so every query degrades to 10 s buckets
    * (reference: clickhouse/query.go:56-59). `strictCompat=true` reproduces
    * that behavior bit-for-bit.
    */
  def divStep(q: PromQuery, strictCompat: Boolean = false): Long = {
    val s = q.startMs / 1000
    val e = q.endMs / 1000
    require(e >= s, "Start time is after end time")
    val step = if (strictCompat) (s - e) / MaxSample else (e - s) / MaxSample
    if (step < Period) Period else step
  }

  /** F2 time-range predicate. The explicit `date` bounds mirror the
    * reference's manual partition alignment (reference: clickhouse/query.go:18)
    * and let Catalyst prune `date`-partitioned parquet even before the
    * `ts` row filter runs. The reference only LOWER-bounds the date; the
    * upper bound here is result-identical (the ts filter subsumes it)
    * but prunes the trailing partitions too — on a year-long store a
    * 2-day query reads 3 date directories instead of ~360
    * (f2_partition_pruning pins the counts).
    */
  def timeRange(q: PromQuery): Column = {
    val s = q.startMs / 1000
    val e = q.endMs / 1000
    col("date") >= to_date(timestamp_seconds(lit(s))) &&
      col("date") <= to_date(timestamp_seconds(lit(e))) &&
      col("ts") >= timestamp_seconds(lit(s)) &&
      col("ts") <= timestamp_seconds(lit(e))
  }

  /** Compile one matcher to a predicate over (name, tags).
    *
    * Semantics preserved from the reference:
    *  - name RE/NRE are UNANCHORED (ClickHouse `match`,
    *    reference: clickhouse/query.go:81-84);
    *  - tag EQ/NEQ split the value on "|" into an IN-list
    *    (reference: clickhouse/query.go:103-107); empty value matches the
    *    literal "''" (reference: clickhouse/query.go:89-91);
    *  - tag RE/NRE re-anchor the pattern as `^key=pattern` after stripping a
    *    leading `^` (reference: clickhouse/query.go:108-122). As written the
    *    reference only assigns the pattern inside the has-"^" branch, so a
    *    caret-less pattern degenerates to `^key=` (any value);
    *    `strictCompat=true` reproduces that quirk.
    */
  def compileMatcher(m: LabelMatcher, strictCompat: Boolean = false): Column =
    if (m.name == Schema.MetricNameLabel) m.mtype match {
      case EQ  => col("name") === m.value
      case NEQ => col("name") =!= m.value
      case RE  => col("name").rlike(m.value)
      case NRE => !col("name").rlike(m.value)
    } else m.mtype match {
      case EQ | NEQ =>
        val v = if (m.value.isEmpty) "''" else m.value
        val lits = v.split("\\|", -1).toSeq.map(x => s"${m.name}=$x")
        val hit = exists(col("tags"), x => x.isin(lits: _*))
        if (m.mtype == EQ) hit else !hit
      case RE | NRE =>
        val pat =
          if (m.value.startsWith("^")) m.value.substring(1)
          else if (strictCompat) "" // reference quirk: pattern lost without '^'
          else m.value
        val hit = exists(col("tags"), x => x.rlike("^" + m.name + "=" + pat))
        if (m.mtype == RE) hit else !hit
    }

  /** Full predicate for a query: time range AND every matcher. */
  def compile(q: PromQuery, strictCompat: Boolean = false): Column =
    q.matchers.map(compileMatcher(_, strictCompat))
      .foldLeft(timeRange(q))(_ && _)
}
