package graft.promql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recording and alerting rules — the other two thirds of what a
  * Prometheus server does with PromQL (the reference participates in
  * neither: rules run inside Prometheus and only their OUTPUT reaches a
  * remote-storage adapter as ordinary samples). Running them in-engine
  * closes the loop: a rule's result lands back in the same store its
  * input came from, at full cluster scale.
  *
  * Semantics follow the public rule model:
  *  - a RECORDING rule evaluates `expr` on the group's interval grid
  *    and stores the result as a new series set named `record`, output
  *    labels carried, extra rule labels overriding;
  *  - an ALERT rule's `expr` is a filter query (elements exist while
  *    the condition holds); a series is PENDING while it has held for
  *    less than `forSec` and FIRING once elements have been present at
  *    every evaluation instant spanning `forSec` (Prometheus holds
  *    alert state between evaluations; on a grid, continuous presence
  *    over the trailing window is exactly that state machine replayed).
  */
object Rules {

  case class RecordingRule(record: String, expr: String,
                           labels: Seq[(String, String)] = Nil) {
    require(record.nonEmpty)
  }

  case class AlertRule(alert: String, expr: String, forSec: Long,
                       labels: Seq[(String, String)] = Nil,
                       keepFiringForSec: Long = 0L,
                       annotations: Seq[(String, String)] = Nil) {
    require(alert.nonEmpty && forSec >= 0 && keepFiringForSec >= 0)
  }

  /** Expand the `{{ $labels.<name> }}` / `{{ $value }}` references in an
    * annotation template against one alert instance — the plain
    * substitution subset of Prometheus's Go templating that real rule
    * files overwhelmingly use (summary/description interpolation). A
    * label the instance doesn't carry renders empty; `$value` prints
    * with minimal decimals, Go's FormatFloat('f', -1) shape.
    */
  private val TemplateRef =
    """\{\{\s*\$(value|labels\.([A-Za-z_][A-Za-z0-9_]*))\s*\}\}""".r

  def formatValue(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v.isPosInfinity) "+Inf"
    else if (v.isNegInfinity) "-Inf"
    else java.math.BigDecimal.valueOf(v).stripTrailingZeros.toPlainString

  def expandTemplate(tmpl: String, labels: Map[String, String],
                     value: Double): String =
    TemplateRef.replaceAllIn(tmpl, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (m.group(1) == "value") formatValue(value)
        else labels.getOrElse(m.group(2), "")))

  /** One configured rule group — the unit /api/v1/rules enumerates:
    * recording + alerting rules sharing an evaluation interval.
    */
  case class RuleGroup(name: String, intervalSec: Long,
                       recording: Seq[RecordingRule] = Nil,
                       alerts: Seq[AlertRule] = Nil) {
    require(name.nonEmpty && intervalSec > 0)
    // `for:` is independent of the group interval upstream (promtool
    // accepts any pairing); evaluation rounds up to whole grid steps
    // in alertRows, so no divisibility constraint belongs here
  }

  /** Parse a Prometheus rule FILE (the `groups:` YAML layout promtool
    * checks) into [[RuleGroup]]s — the `--rules.file` surface. A
    * deliberate STRICT SUBSET of YAML, hand-parsed (no YAML runtime in
    * this environment): `groups:` / `- name:` / `interval:` / `rules:` /
    * `- record:|- alert:` / `expr:` / `for:` / `labels:` with one
    * `key: value` label per line; values optionally single- or
    * double-quoted; `#` comments and blank lines ignored. Anything else
    * fails loudly with its line number — a silently misread alert rule
    * is worse than a rejected file.
    */
  def parseRuleFile(text: String): Seq[RuleGroup] = {
    case class G(name: String, var intervalSec: Long,
                 rec: scala.collection.mutable.ListBuffer[RecordingRule],
                 al: scala.collection.mutable.ListBuffer[AlertRule])
    case class R(var record: String = "", var alert: String = "",
                 var expr: String = "", var forSec: Long = 0L,
                 var keepSec: Long = 0L,
                 labels: scala.collection.mutable.ListBuffer[(String, String)] =
                   scala.collection.mutable.ListBuffer(),
                 annotations: scala.collection.mutable.ListBuffer[(String, String)] =
                   scala.collection.mutable.ListBuffer())
    val groups = scala.collection.mutable.ListBuffer[G]()
    var rule: Option[R] = None
    // which key/value block is open: 0 none, 1 labels:, 2 annotations:
    var inBlock = 0
    def unquote(v: String): String = {
      val t = v.trim
      if (t.length >= 2 &&
          ((t.head == '"' && t.last == '"') ||
            (t.head == '\'' && t.last == '\'')))
        t.substring(1, t.length - 1)
      else t
    }
    def flushRule(ln: Int): Unit = rule.foreach { r =>
      val g = groups.lastOption.getOrElse(
        fail(ln, "rule outside a group"))
      if (r.expr.isEmpty) fail(ln, "rule without expr")
      if (r.record.nonEmpty) {
        if (r.annotations.nonEmpty)
          fail(ln, "recording rules take no annotations")
        g.rec += RecordingRule(r.record, r.expr, r.labels.toSeq)
      } else if (r.alert.nonEmpty) g.al += AlertRule(r.alert, r.expr,
        r.forSec, r.labels.toSeq, keepFiringForSec = r.keepSec,
        annotations = r.annotations.toSeq)
      else fail(ln, "rule with neither record nor alert")
      rule = None
    }
    def fail(ln: Int, msg: String): Nothing =
      throw new IllegalArgumentException(s"rules file line $ln: $msg")
    val Line = """^(\s*)(-\s+)?([A-Za-z_][A-Za-z0-9_]*):\s*(.*)$""".r
    text.linesIterator.zipWithIndex.foreach { case (raw, i) =>
      val ln = i + 1
      val noComment =
        // strip a trailing comment only outside quotes — exprs with #
        // don't occur in PromQL, so a simple split is safe here
        if (raw.trim.startsWith("#")) "" else raw
      if (noComment.trim.nonEmpty) noComment match {
        case Line(indent, dash, key, value) =>
          val v = unquote(value)
          (key, dash != null && dash.nonEmpty) match {
            case ("groups", false) =>
              if (v.nonEmpty) fail(ln, "groups: takes no inline value")
            case ("name", true) =>
              flushRule(ln)
              groups += G(v, 60L,
                scala.collection.mutable.ListBuffer(),
                scala.collection.mutable.ListBuffer())
            case ("interval", false) if rule.isEmpty =>
              groups.lastOption.getOrElse(fail(ln, "interval outside a " +
                "group")).intervalSec = Parser.durationSec(v)
            case ("record", true) =>
              flushRule(ln); rule = Some(R(record = v)); inBlock = 0
            case ("alert", true) =>
              flushRule(ln); rule = Some(R(alert = v)); inBlock = 0
            case ("rules", false) =>
              if (v.nonEmpty) fail(ln, "rules: takes no inline value")
            case ("expr", false) if rule.nonEmpty =>
              rule.get.expr = v; inBlock = 0
            case ("for", false) if rule.nonEmpty =>
              rule.get.forSec = Parser.durationSec(v); inBlock = 0
            case ("keep_firing_for", false) if rule.nonEmpty =>
              rule.get.keepSec = Parser.durationSec(v); inBlock = 0
            case ("labels", false) if rule.nonEmpty =>
              if (v.nonEmpty) fail(ln, "labels: takes no inline value")
              inBlock = 1
            case ("annotations", false) if rule.nonEmpty =>
              if (v.nonEmpty) fail(ln, "annotations: takes no inline value")
              inBlock = 2
            case (k, false) if inBlock == 1 && rule.nonEmpty =>
              rule.get.labels += (k -> v)
            case (k, false) if inBlock == 2 && rule.nonEmpty =>
              rule.get.annotations += (k -> v)
            case (k, _) => fail(ln, s"unrecognized key '$k'")
          }
        case _ => fail(ln, s"unparseable line: ${raw.trim}")
      }
    }
    flushRule(text.linesIterator.length)
    groups.map(g => RuleGroup(g.name, g.intervalSec, g.rec.toSeq,
      g.al.toSeq)).toSeq
  }

  /** Evaluate a recording rule over the grid and return CANONICAL store
    * rows (date, name, tags, val, ts, updated) ready for
    * WritePipeline.append — `__name__` in the output tag set is
    * replaced by the rule name, rule labels override same-named output
    * labels. One extra projection over the query plan; the write
    * inherits the evaluator's partitioning.
    */
  def recordingRows(store: DataFrame, rule: RecordingRule,
                    spec: Eval.RangeSpec): DataFrame = {
    val out = Eval.rangeQuery(store, rule.expr, spec)
    val dropKeys = "__name__" +: rule.labels.map(_._1)
    val cleaned = filter(col("tags"), x =>
      dropKeys.map(k => !x.startsWith(k + "=")).reduce(_ && _))
    val added = (("__name__" -> rule.record) +: rule.labels)
      .map { case (k, v) => lit(s"$k=$v") }
    val tags = sort_array(concat(cleaned, array(added: _*)))
    out.select(
      to_date(timestamp_seconds(col("t"))).as("date"),
      lit(rule.record).as("name"),
      tags.as("tags"),
      col("value").as("val"),
      timestamp_seconds(col("t")).as("ts"),
      timestamp_seconds(col("t")).as("updated"))
  }

  /** Evaluate an alert rule over the grid: one row per (series, instant)
    * the alert is active, with `state` = "pending" (held < forSec) or
    * "firing" (elements present at EVERY instant in the trailing
    * `forSec`). Requires the step to divide `forSec` so "every instant"
    * is well-defined on the grid. The rule's labels merge into the
    * output (alertname first, the Prometheus convention).
    */
  def alertRows(store: DataFrame, rule: AlertRule,
                spec: Eval.RangeSpec): DataFrame = {
    // instants spanning forSec, rounded UP to whole grid steps: k
    // consecutive instants span (k−1)·step seconds, so firing needs
    // ceil(for/step)+1 of them — exact on divisible configs, and a
    // promtool-accepted `for: 90s` on a 60 s grid needs 3 (spanning
    // 120 s ≥ 90 s) instead of throwing
    val need = (rule.forSec + spec.stepSec - 1) / spec.stepSec + 1
    val out = Eval.rangeQuery(store, rule.expr, spec)
    val w = Window.partitionBy(col("tags"))
      .orderBy(col("t").asc).rangeBetween(-(need - 1) * spec.stepSec, 0)
    val dropKeys = "alertname" +: rule.labels.map(_._1)
    val cleaned = filter(col("tags"), x =>
      dropKeys.map(k => !x.startsWith(k + "=")).reduce(_ && _))
    val added = (("alertname" -> rule.alert) +: rule.labels)
      .map { case (k, v) => lit(s"$k=$v") }
    val active = out
      .select(col("tags"), col("t"), col("value"),
        count(lit(1)).over(w).as("_held"))
      .withColumn("state",
        when(col("_held") >= need, lit("firing")).otherwise(lit("pending")))
      .select(
        sort_array(concat(cleaned, array(added: _*))).as("tags"),
        col("t"), col("value"), col("state"))
    if (rule.keepFiringForSec == 0) active
    else {
      // keep_firing_for (upstream state machine): once FIRING, an alert
      // never demotes to pending — it stays firing through later active
      // evaluations (their `for` clock is irrelevant; `for` only gates
      // the pending→firing transition) and through inactive gaps of at
      // most keep_firing_for, going inactive only when a gap outlives
      // the window. Any duration is accepted (promtool does); on the
      // grid it rounds UP to whole steps, so a 15 s keep on a 10 s grid
      // covers the instants a wall-clock window of at least 15 s would.
      val k = (rule.keepFiringForSec + spec.stepSec - 1) / spec.stepSec
      val keepSec = k * spec.stepSec
      // ISLANDS: active instants of one series chain into one firing
      // continuation while each gap is at most keepSec + ONE step —
      // upstream's state only flips at an INACTIVE evaluation, so a
      // re-activation one step after the last kept instant (gap =
      // keepSec + step) still finds the alert firing; one step further
      // and the instant before it already went inactive (the seeded
      // differential against the imperative machine pins the boundary).
      val wOrd = Window.partitionBy(col("tags")).orderBy(col("t").asc)
      val wIsl = Window.partitionBy(col("tags"), col("_isl"))
      val promoted = active
        .withColumn("_gap", col("t") - lag(col("t"), 1).over(wOrd))
        .withColumn("_isl", sum(when(col("_gap").isNull ||
          col("_gap") > keepSec + spec.stepSec, 1L).otherwise(0L))
          .over(wOrd))
        .withColumn("_f0",
          min(when(col("state") === "firing", col("t"))).over(wIsl))
        .withColumn("state", when(col("_f0").isNotNull &&
          col("t") >= col("_f0"), lit("firing")).otherwise(col("state")))
        .select(col("tags"), col("t"), col("value"), col("state"))
      // PROJECTIONS fill the inactive gap instants: every firing instant
      // projects its value k steps forward, the NEWEST source wins among
      // overlaps, and instants that have a real evaluation keep it (only
      // gap instants take a projection — a projection can never reach
      // the next island, whose gap exceeds the keep window).
      val kept = promoted.filter(col("state") === "firing")
        .select(col("tags"), col("t").as("_t0"), col("value"),
          explode(sequence(lit(1L), lit(k))).as("_k"))
        .select(col("tags"), (col("_t0") + col("_k") * spec.stepSec)
          .as("t"), col("_t0"), col("value"))
        .filter(col("t") <= spec.endSec)
        .groupBy(col("tags"), col("t"))
        .agg(max(struct(col("_t0"), col("value"))).as("_src"))
        .select(col("tags"), col("t"), col("_src.value").as("value"),
          lit("firing").as("state"))
        .join(active.select(col("tags").as("_at"), col("t").as("_tt")),
          col("tags") === col("_at") && col("t") === col("_tt"),
          "left_anti")
      promoted.unionByName(kept)
    }
  }

  /** CURRENT alert states at one instant — what /api/v1/rules and
    * /api/v1/alerts serve: replay the rule on the `intervalSec` grid
    * over a trailing history window ending at `atSec`, keep the rows at
    * `atSec`, and derive each alert's `activeAt` as the start of its
    * CONTIGUOUS active run (gaps-and-islands over the grid — exact
    * whenever the run began inside the replay window; a run older than
    * `historySec` clamps to the window start). History defaults to
    * 2× forSec (a firing alert's run start is inside forSec by
    * definition; the factor covers long-pending inspection).
    */
  def alertStatesAt(store: DataFrame, rule: AlertRule, atSec: Long,
                    intervalSec: Long, lookbackSec: Long = 300L,
                    historySec: Long = 0L): DataFrame = {
    val hist = math.max(if (historySec > 0) historySec else 2 * rule.forSec,
      rule.forSec)
    val steps = math.max(hist / intervalSec, 1L)
    val spec = Eval.RangeSpec(atSec - steps * intervalSec, atSec,
      intervalSec, lookbackSec)
    val rows = alertRows(store, rule, spec)
    val wOrd = Window.partitionBy(col("tags")).orderBy(col("t").asc)
    rows
      .withColumn("_rn", row_number().over(wOrd))
      // rows with consecutive grid instants share (t − rn·step)
      .withColumn("_isl", col("t") - col("_rn") * intervalSec)
      .withColumn("activeAt", min(col("t"))
        .over(Window.partitionBy(col("tags"), col("_isl"))))
      .filter(col("t") === atSec)
      .select(col("tags"), col("t"), col("value"), col("state"),
        col("activeAt"))
  }
}
