package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prometheus-style relabeling over the ingest label map — the one
  * remote-write-adapter feature every Prometheus deployment configures
  * (`write_relabel_configs`): route, rename, and thin series BEFORE they
  * reach storage. The reference forwards labels untouched
  * (reference: main.go:377-394); this is the standard upstream contract
  * (prometheus/config relabel semantics) applied to the flat sample
  * stream.
  *
  * Semantics follow Prometheus: the rule's `sourceLabels` values join on
  * `separator` (missing labels contribute ""), the regex is FULLY
  * anchored, and
  *   - keep/drop: row-level filter on whether the joined value matches
  *   - replace: on match, `targetLabel` := `replacement` with $1..$n
  *     group expansion (an empty expansion REMOVES the target label —
  *     the Prometheus label-deletion idiom); no match leaves the row's
  *     labels untouched
  *   - labeldrop / labelkeep: thin the label MAP by key regex
  *
  * Every action compiles to built-in map/regex expressions — per-row map
  * work at scan speed, no shuffle, whole-stage codegen. Keep regexes in
  * the RE2∩Java common subset (the repo-wide convention) so behavior is
  * portable to any engine replaying the rules.
  */
object Relabel {

  sealed trait Action
  case object Keep extends Action
  case object Drop extends Action
  case object Replace extends Action
  case object LabelDrop extends Action
  case object LabelKeep extends Action

  /** `hashmod` — the horizontal-sharding action: `targetLabel` :=
    * hash(joined source values) mod `modulus`, then a keep rule on the
    * shard label routes each series to exactly one of N adapter
    * instances. The hash here is the repo's md5-prefix draw (first 15
    * hex digits as an integer — deterministic, engine-portable, uniform)
    * rather than Prometheus's FNV/MD5-sum64 bit pattern: the SEMANTICS
    * (stable uniform series→shard assignment) carry over; the exact
    * shard of a given series does not, which only matters when mixing
    * implementations inside one sharded fleet.
    */
  case object HashMod extends Action

  /** One relabel rule (field meanings as in prometheus relabel_config;
    * `modulus` only for [[HashMod]]). */
  case class Rule(action: Action,
                  sourceLabels: Seq[String] = Nil,
                  separator: String = ";",
                  regex: String = "(.*)",
                  targetLabel: String = "",
                  replacement: String = "$1",
                  modulus: Long = 0L)

  /** Apply `rules` in order to `df`'s `labelsCol` (a map<string,string>
    * column). Rules compose exactly as Prometheus applies them: each
    * sees the previous rule's output.
    */
  def apply(df: DataFrame, rules: Seq[Rule],
            labelsCol: String = "labels"): DataFrame =
    rules.foldLeft(df)((d, r) => applyRule(d, r, labelsCol))

  /** Prometheus regexes are fully anchored. */
  private def fullRe(regex: String): String = s"^(?:$regex)$$"

  private def joined(labelsCol: String, rule: Rule): Column =
    concat_ws(rule.separator, rule.sourceLabels.map(l =>
      coalesce(element_at(col(labelsCol), lit(l)), lit(""))): _*)

  private def applyRule(df: DataFrame, rule: Rule,
                        labelsCol: String): DataFrame = {
    val re = fullRe(rule.regex)
    rule.action match {
      case Keep => df.filter(joined(labelsCol, rule).rlike(re))
      case Drop => df.filter(!joined(labelsCol, rule).rlike(re))
      case Replace =>
        require(rule.targetLabel.nonEmpty, "replace needs targetLabel")
        val src = joined(labelsCol, rule)
        val newVal = regexp_replace(src, re, rule.replacement)
        // target removed first so map_concat never sees a duplicate key;
        // empty expansion = delete the label (the Prometheus idiom)
        val cleaned = map_filter(col(labelsCol),
          (k, _) => k =!= rule.targetLabel)
        val updated = when(newVal === "", cleaned)
          .otherwise(map_concat(cleaned, map(lit(rule.targetLabel), newVal)))
        df.withColumn(labelsCol,
          when(src.rlike(re), updated).otherwise(col(labelsCol)))
      case HashMod =>
        require(rule.targetLabel.nonEmpty && rule.modulus > 0,
          "hashmod needs targetLabel and modulus")
        val shard = pmod(
          conv(substring(md5(joined(labelsCol, rule)), 1, 15), 16, 10)
            .cast("long"),
          lit(rule.modulus)).cast("string")
        val cleaned = map_filter(col(labelsCol),
          (k, _) => k =!= rule.targetLabel)
        df.withColumn(labelsCol,
          map_concat(cleaned, map(lit(rule.targetLabel), shard)))
      case LabelDrop =>
        df.withColumn(labelsCol,
          map_filter(col(labelsCol), (k, _) => !k.rlike(re)))
      case LabelKeep =>
        df.withColumn(labelsCol,
          map_filter(col(labelsCol), (k, _) => k.rlike(re)))
    }
  }
}
