package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PromQL label-manipulation operators over the canonical sorted
  * `tags: Array[String]` ("k=v") encoding of the metrics schema
  * (reference: clickhouse/tagvalue.go:22-30 builds the array,
  * clickhouse/tagvalue.go:40-42 treats empty values as nonexistent
  * labels — the rule the removal semantics below inherit).
  *
  * All transforms are array HOFs (`filter`/`transform`/`array_union`)
  * on the stored encoding — codegen'd expressions, no UDF, no shuffle:
  * a label rewrite is a map-side projection, and only the aggregation
  * that follows (grouping by the reduced array) exchanges data. The
  * rewritten array is re-sorted, preserving the byte-comparable series
  * identity every downstream groupBy/merge relies on.
  *
  * Label NAMES are Prometheus-constrained (`[a-zA-Z_][a-zA-Z0-9_]*`,
  * no '='), so `k=` prefix tests identify a label unambiguously even
  * though VALUES may contain '='.
  */
object LabelOps {

  /** Value of label `k` in the canonical array, null when absent.
    * `get` (0-based) rather than `element_at`: under ANSI mode the
    * latter THROWS on an empty filter result — an absent label must
    * read as null, not kill the job.
    */
  def labelValue(tags: Column, k: String): Column = {
    val hit = get(filter(tags, t => t.startsWith(k + "=")), lit(0))
    when(hit.isNotNull, substring(hit, k.length + 2, Int.MaxValue))
  }

  /** The tags array with the named labels removed — the grouping key of
    * PromQL `sum without(dropLabels) (v)`. Aggregations additionally
    * drop `__name__` in PromQL; pass it in `dropLabels` for that
    * semantics (the canonical array stores it like any other label).
    */
  def without(tags: Column, dropLabels: Seq[String]): Column = {
    require(dropLabels.nonEmpty)
    filter(tags, t =>
      dropLabels.map(k => !t.startsWith(k + "=")).reduce(_ && _))
  }

  /** PromQL `label_replace(v, dst, replacement, src, regex)`: when
    * `regex` FULL-matches the value of `src` (absent reads as "", the
    * empty≡nonexistent rule), set `dst` to `replacement` with `$1`-style
    * capture expansion; otherwise the series is unchanged. An empty
    * expansion REMOVES `dst` (Prometheus behavior, and the only
    * representable outcome in a model where empty values don't exist).
    *
    * The anchored `^(?:re)$` wrapper reproduces Prometheus's
    * full-match rule (its regex compile wraps exactly so); Java and RE2
    * agree on the matcher subset (SURVEY §7.4).
    */
  def labelReplace(tags: Column, dst: String, replacement: String,
                   src: String, regex: String): Column = {
    val anchored = "^(?:" + regex + ")$"
    val srcVal = coalesce(labelValue(tags, src), lit(""))
    val matched = srcVal.rlike(anchored)
    val newVal = regexp_replace(srcVal, anchored, replacement)
    val dropped = filter(tags, t => !t.startsWith(dst + "="))
    when(!matched, tags)
      .when(newVal === "", dropped)
      .otherwise(sort_array(array_union(dropped,
        array(concat(lit(dst + "="), newVal)))))
  }

  /** PromQL `label_join(v, dst, sep, src...)`: `dst` becomes the values
    * of the source labels joined by `sep` (absent sources read as "").
    * An all-empty join result removes `dst` (empty≡nonexistent).
    */
  def labelJoin(tags: Column, dst: String, sep: String,
                srcLabels: Seq[String]): Column = {
    require(srcLabels.nonEmpty)
    val joined = concat_ws(sep,
      srcLabels.map(k => coalesce(labelValue(tags, k), lit(""))): _*)
    val dropped = filter(tags, t => !t.startsWith(dst + "="))
    when(joined === "", dropped)
      .otherwise(sort_array(array_union(dropped,
        array(concat(lit(dst + "="), joined)))))
  }
}
