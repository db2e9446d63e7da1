package graft

import graft.operators.LabelOps
import org.apache.spark.sql.functions._

/** PromQL label_replace / label_join / without() semantics over the
  * canonical sorted "k=v" tags array, including the empty≡nonexistent
  * removal rule (reference: clickhouse/tagvalue.go:40-42).
  */
class LabelOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tagsOf(rows: Seq[Seq[String]]) = rows.toDF("tags")

  private def run(c: org.apache.spark.sql.Column,
                  rows: Seq[Seq[String]]): Seq[Seq[String]] =
    tagsOf(rows).select(c.as("out")).collect()
      .map(_.getAs[scala.collection.Seq[String]]("out").toSeq).toSeq

  test("labelValue: extracts values, '=' allowed in values, null when " +
       "absent") {
    val df = tagsOf(Seq(Seq("__name__=up", "q=a=b")))
    val out = df.select(
      LabelOps.labelValue(col("tags"), "__name__").as("n"),
      LabelOps.labelValue(col("tags"), "q").as("q"),
      LabelOps.labelValue(col("tags"), "missing").as("m")).collect()(0)
    assert(out.getAs[String]("n") == "up")
    assert(out.getAs[String]("q") == "a=b")
    assert(out.isNullAt(out.fieldIndex("m")))
  }

  test("labelReplace: full-match required; capture expansion re-sorts; " +
       "no-match leaves the row untouched") {
    val c = LabelOps.labelReplace(col("tags"), "shard", "$1", "uid",
      ".*(\\d)")
    assert(run(c, Seq(Seq("__name__=up", "uid=u47"))) ==
      Seq(Seq("__name__=up", "shard=7", "uid=u47")))
    // regex matches only a SUBSTRING ("x" after the digits) -> full
    // match fails -> unchanged
    val c2 = LabelOps.labelReplace(col("tags"), "shard", "$1", "uid",
      "(\\d)")
    assert(run(c2, Seq(Seq("uid=47"))) == Seq(Seq("uid=47")))
  }

  test("labelReplace: empty expansion removes dst; absent src reads as " +
       "empty string") {
    // src absent -> "" , regex ".*" matches -> dst := "" -> removed
    val c = LabelOps.labelReplace(col("tags"), "old", "", "nope", ".*")
    assert(run(c, Seq(Seq("old=x", "q=1"))) == Seq(Seq("q=1")))
    // absent src with a non-empty replacement template still sets dst
    val c2 = LabelOps.labelReplace(col("tags"), "env", "prod", "nope",
      ".*")
    assert(run(c2, Seq(Seq("q=1"))) == Seq(Seq("env=prod", "q=1")))
  }

  test("labelJoin: joins with separator, overwrites dst, all-empty " +
       "single-source result removes dst") {
    val c = LabelOps.labelJoin(col("tags"), "series", ":",
      Seq("__name__", "uid"))
    assert(run(c, Seq(Seq("__name__=up", "series=stale", "uid=4"))) ==
      Seq(Seq("__name__=up", "series=up:4", "uid=4")))
    // one absent source keeps its empty slot (strings.Join semantics)
    assert(run(c, Seq(Seq("uid=4"))) == Seq(Seq("series=:4", "uid=4")))
    // single absent source -> "" -> dst removed
    val c2 = LabelOps.labelJoin(col("tags"), "series", ":", Seq("gone"))
    assert(run(c2, Seq(Seq("series=stale", "uid=4"))) == Seq(Seq("uid=4")))
  }

  test("without: drops exactly the named labels; prefix does not " +
       "over-match") {
    val c = LabelOps.without(col("tags"), Seq("uid", "job"))
    assert(run(c, Seq(Seq("__name__=up", "job=x", "uid=4", "uid2=9"))) ==
      Seq(Seq("__name__=up", "uid2=9")))
  }
}
