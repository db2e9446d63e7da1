package graft

import graft.codec.{GraphiteCodec, OpenTsdbCodec}
import graft.llm.VectorOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The native Catalyst expressions must be drop-in replacements: byte
  * codecs equal to the canonical Scala functions on adversarial inputs,
  * vector kernels BIT-identical to the `aggregate(zip_with(...))` HOF
  * left-fold they replaced (the oracle determinism contract), SQL names
  * resolvable through the SparkSessionExtensions injection, and the
  * whole thing planned inside whole-stage codegen, not as a UDF.
  */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val nasty = Seq(
    "", "plain", "foo.bar%baz/x=y", "(){},='\"\\", "héllo wörld 日本",
    "_under__score_", "colon:colon", "a\nb\tc", "\u0000\u007f\u00ff",
    "http://example.org:8080/metrics?a=b&c=d")

  test("graphite_escape expression == canonical function on nasty vectors") {
    val got = nasty.toDF("s")
      .select(col("s"), GraphiteCodec.escapeCol(col("s")).as("e"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    nasty.foreach { s => assert(got(s) == GraphiteCodec.escape(s), s"escape($s)") }
  }

  test("opentsdb marshal/unmarshal expressions == canonical functions") {
    val gotM = nasty.toDF("s")
      .select(col("s"), OpenTsdbCodec.marshalCol(col("s")).as("m"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    nasty.foreach { s => assert(gotM(s) == OpenTsdbCodec.marshal(s), s"marshal($s)") }

    // Round-trip only inputs the REFERENCE contract can round-trip: its
    // `_%X` hex is unpadded, so a byte < 0x10 followed by a hex-looking
    // char is ambiguous and unmarshal (faithfully) rejects it — e.g.
    // "\nb" marshals to "_Ab" which parses as escape 0xAB. Same behavior
    // as the canonical function, which is what's asserted above.
    val roundtrippable = nasty.filter(s =>
      scala.util.Try(OpenTsdbCodec.unmarshal(OpenTsdbCodec.marshal(s))).isSuccess)
    assert(roundtrippable.size >= nasty.size - 2)
    val gotRt = roundtrippable.toDF("s")
      .select(col("s"),
        OpenTsdbCodec.unmarshalCol(OpenTsdbCodec.marshalCol(col("s"))).as("u"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    roundtrippable.foreach { s => assert(gotRt(s) == s, s"roundtrip($s)") }
  }

  test("graphite_path expression == canonical function incl. label sort") {
    val df = Seq((1, "req.count", "us-east", "a b"), (2, "x%y", "z=1", "."))
      .toDF("id", "name", "zone", "weird")
    val got = df.select(col("id"), GraphiteCodec.path(
        map(lit("__name__"), col("name"), lit("zone"), col("zone"),
          lit("aaa"), col("weird"), lit(""), lit("skipped")),
        lit("prom.")).as("p"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(1) == GraphiteCodec.pathFromMetric(
      Map("__name__" -> "req.count", "zone" -> "us-east",
        "aaa" -> "a b", "" -> "skipped"), "prom."))
    assert(got(2) == GraphiteCodec.pathFromMetric(
      Map("__name__" -> "x%y", "zone" -> "z=1",
        "aaa" -> ".", "" -> "skipped"), "prom."))
  }

  test("vec_dot / vec_cosine / vec_l2norm bit-identical to the HOF fold") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(64) { i =>
      (i.toLong, Seq.fill(16)(rnd.nextDouble() * 2 - 1),
        Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    } :+ (64L, Seq.fill(16)(0.0), Seq.fill(16)(1.0)) // zero-norm → NULL cosine
    val df = rows.toDF("id", "a", "b")

    // the replaced HOF spelling, verbatim
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, p) => acc + p)
    def hofCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      try_divide(hofDot(a, b), sqrt(hofDot(a, a)) * sqrt(hofDot(b, b)))

    val out = df.select(
      VectorOps.dot(col("a"), col("b")).as("d"),
      hofDot(col("a"), col("b")).as("hd"),
      VectorOps.cosine(col("a"), col("b")).as("c"),
      hofCos(col("a"), col("b")).as("hc"),
      VectorOps.l2Norm(col("a")).as("n"),
      sqrt(hofDot(col("a"), col("a"))).as("hn")).collect()

    def bits(r: Row, i: Int): Any =
      if (r.isNullAt(i)) null else java.lang.Double.doubleToRawLongBits(r.getDouble(i))
    out.foreach { r =>
      assert(bits(r, 0) == bits(r, 1), "dot bits")
      assert(bits(r, 2) == bits(r, 3), "cosine bits")
      assert(bits(r, 4) == bits(r, 5), "norm bits")
    }
    assert(out.exists(_.isNullAt(2)), "zero-norm row exercises the NULL path")
  }

  test("length mismatch and NULL elements poison like zip_with") {
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),
      (2L, Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("id", "a", "b")
    val withNull = df.withColumn("an",
      when(col("id") === 2, array(lit(1.0), lit(null).cast("double")))
        .otherwise(col("a")))
    val out = withNull.select(col("id"),
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.dot(col("an"), col("a")).as("dn"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1),
          if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(out(1)._1 == null, "length mismatch → NULL")
    assert(out(2)._1 == 11.0)
    assert(out(2)._2 == null, "NULL element → NULL")
  }

  test("SQL functions registered via SparkSessionExtensions") {
    val r = spark.sql(
      """SELECT graphite_escape('a.b%c') AS e,
        |       opentsdb_unmarshal(opentsdb_marshal('x:y_z')) AS rt,
        |       vec_cosine(array(1d, 0d), array(1d, 0d)) AS c,
        |       vec_l2norm(array(3d, 4d)) AS n,
        |       vec_dot(array(1d, 2d), array(3d, 4d)) AS d,
        |       graphite_path(map('__name__', 'm.n', 'z', 'v'), 'p.') AS gp
        |""".stripMargin).collect().head
    assert(r.getString(0) == "a%2Eb%25c")
    assert(r.getString(1) == "x:y_z")
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 11.0)
    assert(r.getString(5) == "p.m%2En.z.v")
  }

  test("expressions plan inside whole-stage codegen (no UDF boundary)") {
    // non-foldable inputs (derived from range) so constant folding can't
    // evaluate the expressions at plan time
    val plan = spark.range(4)
      .select(concat(lit("a.b"), col("id").cast("string")).as("s"),
        array(col("id").cast("double"), lit(2.0)).as("v"))
      .select(GraphiteCodec.escapeCol(col("s")).as("e"),
        VectorOps.cosine(col("v"), col("v")).as("c"))
      .queryExecution.executedPlan.toString
    // '*(n)' marks a WholeStageCodegen subtree; the project carrying the
    // expressions must be inside one, and nothing may plan as ScalaUDF.
    val exprLine = plan.linesIterator
      .find(l => l.contains("graphite_escape")).getOrElse("")
    assert(exprLine.trim.startsWith("*"), s"not codegen'd:\n$plan")
    assert(!plan.contains("UDF"), s"UDF leaked into plan:\n$plan")
  }

  test("multi_pattern_count: overlaps, nested patterns, suffix links, " +
       "and build-time rejection of empty patterns") {
    import spark.implicits._
    def count(text: String, pats: Seq[String]): Long =
      Seq(Tuple1(text)).toDF("t")
        .select(GraftExtensions.multiPatternCount(col("t"), pats).as("n"))
        .collect()(0).getLong(0)
    // overlapping matches all count: "aba" in "ababa" at pos 1 and 3
    assert(count("ababa", Seq("aba")) == 2L)
    // nested pattern pair through the output chain: every "winbig"
    // also contains "win"
    assert(count("winbig casino win", Seq("win", "winbig casino")) == 3L)
    // suffix-link walk mid-mismatch: she×2, he inside both she's ×2,
    // hells inside shells ×1 — "he" and "hells" are only reachable
    // through suffix links, never by a root-path scan
    assert(count("shells she said", Seq("she", "he", "hells")) == 5L)
    // duplicate patterns double-count by contract
    assert(count("xx", Seq("x", "x")) == 4L)
    // no match, unicode text safe
    assert(count("café naïve", Seq("zzz")) == 0L)
    assert(count("naïve naïve", Seq("naïve")) == 2L)
    // empty pattern and empty list refuse at build
    intercept[IllegalArgumentException] {
      graft.expressions.AhoCorasick.build(Seq("a", ""))
    }
    intercept[IllegalArgumentException] {
      graft.expressions.AhoCorasick.build(Nil)
    }
    // plans inside whole-stage codegen, no UDF boundary (range, not a
    // local Seq — a literal input constant-folds the whole projection)
    val df = spark.range(4)
      .select(GraftExtensions.multiPatternCount(
        concat(lit("bad text "), col("id").cast("string")),
        Seq("bad", "worse")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator
      .find(_.contains("multi_pattern_count")).getOrElse("")
    assert(line.trim.startsWith("*"), s"not codegen'd:\n$plan")
  }

  test("bottom_k aggregate: k smallest ascending, cross-partition merge, " +
       "k past group size keeps all, sort-free object-hash plan") {
    import spark.implicits._
    val df = Seq(
      ("a", 5L, "p5"), ("a", 1L, "p1"), ("a", 3L, "p3"), ("a", 2L, "p2"),
      ("a", 4L, "p4"), ("b", 9L, "q9"), ("b", 7L, "q7")
    ).toDF("g", "ord", "p").repartition(4) // forces partial-state merges
    val agg = df.groupBy(col("g"))
      .agg(GraftExtensions.bottomK(
        struct(col("ord"), col("p")), 3).as("s"))
    val out = agg.orderBy("g").collect()
    def pairs(r: Row) = r.getAs[scala.collection.Seq[Row]]("s")
      .map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(pairs(out(0)) == Seq((1L, "p1"), (2L, "p2"), (3L, "p3")))
    // k exceeds the group: keep everything, still ascending
    assert(pairs(out(1)) == Seq((7L, "q7"), (9L, "q9")))
    // the point of the aggregate form: object-hash aggregation with
    // bounded state — no sort, no window, anywhere in the plan
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.toLowerCase.contains("window"), plan)
    // struct without a leading bigint ordering key refuses at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy(col("g"))
        .agg(GraftExtensions.bottomK(struct(col("p"), col("ord")), 3))
        .collect()
    }
  }
}
