package graft

import graft.llm.Sampling
import graft.operators.TimeSeriesOps
import org.apache.spark.sql.functions._

/** Specs for the time-series extension operators (as-of join,
  * sessionization) and deterministic sampling.
  */
class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join matches the latest right row at or before each left ts") {
    val l = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (1L, 5L, 50.0),
      (2L, 10L, 999.0)).toDF("k", "ts", "v")
    val r = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (1L, 30L, 3.0))
      .toDF("k", "ts", "rv")
    val out = TimeSeriesOps.asofJoin(l, r, Seq("k"), "ts", "rv", "asof_rv")
      .orderBy("k", "ts").collect()
    // k=1: ts=5 -> no match (null); ts=10 -> 1.0 (inclusive >=); ts=20 -> 2.0
    assert(out(0).isNullAt(out(0).fieldIndex("asof_rv")))
    assert(out(1).getAs[Double]("asof_rv") == 1.0)
    assert(out(2).getAs[Double]("asof_rv") == 2.0)
    // k=2 has no right rows at all
    assert(out(3).isNullAt(out(3).fieldIndex("asof_rv")))
  }

  test("asof join yields the matched row's NULL, not a stale earlier value") {
    val l = Seq((1L, 12L, 0.0)).toDF("k", "ts", "v")
    val r = Seq((1L, 5L, Some(2.0)), (1L, 10L, None)).toDF("k", "ts", "rv")
    val out = TimeSeriesOps.asofJoin(l, r, Seq("k"), "ts", "rv", "asof_rv").head
    // latest right row at ts<=12 is ts=10 whose value IS null
    assert(out.isNullAt(out.fieldIndex("asof_rv")))
  }

  test("asof join collapses duplicate right timestamps deterministically") {
    val l = Seq((1L, 10L, 0.0)).toDF("k", "ts", "v")
    val r = Seq((1L, 10L, 5.0), (1L, 10L, 7.0)).toDF("k", "ts", "rv")
    val out = TimeSeriesOps.asofJoin(l, r, Seq("k"), "ts", "rv", "asof_rv")
    assert(out.head.getAs[Double]("asof_rv") == 7.0) // max wins
  }

  test("asof join matches a naive per-row reference on random data") {
    val rnd = new scala.util.Random(11)
    val lRows = Seq.fill(120)((rnd.nextInt(5).toLong, rnd.nextInt(50).toLong,
      rnd.nextInt(100).toDouble))
    val rRows = Seq.fill(80)((rnd.nextInt(5).toLong, rnd.nextInt(50).toLong,
      rnd.nextInt(100).toDouble))
    val got = TimeSeriesOps.asofJoin(lRows.toDF("k", "ts", "v"),
        rRows.toDF("k", "ts", "rv"), Seq("k"), "ts", "rv", "arv")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sorted(Ordering.by((t: (Long, Long, Double, Option[Double])) =>
        (t._1, t._2, t._3, t._4.getOrElse(-1.0))))
    val want = lRows.map { case (k, ts, v) =>
      val eligible = rRows.filter(r => r._1 == k && r._2 <= ts)
      val arv = if (eligible.isEmpty) None
        else {
          val maxTs = eligible.map(_._2).max
          Some(eligible.filter(_._2 == maxTs).map(_._3).max) // dedup = max
        }
      (k, ts, v, arv)
    }.sorted(Ordering.by((t: (Long, Long, Double, Option[Double])) =>
      (t._1, t._2, t._3, t._4.getOrElse(-1.0))))
    assert(got.toSeq == want)
  }

  test("sessionize matches a naive linear scan on random data") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(150)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(10000).toLong, i.toLong))
    val got = TimeSeriesOps.sessionize(rows.toDF("user", "ts", "eid"),
        "user", "ts", 600L, Seq("eid"))
      .collect()
      .map(r => (r.getLong(2), r.getAs[Long]("session_id"))).toMap
    val want = rows.groupBy(_._1).flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      var session = 0L
      var prev = Long.MinValue
      ordered.map { case (_, ts, eid) =>
        if (prev == Long.MinValue || ts - prev > 600L) session += 1
        prev = ts
        eid -> session
      }
    }
    assert(got == want)
  }

  test("sessionize splits on gap and numbers sessions 1-based in time order") {
    val ev = Seq(
      (1L, 100L, 1L), (1L, 200L, 2L), (1L, 5000L, 3L), (1L, 5100L, 4L),
      (2L, 50L, 5L)).toDF("user", "ts", "eid")
    val out = TimeSeriesOps.sessionize(ev, "user", "ts", 3600L, Seq("eid"))
      .orderBy("user", "ts").collect()
    assert(out.map(_.getAs[Long]("session_id")).toSeq == Seq(1L, 1L, 2L, 2L, 1L))
  }

  test("asof join plans without any join operator (union+window shape)") {
    val l = Seq((1L, 10L, 1.0)).toDF("k", "ts", "v")
    val r = Seq((1L, 5L, 2.0)).toDF("k", "ts", "rv")
    val plan = TimeSeriesOps.asofJoin(l, r, Seq("k"), "ts", "rv", "arv")
      .queryExecution.executedPlan.toString
    // the scale guarantee: no |left| x |right-per-key| intermediate ever
    assert(!plan.contains("Join"), s"unexpected join in plan:\n$plan")
  }

  test("sessionize plans one shuffle driving both window passes") {
    val ev = Seq((1L, 100L, 1L)).toDF("user", "ts", "eid")
    val plan = TimeSeriesOps.sessionize(ev, "user", "ts", 3600L, Seq("eid"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("salted aggregation equals the plain aggregate regardless of salt") {
    val df = Seq(("a", 1, 1.5), ("a", 2, 2.5), ("a", 3, 3.0), ("b", 4, 10.0))
      .toDF("k", "seed", "v")
    for (buckets <- Seq(1, 4, 16)) {
      val out = graft.operators.Salting
        .saltedSumCount(df, Seq("k"), "v", "seed", buckets)
        .collect().map(r => r.getString(0) ->
          ((r.getAs[Long]("cnt"), r.getAs[Double]("total")))).toMap
      assert(out == Map("a" -> ((3L, 7.0)), "b" -> ((1L, 10.0))),
        s"buckets=$buckets")
    }
  }

  test("pack bins: first-fit-in-order by start offset; oversized doc isolated") {
    val docs = Seq(
      ("en", 1L, 60L), ("en", 2L, 50L),   // bin 0 (offsets 0, 60)
      ("en", 3L, 200L),                   // starts at 110 -> bin 1 (oversized)
      ("en", 4L, 30L),                    // starts at 310 -> bin 3
      ("de", 5L, 10L))                    // own group, bin 0
      .toDF("lang", "doc_id", "n_tokens")
    val out = Sampling.packBins(docs, "lang", "doc_id", "n_tokens", 100L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("bin"), r.getAs[Long]("bin_offset")))).toMap
    assert(out(1L) == ((0L, 0L)) && out(2L) == ((0L, 60L)))
    assert(out(3L) == ((1L, 110L)))
    assert(out(4L) == ((3L, 310L)))
    assert(out(5L) == ((0L, 0L)))
  }

  test("intervalJoin: inclusive bounds, exactly-once across bucket " +
       "replicas, key separation, inverted intervals dropped") {
    import spark.implicits._
    val ev = Seq(
      ("u1", 100L, 1.0), ("u1", 150L, 2.0), ("u1", 201L, 4.0),
      ("u2", 150L, 8.0), ("u1", 950L, 16.0)).toDF("k", "ts", "v")
    val iv = Seq(
      ("u1", 100L, 200L, "a"),   // spans buckets 1 and 2 at bucket=100
      ("u1", 900L, 1000L, "b"),
      ("u2", 0L, 99L, "c"),      // u2's event at 150 misses this
      ("u1", 500L, 400L, "bad")  // inverted: must vanish, not descend
    ).toDF("k", "s", "e", "tag")
    val got = TimeSeriesOps.intervalJoin(ev, "ts", iv, "s", "e",
        Seq("k"), 100L)
      .select(col("k"), col("ts"), col("tag")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    // ts=100 and ts=200 are inclusive ends; ts=201 is out; each matching
    // pair appears ONCE though interval "a" was replicated into 2 buckets
    assert(got == Set(("u1", 100L, "a"), ("u1", 150L, "a"),
      ("u1", 950L, "b")))
  }

  test("split is a stable pure function of the id with sane proportions") {
    val ids = spark.range(0, 10000).toDF("id")
    val splits = ids.select(Sampling.split(col("id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits("train") > 7500 && splits("train") < 8500)
    assert(splits("val") > 700 && splits("val") < 1300)
    assert(splits("test") > 700 && splits("test") < 1300)
    // same id -> same split, always
    val twice = ids.select(col("id"), Sampling.split(col("id")).as("a"))
      .join(ids.select(col("id"), Sampling.split(col("id")).as("b")), "id")
      .filter(col("a") =!= col("b")).count()
    assert(twice == 0)
  }

  test("counterIncrease: reset rule, bucket attribution, first-sample " +
       "and single-sample series") {
    val s = Seq(
      (1L, 100L, 10.0), (1L, 200L, 25.0), (1L, 300L, 5.0),
      (1L, 3700L, 6.5), // bucket-straddling pair: delta lands in bucket 1
      (2L, 50L, 7.0)    // lone sample: nothing to diff
    ).toDF("k", "ts", "v")
    val out = TimeSeriesOps.counterIncrease(s, Seq("k"), "ts", "v", 3600L)
      .orderBy("k", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // k=1 bucket 0: +15 counted, drop to 5 is a reset contributing the
    // full post-reset value; first sample contributes nothing
    assert(out(0) == (1L, 0L, 3L, 1L, 20000000L, 5555L))
    // k=1 bucket 1: 6.5 - 5.0 crosses the bucket edge, attributed here
    assert(out(1) == (1L, 1L, 1L, 0L, 1500000L, 416L))
    assert(out(2) == (2L, 0L, 1L, 0L, 0L, 0L))
  }

  test("gapFill: LOCF within the staleness bound, per-series grid, " +
       "duplicate-second dedup, pre-first-sample grid point is empty") {
    val s = Seq(
      (1L, 900L, 1.0), (1L, 1000L, 2.0), (1L, 1000L, 1.5), // dup second
      (1L, 4000L, 3.0),
      (2L, 100L, 9.0) // grid floor puts its one point BEFORE the sample
    ).toDF("k", "ts", "v")
    val out = TimeSeriesOps.gapFill(s, Seq("k"), "ts", "v", 900L, 1800L)
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getDouble(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 900L, 1.0, 1L),   // exact hit
      (1L, 1800L, 2.0, 1L),  // carried max of the duplicate second
      (1L, 2700L, 2.0, 1L),  // age 1700 still inside the bound
      (1L, 3600L, null, 0L), // age 2600 > 1800: stale
      (2L, 0L, null, 0L)))   // nothing at or before the grid point
  }

  test("asofJoinForward: earliest right row at-or-after, inclusive on " +
       "equal timestamps, null past the last right row") {
    val l = Seq((1L, 7L, 0.0), (1L, 10L, 0.0), (1L, 12L, 0.0))
      .toDF("k", "ts", "lv")
    val r = Seq((1L, 5L, 50.0), (1L, 10L, 100.0)).toDF("k", "ts", "rv")
    val out = TimeSeriesOps
      .asofJoinForward(l, r, Seq("k"), "ts", "rv", "nxt")
      .orderBy("ts").collect()
      .map(x => (x.getAs[Long]("ts"),
        if (x.isNullAt(x.fieldIndex("nxt"))) null else x.getAs[Double]("nxt")))
    assert(out.toSeq == Seq((7L, 100.0), (10L, 100.0), (12L, null)))
  }

  test("rangeMedian: trailing exact median per series") {
    val s = Seq((1L, 0L, 1.0), (1L, 5L, 2.0), (1L, 10L, 4.0), (1L, 21L, 8.0))
      .toDF("k", "ts", "v")
    val out = TimeSeriesOps.rangeMedian(s, Seq("k"), "ts", "v", 10L)
      .orderBy("ts").collect()
      .map(r => (r.getAs[Long]("ts"), r.getAs[Double]("med")))
    // frames: [1], [1,2], [1,2,4], [8] (21-10=11 > 10 excludes ts<=10)
    assert(out.toSeq == Seq((0L, 1.0), (5L, 1.5), (10L, 2.0), (21L, 8.0)))
  }

  test("alertSpans: consecutive-sample firing with span bounds; short " +
       "bursts below minSamples never fire") {
    val s = Seq(
      (1L, 0L, 1L, 5.0), (1L, 1L, 2L, 150.0), (1L, 2L, 3L, 160.0),
      (1L, 3L, 4L, 170.0), (1L, 4L, 5L, 5.0), (1L, 5L, 6L, 150.0),
      (1L, 6L, 7L, 150.0), // 2-sample burst: below minSamples=3
      (1L, 7L, 8L, 5.0)
    ).toDF("k", "ts", "event_id", "v")
    val out = TimeSeriesOps.alertSpans(s, Seq("k"), "ts", "v",
        thresholdFp = 100000000L, minSamples = 3,
        orderCols = Seq("event_id"))
      .collect().map(r => (r.getAs[Long]("start_ts"),
        r.getAs[Long]("end_ts"), r.getAs[Long]("n_samples"),
        r.getAs[Long]("peak_fp")))
    assert(out.toSeq == Seq((1L, 3L, 3L, 170000000L)))
  }

  test("lttb: keeps endpoints and picks max-triangle points per bucket " +
       "(hand-computed), passes short series through complete") {
    // N=6, nOut=4 → 2 middle buckets {2,3} and {4,5}; double-spike
    // series: bucket 1 must keep the spike at ts=1 (area 60e6 vs 20e6),
    // bucket 2 the spike at ts=4 (area 30e6 vs 20e6)
    val s = Seq((1L, 0L, 0.0), (1L, 1L, 10.0), (1L, 2L, 0.0),
      (1L, 3L, 0.0), (1L, 4L, 10.0), (1L, 5L, 0.0),
      (2L, 0L, 1.0), (2L, 9L, 2.0)).toDF("k", "ts", "v")
    val out = TimeSeriesOps.lttb(s, Seq("k"), "ts", "v", 4)
      .orderBy("k", "rank").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("rank"),
        r.getAs[Long]("ts"), r.getAs[Long]("v_fp")))
    assert(out.filter(_._1 == 1L).map(x => (x._3, x._4)).toSeq ==
      Seq((0L, 0L), (1L, 10000000L), (4L, 10000000L), (5L, 0L)))
    // series shorter than nOut passes through complete, in order
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq(0L, 9L))
  }

  test("rangeAgg: trailing range frame includes duplicate-ts peers " +
       "deterministically") {
    val s = Seq(
      (1L, 0L, 1.0), (1L, 5L, 2.0), (1L, 10L, 4.0), (1L, 10L, 16.0),
      (1L, 21L, 8.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeriesOps.rangeAgg(s, Seq("k"), "ts", "v", 10L)
      .select(col("ts"), col("v"), col("n_window"), col("sum_fp"))
      .orderBy("ts", "v").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out(0) == (0L, 1L, 1000000L))
    assert(out(1) == (5L, 2L, 3000000L))
    // both ts=10 rows see the identical 4-row frame (peers included)
    assert(out(2) == (10L, 4L, 23000000L))
    assert(out(3) == (10L, 4L, 23000000L))
    // ts=21: the frame [11, 21] holds only itself
    assert(out(4) == (21L, 1L, 8000000L))
  }

  test("rangeAgg: min/last/avg_over_time — last picks greatest ts, " +
       "greatest value on duplicate ts; avg floors on the 1e-6 grid") {
    val s = Seq(
      (1L, 0L, 3.0), (1L, 5L, 1.0), (1L, 10L, 16.0), (1L, 10L, 4.0),
      (1L, 21L, 8.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeriesOps.rangeAgg(s, Seq("k"), "ts", "v", 10L)
      .select(col("ts"), col("v"), col("min_fp"), col("last_fp"),
        col("avg_fp"))
      .orderBy("ts", "v").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) == (0L, 3000000L, 3000000L, 3000000L))
    assert(out(1) == (5L, 1000000L, 1000000L, 2000000L))
    // frame at ts=10: {3,1,16,4}; last = the GREATER value at ts=10 (16),
    // identical for both duplicate-ts rows; avg = floor(24e6/4)
    assert(out(2) == (10L, 1000000L, 16000000L, 6000000L))
    assert(out(3) == (10L, 1000000L, 16000000L, 6000000L))
    assert(out(4) == (21L, 8000000L, 8000000L, 8000000L))
  }

  test("vectorMatch: group_right carries the right side's labels with " +
       "left-op-right operand order; ignoring() derives the key set") {
    val fine = Seq(("a", "u1", 1L, 10L), ("b", "u1", 1L, 30L),
      ("a", "u2", 1L, 5L)).toDF("typ", "user", "bucket", "sum")
    val coarse = Seq(("u1", 1L, 40L), ("u2", 1L, 5L), ("u3", 1L, 9L))
      .toDF("user", "bucket", "tot")
    val out = TimeSeriesOps.vectorMatchIgnoring(coarse, fine, Seq("typ"),
        (l, r) => l - r, "tot", "sum", "diff", carry = "right")
      .select(col("typ"), col("user"), col("bucket"), col("diff"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
      .toSet
    // output schema carries `typ` (right-only); diff = tot - sum (left
    // op right, regardless of carry); u3 (no fine rows) drops
    assert(out == Set(("a", "u1", 30L), ("b", "u1", 10L), ("a", "u2", 0L)))
    intercept[IllegalArgumentException] {
      TimeSeriesOps.vectorMatch(coarse, fine, Seq("user"),
        (l, r) => l - r, "tot", "sum", "x", carry = "sideways")
    }
    intercept[IllegalArgumentException] {
      // ignoring every shared label leaves nothing to match on
      TimeSeriesOps.vectorMatchIgnoring(coarse, fine,
        Seq("user", "bucket"), (l, r) => l - r, "tot", "sum", "x")
    }
  }

  test("linearRegress: exact slope/extrapolation on a straight line; " +
       "single-point windows are null") {
    val s = Seq((1L, 0L, 0.0), (1L, 10L, 10.0), (1L, 20L, 20.0))
      .toDF("k", "ts", "v")
    val out = TimeSeriesOps.linearRegress(s, Seq("k"), "ts", "v",
        windowSec = 100L, horizonSec = 30L)
      .orderBy("ts").collect()
    // first sample: n=1 → denom 0 → null slope and predict
    assert(out(0).getAs[Long]("n_window") == 1L)
    assert(out(0).isNullAt(out(0).fieldIndex("deriv_fp")))
    assert(out(0).isNullAt(out(0).fieldIndex("predict_fp")))
    // slope is exactly 1 unit/s = 1_000_000 fp/s; predict at t=20+30
    // on the fitted line is 50 units
    assert(out(2).getAs[Long]("n_window") == 3L)
    assert(out(2).getAs[Long]("deriv_fp") == 1000000L)
    assert(out(2).getAs[Long]("predict_fp") == 50000000L)
  }

  test("histogramQuantile: hand-computed interpolation, +Inf top bucket, " +
       "first-bucket lower bound, monotonic repair") {
    val inf = Double.PositiveInfinity
    def run(counts: Seq[(Double, Long)], q: Double): Seq[(Long, Long)] = {
      val df = counts.map { case (le, c) => (1L, 0L, le, c) }
        .toDF("k", "bucket", "le", "c")
      TimeSeriesOps.histogramQuantile(df, Seq("k"), "le", "bucket", "c", q)
        .collect().map(r => (r.getAs[Long]("total_fp"),
          r.getAs[Long]("quantile_fp"))).toSeq
    }
    // interpolation inside the middle bucket:
    // rank = 5, prev = 2, count = 8 → 0.1 + 0.4·(3/6) = 0.3
    assert(run(Seq((0.1, 2L), (0.5, 8L), (inf, 10L)), 0.5) ==
      Seq((10L, 300000L)))
    // rank in the +Inf bucket → highest finite le (0.5)
    assert(run(Seq((0.1, 2L), (0.5, 3L), (inf, 10L)), 0.9) ==
      Seq((10L, 500000L)))
    // rank in the FIRST bucket → interpolate from lower bound 0:
    // 0.1 · (5/6) = 0.08333…
    assert(run(Seq((0.1, 6L), (0.5, 8L), (inf, 10L)), 0.5) ==
      Seq((10L, 83333L)))
    // non-monotonic counts repaired by running max: 5,3,10 → 5,5,10;
    // rank 5 crosses at the first bucket (5 ≥ 5) → 0.1·(5/5) = 0.1
    assert(run(Seq((0.1, 5L), (0.5, 3L), (inf, 10L)), 0.5) ==
      Seq((10L, 100000L)))
    // zero total emits nothing
    assert(run(Seq((0.1, 0L), (0.5, 0L), (inf, 0L)), 0.5).isEmpty)
  }

  test("counterIncreaseSalted ≡ counterIncrease on random data with " +
       "resets and empty slices") {
    val rnd = new scala.util.Random(7)
    var v = 0.0
    val rows = (0 until 400).map { i =>
      // jumps forward with occasional resets; ~1/8 of slices left empty
      v = if (rnd.nextInt(10) == 0) rnd.nextInt(5).toDouble
          else v + rnd.nextInt(100) / 10.0
      val slice = rnd.nextInt(8)
      val ts = (if (slice == 3) rnd.nextInt(2) * 50L // slice 3 sparse
                else slice * 200L + rnd.nextInt(200)).toLong
      (rnd.nextInt(3).toLong, ts, i.toLong, v)
    }
    val df = rows.toDF("k", "ts", "id", "v")
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.orderBy("k", "bucket").collect().map(r =>
        (r.getAs[Long]("k"), r.getAs[Long]("bucket"),
          r.getAs[Long]("n_samples"), r.getAs[Long]("n_resets"),
          r.getAs[Long]("increase_fp"), r.getAs[Long]("rate_fp"))).toSeq
    val plain = canon(TimeSeriesOps.counterIncrease(
      df, Seq("k"), "ts", "v", 100L, Seq("id")))
    val salted = canon(TimeSeriesOps.counterIncreaseSalted(
      df, Seq("k"), "ts", "v", 100L, sliceSec = 200L, Seq("id")))
    assert(plain == salted)
    assert(plain.map(_._4).sum > 0, "fixture must exercise resets")
  }

  test("rangeStddev: exact population stddev over the trailing frame; " +
       "constant series are zero") {
    val s = Seq(
      (1L, 0L, 5.0), (1L, 10L, 5.0),   // constant → 0
      (2L, 0L, 0.0), (2L, 10L, 2.0)    // {0,2} → stddev 1
    ).toDF("k", "ts", "v")
    val out = TimeSeriesOps.rangeStddev(s, Seq("k"), "ts", "v", 100L)
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("stddev_fp")))
    assert(out.toSeq == Seq((1L, 0L), (1L, 0L), (2L, 0L), (2L, 1000000L)))
  }

  test("instantRate: last-gap rate with reset rule; series head and " +
       "duplicate timestamps are null") {
    val s = Seq(
      (1L, 0L, 1L, 10.0), (1L, 10L, 2L, 40.0),  // +30 over 10 s → 3/s
      (1L, 10L, 3L, 41.0),                       // dt=0 → null
      (1L, 20L, 4L, 5.0)                         // drop → reset: 5 over 10 s
    ).toDF("k", "ts", "id", "v")
    val out = TimeSeriesOps.instantRate(s, Seq("k"), "ts", "v", Seq("id"))
      .orderBy("ts", "id").collect()
      .map(r => if (r.isNullAt(r.fieldIndex("irate_fp"))) None
        else Some(r.getAs[Long]("irate_fp")))
    assert(out.toSeq == Seq(None, Some(3000000L), None, Some(500000L)))
  }

  test("changesOverTime counts consecutive transitions inside the " +
       "trailing window only") {
    val s = Seq(
      (1L, 0L, 1L, 1.0), (1L, 10L, 2L, 1.0),  // no change
      (1L, 20L, 3L, 2.0),                      // change 1
      (1L, 30L, 4L, 1.0),                      // change 2
      (1L, 200L, 5L, 5.0),                     // window [100,200] holds
                                               // only it: its transition's
                                               // older endpoint (ts=30) is
                                               // outside -> NOT counted
                                               // (PromQL boundary rule)
      (1L, 210L, 6L, 7.0)                      // change: both endpoints
                                               // (200, 210) in [110,210]
    ).toDF("k", "ts", "id", "v")
    val out = TimeSeriesOps.changesOverTime(s, Seq("k"), "ts", "v", 100L,
        Seq("id"))
      .orderBy("ts", "id").collect().map(_.getAs[Long]("changes"))
    assert(out.toSeq == Seq(0L, 0L, 1L, 2L, 0L, 1L))
    // the boundary straddle for a LATER output row: at ts=210 the frame
    // [110, 210] contains ts=200 whose predecessor (30) is outside ->
    // that transition stays uncounted while (200,210) counts
  }

  test("rangeAggSalted ≡ rangeAgg on random data with slice-straddling " +
       "frames and duplicate timestamps") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 500).map { i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(50).toDouble)
    }
    val df = rows.toDF("k", "ts", "v")
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.select(col("k"), col("ts"), col("v"), col("n_window"),
          col("sum_fp"), col("max_fp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(x => (x._1, x._2, x._3, x._4))
    val plain = canon(TimeSeriesOps.rangeAgg(df, Seq("k"), "ts", "v", 100L))
    val salted = canon(TimeSeriesOps.rangeAggSalted(
      df, Seq("k"), "ts", "v", windowSec = 100L, sliceSec = 250L))
    assert(plain.toSeq == salted.toSeq)
  }

  test("rangeQuantile: trailing p90 linear interpolation per series") {
    val s = Seq((1L, 0L, 1.0), (1L, 5L, 2.0), (1L, 10L, 4.0))
      .toDF("k", "ts", "v")
    val out = TimeSeriesOps.rangeQuantile(s, Seq("k"), "ts", "v", 10L,
        0.9, "q90")
      .orderBy("ts").collect()
      .map(r => (r.getAs[Long]("ts"), r.getAs[Double]("q90")))
    // frames [1] -> 1; [1,2] -> rank 0.9 -> 1.9; [1,2,4] -> rank 1.8 ->
    // 2 + 0.8*(4-2) = 3.6
    assert(out.toSeq == Seq((0L, 1.0), (5L, 1.9), (10L, 3.6)))
  }

  test("vectorMatch: one-to-one and group_left shapes; unmatched left " +
       "rows drop") {
    val left = Seq(("a", 1L, 10L), ("b", 1L, 30L), ("a", 2L, 5L),
      ("a", 9L, 7L)).toDF("name", "key", "value")
    val right = Seq((1L, 40L), (2L, 10L)).toDF("key", "value")
    val out = TimeSeriesOps.vectorMatch(left, right, Seq("key"),
        (l, r) => l * 100L / r, outCol = "pct")
      .orderBy("name", "key").collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("key"),
        r.getAs[Long]("pct")))
    // group_left: both a/1 and b/1 divide by the same right row; key=9
    // has no right match and drops
    assert(out.toSeq == Seq(("a", 1L, 25L), ("a", 2L, 50L),
      ("b", 1L, 75L)))
  }

  test("holtWinters: integer recurrence hand-computed; <2 samples null") {
    // sf=1/2, tf=1/4, xs = 10, 20, 40 (fp units directly via v = x/1e6)
    // s1=10 b1=10; x=20: s2=fd(20+20,2)=20, b2=fd(1*10+3*10,4)=10
    // x=40: s3=fd(40+30,2)=35, b3=fd(15+30,4)=11
    val s = Seq((1L, 0L, 1L, 10e-6), (1L, 10L, 2L, 20e-6),
      (1L, 20L, 3L, 40e-6), (2L, 0L, 4L, 5.0))
      .toDF("k", "ts", "event_id", "v")
    val out = TimeSeriesOps.holtWinters(s, Seq("k"), "ts", "v",
        1L, 2L, 1L, 4L, Seq("event_id"))
      .orderBy("k").collect()
    assert(out(0).getAs[Long]("smooth_fp") == 35L)
    assert(out(0).getAs[Long]("trend_fp") == 11L)
    assert(out(1).isNullAt(out(1).fieldIndex("smooth_fp")))
  }

  test("extrapolatedRate: boundary extrapolation, zero-crossing cap, " +
       "half-interval overhang, and n<2 null (hand-computed)") {
    // bucketSec=100. A: ts 10/50/90 v 0/40/60 -> raw=60 si=80 avg=40
    //   zero-cap: durZero = 80*(0/60)=0 -> ds=0; de=10<44 -> inc =
    //   60*((80+0+10)/80) = 67.5
    // B: ts 60/70/80 v 10/20/30 -> raw=20 si=20 avg=10 thr=11
    //   zero-cap: 20*(10/20)=10 < 60 -> ds1=10 < thr stays; de0=20>=11
    //   -> 5 -> inc = 20*((20+10+5)/20) = 35
    // C: single sample -> nulls
    val s = Seq(
      (1L, 10L, 1L, 0.0), (1L, 50L, 2L, 40.0), (1L, 90L, 3L, 60.0),
      (2L, 60L, 4L, 10.0), (2L, 70L, 5L, 20.0), (2L, 80L, 6L, 30.0),
      (3L, 5L, 7L, 7.0)
    ).toDF("k", "ts", "event_id", "v")
    val out = TimeSeriesOps.extrapolatedRate(s, Seq("k"), "ts", "v",
        100L, isCounter = true, Seq("event_id"))
      .orderBy("k").collect()
    assert(out(0).getAs[Long]("increase_fp") == 67500000L)
    assert(out(0).getAs[Long]("rate_fp") == 675000L)
    assert(out(1).getAs[Long]("increase_fp") == 35000000L)
    assert(out(1).getAs[Long]("rate_fp") == 350000L)
    assert(out(2).getAs[Long]("n_samples") == 1L)
    assert(out(2).isNullAt(out(2).fieldIndex("increase_fp")))
  }

  test("extrapolatedRate isCounter=false is delta(): plain differences, " +
       "no reset rule, no zero-cap") {
    // ts 10/50/90 v 50/30/40 -> gauge raw = -20+10 = -10, si=80 avg=40
    // ds=de=10 < 44 -> delta = -10*((80+10+10)/80) = -12.5
    // (counter form would reset-adjust to 30+10=40)
    val s = Seq((1L, 10L, 1L, 50.0), (1L, 50L, 2L, 30.0),
      (1L, 90L, 3L, 40.0)).toDF("k", "ts", "event_id", "v")
    val g = TimeSeriesOps.extrapolatedRate(s, Seq("k"), "ts", "v", 100L,
      isCounter = false, Seq("event_id")).collect()(0)
    assert(g.getAs[Long]("increase_fp") == -12500000L)
    val c = TimeSeriesOps.extrapolatedRate(s, Seq("k"), "ts", "v", 100L,
      isCounter = true, Seq("event_id")).collect()(0)
    assert(c.getAs[Long]("increase_fp") > 0L)
  }

  test("holtWinters: floored division on falling series (negative trend)") {
    // xs = 40, 20, 10: s1=40 b1=-20; x=20: s2=fd(20+20,2)=20,
    // b2=fd(-20-60,4)=-20; x=10: s3=fd(10+0,2)=5, b3=fd(-15-60,4)=
    // fd(-75,4)=-19 (floor, not truncate: -75/4=-18.75 -> -19)
    val s = Seq((1L, 0L, 40e-6), (1L, 10L, 20e-6), (1L, 20L, 10e-6))
      .toDF("k", "ts", "v")
    val out = TimeSeriesOps.holtWinters(s, Seq("k"), "ts", "v",
        1L, 2L, 1L, 4L).collect()
    assert(out(0).getAs[Long]("smooth_fp") == 5L)
    assert(out(0).getAs[Long]("trend_fp") == -19L)
  }

  test("holtWinters: per-series array bound enforced by construction — " +
       "over-maxPoints series fail fast, at-bound series fold") {
    val s = (0 until 10).map(i => (1L, i.toLong, i.toDouble))
      .toDF("k", "ts", "v")
    // 10 samples over a 5-point bound: descriptive refusal, not an OOM
    val e = intercept[Exception] {
      TimeSeriesOps.holtWinters(s, Seq("k"), "ts", "v", 1L, 2L, 1L, 4L,
        maxPoints = 5L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(e).exists(_.contains("pre-window the input")))
    // exactly at the bound: folds normally
    val ok = TimeSeriesOps.holtWinters(s, Seq("k"), "ts", "v", 1L, 2L,
      1L, 4L, maxPoints = 10L).collect()
    assert(ok(0).getAs[Long]("n_samples") == 10L)
    assert(!ok(0).isNullAt(ok(0).fieldIndex("smooth_fp")))
  }
}
