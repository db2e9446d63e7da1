package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators beyond the reference's own surface: as-of join
  * and sessionization. These are the two relational shapes a metrics/event
  * store user reaches for first that plain SQL joins do badly.
  *
  * Both are built on the union+window pattern rather than a range join:
  * ONE shuffle on the key, a per-key linear sort pass, and no candidate
  * blow-up — a theta/range join would explode to |left|×|right-per-key|
  * intermediates before filtering, which is exactly the shape that dies at
  * 100 TB. The window frame is running (UNBOUNDED PRECEDING..CURRENT), so
  * Spark evaluates it in a single streaming pass per key.
  */
object TimeSeriesOps {

  /** As-of join: for each left row, attach the right side's value at the
    * greatest right timestamp ≤ the left timestamp, per key (the semantics
    * of DuckDB/QuestDB `ASOF JOIN`, kdb `aj`).
    *
    * Right rows are first collapsed to one per (key, ts) — max value — so
    * the match is deterministic when the right side carries duplicate
    * timestamps. The merge tags right rows side=0 and left rows side=1;
    * sorting by (ts, side) puts a same-timestamp right row BEFORE the left
    * row, giving `>=` (inclusive) as-of semantics. The right value rides
    * in a single-field struct BOX so the running `last(ignoreNulls)`
    * tracks the latest right ROW, not the latest non-null value — a
    * matched right row whose value is NULL yields NULL (true ASOF
    * semantics), never a stale earlier value.
    *
    * @param rightValAlias output column; must not collide with a left column
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightValCol: String,
               rightValAlias: String): DataFrame = {
    val groupCols = (keys :+ tsCol).map(col)
    val rightDedup = right.groupBy(groupCols: _*)
      .agg(max(col(rightValCol)).as(rightValAlias))
    val boxType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(rightValAlias,
        rightDedup.schema(rightValAlias).dataType)))
    val lSide = left
      .withColumn("_side", lit(1))
      .withColumn("_rbox", lit(null).cast(boxType))
    val rSide = rightDedup
      .withColumn("_side", lit(0))
      .withColumn("_rbox", struct(col(rightValAlias)))
      .drop(rightValAlias)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide, allowMissingColumns = true)
      .withColumn(rightValAlias,
        last(col("_rbox"), ignoreNulls = true).over(w)
          .getField(rightValAlias))
      .filter(col("_side") === 1)
      .drop("_side", "_rbox")
  }

  /** Interval (point-in-range) join: each left event at `tsCol` = t
    * matches the right intervals [startCol, endCol] with the same keys
    * that contain t. Spark plans a raw BETWEEN join as
    * BroadcastNestedLoopJoin (every event × every interval) the moment
    * the right side stops fitting in a broadcast — the classic range-join
    * blow-up. This instead chunks time into `bucketSec` buckets,
    * replicates each interval into the buckets it overlaps, and
    * EQUI-joins on (keys, bucket): shuffle volume is events + interval
    * replicas, and each event meets only the intervals sharing its
    * bucket. An event lives in exactly one bucket, so every matching
    * (event, interval) pair joins exactly once — no post-dedup.
    *
    * Pick `bucketSec` near the typical interval length: replication is
    * ceil(len/bucketSec)+1 per interval, while a too-small bucket costs
    * replicas and a too-large one degrades toward per-bucket cross
    * products. Both inputs keep their columns; the containment filter
    * runs on the joined row (map-side, after the equi-join prunes).
    */
  def intervalJoin(events: DataFrame, tsCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   keys: Seq[String], bucketSec: Long): DataFrame = {
    require(bucketSec > 0)
    val evB = events.withColumn("_bucket",
      floor(col(tsCol) / bucketSec).cast("long"))
    // end < start would make sequence() count DOWN (a silent wrong-bucket
    // replication); such intervals can't contain anything — drop them
    val ivB = intervals.filter(col(startCol) <= col(endCol))
      .withColumn("_bucket",
        explode(sequence(floor(col(startCol) / bucketSec).cast("long"),
          floor(col(endCol) / bucketSec).cast("long"))))
    evB.join(ivB, keys :+ "_bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Sessionization: split each key's event stream into sessions separated
    * by gaps > `gapSec`. Adds `session_id` (1-based, per key, in time
    * order). Two window expressions over the SAME (key, order) window, so
    * Spark plans one shuffle + one sort for both.
    *
    * @param orderCols extra tie-break columns after the timestamp (pass a
    *                  unique event id for a fully deterministic numbering)
    */
  def sessionize(events: DataFrame, keyCol: String, tsSecCol: String,
                 gapSec: Long, orderCols: Seq[String] = Nil): DataFrame = {
    val ord = (col(tsSecCol) +: orderCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsSecCol), 1).over(w)
    val isNew = when(prev.isNull || col(tsSecCol) - prev > gapSec, 1L)
      .otherwise(0L)
    events.withColumn("session_id", sum(isNew).over(wRun))
  }
}
