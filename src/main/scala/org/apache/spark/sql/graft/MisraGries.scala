package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-memory heavy-hitter CANDIDATES (the Misra–Gries summary) as a
  * typed imperative aggregate — the sketch half of the two-pass "find
  * every item with frequency > n/(k+1)" pattern over a stream too large
  * to groupBy: a k-counter summary GUARANTEES no such item is absent
  * (est(x) ≥ freq(x) − n/(k+1) > 0 for heavy x), and a cheap exact
  * second pass over the ≤ k surviving candidates removes the false
  * positives — so the FINAL result is exactly the true heavy hitters,
  * independent of row order, partitioning, and merge schedule, even
  * though the summary's own estimates are order-dependent.
  *
  * MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS 2012):
  * merge = pointwise count sum, then subtract the (k+1)-st largest
  * count from every counter and drop non-positives. Error bounds add,
  * so the no-false-negative guarantee survives Spark's partial→final
  * aggregation tree — which is what makes this a fixed-memory
  * distributed operator rather than a single-pass trick.
  *
  * The decrement-all step is amortized O(1)/row: each arrival adds one
  * unit of total count and each decrement event retires k+1 units, so
  * at most n/(k+1) events of cost O(k) occur.
  *
  * Output: array<struct<item string, est bigint>> sorted (est desc,
  * item asc). Estimates are ORDER-DEPENDENT — callers wanting a
  * deterministic result must confirm candidates with an exact count
  * pass (the llm_heavy_hitters entry's shape). Null inputs are skipped
  * (SQL count semantics).
  */
case class MisraGries(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGries.Summary]
    with UnaryLike[Expression] {
  require(k >= 1, "need k >= 1")
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "misra_gries needs a string item column")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MisraGries.Summary =
    new MisraGries.Summary(k)

  override def update(buf: MisraGries.Summary,
                      input: InternalRow): MisraGries.Summary = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: MisraGries.Summary,
                     other: MisraGries.Summary): MisraGries.Summary = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MisraGries.Summary): Any = {
    val rows = buf.sorted.map { case (item, est) =>
      new GenericInternalRow(Array[Any](item, est)): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: MisraGries.Summary): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    val entries = buf.entries
    d.writeInt(entries.length)
    entries.foreach { case (item, est) =>
      val bytes = item.getBytes
      d.writeInt(bytes.length)
      d.write(bytes)
      d.writeLong(est)
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGries.Summary = {
    val d = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = d.readInt()
    val buf = new MisraGries.Summary(k)
    var i = 0
    while (i < n) {
      val len = d.readInt()
      val b = new Array[Byte](len)
      d.readFully(b)
      buf.put(UTF8String.fromBytes(b), d.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** k-counter Misra–Gries summary. Items are defensively copied on
    * insert — input UTF8Strings may point into reused row buffers.
    */
  final class Summary(k: Int) {
    private val m = new java.util.HashMap[UTF8String, Long](k * 2)

    /** Classic single-arrival step: hit → +1; room → insert 1; full →
      * decrement every counter by 1 and retire zeros (the arrival
      * itself is absorbed by the decrement).
      */
    def offer(item: UTF8String): Unit = {
      val cur = m.get(item) // counts are never 0, so 0 means absent
      // hit path: put() on an existing key keeps the stored (owned) key
      // and only swaps the value — no defensive copy needed
      if (cur != 0L) m.put(item, cur + 1L)
      else if (m.size < k) m.put(keyOf(item), 1L)
      else {
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
    }

    /** Raw insert for deserialization (counts already weighted). */
    def put(item: UTF8String, est: Long): Unit = m.put(item, est)

    /** Mergeable-summaries combine: pointwise sum, then subtract the
      * (k+1)-st largest count and drop non-positives (≤ k survive).
      */
    def mergeIn(other: Summary): Unit = {
      other.m.forEach { (item, est) =>
        val cur = m.get(item)
        if (cur != 0L || m.containsKey(item)) m.put(item, cur + est)
        else m.put(keyOf(item), est)
      }
      if (m.size > k) {
        val counts = new Array[Long](m.size)
        var i = 0
        m.forEach { (_, est) => counts(i) = est; i += 1 }
        java.util.Arrays.sort(counts)
        val cut = counts(m.size - k - 1) // (k+1)-st largest
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= cut) it.remove()
          else e.setValue(e.getValue - cut)
        }
      }
    }

    def entries: Array[(UTF8String, Long)] = {
      val out = new Array[(UTF8String, Long)](m.size)
      var i = 0
      m.forEach { (item, est) => out(i) = (item, est); i += 1 }
      out
    }

    def sorted: Array[(UTF8String, Long)] = {
      val out = entries
      java.util.Arrays.sort(out,
        (a: (UTF8String, Long), b: (UTF8String, Long)) => {
          val c = java.lang.Long.compare(b._2, a._2)
          if (c != 0) c else a._1.compareTo(b._1)
        })
      out
    }

    private def keyOf(item: UTF8String): UTF8String =
      UTF8String.fromBytes(item.getBytes)
  }
}
