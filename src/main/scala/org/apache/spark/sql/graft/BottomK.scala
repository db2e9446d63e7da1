package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Bounded per-group bottom-k as a typed imperative aggregate — the
  * deterministic group-sampling primitive. Input is a struct whose
  * FIRST field is a long ordering key (callers pass a content hash for
  * "uniform deterministic sample", or any score for "k best"); the
  * aggregate keeps the k structs with the smallest keys and returns
  * them as an ascending array.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY
  * g ORDER BY ord) <= k` sorts EVERY row of every group through a
  * shuffle (WindowGroupLimit prunes per partition, but the loser rows
  * still flow into the exchange and the sort still runs); collect_list
  * + slice(sort_array) holds whole groups in memory. This aggregate is
  * a size-k bounded heap with map-side partial combine: each executor
  * ships at most k rows per group into the shuffle, the canonical
  * bounded-state shape for "inspect 5 docs per source" over 100 TB.
  *
  * Determinism: ties on the ordering key keep the incumbent, so callers
  * wanting a total order must make the key unique (hash of a unique
  * id — the fixture convention). Not codegen'd (imperative aggregates
  * run in ObjectHashAggregate), which is the right trade: the state is
  * the point, not per-row arithmetic.
  */
case class BottomK(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomK.Heap] with UnaryLike[Expression] {
  require(k >= 1, "need k >= 1")
  private def structType: StructType =
    child.dataType.asInstanceOf[StructType]
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.nonEmpty && s.head.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "bottom_k needs struct(ord: bigint, ...) input")
    }
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k"

  override def createAggregationBuffer(): BottomK.Heap = new BottomK.Heap(k)

  override def update(buf: BottomK.Heap, input: InternalRow): BottomK.Heap = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // a null ordering key would read as 0 via getLong and rank
      // near-smallest — reject the row instead of poisoning the sample
      if (!row.isNullAt(0)) buf.offer(row.getLong(0), toUnsafe(row).copy())
    }
    buf
  }

  override def merge(buf: BottomK.Heap, other: BottomK.Heap): BottomK.Heap = {
    other.foreach((ord, row) => buf.offer(ord, row))
    buf
  }

  override def eval(buf: BottomK.Heap): Any =
    new GenericArrayData(buf.sortedRows.asInstanceOf[Array[Any]])

  @transient private lazy val project = UnsafeProjection.create(structType)
  private def toUnsafe(row: InternalRow): UnsafeRow = row match {
    case u: UnsafeRow => u
    case r => project(r)
  }

  override def serialize(buf: BottomK.Heap): Array[Byte] = {
    val rows = buf.sortedRows
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(rows.length)
    rows.foreach { r =>
      val bytes = r.getBytes
      d.writeInt(bytes.length)
      d.write(bytes)
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomK.Heap = {
    val d = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = d.readInt()
    val buf = new BottomK.Heap(k)
    val nFields = structType.length
    var i = 0
    while (i < n) {
      val len = d.readInt()
      val rowBytes = new Array[Byte](len)
      d.readFully(rowBytes)
      val row = new UnsafeRow(nFields)
      row.pointTo(rowBytes, len)
      buf.offer(row.getLong(0), row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomK =
    copy(child = newChild)
}

object BottomK {
  /** Size-bounded max-heap of (ord, row): keeps the k SMALLEST keys;
    * on a full heap an incoming key displaces only if strictly smaller
    * than the current maximum (ties keep the incumbent).
    */
  final class Heap(k: Int) {
    private val pq = new java.util.PriorityQueue[(Long, UnsafeRow)](
      math.min(k, 64),
      (a: (Long, UnsafeRow), b: (Long, UnsafeRow)) =>
        java.lang.Long.compare(b._1, a._1)) // max-heap
    def offer(ord: Long, row: UnsafeRow): Unit =
      if (pq.size < k) pq.add((ord, row))
      else if (ord < pq.peek()._1) { pq.poll(); pq.add((ord, row)) }
    def foreach(f: (Long, UnsafeRow) => Unit): Unit =
      pq.forEach(e => f(e._1, e._2))
    def sortedRows: Array[UnsafeRow] = {
      val arr = new Array[(Long, UnsafeRow)](pq.size)
      pq.toArray(arr)
      java.util.Arrays.sort(arr,
        (a: (Long, UnsafeRow), b: (Long, UnsafeRow)) =>
          java.lang.Long.compare(a._1, b._1))
      arr.map(_._2)
    }
  }
}
