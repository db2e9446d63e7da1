package org.apache.spark.sql.graft

import graft.expressions.Kernels
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the byte-level wire codecs (E7-E10).
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` (the
  * `inputTypes` contract of ExpectsInputTypes) and the Column↔Expression
  * bridge are `private[sql]` — the standard placement for third-party
  * native expressions.
  *
  * These replace the Scala UDF spelling: a UDF sits outside whole-stage
  * codegen and pays a per-row InternalRow→Scala conversion; a native
  * expression with `doGenCode` stays inside the generated loop and hands
  * the kernel the raw `UTF8String` — no encoder, no boxing of the row.
  * Semantics are byte-for-byte those of `graft.codec.*` (the kernels
  * delegate), which are golden-tested against the reference's vectors
  * (reference: graphite/escape.go:82-103, opentsdb/tagvalue.go:65-158).
  */
case class GraphiteEscape(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graphite_escape"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.graphiteEscape(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.graphiteEscape($c)")
  override protected def withNewChildInternal(newChild: Expression): GraphiteEscape =
    copy(child = newChild)
}

/** `prefix + escape(name) + ".label.escape(value)"...`, labels sorted by
  * name (reference: graphite/client.go:53-80).
  */
case class GraphitePath(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(MapType(StringType, StringType), StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graphite_path"
  override protected def nullSafeEval(labels: Any, prefix: Any): Any =
    Kernels.graphitePath(
      labels.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData],
      prefix.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (m, p) => s"graft.expressions.Kernels.graphitePath($m, $p)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraphitePath =
    copy(left = newLeft, right = newRight)
}

case class OpenTsdbMarshal(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "opentsdb_marshal"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.opentsdbMarshal(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.opentsdbMarshal($c)")
  override protected def withNewChildInternal(newChild: Expression): OpenTsdbMarshal =
    copy(child = newChild)
}

/** Exact inverse state machine; throws on an illegal escape sequence like
  * the reference errors (opentsdb/tagvalue.go:91-158) — same contract as
  * the former UDF.
  */
case class OpenTsdbUnmarshal(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "opentsdb_unmarshal"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.opentsdbUnmarshal(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.opentsdbUnmarshal($c)")
  override protected def withNewChildInternal(newChild: Expression): OpenTsdbUnmarshal =
    copy(child = newChild)
}
