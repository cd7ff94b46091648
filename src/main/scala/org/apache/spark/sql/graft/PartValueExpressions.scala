package org.apache.spark.sql.graft

import graft.delta.PartValueIndex
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Partition-value scan expression (same design as [[RowIdOf]]): the
  * per-file partition-value table rides a `Broadcast[PartValueIndex]`
  * and the per-row lookup is codegen'd into the scan — so a partitioned
  * table whose files sit outside the hive-discoverable root plans ONE
  * relation instead of one per partition-value group.
  *
  * Output is the raw log string (nullable — the null-partition
  * sentinel); callers cast to the declared partition-column type,
  * mirroring hive partition-dir semantics. */
case class PartValueOf(
    index: Broadcast[PartValueIndex],
    ordinal: Int,
    child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "part_value_of"

  override def nullSafeEval(p: Any): Any =
    index.value.value(p.asInstanceOf[UTF8String], ordinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcast = ctx.addReferenceObj("partValueIndexBcast", index,
      classOf[Broadcast[PartValueIndex]].getName)
    nullSafeCodeGen(ctx, ev, p => s"""
      ${ev.value} = ((graft.delta.PartValueIndex) $bcast.value()).value($p, $ordinal);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PartValueExpressions {
  def partValue(index: Broadcast[PartValueIndex], ordinal: Int, path: Column): Column =
    ExpressionUtils.column(PartValueOf(index, ordinal, ExpressionUtils.expression(path)))
}
