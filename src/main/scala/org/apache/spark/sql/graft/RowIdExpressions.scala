package org.apache.spark.sql.graft

import graft.delta.RowIdIndex
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-tracking scan expressions (same design as [[DvProbe]]): the
  * per-file (baseRowId, defaultRowCommitVersion) table rides a
  * `Broadcast[RowIdIndex]` — fetched once per executor — and the per-row
  * materialization `base + row_index` is a codegen'd expression inlined
  * into whole-stage codegen, not a ScalaUDF.
  *
  * Lives in an `org.apache.spark.sql` subpackage because
  * `ExpectsInputTypes`/`ExpressionUtils` are `private[sql]`. */
case class RowIdOf(
    index: Broadcast[RowIdIndex],
    left: Expression,
    right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "row_id_of"

  override def nullSafeEval(p: Any, i: Any): Any =
    index.value.rowId(p.asInstanceOf[UTF8String], i.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcast = ctx.addReferenceObj("rowIdIndexBcast", index,
      classOf[Broadcast[RowIdIndex]].getName)
    nullSafeCodeGen(ctx, ev, (p, i) =>
      s"${ev.value} = ((graft.delta.RowIdIndex) $bcast.value()).rowId($p, $i);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class RowCommitVersionOf(
    index: Broadcast[RowIdIndex],
    child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "row_commit_version_of"

  override def nullSafeEval(p: Any): Any =
    index.value.commitVersion(p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcast = ctx.addReferenceObj("rowIdIndexBcast", index,
      classOf[Broadcast[RowIdIndex]].getName)
    defineCodeGen(ctx, ev, p =>
      s"((graft.delta.RowIdIndex) $bcast.value()).commitVersion($p)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RowIdExpressions {
  def rowId(index: Broadcast[RowIdIndex], path: Column, rowIndex: Column): Column =
    ExpressionUtils.column(RowIdOf(index,
      ExpressionUtils.expression(path), ExpressionUtils.expression(rowIndex)))

  def commitVersion(index: Broadcast[RowIdIndex], path: Column): Column =
    ExpressionUtils.column(RowCommitVersionOf(index, ExpressionUtils.expression(path)))
}
