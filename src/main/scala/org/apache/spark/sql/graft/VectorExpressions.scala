package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native codegen'd vector kernel for the similarity operators. Lives in
  * an `org.apache.spark.sql` subpackage (like `StreamingBridge`) because
  * `ExpectsInputTypes`' `AbstractDataType` and `ExpressionUtils` are
  * `private[sql]`; the public facade is `graft.functions.VectorFunctions`.
  *
  * The portable formulation `aggregate(zip_with(a, b, _ * _), 0L, _ + _)`
  * is correct but runs as interpreted higher-order functions: per row it
  * allocates the zipped array, then folds with a lambda — three object
  * hops per element, outside whole-stage codegen. This expression is the
  * same BIGINT dot product as a fused primitive loop over the two
  * `ArrayData`, generated inline into the surrounding codegen stage
  * (preference order per the build brief: native `Expression` with
  * `doGenCode` over HOFs over UDFs).
  *
  * Contract (bit-identical to the HOF path it replaces, pinned in
  * SimilaritySpec vs `Similarity.dotQViaHof`): inputs are quantized
  * embedding vectors — non-null BIGINT elements whose products and
  * partial sums stay within Long range (micro-unit quantization gives
  * |x| ≲ 2^21, so dims up to ~2^20 are safe). A dimension mismatch
  * yields NULL, exactly like the HOF (zip_with null-pads the shorter
  * side and the fold absorbs the null) — and a silent partial dot on a
  * dimension bug would be worse.
  */
case class DotProductQ(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0L
      var i = 0
      while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorBridge {
  def dotQ(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductQ(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
