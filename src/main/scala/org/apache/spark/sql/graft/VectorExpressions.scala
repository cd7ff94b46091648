package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

/** 64-bit SimHash of an array of feature hashes, as one fused pass: each
  * hash votes ±1 on every bit, bit i of the result is set iff its vote
  * sum is strictly positive (2·pos > total — the tie-breaks-to-0
  * contract of the HOF formulation it replaces, pinned bit-equal in
  * DedupSpec vs the independent explode→Aggregator path).
  *
  * The portable formulation folds `sequence(0,63)` with a `filter` over
  * the hash array per bit — 64 interpreted array traversals with a
  * lambda allocation each, per ROW. This is the same arithmetic as one
  * generated O(64·n) primitive loop inside whole-stage codegen. Null
  * elements are not expected (inputs are feature-hash outputs); a null
  * array yields null. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = x.getLong(j)
      var i = 0
      while (i < 64) {
        votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $a.numElements();
         |final int[] $votes = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $h = $a.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $votes[$i] += ((($h >>> $i) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling hash of a string in [0, 1e9+7): h ← (31·h + cp)
  * mod P over the string's CODE POINTS — the exact arithmetic of the
  * portable formulation `aggregate(chars, 0L, (h,c) => (31h+ascii(c))%P)`
  * (ascii() yields the code point of its first character; DuckDB's
  * ascii() matches), fused into one generated loop instead of a
  * per-character lambda round-trip through a split array. The
  * engine-portable gram hash of the Bloom decontamination sketch. */
case class PolyHash31(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "polyhash31"

  private val P = 1000000007L

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (31L * h + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |final String $s = $a.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  final int $cp = $s.codePointAt($i);
         |  $h = (31L * $h + $cp) % ${P}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Engine-portable 60-bit polynomial string hash: two independent prime-
  * modulus rolling hashes over the code points in ONE generated pass —
  * h1 ← (31·h1 + cp) mod 1e9+7, h2 ← (131·h2 + cp) mod 998244353 —
  * combined as h2·2³⁰ + h1 (< 2⁶⁰, bits 60-63 always clear). Every
  * intermediate stays < 2³⁷, so an oracle engine reproduces the value
  * with plain ANSI BIGINT arithmetic (the same portability contract as
  * [[PolyHash31]], widened to enough bits for SimHash bit votes). */
case class PolyHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "polyhash60"

  private val P1 = 1000000007L
  private val P2 = 998244353L

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h1 = (31L * h1 + cp) % P1
      h2 = (131L * h2 + cp) % P2
      i += Character.charCount(cp)
    }
    h2 * 1073741824L + h1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |final String $s = $a.toString();
         |long $h1 = 0L;
         |long $h2 = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  final int $cp = $s.codePointAt($i);
         |  $h1 = (31L * $h1 + $cp) % ${P1}L;
         |  $h2 = (131L * $h2 + $cp) % ${P2}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h2 * 1073741824L + $h1;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorBridge {
  def dotQ(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductQ(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def simhash64(hs: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(hs)))

  def polyhash31(s: Column): Column =
    ExpressionUtils.column(PolyHash31(ExpressionUtils.expression(s)))

  def polyhash60(s: Column): Column =
    ExpressionUtils.column(PolyHash60(ExpressionUtils.expression(s)))
}
