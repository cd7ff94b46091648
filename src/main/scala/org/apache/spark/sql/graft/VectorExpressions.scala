package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}
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

/** Product-quantization encoder: for each of `m` subspaces of width `w`,
  * the index (in [0, codes)) of the nearest codebook centroid by exact
  * BIGINT squared distance, ties to the lower code. `codebooks` is the
  * flattened [subspace][code][dim] centroid table in the same micro-unit
  * quantization as the input vector.
  *
  * The portable formulation (per subspace: `array_min` over `codes`
  * structs each holding an `aggregate(zip_with(...))` distance) is
  * bit-identical but runs as interpreted higher-order functions —
  * m·codes array allocations and m·codes·w lambda round-trips per ROW
  * (measured as the dominant cost of IVF-PQ indexing at 200k vectors).
  * This is the same arithmetic as one generated O(m·codes·w) primitive
  * loop inside whole-stage codegen. A vector whose length ≠ m·w yields
  * NULL (a silent partial encode would be worse). With m=1, codes=nlist,
  * w=dim this is also the IVF coarse-cell assignment — no ML-pipeline
  * UDF in the scan path. */
case class PqEncodeQ(child: Expression, codebooks: IndexedSeq[Long],
    m: Int, codes: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(codebooks.length == m * codes * w,
    s"codebook table must be m*codes*w = ${m * codes * w} longs: ${codebooks.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_q"

  @transient private lazy val cb: Array[Long] = codebooks.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != m * w) null
    else {
      val out = new Array[Int](m)
      var j = 0
      while (j < m) {
        var best = Long.MaxValue
        var bi = 0
        var c = 0
        while (c < codes) {
          var d = 0L
          val base = (j * codes + c) * w
          var i = 0
          while (i < w) {
            val t = x.getLong(j * w + i) - cb(base + i)
            d += t * t
            i += 1
          }
          if (d < best) { best = d; bi = c }
          c += 1
        }
        out(j) = bi
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", cb, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val base = ctx.freshName("base")
      s"""
         |if ($a.numElements() != ${m * w}) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int[] $out = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    long $best = Long.MAX_VALUE;
         |    int $bi = 0;
         |    for (int $c = 0; $c < $codes; $c++) {
         |      long $d = 0L;
         |      final int $base = ($j * $codes + $c) * $w;
         |      for (int $i = 0; $i < $w; $i++) {
         |        final long $t = $a.getLong($j * $w + $i) - $cbRef[$base + $i];
         |        $d += $t * $t;
         |      }
         |      if ($d < $best) { $best = $d; $bi = $c; }
         |    }
         |    $out[$j] = $bi;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC lookup: Σ_j lut[j][codes[j]] — the asymmetric-distance sum of a
  * PQ-coded vector against a per-query lookup table (array of `m`
  * arrays of `codes` BIGINT distances). One generated loop instead of an
  * interpreted zip_with+aggregate per candidate row. NULL on a
  * lut/codes arity mismatch or an out-of-range code. */
case class AdcLookupQ(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(ArrayType(LongType)))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_lookup_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val cs = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = cs.numElements()
    if (lut.numElements() != m) null
    else {
      var s = 0L
      var j = 0
      while (j < m) {
        val row = lut.getArray(j)
        val c = cs.getInt(j)
        if (c < 0 || c >= row.numElements()) return null
        s += row.getLong(c)
        j += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mN = ctx.freshName("m")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |final int $mN = $a.numElements();
         |if ($b.numElements() != $mN) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $j = 0; $j < $mN && !$bad; $j++) {
         |    final org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($j);
         |    final int $c = $a.getInt($j);
         |    if ($c < 0 || $c >= $row.numElements()) { $bad = true; }
         |    else { $acc += $row.getLong($c); }
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All length-`spanLen` window hashes of a string in ONE generated O(n)
  * pass — the exact-substring-dedup span keys (Lee et al.) without
  * materializing the O(n·spanLen) substring payload before hashing.
  * Window i carries the polyhash60-family value over the window's
  * UTF-16 code units: h1 ← base-31 mod 1e9+7, h2 ← base-131 mod
  * 998244353, combined h2·2³⁰ + h1 (< 2⁶⁰). Rolling update removes the
  * leading unit via the precomputed baseᴸ⁻¹ mod P, so every
  * intermediate stays far below 2⁶³ (max ~2·P·base + 2¹⁶). Strings
  * shorter than the span yield an empty array. */
case class RollingHash60(child: Expression, spanLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(spanLen > 0, s"spanLen must be positive: $spanLen")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_hash60"

  private val P1 = 1000000007L
  private val P2 = 998244353L
  private def powMod(b: Long, e: Int, p: Long): Long = {
    var r = 1L; var base = b % p; var n = e
    while (n > 0) {
      if ((n & 1) == 1) r = r * base % p
      base = base * base % p
      n >>= 1
    }
    r
  }
  private val pow31: Long = powMod(31L, spanLen - 1, P1)
  private val pow131: Long = powMod(131L, spanLen - 1, P2)

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < spanLen) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val m = n - spanLen + 1
    val out = new Array[Long](m)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < spanLen) {
      val c = s.charAt(i).toLong
      h1 = (31L * h1 + c) % P1
      h2 = (131L * h2 + c) % P2
      i += 1
    }
    out(0) = h2 * 1073741824L + h1
    i = 1
    while (i < m) {
      val drop = s.charAt(i - 1).toLong
      val add = s.charAt(i + spanLen - 1).toLong
      h1 = ((h1 - drop * pow31 % P1 + P1) * 31L + add) % P1
      h2 = ((h2 - drop * pow131 % P2 + P2) * 131L + add) % P2
      out(i) = h2 * 1073741824L + h1
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val drop = ctx.freshName("drop")
      val add = ctx.freshName("add")
      s"""
         |final String $s = $a.toString();
         |final int $n = $s.length();
         |final int $m = $n < $spanLen ? 0 : $n - ${spanLen - 1};
         |final long[] $out = new long[$m];
         |long $h1 = 0L, $h2 = 0L;
         |if ($m > 0) {
         |  for (int $i = 0; $i < $spanLen; $i++) {
         |    final long $c = $s.charAt($i);
         |    $h1 = (31L * $h1 + $c) % ${P1}L;
         |    $h2 = (131L * $h2 + $c) % ${P2}L;
         |  }
         |  $out[0] = $h2 * 1073741824L + $h1;
         |  for (int $i = 1; $i < $m; $i++) {
         |    final long $drop = $s.charAt($i - 1);
         |    final long $add = $s.charAt($i + ${spanLen - 1});
         |    $h1 = (($h1 - $drop * ${pow31}L % ${P1}L + ${P1}L) * 31L + $add) % ${P1}L;
         |    $h2 = (($h2 - $drop * ${pow131}L % ${P2}L + ${P2}L) * 131L + $add) % ${P2}L;
         |    $out[$i] = $h2 * 1073741824L + $h1;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing selection (Schleimer/Wilkerson/Aiken) over a document's
  * rolling-hash sequence: every length-`window` window contributes its
  * minimum hash with RIGHTMOST tie-break, and the result is the distinct
  * selected positions (1-based, ascending) — `element_at(hashes, pos)`
  * recovers the fingerprint value. Arrays shorter than a full window
  * select their global (rightmost) minimum; empty arrays select nothing.
  *
  * One monotonic-deque pass — O(m) regardless of `window`, vs the
  * O(m·window) per-row frame recomputation of a `min(...) OVER (ROWS
  * BETWEEN CURRENT ROW AND window−1 FOLLOWING)` plan, and crucially with
  * NO doc_id sort-exchange: selection is a pure per-row array
  * computation, so winnowing an entire corpus is scan-local. The deque
  * pops on `>=` so an equal later hash evicts an earlier one — exactly
  * the rightmost-of-the-minima rule. */
case class WinnowSelect(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1, s"window must be >= 1: $window")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_select"

  // The deque kernel reads the input via toLongArray(), which requires
  // null-free elements. NULLABLE-TYPED arrays are ACCEPTED — transform()/
  // element_at()-built arrays are routinely typed containsNull = true
  // even when provably null-free, and an analysis-time rejection broke
  // those working queries (ADVICE r16) — but an ACTUAL null element
  // raises a descriptive runtime error instead of the kernel's bare NPE
  // (ADVICE r15). Declared-non-nullable inputs skip the runtime scan.
  private def nullElementError(pos: Int): Nothing =
    throw new IllegalArgumentException(
      s"$prettyName: null element at position ${pos + 1} — rolling-hash " +
        "arrays must be null-free (filter(h, x -> x IS NOT NULL) the " +
        "input, or fix the producer)")

  private lazy val elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullSafeEval(a: Any): Any = {
    val ad = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (elementsNullable) {
      var p = 0
      val len = ad.numElements()
      while (p < len) { if (ad.isNullAt(p)) nullElementError(p); p += 1 }
    }
    val hs = ad.toLongArray()
    val m = hs.length
    val sel = new Array[Boolean](m)
    val dq = new Array[Int](m + 1)
    var head = 0; var tail = 0
    val first = math.min(window, m) - 1
    var i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - window) head += 1
      if (i >= first) sel(dq(head)) = true
      i += 1
    }
    var n = 0; i = 0
    while (i < m) { if (sel(i)) n += 1; i += 1 }
    val out = new Array[Long](n)
    var j = 0; i = 0
    while (i < m) { if (sel(i)) { out(j) = i + 1L; j += 1 }; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val hs = ctx.freshName("hs")
      val m = ctx.freshName("m")
      val sel = ctx.freshName("sel")
      val dq = ctx.freshName("dq")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val first = ctx.freshName("first")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      // mirror of the interpreted path's null-element scan: only emitted
      // for nullable-TYPED inputs, so declared-null-free arrays keep the
      // guard-free kernel
      val guard = if (!elementsNullable) "" else
        s"""
           |for (int $p = 0; $p < $a.numElements(); $p++) {
           |  if ($a.isNullAt($p)) {
           |    throw new IllegalArgumentException(
           |      "winnow_select: null element at position " + ($p + 1) +
           |      " - rolling-hash arrays must be null-free (filter(h, x -> x IS NOT NULL) the input, or fix the producer)");
           |  }
           |}
         """.stripMargin
      s"""
         |$guard
         |final long[] $hs = $a.toLongArray();
         |final int $m = $hs.length;
         |final boolean[] $sel = new boolean[$m];
         |final int[] $dq = new int[$m + 1];
         |int $head = 0, $tail = 0;
         |final int $first = java.lang.Math.min($window, $m) - 1;
         |for (int $i = 0; $i < $m; $i++) {
         |  while ($tail > $head && $hs[$dq[$tail - 1]] >= $hs[$i]) $tail--;
         |  $dq[$tail++] = $i;
         |  if ($dq[$head] <= $i - $window) $head++;
         |  if ($i >= $first) $sel[$dq[$head]] = true;
         |}
         |int $n = 0;
         |for (int $i = 0; $i < $m; $i++) if ($sel[$i]) $n++;
         |final long[] $out = new long[$n];
         |for (int $i = 0, $j = 0; $i < $m; $i++) if ($sel[$i]) $out[$j++] = $i + 1L;
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document DISTINCT word-n-gram polyhash31 values in ONE O(len)
  * pass — the fused form of
  * `explode(array_distinct(word n-gram strings))` → `polyhash31(gram)`
  * (the t16/t32 decontamination shape, `Decontamination.gramHash`).
  *
  * The composed formulation materializes every gram STRING: a 13-word
  * gram copies ~13× the text (slice + concat_ws per window), then
  * array_distinct hashes those strings, then polyhash31 re-walks each —
  * O(len·n) bytes touched per document. This kernel walks the text once:
  * prefix hashes + codepoint-count prefix + power table give each
  * window's hash in O(1), and distinctness dedupes on a 60-bit
  * double-prime key VERIFIED by an exact substring compare (so the
  * result is distinct-by-STRING, bit-identical to array_distinct — a
  * 60-bit collision cannot merge two different grams).
  *
  * Semantics contract (pinned in DecontaminationSpec vs the composed
  * path): words = `split(text, " ")` (single-space regex, trailing
  * empties kept); gram i = words[i..i+n) rejoined with " ", which is
  * exactly the original substring between the word boundaries (runs of
  * spaces round-trip through empty words); fewer than n words → one
  * whole-text gram; output order = first occurrence. Values are the
  * same polyhash31 the oracle SQL reproduces — swapping the composed
  * path for this kernel changes no query result.
  */
case class WordGramHash31(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, s"n must be positive: $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_gram_hash31"

  override def nullSafeEval(a: Any): Any =
    WordGramHash31.compute(a.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.WordGramHash31.compute(" +
        s"$a.toString(), $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The 60-bit sibling of [[WordGramHash31]]: per-document DISTINCT
  * word-n-gram `polyhash60` values (h2·2³⁰ + h1, the SimHash feature
  * hash) in one O(len) pass — the fused form of
  * `withShingleSet` → `transform(polyhash60)` (the t04 simhash shape).
  * Same distinct-by-STRING contract, same first-occurrence order; values
  * bit-identical to `polyhash60` over the materialized gram strings
  * (pinned in DedupSpec), so the simhash oracles are unchanged. */
case class WordGramHash60(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, s"n must be positive: $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_gram_hash60"

  override def nullSafeEval(a: Any): Any =
    WordGramHash31.compute60(a.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.WordGramHash31.compute60(" +
        s"$a.toString(), $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fixed-weight hashed-linear quality score — the fastText/DCLM curation
  * filter shape (VERDICT r14 #2): word n-grams of EXACTLY size `n`
  * ([[WordGramHash31]]'s shinglesOfWords split semantics — literal-space
  * split keeping empties; fewer than n words → one whole-text gram) hash
  * with the same polyhash31, index a FIXED weight table
  * (`weights[h mod weights.length]`, the table a codegen reference — the
  * broadcast-literal "model"), and accumulate an integer dot product over
  * gram OCCURRENCES (bag-of-features, not distinct — fastText counts).
  * Returns [score, n_grams] as longs — integer-exact end to end, so a
  * SQL oracle rebuilds the score bit-for-bit from the same fold. One
  * O(len·n) pass; no gram strings materialize. */
case class HashedLinearScoreQ(child: Expression, weights: IndexedSeq[Int], n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, s"n must be positive: $n")
  require(weights.nonEmpty, "weights must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_linear_score_q"

  @transient private lazy val w: Array[Int] = weights.toArray

  override def nullSafeEval(a: Any): Any =
    HashedLinearScoreQ.compute(a.asInstanceOf[UTF8String].toString, w, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("qualityWeights", w, "int[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.HashedLinearScoreQ.compute(" +
        s"$a.toString(), $wRef, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedLinearScoreQ {
  private val P1 = 1000000007L // polyhash31 modulus (shared with WordGramHash31)

  def compute(s: String, w: Array[Int], n: Int): ArrayData = {
    val len = s.length
    var nWords = 1
    var i = 0
    while (i < len) { if (s.charAt(i) == ' ') nWords += 1; i += 1 }
    val d = w.length
    var score = 0L
    var grams = 0L
    if (nWords < n) {
      // whole-text fallback gram (the shinglesOfWords short-doc contract)
      var h = 0L; i = 0
      while (i < len) {
        val cp = s.codePointAt(i)
        h = (31L * h + cp) % P1
        i += Character.charCount(cp)
      }
      score = w((h % d).toInt)
      grams = 1L
    } else {
      val starts = new Array[Int](nWords + 1)
      var wi = 1; i = 0
      while (i < len) { if (s.charAt(i) == ' ') { starts(wi) = i + 1; wi += 1 }; i += 1 }
      starts(nWords) = len + 1 // sentinel: gram (k, k+n) = s[starts(k), starts(k+n)-1)
      var k = 0
      while (k + n <= nWords) {
        val to = starts(k + n) - 1
        var h = 0L
        var j = starts(k)
        while (j < to) {
          val cp = s.codePointAt(j)
          h = (31L * h + cp) % P1
          j += Character.charCount(cp)
        }
        score += w((h % d).toInt)
        grams += 1L
        k += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(score, grams))
  }
}

object WordGramHash31 {
  private val P1 = 1000000007L // polyhash31 modulus (the value emitted)
  private val P2 = 998244353L  // second prime: dedupe-key discriminator only

  /** One-pass distinct gram hashes; static so codegen emits a single
    * call. Returns the polyhash31 of each distinct gram in
    * first-occurrence order. */
  def compute(s: String, n: Int): ArrayData = computeImpl(s, n, emit60 = false)

  /** Same pass, emitting the combined 60-bit polyhash60 per distinct
    * gram (the dedupe key itself). */
  def compute60(s: String, n: Int): ArrayData = computeImpl(s, n, emit60 = true)

  private def computeImpl(s: String, n: Int, emit60: Boolean): ArrayData = {
    val len = s.length
    // word starts: split on the literal ' ' keeps empty words, so word k
    // spans [start(k), space_k) and gram (i, i+n) is EXACTLY the text
    // substring [start(i), end(i+n-1))
    var nWords = 1
    var i = 0
    while (i < len) { if (s.charAt(i) == ' ') nWords += 1; i += 1 }
    if (nWords < n) {
      // single whole-text gram (the shinglesOfWords short-doc fallback)
      var h = 0L; var g2 = 0L; i = 0
      while (i < len) {
        val cp = s.codePointAt(i)
        h = (31L * h + cp) % P1; g2 = (131L * g2 + cp) % P2
        i += Character.charCount(cp)
      }
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(if (emit60) g2 * 1073741824L + h else h))
    }
    val starts = new Array[Int](nWords + 1)
    var w = 1
    i = 0
    while (i < len) { if (s.charAt(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
    starts(nWords) = len + 1 // sentinel: end(k) = starts(k+1) - 1
    // prefix hashes over code points + codepoint-count prefix + 31^k /
    // 131^k tables: any substring's (h1, h2) in O(1). Indices inside a
    // surrogate pair are never queried (gram boundaries are spaces/ends).
    val h1 = new Array[Long](len + 1)
    val h2 = new Array[Long](len + 1)
    val cpn = new Array[Int](len + 1)
    i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      val nh1 = (31L * h1(i) + cp) % P1
      val nh2 = (131L * h2(i) + cp) % P2
      h1(i + cc) = nh1; h2(i + cc) = nh2; cpn(i + cc) = cpn(i) + 1
      if (cc == 2) { h1(i + 1) = nh1; h2(i + 1) = nh2; cpn(i + 1) = cpn(i) } // unused
      i += cc
    }
    val maxCp = cpn(len)
    val pw1 = new Array[Long](maxCp + 1)
    val pw2 = new Array[Long](maxCp + 1)
    pw1(0) = 1L; pw2(0) = 1L
    i = 1
    while (i <= maxCp) {
      pw1(i) = pw1(i - 1) * 31L % P1; pw2(i) = pw2(i - 1) * 131L % P2; i += 1
    }
    @inline def sub1(a: Int, b: Int): Long =
      ((h1(b) - h1(a) * pw1(cpn(b) - cpn(a)) % P1) % P1 + P1) % P1
    @inline def sub2(a: Int, b: Int): Long =
      ((h2(b) - h2(a) * pw2(cpn(b) - cpn(a)) % P2) % P2 + P2) % P2
    // distinct-by-string: open-addressed table on the 60-bit key; a key
    // hit verifies the actual substring before dropping the gram, so
    // even a double-prime collision cannot merge two different grams
    val m = nWords - n + 1
    var cap = 16
    while (cap < m * 2) cap <<= 1
    val keys = new Array[Long](cap)     // 60-bit key + 1 (0 = empty slot)
    val slotA = new Array[Int](cap)     // kept gram's [start, end)
    val slotB = new Array[Int](cap)
    val out = new Array[Long](m)
    var nOut = 0
    var g = 0
    while (g < m) {
      val a = starts(g)
      val b = starts(g + n) - 1
      val k = sub2(a, b) * 1073741824L + sub1(a, b) + 1L
      var slot = ((k * -7046029254386353131L) >>> (64 - Integer.numberOfTrailingZeros(cap))).toInt
      var fresh = true
      var done = false
      while (!done) {
        if (keys(slot) == 0L) done = true
        else if (keys(slot) == k) {
          // verify by content: equal length then char compare
          val oa = slotA(slot); val ob = slotB(slot)
          if (ob - oa == b - a) {
            var j = 0; var eq = true
            while (eq && j < b - a) { eq = s.charAt(oa + j) == s.charAt(a + j); j += 1 }
            if (eq) { fresh = false; done = true }
            else slot = (slot + 1) & (cap - 1) // true 60-bit collision
          } else slot = (slot + 1) & (cap - 1)
        } else slot = (slot + 1) & (cap - 1)
      }
      if (fresh) {
        keys(slot) = k; slotA(slot) = a; slotB(slot) = b
        out(nOut) = if (emit60) k - 1L else sub1(a, b); nOut += 1
      }
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, nOut))
  }
}

/** Per-document DISTINCT word-n-gram `xxhash64` values in one O(len·n)
  * BYTE pass — the fused form of the MinHash shape
  * `withShingleSet` → `transform(sh_set, xxhash64)`
  * (gram strings materialized via slice + concat_ws, deduped by
  * array_distinct, then re-walked by xxhash64). A gram is EXACTLY the
  * original text's byte range between two word boundaries (split on the
  * literal ' ' keeps empty words, and 0x20 never occurs inside a UTF-8
  * multi-byte sequence), so each window hashes in place with Spark's own
  * `XXH64.hashUnsafeBytes` (seed 42 — the `xxhash64` SQL function's
  * seed) and no gram string is ever allocated.
  *
  * Distinctness is by STRING, bit-identical to `array_distinct`: the
  * dedupe table keys on the 64-bit hash but VERIFIES the actual bytes on
  * a key hit, so two different grams sharing an xxhash64 value both
  * emit (exactly as `transform(array_distinct(...), xxhash64)` would —
  * the duplicate VALUE is then the caller's collision guard's problem,
  * same contract as the composed path). First-occurrence order; fewer
  * than n words → one whole-text gram; null text → null. Pinned
  * bit-identical to the composed path in DedupSpec. */
case class WordGramXxhash64(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, s"n must be positive: $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_gram_xxhash64"

  override def nullSafeEval(a: Any): Any =
    WordGramXxhash64.compute(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.WordGramXxhash64.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGramXxhash64 {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.Platform

  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val r = WordGramWalk.walk(bytes, n)
    if (r == null)
      // single whole-text gram (the shinglesOfWords short-doc fallback:
      // array_join(split(text, " "), " ") round-trips to the text itself)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, WordGramWalk.Seed)))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(r.keys, r.count))
  }
}

/** The shared byte-level distinct word-gram core of [[WordGramXxhash64]]
  * and [[WordGrams]]: one boundary scan builds word starts, then each
  * n-word window (a byte range of the original text — split on the
  * literal ' ' keeps empty words, and 0x20 never occurs inside a UTF-8
  * multi-byte sequence) is deduped by an open-addressed table keyed on
  * the window's xxhash64 with the actual BYTES verified on every key
  * hit — a 64-bit collision between different grams keeps both, never
  * merges (the `array_distinct` contract). First-occurrence order.
  * Returns null for fewer than n words; callers emit their whole-text
  * fallback gram. [[WordGramHash31]] does NOT route here: its polyhash
  * keys come O(1) from code-point prefix hashes — a different scan. */
private[graft] object WordGramWalk {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.Platform

  private[graft] val Seed = 42L // xxhash64's fixed seed (XxHash64's one-arg ctor)

  /** Distinct grams: xxhash64 keys + byte ranges `[froms(i), tos(i))`,
    * valid for indices `< count`. */
  final class Grams(val keys: Array[Long], val froms: Array[Int],
      val tos: Array[Int], val count: Int)

  def walk(bytes: Array[Byte], n: Int): Grams = {
    val len = bytes.length
    var nWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) nWords += 1; i += 1 }
    if (nWords < n) return null
    val starts = new Array[Int](nWords + 1)
    var w = 1
    i = 0
    while (i < len) { if (bytes(i) == 0x20) { starts(w) = i + 1; w += 1 }; i += 1 }
    starts(nWords) = len + 1 // sentinel: end(k) = starts(k+1) - 1
    val m = nWords - n + 1
    var cap = 16
    while (cap < m * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val slotA = new Array[Int](cap) // kept gram's byte range [start, end)
    val slotB = new Array[Int](cap)
    java.util.Arrays.fill(slotA, -1) // -1 = empty slot
    val outK = new Array[Long](m)
    val outA = new Array[Int](m)
    val outB = new Array[Int](m)
    var nOut = 0
    var g = 0
    while (g < m) {
      val a = starts(g)
      val b = starts(g + n) - 1
      val k = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + a, b - a, Seed)
      var slot = ((k * -7046029254386353131L) >>> (64 - Integer.numberOfTrailingZeros(cap))).toInt
      var fresh = true
      var done = false
      while (!done) {
        if (slotA(slot) == -1) done = true
        else if (keys(slot) == k) {
          val oa = slotA(slot); val ob = slotB(slot)
          if (ob - oa == b - a) {
            var j = 0; var eq = true
            while (eq && j < b - a) { eq = bytes(oa + j) == bytes(a + j); j += 1 }
            if (eq) { fresh = false; done = true }
            else slot = (slot + 1) & (cap - 1) // true 64-bit collision
          } else slot = (slot + 1) & (cap - 1)
        } else slot = (slot + 1) & (cap - 1)
      }
      if (fresh) {
        keys(slot) = k; slotA(slot) = a; slotB(slot) = b
        outK(nOut) = k; outA(nOut) = a; outB(nOut) = b; nOut += 1
      }
      g += 1
    }
    new Grams(outK, outA, outB, nOut)
  }
}

/** Position-weighted rolling checksum fingerprint of a string:
  * `(Σ_i cp_i · ((i mod 64) + 1)) mod 1e9+7` over CODE POINTS — the
  * fused form of the t07 fingerprint shape
  * `aggregate(zip_with(split(text, ""), sequence(...), ...), 0L, +) % P`
  * (Spark's `split(s, "")` yields one element per code point — a
  * surrogate pair stays one element — and `ascii()` yields its code
  * point; empty text splits to an EMPTY array, so the fold's seed 0
  * survives). The composed path allocates the char array, the index
  * array, the zipped term array, and folds interpreted per element;
  * this is the same arithmetic as one generated codePointAt walk.
  * Per-term products are ≤ 0x10FFFF·64 ≈ 2^27, so the un-modded sum
  * cannot overflow for any realistic document — one mod at the end,
  * exactly like the HOF fold (TextAnalysisSpec pins bit-equality). */
case class Fingerprint31(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "fingerprint31"

  override def nullSafeEval(a: Any): Any =
    Fingerprint31.compute(a.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.Fingerprint31.compute($a.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fingerprint31 {
  def compute(s: String): Long = {
    var sum = 0L
    var i = 0
    var idx = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sum += cp.toLong * ((idx % 64) + 1)
      idx += 1
      i += Character.charCount(cp)
    }
    sum % 1000000007L
  }
}

/** Count of maximal ASCII-alphanumeric runs in a string — the fused
  * form of the BPE-ish token-count shape
  * `size(filter(split(text, "[^A-Za-z0-9]+"), t → length(t) > 0))`:
  * the regex split's non-empty tokens are exactly the maximal
  * `[A-Za-z0-9]` runs. Byte-level walk: UTF-8 continuation/lead bytes
  * are ≥ 0x80 and therefore non-alnum, exactly like the regex's
  * per-character class (TextAnalysisSpec pins equality). */
case class AlnumRunCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "alnum_run_count"

  override def nullSafeEval(a: Any): Any =
    AlnumRunCount.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.AlnumRunCount.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AlnumRunCount {
  def compute(s: UTF8String): Int = {
    val bytes = s.getBytes
    var runs = 0
    var in = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val alnum = (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
      if (alnum && !in) runs += 1
      in = alnum
      i += 1
    }
    runs
  }
}

/** Greedy longest-match tokenization statistics over a fixed merged
  * vocabulary — tokenizer-ACCURATE token counting (the BPE vocabulary
  * walk production tokenizers resolve to after training), replacing the
  * alnum-run approximation where budgets must match a real tokenizer.
  * At each position the longest vocabulary entry matching wins; no
  * entry → one code point. Returns `[n_tokens, checksum]` with
  * `checksum = Σ tokenIndex₁ₓ · tokenLen` — order-sensitive integer
  * arithmetic an oracle engine replays exactly (the t49 contract).
  *
  * One generated pass per row; the per-length hash-set probe is
  * O(maxEntryLen) per position (a byte-trie is the drop-in upgrade at
  * vocabulary sizes where the set probe dominates — the walk shape and
  * the emitted statistics are unchanged). ASCII-only vocabulary keeps
  * UTF-16 offsets and code-point positions in lockstep, so a SQL mirror
  * stepping by code points agrees on every boundary. */
case class BpeStatsQ(child: Expression, vocab: IndexedSeq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(vocab.nonEmpty && vocab.forall(v => v.length >= 2 && v.forall(_ < 0x80)),
    "vocab entries must be ASCII with length >= 2 (single chars are implicit)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_stats_q"

  @transient private lazy val table: BpeStatsQ.Table = BpeStatsQ.buildTable(vocab)

  override def nullSafeEval(a: Any): Any =
    BpeStatsQ.compute(a.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table,
      "org.apache.spark.sql.graft.BpeStatsQ.Table")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.BpeStatsQ.compute($a, $tRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeStatsQ {
  /** Per-length entry sets, lengths 2..maxLen. */
  final class Table(val maxLen: Int,
      val byLen: Array[java.util.HashSet[String]]) extends Serializable

  def buildTable(vocab: Seq[String]): Table = {
    val maxLen = vocab.map(_.length).max
    val byLen = new Array[java.util.HashSet[String]](maxLen + 1)
    vocab.foreach { v =>
      if (byLen(v.length) == null) byLen(v.length) = new java.util.HashSet[String]()
      byLen(v.length).add(v)
    }
    new Table(maxLen, byLen)
  }

  def compute(s: UTF8String, t: Table): ArrayData = {
    val str = s.toString
    val n = str.length
    var i = 0
    var ntok = 0L
    var ck = 0L
    while (i < n) {
      var matched = 0
      var len = math.min(t.maxLen, n - i)
      while (len >= 2 && matched == 0) {
        val set = t.byLen(len)
        if (set != null && set.contains(str.substring(i, i + len))) matched = len
        len -= 1
      }
      ntok += 1
      if (matched > 0) {
        ck += ntok * matched
        i += matched
      } else {
        // single code point: ASCII vocab keeps UTF-16 and code-point
        // positions aligned, so the fallback advances one code point
        ck += ntok
        i += Character.charCount(str.codePointAt(i))
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(ntok, ck))
  }
}

/** Per-document DISTINCT word n-gram STRINGS in one byte pass — the
  * fused form of the shingling shape itself,
  * `array_distinct(transform(sequence(...), i → concat_ws(" ",
  * slice(words, i+1, n))))` over `split(text, " ")`. The composed
  * formulation runs as interpreted higher-order functions and copies
  * every window through slice + concat_ws before array_distinct
  * re-walks the strings (measured as the dominant cost of every
  * string-shingle consumer); a gram is EXACTLY the original text's
  * byte range between two word boundaries, so this kernel emits
  * zero-copy-deduped substring slices of the input in one walk.
  * Same distinct-by-STRING dedupe (hash-keyed, content-verified),
  * same first-occurrence order, same whole-text gram for docs with
  * fewer than n words — bit-identical to `Dedup.shinglesOfWords`
  * (DedupSpec pin). */
case class WordGrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, s"n must be positive: $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_grams"

  override def nullSafeEval(a: Any): Any =
    WordGrams.compute(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.WordGrams.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGrams {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val r = WordGramWalk.walk(bytes, n)
    if (r == null)
      // single whole-text gram (split + rejoin round-trips to the text)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](UTF8String.fromBytes(bytes, 0, bytes.length)))
    val out = new Array[Any](r.count)
    var i = 0
    while (i < r.count) {
      out(i) = UTF8String.fromBytes(bytes, r.froms(i), r.tos(i) - r.froms(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Fused 32-wide MinHash signature from an array of gram xxhash64
  * values — the fused form of
  * `transform(sequence(0, k−1), j → array_min(transform(hs, h →
  * pmod(a_j · pmod(h, P) + b_j, P))))`, which per row allocates k
  * intermediate arrays and round-trips k·|hs| interpreted lambdas. Same
  * arithmetic as one generated O(k·|hs|) primitive loop: each input
  * hash folds to `hp = ((h % p) + p) % p` ONCE, then every permutation
  * j takes `min((a_j·hp + b_j) % p)` (hp < p < 2³¹ and a_j < 2³¹ keep
  * the product under 2⁶², so the plain Java % IS pmod here — both
  * operands non-negative). Bit-identical to the HOF formulation and to
  * the shuffle-based MinhashSigAgg oracle (DedupSpec pin). Empty array
  * → NULL (callers filter empty gram sets first — the composed path
  * yielded an array of nulls there, which no caller consumed). */
case class MinhashSigQ(child: Expression, as: IndexedSeq[Long],
    bs: IndexedSeq[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(as.nonEmpty && as.length == bs.length,
    s"coefficient arrays must be non-empty and equal-length: ${as.length}/${bs.length}")
  require(p > 0, s"modulus must be positive: $p")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig_q"

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override def nullSafeEval(x: Any): Any =
    MinhashSigQ.compute(x.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.MinhashSigQ.compute(
         |  $x, $aRef, $bRef, ${p}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of DISTINCT common values of two ASCENDING-SORTED long arrays —
  * the fused form of `size(array_intersect(a, b))` for pre-sorted
  * inputs. `array_intersect` builds a hash set per ROW (allocation +
  * boxing per element, outside whole-stage codegen when nested in the
  * verify projection); this is one generated merge walk, O(|a|+|b|) with
  * zero allocation. Equal runs advance BOTH sides past the value, so
  * duplicate values count once — exactly array_intersect's
  * distinct-values contract. Inputs MUST be sorted ascending (callers
  * sort once at persist time); unsorted inputs silently undercount,
  * which is why the facade name carries the Sorted prefix. */
case class SortedIntersectCountQ(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count_q"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountQ.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.SortedIntersectCountQ.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountQ {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        cnt += 1
        while (i < n && a.getLong(i) == x) i += 1
        while (j < m && b.getLong(j) == x) j += 1
      }
    }
    cnt
  }
}

object MinhashSigQ {
  def compute(x: ArrayData, as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    val n = x.numElements()
    if (n == 0) return null
    val k = as.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val hp = ((x.getLong(i) % p) + p) % p
      var j = 0
      while (j < k) {
        val v = (as(j) * hp + bs(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object VectorBridge {
  /** The Catalyst expression a Column wraps — `ExpressionUtils` is
    * `private[sql]`, so engine code outside this package (the MERGE
    * by-source bound extractor) reaches it through this bridge. */
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)

  def dotQ(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductQ(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def simhash64(hs: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(hs)))

  def polyhash31(s: Column): Column =
    ExpressionUtils.column(PolyHash31(ExpressionUtils.expression(s)))

  def polyhash60(s: Column): Column =
    ExpressionUtils.column(PolyHash60(ExpressionUtils.expression(s)))

  def bpeStatsQ(s: Column, vocab: IndexedSeq[String]): Column =
    ExpressionUtils.column(BpeStatsQ(ExpressionUtils.expression(s), vocab))

  def rollingHash60(s: Column, spanLen: Int): Column =
    ExpressionUtils.column(RollingHash60(ExpressionUtils.expression(s), spanLen))

  def winnowSelect(hs: Column, window: Int): Column =
    ExpressionUtils.column(WinnowSelect(ExpressionUtils.expression(hs), window))

  def wordGramHash31(s: Column, n: Int): Column =
    ExpressionUtils.column(WordGramHash31(ExpressionUtils.expression(s), n))

  def hashedLinearScoreQ(s: Column, weights: IndexedSeq[Int], n: Int): Column =
    ExpressionUtils.column(HashedLinearScoreQ(ExpressionUtils.expression(s), weights, n))

  def wordGramHash60(s: Column, n: Int): Column =
    ExpressionUtils.column(WordGramHash60(ExpressionUtils.expression(s), n))

  def wordGramXxhash64(s: Column, n: Int): Column =
    ExpressionUtils.column(WordGramXxhash64(ExpressionUtils.expression(s), n))

  def minhashSigQ(hs: Column, as: IndexedSeq[Long], bs: IndexedSeq[Long], p: Long): Column =
    ExpressionUtils.column(MinhashSigQ(ExpressionUtils.expression(hs), as, bs, p))

  def sortedIntersectCountQ(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCountQ(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def wordGrams(s: Column, n: Int): Column =
    ExpressionUtils.column(WordGrams(ExpressionUtils.expression(s), n))

  def fingerprint31(s: Column): Column =
    ExpressionUtils.column(Fingerprint31(ExpressionUtils.expression(s)))

  def alnumRunCount(s: Column): Column =
    ExpressionUtils.column(AlnumRunCount(ExpressionUtils.expression(s)))

  def pqEncodeQ(v: Column, codebooks: IndexedSeq[Long],
      m: Int, codes: Int, w: Int): Column =
    ExpressionUtils.column(
      PqEncodeQ(ExpressionUtils.expression(v), codebooks, m, codes, w))

  def adcLookupQ(codes: Column, lut: Column): Column =
    ExpressionUtils.column(AdcLookupQ(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(lut)))
}
