package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native int8-code kernels for quantized vector search.
  *
  * [[PackI8Expr]] packs `array<int>` quantization codes (already clamped
  * to [-127, 127] by [[graft.pipeline.Quantize]]) into a `binary` blob —
  * 1 byte per element instead of Spark's unsafe-array 4, so a dim-64
  * embedding rides the candidate shuffle as 64 bytes instead of ~256
  * (float32 array) or ~512 (double array). That factor is exactly what
  * an IVF-ADC candidate join moves per row at 100 TB.
  *
  * [[I8DotExpr]] is the scoring kernel: Σ a[i]*b[i] over two code blobs
  * as an exact BIGINT — integer accumulation has no rounding and no
  * ordering sensitivity, so a second engine reproduces every score
  * bit-for-bit (the property the q89 oracle gate stands on). Length
  * mismatch truncates to the shorter side, like [[VecDot]].
  *
  * Both generate tight primitive loops via `doGenCode` (the reference
  * fork's CUDA kernels play this role for its pipes apps, e.g.
  * `apps/pipes/kmeans/gpu-kmeans2D/kernel.cu`; on Spark the analogous
  * move is a codegen'd Expression inside whole-stage codegen).
  */
case class PackI8Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pack_i8 expects array<int>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = a.getInt(i).toByte; i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) $a.getInt($i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PackI8Expr = copy(child = newChild)
}

/** Max |x_i| of a float/double array as double — the int8 quantization
  * scale, natively.
  *
  * Declaratively this is `aggregate(v, 0.0, (a, x) => greatest(a,
  * abs(x)))`, but higher-order functions are CodegenFallback AND Catalyst
  * inlines the fold everywhere its alias is referenced — inside
  * [[graft.pipeline.Quantize]]'s codes lambda that re-evaluated the
  * whole 64-step interpreted fold PER ELEMENT (~4k interpreted steps per
  * row, measured dominating the q89 corpus projection). Value semantics
  * are identical: max is selection, not accumulation — same doubles out,
  * including the NaN-absorbs (`greatest` ranks NaN above all) and empty
  * → 0.0 behaviors. */
case class MaxAbsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"max_abs expects array<float|double>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    Int8Ops.maxAbs(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Int8Ops.maxAbs($a, $isFloat);")

  override protected def withNewChildInternal(
      newChild: Expression): MaxAbsExpr = copy(child = newChild)
}

/** Single-pass int8 quantize + pack: (vector, scale) → the byte blob
  * [[PackI8Expr]] would produce from [[graft.pipeline.Quantize]]'s
  * declarative codes — bit-identical arithmetic (the per-element round
  * is the same shortest-decimal HALF_UP Spark's `round` applies to
  * doubles), ONE evaluation per row, codegen'd. Non-positive or
  * non-finite scale → all-zero codes, matching the declarative guard. */
case class PackQuantExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }, right.dataType) match {
    case (true, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pack_quant expects (array<float|double>, double), got " +
      s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(v: Any, s: Any): Any =
    Int8Ops.packQuant(v.asInstanceOf[ArrayData], isFloat,
      s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, s) =>
      s"${ev.value} = graft.functions.Int8Ops.packQuant($v, $isFloat, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackQuantExpr =
    copy(left = newLeft, right = newRight)
}

object Int8Ops {

  /** Kernel shared by [[MaxAbsExpr]]'s eval and generated code. */
  def maxAbs(a: ArrayData, isFloat: Boolean): Double = {
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
      // NaN absorbs, like greatest(): x > m is false for NaN, so test it
      if (java.lang.Double.isNaN(x) || x > m) m = x
      i += 1
    }
    m
  }

  /** Shortest-decimal HALF_UP round to an integer — exactly what Spark's
    * `round(double)` computes via BigDecimal. The BigDecimal constructor
    * costs ~70 ns/element (it dominated q89's whole-stage profile), so the
    * unambiguous cases take an arithmetic fast path: for |x| ≤ 127 the
    * fraction `|x| - floor(|x|)` is fp-exact (Sterbenz: both operands
    * within a factor of 2), and the shortest-decimal rendering of x sits
    * within half an ulp (< 1e-14 at this magnitude) of x itself — so
    * whenever the fraction is more than 1e-9 away from exactly 0.5, binary
    * and shortest-decimal agree on which side of the half boundary x is,
    * and round-to-nearest needs no BigDecimal. Only the ambiguous band
    * falls back. Callers guarantee x is finite (the scale guard below). */
  private def roundHalfUp(x: Double): Double = {
    val ax = math.abs(x)
    val k = math.floor(ax)
    val frac = ax - k
    if (frac > 0.4999999990 && frac < 0.5000000010)
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    else {
      val r = if (frac < 0.5) k else k + 1.0
      if (x < 0) -r else r
    }
  }

  /** Kernel shared by [[PackQuantExpr]]'s eval and generated code. The
    * round is shortest-decimal HALF_UP — exactly what Spark's
    * `round(double)` performs (see [[roundHalfUp]]), so the blob equals
    * pack_i8 over the declarative codes byte for byte. */
  def packQuant(a: ArrayData, isFloat: Boolean, scale: Double): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    if (scale > 0.0 && scale < Double.PositiveInfinity) {
      var i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val r = roundHalfUp(x / scale * 127.0)
        out(i) = math.max(-127.0, math.min(127.0, r)).toInt.toByte
        i += 1
      }
    }
    out
  }
}

/** Exact integer dot product of two packed int8 code blobs (see
  * [[PackI8Expr]]): Σ a[i]*b[i] as long; min-length truncation; null in
  * → null out. */
case class I8DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"i8_dot expects (binary, binary), got ${left.dataType.sql}, " +
      right.dataType.sql)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
    val n = math.min(a.length, b.length)
    var s = 0L
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a[$i] * $b[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): I8DotExpr =
    copy(left = newLeft, right = newRight)
}
