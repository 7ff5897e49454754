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
