package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable 60-bit hash (graft.pipeline.Portable) as one
  * native expression.
  *
  * The declarative form — `conv(substring(md5(s),1,15),16,10).cast(long)`
  * — is bit-identical but allocates three intermediate strings per value
  * (32-char hex, 15-char substring, base-10 string) and re-parses digits;
  * on a shingle-hashing scan that is 3 allocations × shingles-per-doc ×
  * corpus. The first 15 hex chars of an md5 are exactly the first 7.5
  * digest bytes, so the value is the first 8 bytes read big-endian,
  * shifted right 4 bits (unsigned) — straight from the digest buffer, no
  * strings at all. A shared ThreadLocal MessageDigest avoids per-row
  * allocation of the digest machinery.
  *
  * Equality with the declarative form (and therefore with the DuckDB
  * oracle's `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`) is
  * property-tested in Hash60Props.
  */
case class Hash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash60 expects string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    Hash60.hash60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.Hash60.hash60($v)")

  override protected def withNewChildInternal(newChild: Expression)
      : Hash60Expr = copy(child = newChild)
}

object Hash60 {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8 bytes): bytes [0,8) big-endian >>> 4. */
  def hash60(s: UTF8String): Long = hash60(s.getBytes, 0, -1)

  /** Same hash over a byte slice (len < 0 = to the end) — the shingle
    * walkers hash sub-ranges of one document buffer without slicing. */
  def hash60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, if (len < 0) bytes.length - off else len)
    val d = md.digest()
    val top8 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top8 >>> 4
  }
}
