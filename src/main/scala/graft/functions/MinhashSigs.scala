package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole minhash signature of a document in ONE map-side pass:
  * `minhash_sigs(text)` returns `[h_0 … h_{H-1}, distinctShingles]` —
  * the H banded-LSH signature minima over the doc's distinct word
  * `n`-gram shingles plus the set size the Jaccard step needs.
  *
  * The declarative twin (`Dedup.shinglePostings` → groupBy(id) with H
  * `min` aggregates) must SHUFFLE every (id, shingle-hash) posting to
  * build signatures; this expression folds the shingle walk, the
  * [[Hash60]] content hash, the distinct filter, and all H affine minima
  * into the projection, so signature construction costs zero exchanges
  * at any corpus size (the posting shuffle then only runs
  * candidate-restricted, for verification). Bit-equality with the
  * aggregate path is spec-gated (`MinhashSigsSpec`), and the q31 oracle
  * gates the end-to-end result.
  *
  * Contract shared with `Dedup.shingles`: single-space-separated text
  * (the regex twin treats a doc with doubled spaces as having no shingle
  * across the gap; this walker, like the rest of the pipeline, assumes
  * normalized text — normalize upstream otherwise). Documents with fewer
  * than `n` words have no shingles and return null (absent from the
  * aggregate path for the same reason).
  */
case class MinhashSigsExpr(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 && numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs needs n > 0 and numHashes > 0, got ($n, $numHashes)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val out = MinhashSigs.eval(v.asInstanceOf[UTF8String], n, numHashes)
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val arr = ctx.freshName("sigs")
      s"""
         |long[] $arr = graft.functions.MinhashSigs.eval($v, $n, $numHashes);
         |if ($arr == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : MinhashSigsExpr = copy(child = newChild)
}

object MinhashSigs {

  /** Affine permutation coefficients — MUST stay identical to
    * `Dedup.hashParams` (the spec asserts signature equality, which
    * covers this). Cached per (H). */
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private val P = 2147483647L

  private def params(h: Int): Array[Long] =
    paramCache.computeIfAbsent(h, _ => {
      val out = new Array[Long](2 * h)
      var i = 0
      while (i < h) {
        out(2 * i) = 1L + ((i + 1) * 2654435761L) % (P - 1)
        out(2 * i + 1) = ((i + 1) * 1013904223L) % P
        i += 1
      }
      out
    })

  /** Null when the doc has fewer than n words (no shingles). */
  def eval(text: UTF8String, n: Int, numHashes: Int): Array[Long] = {
    val bytes = text.getBytes
    // word start/end offsets, skipping empty tokens
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && bytes(i) == ' ') i += 1
      if (i < bytes.length) {
        starts.add(i)
        while (i < bytes.length && bytes(i) != ' ') i += 1
        ends.add(i)
      }
    }
    val words = starts.size()
    if (words < n) return null
    val ab = params(numHashes)
    val mins = new Array[Long](numHashes + 1)
    java.util.Arrays.fill(mins, 0, numHashes, Long.MaxValue)
    val seen = new java.util.HashSet[java.lang.Long]()
    val md = java.security.MessageDigest.getInstance("MD5")
    var w = 0
    while (w + n <= words) {
      // the shingle is the exact byte range from word w's start to word
      // w+n-1's end — single-space contract makes this identical to the
      // regex twin's captured string
      md.reset()
      md.update(bytes, starts.get(w), ends.get(w + n - 1) - starts.get(w))
      val d = md.digest()
      val sh = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      if (seen.add(sh)) {
        val x = sh % P
        var k = 0
        while (k < numHashes) {
          val v = (ab(2 * k) * x + ab(2 * k + 1)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      w += 1
    }
    mins(numHashes) = seen.size().toLong
    mins
  }
}
