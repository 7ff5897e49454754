package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
    if (out == null) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out) // no per-element boxing
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val arr = ctx.freshName("sigs")
      s"""
         |long[] $arr = graft.functions.MinhashSigs.eval($v, $n, $numHashes);
         |if ($arr == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : MinhashSigsExpr = copy(child = newChild)
}

object MinhashSigs {

  /** The affine-permutation modulus — THE single source (`Dedup.P`
    * aliases this). */
  val P = 2147483647L

  /** Affine permutation coefficients, flat-packed [a0,b0,a1,b1,…] — THE
    * single source of the permutation family (`Dedup.hashParams` derives
    * its pair view from this, so the two signature strategies cannot
    * drift). Cached per H. */
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  def affineParams(h: Int): Array[Long] =
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

  /** Null when the doc has fewer than n words (no shingles). The walk is
    * allocation-light on purpose — this runs once per document in the
    * scan projection: primitive offset arrays, an open-addressed
    * primitive long set for the distinct filter, and the shared
    * ThreadLocal digest via [[Hash60.hash60]]. */
  def eval(text: UTF8String, n: Int, numHashes: Int): Array[Long] = {
    val bytes = text.getBytes
    // word start/end offsets, skipping empty tokens; a doc of L bytes
    // has at most (L+1)/2 words
    val maxWords = bytes.length / 2 + 1
    val starts = new Array[Int](maxWords)
    val ends = new Array[Int](maxWords)
    var words = 0
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && bytes(i) == ' ') i += 1
      if (i < bytes.length) {
        starts(words) = i
        while (i < bytes.length && bytes(i) != ' ') i += 1
        ends(words) = i
        words += 1
      }
    }
    if (words < n) return null
    val ab = affineParams(numHashes)
    val mins = new Array[Long](numHashes + 1)
    java.util.Arrays.fill(mins, 0, numHashes, Long.MaxValue)
    // open-addressed set of the distinct 60-bit hashes; 0 marks an empty
    // slot, so the (2^-60-probability) hash value 0 is tracked by a
    // dedicated flag to stay bit-exact with the aggregate twin;
    // capacity 2x shingles keeps probes short
    val shingleCount = words - n + 1
    var cap = java.lang.Integer.highestOneBit(
      math.max(4, shingleCount * 2) - 1) << 1
    if (cap <= 0) cap = 4
    val table = new Array[Long](cap)
    var seenZero = false
    var distinct = 0
    var w = 0
    while (w + n <= words) {
      // the shingle is the exact byte range from word w's start to word
      // w+n-1's end — single-space contract makes this identical to the
      // regex twin's captured string
      val sh = Hash60.hash60(bytes,
        starts(w), ends(w + n - 1) - starts(w))
      var fresh = false
      if (sh == 0L) {
        fresh = !seenZero
        seenZero = true
      } else {
        var slot = (java.lang.Long.hashCode(sh) & (cap - 1))
        var done = false
        while (!done) {
          val cur = table(slot)
          if (cur == 0L) { table(slot) = sh; fresh = true; done = true }
          else if (cur == sh) done = true
          else slot = (slot + 1) & (cap - 1)
        }
      }
      if (fresh) {
        distinct += 1
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
    mins(numHashes) = distinct.toLong
    mins
  }
}
