package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit, typedLit}
import org.apache.spark.sql.types._

/** The `nprobe` nearest coarse-quantizer cells of an embedding — the
  * IVF index's assignment/probe primitive.
  *
  * The declarative form (`array_sort` over an `array(struct(dist, cell))`
  * built from nlist literal dot products) is correct but builds an
  * expression tree with nlist × dim literal leaves: at nlist=64, dim=64
  * that is a ~4k-node tree whose planning + codegen time dwarfs the
  * actual arithmetic at every phase (train, assign, probe). Here the
  * centroid matrix is ONE foldable literal child, folded once into flat
  * primitive arrays; the generated code is a single static call into a
  * tight loop — whole-stage-codegen friendly, O(nlist × dim) per row,
  * no allocation beyond the output ids.
  *
  * Distance key is |c|² − 2·v·c (|v|² is row-constant and drops out of
  * the ordering); ties break toward the lower cell id, matching the
  * `array_sort(struct(d, cell))` semantics it replaces.
  */
case class NearestCellsExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  @transient private lazy val cents: Array[Array[Double]] = {
    val arr = second.eval().asInstanceOf[ArrayData]
    val m = Array.tabulate(arr.numElements())(i => arr.getArray(i).toDoubleArray())
    // the kernel reads the matrix as flat c*dim offsets — a ragged row
    // would silently misalign every distance, so fail loudly instead
    m.find(_.length != m(0).length).foreach(r =>
      throw new IllegalArgumentException(
        s"nearest_cells: ragged centroid matrix (row of length ${r.length}" +
        s" vs ${m(0).length})"))
    m
  }
  @transient private lazy val dim: Int =
    if (cents.isEmpty) 0 else cents(0).length
  @transient private lazy val flat: Array[Double] = cents.flatten
  @transient private lazy val norms2: Array[Double] =
    cents.map(_.map(x => x * x).sum)
  @transient private lazy val nprobe: Int =
    third.eval().asInstanceOf[Number].intValue()

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    val centsOk = second.foldable && (second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _                                      => false
    })
    val probeOk = third.foldable && third.dataType == IntegerType
    if (vecOk && centsOk && probeOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_cells expects (array<float|double>, foldable " +
      s"array<array<double>>, foldable int); got (${first.dataType.sql}, " +
      s"${second.dataType.sql}, ${third.dataType.sql})")
  }

  override def nullSafeEval(v: Any, c: Any, p: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(NearestCells.nearest(
      v.asInstanceOf[ArrayData], isFloat, flat, norms2, dim, nprobe))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val flatRef = ctx.addReferenceObj("ivfFlat", flat, "double[]")
      val normsRef = ctx.addReferenceObj("ivfNorms2", norms2, "double[]")
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray(
         |    graft.functions.NearestCells.nearest(
         |      $v, $isFloat, $flatRef, $normsRef, $dim, $nprobe));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): NearestCellsExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NearestCells {

  /** Column API: ids of the `nprobe` cells nearest to `vec`, ascending
    * by distance. Requires [[VectorOps.ensureRegistered]]. */
  def apply(vec: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    call_function("nearest_cells", vec,
      typedLit(cents.map(_.toSeq).toSeq), lit(nprobe))

  /** The first `k` POSITIONS of a (key, id) argsort — ascending by
    * `Double.compare` on the key (NaN last), ties to the lower id.
    * The large-k selection shared by the flat kernel's nprobe > 64
    * path and [[NearestCellsHier]]'s; boxed index sort, so callers
    * keep small-k selections on their scan paths. */
  private[functions] def sortedPrefixPositions(keys: Array[Double],
      idOf: Int => Int, k: Int): Array[Int] = {
    val idx = Array.tabulate[Integer](keys.length)(Integer.valueOf)
    java.util.Arrays.sort(idx, (x: Integer, y: Integer) => {
      val cd = java.lang.Double.compare(keys(x), keys(y))
      if (cd != 0) cd else Integer.compare(idOf(x), idOf(y))
    })
    Array.tabulate(k)(j => idx(j).intValue())
  }

  /** Tight-loop kernel shared by eval and generated code. */
  def nearest(a: ArrayData, isFloat: Boolean, flat: Array[Double],
      norms2: Array[Double], dim: Int, nprobe: Int): Array[Int] = {
    val nlist = norms2.length
    val n = math.min(a.numElements(), dim)
    val dists = new Array[Double](nlist)
    var anyNaN = false
    var c = 0
    while (c < nlist) {
      var s = 0.0
      val off = c * dim
      var i = 0
      if (isFloat) while (i < n) { s += a.getFloat(i) * flat(off + i); i += 1 }
      else while (i < n) { s += a.getDouble(i) * flat(off + i); i += 1 }
      val d = norms2(c) - 2.0 * s
      if (d != d) anyNaN = true
      dists(c) = d
      c += 1
    }
    val k = math.min(nprobe, nlist)
    // selection is O(k x nlist): fine at probe-sized k, quadratic at the
    // fraction law's k ~ nlist/2 (19M compares per row at nlist=6250).
    // For large k, a full (dist, idx) index sort is the same ordering —
    // ascending distance, ties to the lower cell id — in O(nlist log
    // nlist). Equivalence holds only NaN-free (the scan's seed rule puts
    // a first-unused NaN cell AHEAD of finite ones; a sort would put it
    // last), so any NaN falls back to the scan. NaN distances require
    // NaN centroids — a pathology, not a path worth optimizing.
    if (k > 64 && !anyNaN)
      return sortedPrefixPositions(dists, i => i, k)
    val out = new Array[Int](k)
    val used = new Array[Boolean](nlist)
    var j = 0
    while (j < k) {
      // seed best with the first unused cell so an all-NaN distance row
      // (NaN comparisons are always false) still selects deterministically
      // instead of indexing used(-1)
      var best = -1
      var bd = 0.0
      var cc = 0
      while (cc < nlist) {
        if (!used(cc) && (best < 0 || dists(cc) < bd)) {
          bd = dists(cc); best = cc
        }
        cc += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    out
  }
}
