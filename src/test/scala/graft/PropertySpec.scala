package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.accel.{DeviceProfile, HybridPolicy}
import graft.agg.TopKAggregator
import graft.apps.KMeansLocal
import graft.ops.KeyFieldSort

/** Property-based tests — the scalacheck upgrade of the reference's
  * generator-driven tests (TestDatamerge's random co-partitioned sources,
  * RandomWriter; SURVEY §5). These target the pure algorithmic kernels so
  * thousands of cases run without Spark job overhead. */
object HybridPolicyProps extends Properties("HybridPolicy") {

  private val profiles = for {
    nCpu <- Gen.choose(0, 8)
    nGpu <- Gen.choose(0, 4)
    if nCpu + nGpu > 0
    cpuMean <- Gen.choose(1, 100).map(_.toDouble)
    gpuMean <- Gen.choose(1, 100).map(_.toDouble)
  } yield DeviceProfile(nCpu, nGpu, cpuMean, gpuMean)

  property("split is optimal over every alternative split") =
    forAll(profiles, Gen.choose(0, 60)) { (p, pending) =>
      val (x, y) = HybridPolicy.split(pending, p)
      val f = HybridPolicy.makespan(x, y, p)
      x + y == pending && x >= 0 && y >= 0 &&
        (0 to pending).forall(alt =>
          f <= HybridPolicy.makespan(pending - alt, alt, p))
    }

  property("mixing never loses to single-device execution") =
    forAll(profiles, Gen.choose(0, 60)) { (p, pending) =>
      val (x, y) = HybridPolicy.split(pending, p)
      val f = HybridPolicy.makespan(x, y, p)
      f <= HybridPolicy.fCpuOnly(pending, p) + 1e-9 &&
        f <= HybridPolicy.fGpuOnly(pending, p) + 1e-9
    }
}

object TopKAggregatorProps extends Properties("TopKAggregator") {

  private val items = Gen.listOf(Gen.zip(
    Gen.choose(-1000, 1000).map(_.toDouble), Gen.choose(0L, 50L)))

  property("reduce == full sort take k (duplicates kept)") =
    forAll(items, Gen.choose(1, 5)) { (xs, k) =>
      val agg = new TopKAggregator(k)
      xs.foldLeft(agg.zero)(agg.reduce) ==
        xs.sortBy { case (v, id) => (-v, id) }.take(k)
    }

  property("merge of any split equals sequential reduce (combiner law)") =
    forAll(items, Gen.choose(0, 100), Gen.choose(1, 5)) { (xs, cut, k) =>
      val agg = new TopKAggregator(k)
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)) == xs.foldLeft(agg.zero)(agg.reduce)
    }
}

object KMeansLocalProps extends Properties("KMeansLocal") {

  private val problems = for {
    k <- Gen.choose(1, 4)
    n <- Gen.choose(k, 40)
    pts <- Gen.listOfN(n, Gen.zip(
      Gen.choose(0, 99).map(_.toFloat), Gen.choose(0, 99).map(_.toFloat)))
  } yield (k, pts.toArray)

  property("centroids stay in the data bounding box; iterations bounded") =
    forAll(problems) { case (k, pts) =>
      val (cents, iters) = KMeansLocal.lloyd(k, pts.take(k), pts)
      val xs = pts.map(_._1); val ys = pts.map(_._2)
      iters >= 1 && iters <= 100 && cents.length == k &&
        cents.forall { case (cx, cy) =>
          cx >= xs.min.toInt - 1 && cx <= xs.max.toInt + 1 &&
          cy >= ys.min.toInt - 1 && cy <= ys.max.toInt + 1
        }
    }
}

object KeyFieldSortProps extends Properties("KeyFieldSort") {

  property("parse handles every generated -k spec shape") = {
    val specGen = for {
      f <- Gen.choose(1, 9)
      c <- Gen.option(Gen.choose(1, 5))
      to <- Gen.option(Gen.choose(1, 9))
      opts <- Gen.someOf("n", "r").map(_.mkString)
    } yield {
      val from = s"$f${c.map("." + _).getOrElse("")}"
      s"-k$from$opts${to.map("," + _).getOrElse("")}"
    }
    forAll(specGen) { s =>
      val parsed = KeyFieldSort.parse(s)
      parsed.length == 1 && parsed.head.fromField >= 1
    }
  }

  property("multiple specs compose in order") =
    forAll(Gen.choose(1, 4)) { n =>
      val s = (1 to n).map(i => s"-k$i,${i}n").mkString(" ")
      KeyFieldSort.parse(s).length == n
    }
}

object NearestCellsProps extends Properties("NearestCells") {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import graft.functions.NearestCells

  private val cases = for {
    dim <- Gen.choose(1, 8)
    nlist <- Gen.choose(1, 12)
    nprobe <- Gen.choose(1, 12)
    vec <- Gen.listOfN(dim, Gen.choose(-50, 50).map(_.toDouble))
    cents <- Gen.listOfN(nlist,
      Gen.listOfN(dim, Gen.choose(-50, 50).map(_.toDouble)))
  } yield (vec.toArray, cents.map(_.toArray).toArray, nprobe)

  property("kernel equals naive argsort by (distance, cell)") =
    forAll(cases) { case (vec, cents, nprobe) =>
      val dim = vec.length
      val got = NearestCells.nearest(new GenericArrayData(vec),
        isFloat = false, cents.flatten, cents.map(_.map(x => x * x).sum),
        dim, nprobe).toSeq
      val expect = cents.zipWithIndex.map { case (c, i) =>
        val key = c.map(x => x * x).sum -
          2.0 * c.zip(vec).map { case (a, b) => a * b }.sum
        (key, i)
      }.sortBy(identity).take(math.min(nprobe, cents.length)).map(_._2).toSeq
      got == expect
    }

  // nprobe > 64 takes the index-sort path (the scan's selection is
  // O(nprobe x nlist) — quadratic at the fraction law's nprobe); the
  // two paths must order identically, ties to the lower cell id.
  // Duplicate centroids are generated deliberately (small value range)
  // so tie-breaks are actually exercised.
  private val bigCases = for {
    dim <- Gen.choose(1, 3)
    nlist <- Gen.choose(65, 160)
    nprobe <- Gen.choose(65, 160)
    vec <- Gen.listOfN(dim, Gen.choose(-3, 3).map(_.toDouble))
    cents <- Gen.listOfN(nlist,
      Gen.listOfN(dim, Gen.choose(-3, 3).map(_.toDouble)))
  } yield (vec.toArray, cents.map(_.toArray).toArray, nprobe)

  property("large-nprobe sort path equals the same naive argsort") =
    forAll(bigCases) { case (vec, cents, nprobe) =>
      val dim = vec.length
      val got = NearestCells.nearest(new GenericArrayData(vec),
        isFloat = false, cents.flatten, cents.map(_.map(x => x * x).sum),
        dim, nprobe).toSeq
      val expect = cents.zipWithIndex.map { case (c, i) =>
        val key = c.map(x => x * x).sum -
          2.0 * c.zip(vec).map { case (a, b) => a * b }.sum
        (key, i)
      }.sortBy(identity).take(math.min(nprobe, cents.length)).map(_._2).toSeq
      got == expect
    }
}

object NearestCellsHierProps extends Properties("NearestCellsHier") {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import graft.functions.NearestCellsHier

  // nlist/nprobe ranges straddle the kernel's 64-candidate selection
  // switch, so BOTH the scan and the sort paths are exercised
  private val cases = for {
    dim <- Gen.choose(1, 6)
    nlist <- Gen.choose(1, 140)
    nprobe <- Gen.choose(1, 140)
    gprobe <- Gen.choose(1, 14)
    vec <- Gen.listOfN(dim, Gen.choose(-50, 50).map(_.toDouble))
    cents <- Gen.listOfN(nlist,
      Gen.listOfN(dim, Gen.choose(-50, 50).map(_.toDouble)))
  } yield (vec.toArray, cents.map(_.toArray).toArray, gprobe, nprobe)

  // with gprobe covering EVERY group, the candidate set is every cell
  // (the grouping partitions the cells exactly once) and the two-level
  // kernel must reproduce the flat argsort bit-for-bit
  property("full group coverage equals the flat argsort by (distance, cell)") =
    forAll(cases) { case (vec, cents, _, nprobe) =>
      val h = NearestCellsHier.group(cents)
      val got = NearestCellsHier.nearest(new GenericArrayData(vec),
        isFloat = false, h, h.groups, nprobe).toSeq
      val expect = cents.zipWithIndex.map { case (c, i) =>
        val key = c.map(x => x * x).sum -
          2.0 * c.zip(vec).map { case (a, b) => a * b }.sum
        (key, i)
      }.sortBy(identity).take(math.min(nprobe, cents.length)).map(_._2).toSeq
      got == expect
    }

  // partial coverage: the kernel must equal a naive re-derivation FROM
  // THE SAME GROUPING — top-gprobe groups by (distance, group id), then
  // their member cells argsorted by (distance, cell id)
  property("partial group coverage equals the naive two-level selection") =
    forAll(cases) { case (vec, cents, gprobe, nprobe) =>
      val h = NearestCellsHier.group(cents)
      val got = NearestCellsHier.nearest(new GenericArrayData(vec),
        isFloat = false, h, gprobe, nprobe).toSeq
      val dim = vec.length
      def dist(flat: Array[Double], norms2: Array[Double], j: Int)
          : Double = {
        var s = 0.0
        var i = 0
        while (i < dim) { s += vec(i) * flat(j * dim + i); i += 1 }
        norms2(j) - 2.0 * s
      }
      val gp = math.min(gprobe, h.groups)
      val groupsPicked = (0 until h.groups)
        .map(j => (dist(h.groupFlat, h.groupNorms2, j), j))
        .sortBy(identity).take(gp).map(_._2)
      val cand = groupsPicked.flatMap(grp =>
        (h.offsets(grp) until h.offsets(grp + 1)).map(p =>
          (dist(h.cellFlat, h.cellNorms2, p), h.cellIds(p))))
      val expect = cand.sortBy(identity)
        .take(math.min(nprobe, cand.length)).map(_._2)
      got == expect
    }
}

object SignBucketsProps extends Properties("SignBuckets") {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import graft.functions.SignBuckets

  private val cases = for {
    dim <- Gen.choose(1, 8)
    planes <- Gen.choose(1, 5)
    tables <- Gen.choose(1, 4)
    vec <- Gen.listOfN(dim, Gen.choose(-50, 50).map(_.toDouble))
    rows <- Gen.listOfN(tables * planes,
      Gen.listOfN(dim, Gen.choose(-50, 50).map(_.toDouble)))
  } yield (vec.toArray, rows.map(_.toArray).toArray, planes, tables)

  property("kernel equals the declarative strict-sign bit packing") =
    forAll(cases) { case (vec, rows, planes, tables) =>
      val got = SignBuckets.buckets(new GenericArrayData(vec),
        isFloat = false, rows.flatten, vec.length, planes, tables).toSeq
      val expect = (0 until tables).map { t =>
        val bucket = (0 until planes).foldLeft(0L) { (acc, p) =>
          val dot = rows(t * planes + p).zip(vec)
            .map { case (a, b) => a * b }.sum
          if (dot > 0.0) acc | (1L << p) else acc
        }
        (t.toLong << 48) | bucket
      }
      got == expect
    }
}

object Hash60Props extends Properties("Hash60") {
  import org.apache.spark.unsafe.types.UTF8String

  /** Reference implementation: the declarative form's arithmetic —
    * first 15 hex chars of md5, parsed base-16. */
  private def reference(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  property("native kernel == declarative md5/substring/conv arithmetic") =
    forAll(Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.listOf(Gen.choose(32, 0x10FFFF)
        .retryUntil(c => !Character.isSurrogate(c.toChar) || c > 0xFFFF))
        .map(_.flatMap(Character.toChars(_)).mkString))) { s =>
      graft.functions.Hash60.hash60(UTF8String.fromString(s)) == reference(s)
    }
}

object Int8OpsProps extends Properties("Int8Ops") {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, BinaryType, IntegerType}
  import graft.functions.{I8DotExpr, PackI8Expr}

  private val nullArr = Literal.create(null, ArrayType(IntegerType))
  private val nullBin = Literal.create(null, BinaryType)
  private val codes =
    Gen.choose(0, 80).flatMap(n => Gen.listOfN(n, Gen.choose(-127, 127)))

  private def pack(xs: List[Int]): Array[Byte] =
    PackI8Expr(nullArr)
      .nullSafeEval(new GenericArrayData(xs.toArray))
      .asInstanceOf[Array[Byte]]

  property("pack is the exact byte image of the codes") =
    forAll(codes) { a =>
      pack(a).toList == a.map(_.toByte)
    }

  property("dot equals the exact integer sum, truncated to the shorter blob") =
    forAll(codes, codes) { (a, b) =>
      val got = I8DotExpr(nullBin, nullBin)
        .nullSafeEval(pack(a), pack(b)).asInstanceOf[Long]
      val n = math.min(a.length, b.length)
      got == (0 until n).map(i => a(i).toLong * b(i)).sum
    }
}
