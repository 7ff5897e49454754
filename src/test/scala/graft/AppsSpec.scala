package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.apps.{KMeans, KMeansLocal, MatMul, Pi}

class KMeansSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("lloyd: k=1 converges to the truncated mean") {
    val pts = Array((0f, 0f), (3f, 4f), (5f, 5f))
    val (cents, _) = KMeansLocal.lloyd(1, Array((0f, 0f)), pts)
    // mean = (8/3, 3) = (2.66, 3.0) -> int-truncated (2, 3)
    assert(cents.toSeq == Seq((2, 3)))
  }

  test("lloyd: two well-separated blobs split cleanly") {
    val blobA = Array.tabulate(5)(i => (i.toFloat, 0f))
    val blobB = Array.tabulate(5)(i => (100f + i, 100f))
    val (cents, iters) =
      KMeansLocal.lloyd(2, Array(blobA(0), blobB(0)), blobA ++ blobB)
    assert(cents.toSet == Set((2, 0), (102, 100)))
    assert(iters >= 1 && iters <= 100)
  }

  test("lloyd: ties assign to the lowest-index centroid (strict <)") {
    // point equidistant from both centroids
    val (cents, _) = KMeansLocal.lloyd(2,
      Array((0f, 0f), (2f, 0f)), Array((1f, 0f)))
    // centroid 0 gets the point; centroid 1 keeps its position (empty)
    assert(cents(0) == ((1, 0)) && cents(1) == ((2, 0)))
  }

  test("centroidsPerLine emits k rows per line") {
    val out = KMeansLocal.centroidsPerLine(
      KMeansLocal.fixtureLines(spark, 4, 3, 30))
    val byKey = out.groupBy("key").count().as[(String, Long)].collect().toMap
    assert(byKey.values.toSet == Set(3L) && byKey.size == 4)
  }

  test("relationalInt matches a hand-run of the same integer Lloyd") {
    val pts = Seq((0L, 0L, 0L), (1L, 1L, 1L), (2L, 10L, 10L), (3L, 11L, 11L))
      .toDF("pid", "x", "y")
    val out = KMeans.relationalInt(pts, Seq((0L, 0L, 0L), (1L, 10L, 10L)), 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    // cluster 0: points (0,0),(1,1) -> mean (0,0); cluster 1: (10,10),(11,11) -> (10,10)
    assert(out == Set((0L, 0L, 0L, 2L), (1L, 10L, 10L, 2L)))
  }
}

class MatMulSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("multiply computes a known 2x2 product") {
    // A = [[1,2],[3,4]], B = [[5,6],[7,8]] -> C = [[19,22],[43,50]]
    val a = Seq((0L, 0L, 1L), (0L, 1L, 2L), (1L, 0L, 3L), (1L, 1L, 4L))
      .toDF("i", "k", "v")
    val b = Seq((0L, 0L, 5L), (0L, 1L, 6L), (1L, 0L, 7L), (1L, 1L, 8L))
      .toDF("k", "j", "v")
    val c = MatMul.multiply(a, b).as[(Long, Long, Long)].collect().toSet
    assert(c == Set((0L, 0L, 19L), (0L, 1L, 22L), (1L, 0L, 43L), (1L, 1L, 50L)))
  }

  test("relational and zip_with dot forms agree on the shared fixture") {
    val viaJoin = MatMul.fixtureQuery(spark, 16)
      .select(col("i"), col("j"), col("cval").as("v"))
      .as[(Long, Long, Long)].collect().toSet
    val viaDot = MatMul.fixtureDotQuery(spark, 16)
      .select(col("i"), col("j"), col("dot").as("v"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaJoin == viaDot)
  }
}

class PiSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("halton darts partition exactly and estimate converges") {
    val Array((in, out, est)) =
      Pi.estimate(spark, 10000).as[(Long, Long, Double)].collect()
    assert(in + out == 10000L)
    assert(est > 3.0 && est < 3.3, s"pi estimate $est")
  }
}
