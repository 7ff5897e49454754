package graft.apps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PiEstimator (examples/PiEstimator.java:66-188 in the reference):
  * quasi-Monte-Carlo darts from a 2,3-Halton sequence, counting points
  * inside the circle of radius 0.5 centered at (0.5, 0.5).
  *
  * The radical inverse is computed by exact integer digit reversal —
  * rb_b(n) = reverse_digits_b(n) / b^J — so x and y are single IEEE
  * divisions of exact integers and the inside/outside counts are bit-equal
  * across engines (the DuckDB oracle uses the same digit arithmetic).
  * The whole thing is one codegen'd projection over `spark.range` —
  * embarrassingly parallel at any n.
  */
object Pi {
  private val P3: Array[Long] = Array.iterate(1L, 12)(_ * 3) // 3^0..3^11

  /** Reversed 17-digit base-2 integer of column i. */
  private def rev2(i: Column): Column =
    (0 until 17).map(j =>
      shiftleft(shiftright(i, j).bitwiseAND(lit(1L)), 16 - j)).reduce(_ + _)

  /** Reversed 11-digit base-3 integer of column i. */
  private def rev3(i: Column): Column =
    (0 until 11).map(j =>
      expr(s"(id div ${P3(j)}) % 3") * lit(P3(10 - j))).reduce(_ + _)

  /** One row: num_inside, num_outside, pi_est for n Halton darts.
    * n must be < 2^17 and < 3^11 (131072 / 177147). */
  def estimate(spark: SparkSession, n: Long): DataFrame = {
    require(n < (1L << 17) && n < P3(11))
    val darts = spark.range(n)
      .withColumn("x", rev2(col("id")).cast("double") / lit((1L << 17).toDouble))
      .withColumn("y", rev3(col("id")).cast("double") / lit(P3(11).toDouble))
      .withColumn("inside",
        (col("x") - 0.5) * (col("x") - 0.5) +
        (col("y") - 0.5) * (col("y") - 0.5) <= lit(0.25))
    darts.agg(
      sum(when(col("inside"), 1L).otherwise(0L)).as("num_inside"),
      sum(when(col("inside"), 0L).otherwise(1L)).as("num_outside"),
      (lit(4.0) * sum(when(col("inside"), 1L).otherwise(0L)) / lit(n.toDouble))
        .as("pi_est"))
  }
}
