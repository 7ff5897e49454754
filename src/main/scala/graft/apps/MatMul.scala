package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dense matrix multiply, re-expressed relationally — the reference runs it
  * as a Pipes map that emits (i j, a[k]*b[k]) per element and a sum reducer
  * (apps/pipes/matmul/cpu-matmul/cpu-matmul.cc:43-86), i.e. a manual
  * join-on-k + groupBy(i,j).sum. Catalyst plans exactly that from the
  * declarative form, and picks broadcast-hash when one operand fits.
  */
object MatMul {

  /** C = A × B for coordinate-form matrices A(i,k,v), B(k,j,v).
    * The shuffle is one hash-partitioned join on k plus one partial-agg
    * groupBy — both scale linearly; if B is a small matrix pass
    * `broadcast(b)` and the join is shuffle-free on A. */
  def multiply(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, Seq("k"))
      .groupBy(col("i"), col("j"))
      .agg(sum(a("v") * b("v")).as("cval"))

  /** The reference's per-line vector form: each row carries row i of A and
    * column j of B as arrays; the dot product runs inside one codegen'd
    * expression (`zip_with` + `aggregate`), no shuffle at all —
    * cpu-matmul.cc's per-map loop without the reduce stage. */
  def dot(rows: DataFrame, aCol: String, bCol: String): DataFrame =
    rows.withColumn("dot",
      aggregate(zip_with(col(aCol), col(bCol), _ * _), lit(0L), _ + _))

  /** Deterministic T×T integer fixture A(i,k)=(iT+k)%7-3, B(k,j)=(kT+j)%5-2,
    * mirrored in the DuckDB oracle. */
  def fixtureQuery(spark: SparkSession, t: Int): DataFrame = {
    val a = spark.range(t.toLong * t).select(
      expr(s"id div $t").as("i"), (col("id") % t).as("k"),
      ((col("id") % 7) - 3).as("v"))
    val b = spark.range(t.toLong * t).select(
      expr(s"id div $t").as("k"), (col("id") % t).as("j"),
      ((col("id") % 5) - 2).as("v"))
    multiply(a, b)
  }

  /** Array-form fixture over a T×T grid of (i,j) lines. */
  def fixtureDotQuery(spark: SparkSession, t: Int): DataFrame = {
    val grid = spark.range(t.toLong * t).select(
      expr(s"id div $t").as("i"), (col("id") % t).as("j"))
    val withVecs = grid
      .withColumn("a", transform(sequence(lit(0), lit(t - 1)),
        k => (col("i") * t + k) % 7 - 3))
      .withColumn("b", transform(sequence(lit(0), lit(t - 1)),
        k => (k * t + col("j")) % 5 - 2))
    dot(withVecs, "a", "b").select("i", "j", "dot")
  }
}
