package graft.apps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Blocked matrix multiply — the reference's submatmul app
    * (apps/pipes/matmul/cpu-submatmul/cpu-submatmul.cc:44-90+): map
    * multiplies one m×m block pair SC = SA × SB, reduce sums blocks
    * elementwise per output block (i, j).
    *
    * Blocks are flat row-major m² arrays. The per-pair block product runs
    * in one expression; the cross-row elementwise block sum is
    * posexplode → groupBy(bi, bj, pos) → sum — a plain relational
    * aggregation, so partial aggregation and AQE apply as usual and no
    * block ever needs to fit anywhere but one row. Output is flattened
    * to global cells (gi, gj, v) for easy verification. */
  def blockMultiply(a: DataFrame, b: DataFrame, m: Int): DataFrame = {
    val prod = a.select(col("bi"), col("bk"), col("block").as("ab"))
      .join(b.select(col("bk"), col("bj"), col("block").as("bb")), Seq("bk"))
      .select(col("bi"), col("bj"),
        transform(sequence(lit(0), lit(m * m - 1)), idx => {
          val row = (idx / m).cast("int"); val c = idx % m
          aggregate(sequence(lit(0), lit(m - 1)), lit(0L),
            (acc, k) => acc +
              element_at(col("ab"), row * m + k + 1) *
              element_at(col("bb"), k * m + c + 1))
        }).as("sc"))
    prod.select(col("bi"), col("bj"), posexplode(col("sc")).as(Seq("pos", "v")))
      .groupBy("bi", "bj", "pos").agg(sum("v").as("v"))
      .select(
        (col("bi") * m + expr("pos div " + m)).as("gi"),
        (col("bj") * m + col("pos") % m).as("gj"),
        col("v"))
  }

  /** Blocked fixture: the same T×T integer matrices as [[fixtureQuery]]
    * carved into m×m blocks, so the DuckDB oracle is the flat product. */
  def fixtureBlockQuery(spark: SparkSession, t: Int, m: Int): DataFrame = {
    require(t % m == 0)
    val nb = t / m
    def blocks(f: (Column, Column) => Column) =
      spark.range(nb.toLong * nb).select(
        expr(s"id div $nb").as("br"), (col("id") % nb).as("bc"))
        .select(col("br"), col("bc"),
          transform(sequence(lit(0), lit(m * m - 1)), idx => {
            val gi = col("br") * m + (idx / m).cast("int")
            val gj = col("bc") * m + idx % m
            f(gi, gj)
          }).as("block"))
    val a = blocks((gi, gj) => (gi * t + gj) % 7 - 3)
      .select(col("br").as("bi"), col("bc").as("bk"), col("block"))
    val b = blocks((gi, gj) => (gi * t + gj) % 5 - 2)
      .select(col("br").as("bk"), col("bc").as("bj"), col("block"))
    blockMultiply(a, b, m)
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
