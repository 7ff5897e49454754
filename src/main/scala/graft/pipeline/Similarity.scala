package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Similarity search over an embedding column (`array<float>`).
  *
  * - [[bruteForceTopK]] / [[nearDupPairs]] — exact cosine, the correctness
  *   baseline. Cost O(queries × corpus); acceptable when the query set is
  *   small or the corpus fits a broadcast.
  * - [[lshTopK]] — random-hyperplane LSH: vectors land in 2^planes sign
  *   buckets, candidates are same-bucket only, then exact cosine re-rank.
  *   The scale path: bucketing is a map-side projection, and the self-join
  *   shuffles on the bucket key instead of forming the full cross product.
  *
  * Dot products run inside one codegen'd expression (`zip_with` +
  * `aggregate`) after casting float→double, so results are stable and
  * match the oracle's double arithmetic to ULP.
  */
object Similarity {

  /** Σ a[i]*b[i] as double, sequential order (parity with the oracle).
    * Backed by the native codegen'd [[graft.functions.VecDot]] — the
    * declarative zip_with/aggregate form computes the identical doubles
    * but ~40× slower on brute-force pair scans (interpreted lambdas +
    * per-pair allocation). */
  def dot(a: Column, b: Column): Column = VectorOps.vecDot(a, b)

  /** The declarative reference form, kept for spec cross-validation. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(transform(a, _.cast("double")), transform(b, _.cast("double")),
        _ * _),
      lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Vectors annotated with their L2 norm (computed once, pre-join). */
  private def withNorm(vecs: DataFrame, idCol: String, vecCol: String)
      : DataFrame = {
    VectorOps.ensureRegistered(vecs.sparkSession)
    vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"))
  }

  /** Exact top-k cosine neighbors for each query vector.
    * Returns (q_id, nb_id, rank, cos); ties broken by neighbor id. */
  def bruteForceTopK(vecs: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val corpus = withNorm(vecs, idCol, vecCol)
    val qs = withNorm(queries, idCol, vecCol)
      .select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = qs.crossJoin(corpus)
      .filter(col("q_id") =!= col("id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("cos").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id").as("nb_id"), col("rank"), col("cos"))
  }

  /** All pairs (id_a < id_b) with cosine >= threshold — embedding-space
    * near-duplicate detection. */
  def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = withNorm(vecs, idCol, vecCol)
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos",
        dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }

  /** Deterministic random hyperplanes: planes × dim doubles in [-1, 1),
    * derived from md5 seeds (no RNG state, reproducible everywhere). */
  def hyperplanes(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim)((p, d) => Portable.unitFromSeed(s"plane_${p}_$d"))

  /** Sign-bucket id of a vector under the given hyperplanes. */
  def bucketOf(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val proj = dot(vec, lit(plane))
      shiftleft(when(proj > 0, 1L).otherwise(0L), p)
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-k: candidates share the query's sign
    * bucket; exact cosine re-ranks within the bucket. Recall depends on
    * bucket granularity (`planes`); the shuffle is keyed on the bucket. */
  def lshTopK(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, planes: Int = 4, dim: Int = 64): DataFrame = {
    val hp = hyperplanes(planes, dim)
    val bucketed = withNorm(vecs, idCol, vecCol)
      .withColumn("bucket", bucketOf(col("v"), hp))
    val pairs = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .withColumn("cos",
        dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
    pairs
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("a.id")).orderBy(col("cos").desc, col("b.id"))))
      .filter(col("rank") <= k)
      .select(col("a.id").as("q_id"), col("b.id").as("nb_id"),
        col("rank"), col("cos"))
  }
}
