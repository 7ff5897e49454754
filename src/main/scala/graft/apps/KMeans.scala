package graft.apps

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** k-means clustering, the reference fork's flagship analytics app
  * (apps/pipes/kmeans/cpu-kmeans2D/cpu-kmeans2D.cc:100-299 in
  * koichishirahata/hadoop-gpu).
  *
  * Two Spark-native re-expressions:
  *
  *  1. [[KMeans.relationalInt]] — the distributed formulation: points are a
  *     DataFrame, centroids a tiny table broadcast to every executor each
  *     iteration (the same driver-collect-then-broadcast loop Spark MLlib's
  *     KMeans uses). All arithmetic is integer (centroids truncated toward
  *     zero after each recalc, matching the reference's `(int)c[i].x` output
  *     cast at cpu-kmeans2D.cc:285), so results are bit-exact across engines
  *     and the DuckDB oracle can verify them.
  *
  *  2. [[KMeansLocal]] — the reference's actual per-line semantics: each
  *     input line carries an entire dataset ("k n c1x c1y ... dnx dny") and
  *     one map call runs Lloyd's algorithm to convergence locally
  *     (cpu-kmeans2D.cc:232-275: float math, strict `<` assignment so the
  *     lowest-index centroid wins ties, stop when every centroid moved
  *     ≤ 1.0 euclidean or after 100 iterations). This is a typed
  *     `Dataset.flatMap` — pure per-record compute, embarrassingly
  *     parallel, no shuffle at any scale.
  */
object KMeans {

  /** Distributed Lloyd iterations over an integer point set.
    *
    * Scale notes: `points` may be arbitrarily large — each iteration is one
    * broadcast-join (no shuffle of the big side) plus one partial-agg
    * `groupBy(cid)` whose output is k rows. Centroids (k rows) are collected
    * to the driver between iterations to keep the plan flat — the same
    * pattern as MLlib; collecting k rows is O(k), not a driver-side loop
    * over the data.
    */
  def relationalInt(
      points: DataFrame, // columns pid, x, y (integral)
      initialCentroids: Seq[(Long, Long, Long)], // (cid, cx, cy)
      iters: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    var cents = initialCentroids
    var counts = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val centDf = broadcast(cents.toDF("cid", "cx", "cy"))
      // assign: nearest centroid by squared distance, lowest cid on ties
      // (reference assign_data uses strict `<`, cpu-kmeans2D.cc:101-113)
      val assigned = points
        .crossJoin(centDf)
        .withColumn("d2",
          (col("x") - col("cx")) * (col("x") - col("cx")) +
          (col("y") - col("cy")) * (col("y") - col("cy")))
        .groupBy("pid", "x", "y")
        .agg(min(struct(col("d2"), col("cid"))).as("m"))
        .select(col("x"), col("y"), col("m.cid").as("cid"))
      // recalc: integer mean, truncated (floor for non-negative coords) —
      // centroids_recalc + the int output cast, cpu-kmeans2D.cc:130-151,285
      val stats = assigned.groupBy("cid")
        .agg(expr("sum(x) div count(1)").as("nx"),
             expr("sum(y) div count(1)").as("ny"),
             count(lit(1)).as("n"))
        .collect()
      val byCid = stats.map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // empty cluster keeps its previous centroid
      cents = cents.map { case (cid, cx, cy) =>
        byCid.get(cid).map { case (nx, ny, _) => (cid, nx, ny) }
          .getOrElse((cid, cx, cy))
      }
      counts = cents.map(_._1).map(cid =>
        cid -> byCid.get(cid).map(_._3).getOrElse(0L)).toMap
    }
    cents.map { case (cid, cx, cy) => (cid, cx, cy, counts(cid)) }
      .toDF("cid", "cx", "cy", "n")
  }

  /** Deterministic fixture: n points on a 200x200 integer grid; the first k
    * points are the initial centroids (mirrored by the DuckDB oracle). */
  def fixtureQuery(spark: SparkSession, nPoints: Int, k: Int, iters: Int): DataFrame = {
    val pts = spark.range(nPoints).select(
      col("id").as("pid"),
      ((col("id") * 37 + 11) % 200).as("x"),
      ((col("id") * 53 + 7) % 200).as("y"))
    val init = (0L until k.toLong).map(i =>
      (i, (i * 37 + 11) % 200, (i * 53 + 7) % 200))
    relationalInt(pts, init, iters)
  }
}

/** Faithful per-line Lloyd's algorithm (reference map semantics: one whole
  * k-means problem per input line, float arithmetic, local convergence).
  * See [[KMeans]] Scaladoc for the file:line citations.
  */
object KMeansLocal {

  /** One line's k-means: returns (centroids as (x,y) ints, iterations run).
    * Float math ordering matches cpu-kmeans2D.cc: distances via sqrt of
    * float sums, assignment strict `<`, per-cluster mean accumulated in
    * cluster order, convergence when every centroid moved ≤ 1.0. */
  def lloyd(
      k: Int,
      init: Array[(Float, Float)],
      pts: Array[(Float, Float)]): (Array[(Int, Int)], Int) = {
    require(init.length == k)
    var cur = init.clone()
    var iter = 0
    var done = false
    while (!done && iter < 100) {
      iter += 1
      // assign
      val cent = new Array[Int](pts.length)
      var i = 0
      while (i < pts.length) {
        var best = 0
        var dmin = dist(cur(0), pts(i))
        var j = 1
        while (j < k) {
          val d = dist(cur(j), pts(i))
          if (d < dmin) { dmin = d; best = j }
          j += 1
        }
        cent(i) = best
        i += 1
      }
      // recalc (float accumulation per cluster, like centroids_recalc)
      val next = new Array[(Float, Float)](k)
      var c = 0
      while (c < k) {
        var sx = 0.0f; var sy = 0.0f; var n = 0
        var p = 0
        while (p < pts.length) {
          if (cent(p) == c) { sx += pts(p)._1; sy += pts(p)._2; n += 1 }
          p += 1
        }
        next(c) = if (n == 0) cur(c) else (sx / n, sy / n)
        c += 1
      }
      // datacmp: converged when every centroid moved <= 1.0
      done = (0 until k).forall(j => dist(cur(j), next(j)) <= 1.0f)
      cur = next
    }
    (cur.map { case (x, y) => (x.toInt, y.toInt) }, iter)
  }

  private def dist(a: (Float, Float), b: (Float, Float)): Float = {
    val dx = a._1 - b._1; val dy = a._2 - b._2
    math.sqrt((dx * dx + dy * dy).toDouble).toFloat
  }

  /** Parse a reference-format line "k n c1x c1y ... dnx dny", run
    * [[lloyd]], emit one (key, cid, cx, cy) per centroid — the map body
    * the reference builds as both a CPU binary and a CUDA binary. */
  def centroidsOfLine(key: String, value: String): Seq[(String, Int, Int, Int)] = {
    val e = value.trim.split("\\s+")
    val k = e(0).toInt
    val n = e(1).toInt
    val init = Array.tabulate(k)(i => (e(2 * i + 2).toFloat, e(2 * i + 3).toFloat))
    val pts = Array.tabulate(n)(i =>
      (e(2 * i + 2 * k + 2).toFloat, e(2 * i + 2 * k + 3).toFloat))
    val (cents, _) = lloyd(k, init, pts)
    cents.toSeq.zipWithIndex.map { case ((cx, cy), cid) => (key, cid, cx, cy) }
  }

  /** [[centroidsOfLine]] over a Dataset — `context.emit(key + '\t' + i,
    * (int)x + '\t' + (int)y)` re-expressed as a typed flatMap. */
  def centroidsPerLine(lines: Dataset[(String, String)]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.flatMap { case (key, value) => centroidsOfLine(key, value) }
      .toDF("key", "cid", "cx", "cy")
  }

  /** Deterministic multi-line fixture in the reference's input format. */
  def fixtureLines(spark: SparkSession, nLines: Int, k: Int, n: Int): Dataset[(String, String)] = {
    import spark.implicits._
    spark.range(nLines).map { l =>
      val pts = Array.tabulate(n)(p => ((l * 31 + p * 17) % 100, (l * 7 + p * 23) % 100))
      val cents = pts.take(k)
      val body = (cents ++ pts).map { case (x, y) => s"$x $y" }.mkString(" ")
      (s"line$l", s"$k $n $body")
    }
  }
}
