package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * Returns (q_id, nb_id, rank, cos); ties broken by neighbor id.
    * The QUERY side broadcasts (explicit hint): queries are by contract
    * the small side of a brute-force scan, and without the hint Spark's
    * size estimate can flip the nested-loop broadcast to the corpus —
    * a corpus-sized vector broadcast at scale. */
  def bruteForceTopK(vecs: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val corpus = withNorm(vecs, idCol, vecCol)
    val qs = withNorm(queries, idCol, vecCol)
      .select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = broadcast(qs).crossJoin(corpus)
      .filter(col("q_id") =!= col("id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    // per-query cut via the bounded-state TopKAggregator (r22, the r21
    // verdict's dense-leg item): the window form shuffled and fully
    // sorted every (query × corpus) candidate row — a corpus-sized sort
    // per query batch — where the partial-agg path ships ≤k rows per
    // query per map task. Ranking is identical: the aggregator's key
    // comparison is the same NaN-largest / -0.0==0.0 total order the
    // window's `cos DESC, id` sort used (see TopKAggregator), so ties
    // and degenerate zero-norm rows order bit-identically.
    val topk = udaf(new graft.agg.TopKAggregator(k),
      org.apache.spark.sql.Encoders.product[(Double, Long)])
    scored.groupBy("q_id")
      .agg(topk(col("cos"), col("id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "v")))
      .select(col("q_id"), col("v._2").as("nb_id"),
        (col("pos") + 1).cast("int").as("rank"), col("v._1").as("cos"))
  }

  /** All pairs (id_a < id_b) with cosine >= threshold — embedding-space
    * near-duplicate detection, EXACT baseline. O(n²) cartesian: use only
    * when the corpus fits a broadcast / as a correctness oracle. The scale
    * path is [[lshNearDupPairs]] — same output contract, bucketed shuffle. */
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
  def hyperplanes(planes: Int, dim: Int, seed: String = "plane")
      : Array[Array[Double]] =
    Array.tabulate(planes, dim)((p, d) =>
      Portable.unitFromSeed(s"${seed}_${p}_$d"))

  /** Per-pair recall of OR-amplified sign-LSH at cosine `c`:
    * 1 − (1 − s^planes)^tables with s = 1 − arccos(c)/π (the probability
    * one hyperplane agrees on the pair). The law the docstrings quote,
    * as code — calibration and specs share this single source of truth. */
  def lshRecall(cosine: Double, planes: Int, tables: Int): Double = {
    val s = 1.0 - math.acos(math.max(-1.0, math.min(1.0, cosine))) / math.Pi
    1.0 - math.pow(1.0 - math.pow(s, planes), tables)
  }

  /** Derive (planes, tables) from the recall law instead of hand-picking:
    * the smallest table count achieving `targetRecall` at `threshold`, at
    * the LARGEST plane count whose required tables fit `maxTables`.
    *
    * Why largest-planes-first: every extra plane halves the random-pair
    * bucket-collision rate (≈2^-planes per table) — the candidate join is
    * the dominant cost at scale, so selectivity is bought first and the
    * table budget caps the map-side explode factor (each table is one
    * more (bucket, id) row per input vector). Throws if even planes=1
    * cannot reach the target within `maxTables`. */
  def lshParams(threshold: Double, targetRecall: Double,
      maxTables: Int = 32, maxPlanes: Int = 24): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold=$threshold")
    require(targetRecall > 0.0 && targetRecall < 1.0, s"target=$targetRecall")
    val s = 1.0 - math.acos(threshold) / math.Pi
    def tablesFor(p: Int): Option[Int] = {
      val sp = math.pow(s, p)
      if (sp <= 0.0) None
      else if (sp >= 1.0) Some(1)
      else {
        val t = math.ceil(math.log1p(-targetRecall) / math.log1p(-sp))
        if (!t.isFinite || t > maxTables) None else Some(math.max(1.0, t).toInt)
      }
    }
    (maxPlanes to 1 by -1).iterator
      .map(p => tablesFor(p).map(t => (p, t)))
      .collectFirst { case Some(pt) => pt }
      .getOrElse(throw new IllegalArgumentException(
        s"recall $targetRecall at threshold $threshold needs more than " +
        s"$maxTables tables even at planes=1 — raise maxTables"))
  }

  /** LSH-bucketed near-dup pairs — the scale path for [[nearDupPairs]].
    * OR-amplified sign-LSH (the hyperplane analog of minhash banding,
    * [[graft.pipeline.Dedup.minhashLsh]]): `tables` independent sets of
    * `planes` hyperplanes; a pair is a candidate iff it shares a bucket in
    * ANY table, then exact cosine verifies every candidate — so output
    * precision is exact and only recall is approximate. Per-pair recall at
    * cosine c is 1-(1-(1-θ/π)^planes)^tables with θ = arccos(c): more
    * planes → smaller buckets (cheaper join), more tables → higher recall.
    *
    * Scale shape (the default, auto-chosen when the random-pair candidate
    * rate is near zero): candidate generation shuffles (table, bucket, id)
    * ONLY — the vectors never ride the bucket join — and verification
    * joins vectors back on the deduplicated candidate ids. At 100 TB the
    * all-pairs baseline is O(n²); this is O(Σ bucket²) on ids + O(pairs)
    * exact dots. Wide-angle thresholds (τ ≈ 0.5), where candidates are a
    * large fraction of all pairs, flip to in-join verification — see the
    * strategy note in the body; `carryVectors` overrides the choice. */
  def lshNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 8, tables: Int = 8, dim: Int = 64,
      carryVectors: Option[Boolean] = None): DataFrame = {
    val base = withNorm(vecs, idCol, vecCol)
    val hps = Array.tabulate(tables)(t =>
      hyperplanes(planes, dim, seed = s"table${t}_plane"))
    // one LONG key per (table, bucket) — table index in the high bits —
    // computed by the native sign_buckets expression: the declarative
    // array-of-literal-dots form embeds tables × planes × dim literal
    // doubles and falls out of JIT-able codegen (measured ~1s of
    // interpreted projection at sf0.1); the native kernel is a tight
    // loop over a reference-object matrix (planes < 48 enforced there)
    val buckets = (v: Column) =>
      explode(graft.functions.SignBuckets(v, hps)).as("tb")
    // Two physical strategies with identical output. The discriminator is
    // the RANDOM-pair candidate rate f = 1-(1-2^-planes)^tables (random
    // vectors agree with a hyperplane w.p. 1/2): at scale parameters
    // (high τ → many planes) f ≈ tables·2^-planes ≈ 0 and the candidate
    // set is near-dup-rate-sized, so shuffling bare id pairs and joining
    // vectors back is cheapest; at wide angles (τ ≈ 0.5, the q34b demo
    // regime) f is a large fraction of ALL pairs — materializing and
    // re-shuffling an O(f·n²) pair set three times (distinct + two
    // vector join-backs) costs far more than letting the vectors ride
    // the (linear, tables·n-row) bucket exchange and verifying inside
    // the join, where candidate pairs are born and die in one stage.
    val randomRate = 1.0 - math.pow(1.0 - math.pow(0.5, planes), tables)
    if (carryVectors.getOrElse(randomRate > 0.01)) {
      val bucketed = base.select(col("id"), col("v"), col("nrm"),
        buckets(col("v")))
      bucketed.as("a").join(bucketed.as("b"),
          col("a.tb") === col("b.tb") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
            .as("cos"))
        .filter(col("cos") >= threshold)
        // a pair colliding in several tables verifies more than once but
        // yields bit-identical cos; dedup AFTER the filter, where the
        // frame is result-sized rather than candidate-sized
        .distinct()
    } else {
      // (id, (table, bucket)) — buckets are a map-side projection; the
      // candidate self-join carries ids only, never embeddings. Left
      // declarative (no cache/checkpoint): when both join sides shuffle —
      // the at-scale shape — ReusedExchange computes the bucket projection
      // once, and the lazy plan stays inspectable end to end
      val ids = base.select(col("id"), buckets(col("v")))
      val pairs = ids.as("a").join(ids.as("b"),
          col("a.tb") === col("b.tb") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct() // a pair colliding in several tables verifies once
      pairs
        .join(base.select(col("id").as("id_a"), col("v").as("va"),
          col("nrm").as("na")), Seq("id_a"))
        .join(base.select(col("id").as("id_b"), col("v").as("vb"),
          col("nrm").as("nb")), Seq("id_b"))
        .withColumn("cos",
          dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("cos") >= threshold)
        .select(col("id_a"), col("id_b"), col("cos"))
    }
  }

  /** Derive the hyperplane count for [[lshTopK]] from the corpus size:
    * the smallest `planes` whose 2^planes sign buckets hold mean
    * occupancy <= `targetOccupancy` — the same occupancy-constant law as
    * [[ivfParams]]' nlist (and the GrowthBench "+log2(growth) planes"
    * calibration, which held candidate volume linear across a 10x
    * scale-up). Pure integer arithmetic (ceil-log2 via leading zeros),
    * so a DuckDB oracle derives the identical count from count(*);
    * clamped to `maxPlanes` (each plane is one dim-length dot per row —
    * and the oracle must pre-embed maxPlanes literal hyperplanes). */
  def signAnnParams(n: Long, targetOccupancy: Int = defaultOccupancy,
      maxPlanes: Int = maxSignPlanes): Int = {
    require(n > 0 && targetOccupancy > 0, s"n=$n occ=$targetOccupancy")
    val targetBuckets = (n + targetOccupancy - 1) / targetOccupancy
    val planes =
      if (targetBuckets <= 1) 1
      else 64 - java.lang.Long.numberOfLeadingZeros(targetBuckets - 1)
    math.max(1, math.min(maxPlanes, planes))
  }

  /** Sign-bucket id of a vector under the given hyperplanes. */
  def bucketOf(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val proj = dot(vec, lit(plane))
      shiftleft(when(proj > 0, 1L).otherwise(0L), p)
    }.reduce(_ + _)

  // ---------------------------------------------------------------- IVF

  /** Probe-fraction floors measured on the reference data model
    * (hash-random embeddings — CLUSTERLESS, the adversarial case for any
    * inverted-file index, where recall tracks the probed fraction of the
    * corpus because cells carry no cluster structure to exploit). Each row
    * is (recall floor, nprobe/nlist fraction): the fraction's measured
    * recall@3 met the floor at every tested scale (n=500 and n=2000, and
    * the IvfParamsSpec synthetic rescale). Fractions are binary-exact
    * multiples of 1/8 so Spark and a DuckDB oracle derive the identical
    * nprobe from the identical formula. On real clustered embeddings the
    * same fraction over-delivers — this table is the worst-case floor. */
  private[graft] val ivfProbeFracs: Seq[(Double, Double)] = Seq(
    0.55 -> 0.25, 0.70 -> 0.375, 0.80 -> 0.5,
    0.90 -> 0.625, 0.95 -> 0.75, 1.0 -> 1.0)

  /** The shared occupancy constant of [[ivfParams]] and [[signAnnParams]]
    * — oracle builders reference it so the SQL twins cannot drift. */
  val defaultOccupancy: Int = 32

  /** Lloyd rounds [[trainCoarseQuantizer]] runs by default — the q35c
    * oracle unrolls exactly this many CTE iterations. */
  val defaultLloydIters: Int = 3

  /** [[signAnnParams]]' plane-count clamp — the q35b oracle pre-embeds
    * exactly this many hyperplane literal projections. */
  val maxSignPlanes: Int = 12

  /** The probe fraction for `targetRecall` as its exact numerator over
    * 8 — the integer the DuckDB oracles repeat (every [[ivfProbeFracs]]
    * fraction is a binary-exact multiple of 1/8 by construction, and
    * this throws if a recalibration ever breaks that invariant instead
    * of letting the SQL twin silently diverge). */
  def probeFracEighths(targetRecall: Double): Int = {
    val frac = ivfProbeFracs
      .collectFirst { case (floor, f) if targetRecall <= floor => f }
      .getOrElse(1.0)
    val num = frac * 8
    require(num == num.toInt.toDouble,
      s"probe fraction $frac is not a multiple of 1/8")
    num.toInt
  }

  /** Derive `(nlist, nprobe)` for [[ivfTopK]] from the corpus size — the
    * IVF analog of [[lshParams]]/[[Dedup.minhashParams]]: parameters from
    * the data, not hand-picked constants (the reference's
    * `mapred/lib/InputSampler.java:49` sampled-calibration idea).
    *
    * - `nlist = ceil(n / targetOccupancy)`: constant cell occupancy. The
    *   measured growth law (BASELINE.md, GrowthBench): T ~ n^2.06 with
    *   nlist FIXED, n^1.00 with nlist tracking n — cell occupancy, not
    *   cell count, is what must stay constant as the corpus grows.
    * - `nprobe = ceil(frac(targetRecall) * nlist)` from the measured
    *   [[ivfProbeFracs]] floors. Probed work per query is frac·n — on
    *   clusterless data no inverted file does better (there is no
    *   structure to exploit); on clustered corpora callers wanting the
    *   runtime-linear regime instead pass a fixed nprobe to [[ivfTopK]]
    *   and lean on cluster locality for recall.
    *
    * Both formulas are integer/exact-binary arithmetic, so an external
    * oracle (DuckDB) reproduces them bit-for-bit from `count(*)`. */
  def ivfParams(n: Long, targetRecall: Double = 0.8,
      targetOccupancy: Int = defaultOccupancy): (Int, Int) = {
    require(n > 0, s"n=$n")
    require(targetRecall > 0.0 && targetRecall <= 1.0, s"target=$targetRecall")
    require(targetOccupancy > 0, s"occupancy=$targetOccupancy")
    // Int.MaxValue clamp: a >68-billion-row corpus at occupancy 32 would
    // overflow Int nlist — at that size the caller shards the index anyway
    val nlist = math.min(Int.MaxValue.toLong, math.max(1L,
      math.min(n, (n + targetOccupancy - 1) / targetOccupancy)))
    val frac = probeFracEighths(targetRecall) / 8.0
    val nprobe = math.max(1L,
      math.min(nlist, math.ceil(frac * nlist).toLong))
    (nlist.toInt, nprobe.toInt)
  }

  /** Bounded training-sample size for an nlist-cell quantizer: 64 points
    * per cell, floored at 4096, computed in Long (an Int `nlist * 64`
    * wraps at nlist > 2^25) and capped at Int.MaxValue — the q35c oracle
    * computes the same LEAST/GREATEST in BIGINT. */
  def trainingCap(nlist: Int): Int =
    math.min(Int.MaxValue.toLong,
      math.max(nlist.toLong * 64L, 4096L)).toInt

  /** Deterministic BOUNDED quantizer-training sample: the `cap` rows with
    * the smallest portable content hash of their id (ties by id). Stable
    * across runs, partitionings and engines — unlike `limit(cap)`, whose
    * row set depends on scan order — and bounded unlike a proportional
    * `hash % k` filter, which at 100 TB still collects terabytes.
    * Physically a TakeOrderedAndProject: partial top-cap per partition,
    * only cap rows per partition cross the wire — never a full sort. */
  def trainingSample(vecs: DataFrame, idCol: String, vecCol: String,
      cap: Int): DataFrame = {
    VectorOps.ensureRegistered(vecs.sparkSession)
    vecs.select(Portable.hash60Fast(col(idCol).cast("string")).as("h"),
        col(idCol).as("i"), col(vecCol))
      .orderBy(col("h"), col("i"))
      .limit(cap)
      .select(col(vecCol))
  }

  /** The `nprobe` nearest quantizer cells, ascending by distance —
    * backed by the native [[graft.functions.NearestCells]] expression
    * (the centroid matrix rides as a codegen reference object; a literal
    * expression tree at nlist=64 × dim=64 costs more to plan and compile
    * than the whole scan). */
  /** The scan-path operators' quantizer, shipped as a BROADCAST handle
    * instead of a plan literal (r22, the r21 verdict's q35c item): the
    * literal form folds the centroid matrix into every stage's task
    * binary of every plan — at sf0.1 the q35c/q89 plan TEXT alone was
    * ~258 KB (q88 427 KB), re-planned per run, and at a production
    * nlist the per-plan payload is ~0.5 GB (the measured ~0.4 µs/cell/
    * plan tax that motivated [[adcQuantBc]] on the indexed path).
    * Kernel and flat/norms2 derivation are shared with the literal
    * expression, so results are bit-identical; the broadcast is
    * per-operator-call and reclaimed by the ContextCleaner like any
    * broadcast join's. */
  private def broadcastQuantizer(spark: SparkSession,
      cents: Array[Array[Double]]): org.apache.spark.broadcast.Broadcast[
        graft.functions.NearestCellsBc.Quantizer] =
    spark.sparkContext.broadcast(
      graft.functions.NearestCellsBc.quantizerOf(cents))

  private def nearestCells(vec: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        graft.functions.NearestCellsBc.Quantizer],
      nprobe: Int): Column =
    graft.functions.NearestCellsBc(vec, bc, nprobe)

  /** Train a coarse quantizer on a driver-resident sample: one collect,
    * then local Lloyd iterations (nlist × dim doubles of state — the
    * standard IVF recipe: train on a bounded sample, quantize the full
    * 100 TB corpus map-side via the broadcast centroids). Pass a SAMPLE
    * as `vecs` — the collect is the caller's scale contract. One job
    * instead of one-per-iteration; at sample sizes the arithmetic is
    * microseconds and the Spark jobs were pure overhead.
    *
    * Deterministic throughout: init = nlist sample points under
    * lexicographic order (actual data points — seeded random unit
    * vectors sit far from an uncentered corpus and collapse most points
    * into one cell, making the candidate join quadratic again); ties and
    * empty cells resolve identically across runs.
    *
    * `init` picks WHICH sorted sample points seed the cells. `"first"`
    * (default, and the form every SQL oracle unrolls — do not change it
    * under an oracle-gated path) takes the lexicographic PREFIX: fine
    * on diffuse corpora, but on well-separated CLUSTERED corpora the
    * prefix clumps into whichever cluster sorts lowest, and Lloyd
    * iterations cannot migrate centroids across separated clusters —
    * the surviving giant multi-cluster cells inflate the probe dial
    * ([[tuneNprobe]]) with useless candidates. `"strided"` takes every
    * (len/nlist)-th sorted point instead — still fully deterministic,
    * but spread across the value range so each cluster attracts seeds
    * proportional to its mass. Production clustered-corpus builds
    * pre-train with it and pass `cents` into [[writeIvfAdcIndex]]. */
  def trainCoarseQuantizer(vecs: DataFrame, vecCol: String, nlist: Int,
      dim: Int, iters: Int = defaultLloydIters,
      init: String = "first"): Array[Array[Double]] = {
    import scala.math.Ordering.Implicits._
    val data = vecs
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
      .sortBy(_.toSeq)
    // ragged centroid rows would silently misalign NearestCellsExpr's
    // flat c*dim offsets — reject mismatched input up front
    data.find(_.length != dim).foreach(v => throw new IllegalArgumentException(
      s"vector of length ${v.length} does not match dim=$dim"))
    var cents: Array[Array[Double]] =
      if (data.length < nlist)
        data.map(_.clone()) ++ Array.tabulate(nlist - data.length, dim)(
          (c, d) => Portable.unitFromSeed(s"ivf_${c}_$d"))
      else init match {
        case "first" => data.take(nlist).map(_.clone())
        case "strided" => Array.tabulate(nlist)(c =>
          data(((c.toLong * data.length) / nlist).toInt).clone())
        case other => throw new IllegalArgumentException(
          s"init=$other (expected first|strided)")
      }
    for (_ <- 0 until iters) {
      val sums = Array.ofDim[Double](nlist, dim)
      val counts = new Array[Long](nlist)
      data.foreach { v =>
        var best = 0; var bd = Double.PositiveInfinity
        var c = 0
        while (c < nlist) {
          var s = 0.0; var i = 0
          val n = math.min(v.length, cents(c).length)
          while (i < n) { val d = v(i) - cents(c)(i); s += d * d; i += 1 }
          if (s < bd) { bd = s; best = c }
          c += 1
        }
        var i = 0
        while (i < math.min(v.length, dim)) {
          sums(best)(i) += v(i); i += 1
        }
        counts(best) += 1
      }
      cents = Array.tabulate(nlist)(c =>
        if (counts(c) == 0) cents(c) // empty cell keeps its centroid
        else Array.tabulate(dim)(i => sums(c)(i) / counts(c)))
    }
    cents
  }

  /** IVF approximate top-k: the coarse quantizer partitions the corpus
    * into `nlist` inverted lists; each query probes its `nprobe` nearest
    * cells and exact cosine re-ranks only those candidates. The join is
    * keyed on the cell id — the shuffle carries (cell, id, vector), never
    * the cross product — and with `nprobe = nlist` the result equals
    * brute force exactly (the spec's correctness gate).
    *
    * `queries` (optional) restricts the probe side to a separate query
    * set — the corpus is still indexed in full, but only the given rows
    * fan out to their `nprobe` cells (the [[recallAudit]] shape: probe
    * with a sample, index everything). `null` keeps the self-join
    * default where every corpus vector is also a query. */
  def ivfTopK(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, dim: Int = 64,
      cents: Array[Array[Double]] = null,
      queries: DataFrame = null): DataFrame = {
    val quantizer =
      if (cents != null) cents
      // default training input is a BOUNDED DETERMINISTIC slice, never the
      // full corpus: trainCoarseQuantizer collects its input to the driver
      // (its scale contract), and at 100 TB an unbounded collect is a
      // driver OOM; a bare limit() would be bounded but scan-order-
      // dependent, breaking the deterministic contract. Callers wanting a
      // specific sampling policy pre-train and pass `cents`.
      else trainCoarseQuantizer(
        trainingSample(vecs, idCol, vecCol, trainingCap(nlist)),
        vecCol, nlist, dim)
    val qbc = broadcastQuantizer(vecs.sparkSession, quantizer)
    val base = withNorm(vecs, idCol, vecCol)
    val corpus = base.withColumn("cell",
      element_at(nearestCells(col("v"), qbc, 1), 1))
    val probes = (if (queries == null) base
      else withNorm(queries, idCol, vecCol))
      .withColumn("cell", explode(nearestCells(col("v"), qbc, nprobe)))
      .select(col("id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell"))
    val candidates = probes.join(corpus, Seq("cell"))
      .filter(col("q_id") =!= col("id"))
      // project the vectors away BEFORE the per-query ranking: the
      // shuffle carries (q_id, nb_id, cos), never the embeddings
      .select(col("q_id"), col("id").as("nb_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
    rankTopK(candidates, k)
  }

  /** Recall@k audit of the IVF tier (qa4) — the index-quality gate a
    * production ANN deployment monitors: for a SAMPLED query set, how
    * many of the exact top-k neighbors does the approximate tier
    * return? Returns `(q_id, hits, recall)` per query — `hits` the
    * overlap count, `recall = hits / k` one IEEE division of small
    * integers (bit-equal across engines). The macro recall is the mean
    * over rows; keeping per-query rows is deliberate (the tail — queries
    * with recall 0 — is what parameter tuning needs to see, and a single
    * averaged row would hash-hide it).
    *
    * Scale contract: the exact side is a brute-force pass of the corpus
    * per query — that is WHY the audit runs on a sampled query set
    * (corpus/100 here; any fraction works), never all queries: cost is
    * |sample| × corpus map-side dot products, ~1/100th of one all-pairs
    * tier, and the approximate side reuses the production [[ivfTopK]]
    * path restricted to the same sample. Each leg keeps its own
    * documented exchange shape ([[ivfTopK]]'s cell-keyed join,
    * [[bruteForceTopK]]'s query-side-broadcast cross join); what the
    * AUDIT adds on top is only the explicit `broadcast` of the
    * (sample × k)-row approximate result into the overlap join plus an
    * integer per-query rollup — no new corpus-scale movement, and no
    * corpus-side float vector in any broadcast (plan-asserted).
    *
    * Reference analog: the fork's schedulers log per-device mean task
    * times as a live quality/efficiency comparator
    * (mapred/JobInProgress.java:338-364); this is the same
    * measure-the-approximation-against-truth loop applied to index
    * quality. */
  def recallAudit(vecs: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int, nprobe: Int, dim: Int,
      cents: Array[Array[Double]]): DataFrame = {
    val approx = ivfTopK(vecs, idCol, vecCol, k, nlist, nprobe, dim,
        cents, queries = queries)
      .select(col("q_id"), col("nb_id"), lit(1L).as("hit"))
    val exact = bruteForceTopK(vecs, queries, idCol, vecCol, k)
      .select(col("q_id"), col("nb_id"))
    exact.join(broadcast(approx), Seq("q_id", "nb_id"), "left_outer")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("q_id"), col("hits"),
        (col("hits") / lit(k.toDouble)).as("recall"))
  }

  /** IVF-ADC quantized top-k (the composition [[Quantize]]'s Scaladoc
    * promises): candidates come from the coarse quantizer's `nprobe`
    * cells exactly as in [[ivfTopK]], but scoring runs over PACKED INT8
    * CODES — `i8_dot(q_codes, nb_codes)` is an exact BIGINT, and the
    * per-query ranking key `idot * nb_scale` multiplies that integer by
    * one double (the query's own scale is a per-query constant and drops
    * out of its ordering). MIPS semantics (dot product, not cosine) —
    * the standard quantized-retrieval objective.
    *
    * Cross-engine determinism is stronger than [[ivfTopK]]'s: integer
    * accumulation has no rounding and no order sensitivity, and the key
    * is a single IEEE multiply of exact inputs, so ties are exact ties
    * (broken by nb_id) rather than fp near-ties.
    *
    * Scale: the candidate shuffle carries (cell, id, 64-byte code blob,
    * scale) — 4-8× lighter than the float vectors [[ivfTopK]] moves, on
    * top of the same occupancy-constant cell geometry. Float vectors
    * never enter any exchange (plan-asserted); a production pipeline
    * re-ranks the few survivors against full precision ([[bruteForceTopK]]
    * on the top-k ids). Returns (q_id, nb_id, rank, idot). */
  def ivfAdcTopK(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, dim: Int = 64,
      cents: Array[Array[Double]] = null): DataFrame = {
    val quantizer =
      if (cents != null) cents
      else trainCoarseQuantizer(
        trainingSample(vecs, idCol, vecCol, trainingCap(nlist)),
        vecCol, nlist, dim)
    VectorOps.ensureRegistered(vecs.sparkSession)
    // all three per-row kernels are native + codegen'd (max_abs,
    // pack_quant, nearest_cells — float arrays consumed directly, no
    // cast-transform wrapper): the declarative HOF quantize was
    // CodegenFallback and Catalyst inlined its 64-step fold per ELEMENT
    // of the codes lambda (~4k interpreted steps/row, measured 4x the
    // whole float pipeline's projection cost)
    val sc = VectorOps.maxAbs(col(vecCol))
    val qc = VectorOps.packQuant(col(vecCol), sc)
    // ONE map-side projection each side — cell, codes, and scale all
    // compute in the scan; the float vector never leaves it. The probe
    // side additionally repartitions by cell: that exchange is a
    // materialization barrier — without it Catalyst collapses the
    // pack_quant projection across the join into the rank aggregate's
    // input stage, re-running the 64-element kernel once per CANDIDATE
    // row instead of once per probe (measured 39.6 s vs 2.5 s at sf0.1,
    // in one unpartitioned task). Only the probe side needs the barrier:
    // it is the join's stream side, whereas the corpus side materializes
    // its blobs in whatever exchange the planner picks for it (broadcast
    // build at bench scale, cell-keyed shuffle at corpus scale) — forcing
    // a corpus repartition here measured 2× slower at growth-10x by
    // denying the planner the broadcast.
    val qbc = broadcastQuantizer(vecs.sparkSession, quantizer)
    val corpus = vecs.select(
      element_at(nearestCells(col(vecCol), qbc, 1), 1).as("cell"),
      col(idCol).as("id"), qc.as("qc"), sc.as("scale"))
    val probes = vecs.select(col(idCol).as("q_id"), qc.as("q_qc"),
      explode(nearestCells(col(vecCol), qbc, nprobe)).as("cell"))
      .repartition(col("cell"))
    val candidates = probes.join(corpus, Seq("cell"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id").as("nb_id"),
        VectorOps.i8Dot(col("q_qc"), col("qc")).as("idot"),
        col("scale"))
    rankByScaledIdot(candidates, k)
  }

  /** Per-query top-k over (q_id, nb_id, idot, scale) candidates by the
    * ADC key `idot * scale` desc (ties by nb_id) — through a per-query
    * WINDOW (hash-partitioned by q_id, sort-based, SPILLING). Shared by
    * [[ivfAdcTopK]] and [[ivfAdcTopKIndexed]] so the live and persisted
    * tiers cannot rank differently.
    *
    * Why not the [[rankTopK]] grouped-collect shape (which this was
    * until r18): a probe group's size is nprobe × occupancy — under
    * the fraction law that is a CORPUS FRACTION per query, and the
    * r18 100× growth run OOM'd the collect ranker exactly there (the
    * object-hash aggregate holds up to 128 in-flight group buffers per
    * task; at ~100k-row groups × 24 tasks that is the whole heap).
    * The window sorts and spills at any group size; [[adcFullTopK]]'s
    * spec pins the window and collect rankings bit-equal (same key,
    * same nb_id tie-break). [[rankTopK]] remains correct where groups
    * are depth-bounded by construction (the re-rank tails). */
  private def rankByScaledIdot(candidates: DataFrame, k: Int): DataFrame =
    candidates
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy((-col("idot").cast("double") * col("scale")).asc,
            col("nb_id").asc)))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("nb_id"), col("rank"), col("idot"))

  /** Bucket count of the persisted ADC index ([[writeIvfAdcIndex]]) —
    * shared with the probe's co-partitioning repartition so the stored
    * side never re-shuffles. */
  val ivfIndexBuckets: Int = 16

  /** Persist the IVF-ADC retrieval index (q99) — the [[ivfAdcTopK]]
    * corpus side written ONCE into the MapFile bucketed layout
    * ([[graft.sources.MapFiles]]), the write-once-probe-many shape q86
    * proved for minhash applied to vector retrieval: in production the
    * coarse quantizer is trained and every code packed once per archive
    * append, not once per query batch. Three tables: `table` holds
    * (cell, id, qc, scale, gen) bucketed + sorted by `cell` (the join
    * key of every probe), `table_c` holds the nlist centroid rows so a
    * probing session reconstructs the EXACT quantizer (the index is
    * self-describing — no driver-side state survives between write and
    * probe), and `table_g` is the committed-generation set of the r13
    * maintenance protocol (see [[appendIvfAdcIndex]]).
    *
    * Scale: the write is one map-side projection of the corpus (cell
    * assignment via broadcast centroids, pack_quant in the scan) plus
    * the bucketed sink's own cell-keyed exchange — paid once; after
    * that, every batch probe reads the stored side with NO shuffle
    * (plan-asserted) and 64-byte blobs instead of float vectors.
    * Reference analog: `MapFileOutputFormat`'s build-then-`getEntry`
    * contract (mapred/MapFileOutputFormat.java:39). Returns the trained
    * quantizer. */
  def writeIvfAdcIndex(vecs: DataFrame, idCol: String, vecCol: String,
      table: String, nlist: Int, dim: Int = 64,
      cents: Array[Array[Double]] = null,
      buckets: Int = ivfIndexBuckets,
      init: String = "first"): Array[Array[Double]] = {
    val spark = vecs.sparkSession
    VectorOps.ensureRegistered(spark)
    // a fresh index has no committed batches and no deletions — stale
    // replay marks OR tombstones from a previous build at this name
    // must not outlive it (leftover tombstones would silently delete
    // the fresh build's rows at matching ids)
    MergeTables.dropHwms(spark, table + "_g")
    // and no stale quantizer broadcasts: a same-name rebuild restarts
    // epochs at 0, so (table, epoch) alone would hit the OLD memo and
    // probes would silently rank against the previous quantizer
    Option(quantBcMemo.remove(table)).foreach(_._2.unpersist(false))
    Option(hierBcMemo.remove(table)).foreach(_._2.unpersist(false))
    spark.sql(s"DROP TABLE IF EXISTS `${table}_t`")
    graft.sources.MapFiles.clearStaleLocation(spark, table + "_t")
    val quantizer =
      if (cents != null) cents
      else trainCoarseQuantizer(
        trainingSample(vecs, idCol, vecCol, trainingCap(nlist)),
        vecCol, nlist, dim, init = init)
    // epoch 0: rows, centroids, generations and tombstones all carry
    // the quantizer EPOCH — retrain bumps it and commits the bump with
    // ONE table_g swap ([[retrainIvfAdcIndex]]); probes filter every
    // side to the active epoch, so a half-landed retrain is invisible
    // fresh quantizer, broadcast ad hoc for the one build plan (the
    // probe/append memo keys on the POST-write table state) and
    // unpersisted after it — a pinned dead quantizer is ~0.5 GB of
    // executor block space at a 10^6-cell shard
    val bc = spark.sparkContext.broadcast(
      graft.functions.NearestCellsBc.quantizerOf(quantizer))
    try graft.sources.MapFiles.write(
      packedRows(vecs, idCol, vecCol, bc)
        .withColumn("gen", lit(0L)).withColumn("epoch", lit(0L)),
      "cell", buckets, table)
    finally bc.unpersist(false)
    graft.sources.MapFiles.write(
      centroidRows(spark, quantizer, 0L), "cell", 1, table + "_c")
    import spark.implicits._
    graft.sources.MapFiles.write(
      Seq((0L, -1L, 0L)).toDF("gen", "batch_key", "epoch"), "gen", 1,
      table + "_g")
    quantizer
  }

  /** The (cell, cent, epoch) rows of one trained quantizer — shared by
    * build and retrain so the stored form cannot diverge. */
  private def centroidRows(spark: SparkSession,
      quantizer: Array[Array[Double]], epoch: Long): DataFrame =
    spark.createDataFrame(
        quantizer.zipWithIndex.map { case (c, i) => (i, c.toSeq, epoch) }
          .toSeq)
      .toDF("cell", "cent", "epoch")

  /** The ACTIVE quantizer epoch of a persisted ADC index — the single
    * epoch on `table_g`'s committed-generation rows (appends commit
    * under it; retrain's one-swap commit replaces it wholesale, so the
    * table is single-epoch in every reachable state). Epochs exist for
    * one reason: to give RETRAIN a single commit point — the new
    * epoch's rows, centroids and generation set all land inert, and
    * this value flipping IS the retrain (r16 verdict item 2). */
  private[graft] def activeAdcEpoch(spark: SparkSession, table: String)
      : Long = {
    // driver-side sidecar read (r22): `_g` is protocol-sized (bounded
    // by the compaction contract), and the max-epoch resolution ran a
    // full Spark job per probe plan — the serving metadata floor. The
    // reader takes the same crash-healed fresh listing the job form
    // scanned, so freshness (TTL=0: every plan sees a foreign
    // retrain's flip) is unchanged.
    val rows = graft.sources.SidecarRead.rows(spark, table + "_g")
    if (rows.isEmpty) 0L else rows.iterator.map(_.getLong("epoch")).max
  }

  /** TTL cache over the PROBE paths' epoch resolution — the other half
    * of the serving metadata floor beside [[quantStateKey]]'s listing
    * (each probe plan pays one crash-heal + refresh + single-row agg
    * JOB per table; a sharded fan-out pays it per shard). Same conf,
    * same contract: with `graft.adc.quantKeyTtlMs` > 0 a cached epoch
    * serves for that long, so a retrain's flip (or a foreign rebuild)
    * is seen by a warm serving loop at the next expiry or explicit
    * [[invalidateQuantKeyCache]] — never silently forever. Default 0
    * keeps the per-plan fresh read; every MUTATOR keeps calling
    * [[activeAdcEpoch]] directly (appends/retrains must never act on
    * a cached epoch). */
  private val epochCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private def probeEpoch(spark: SparkSession, table: String): Long = {
    val ttlMs = spark.conf.getOption("graft.adc.quantKeyTtlMs")
      .map(_.toLong).getOrElse(0L)
    val ck = spark.sparkContext.applicationId + ":" + table + ":"
    if (ttlMs > 0L) {
      val hit = epochCache.get(ck)
      if (hit != null &&
          System.nanoTime() - hit._1 < ttlMs * 1000000L) return hit._2
    }
    val e = activeAdcEpoch(spark, table)
    if (ttlMs > 0L) epochCache.put(ck, (System.nanoTime(), e))
    else epochCache.remove(ck)
    e
  }

  /** The packed (cell, id, qc, scale) rows of one vector set against a
    * frozen quantizer — shared by build, append and retrain so the
    * write paths cannot code differently. The quantizer rides a
    * BROADCAST like the probes' ([[adcQuantBc]]): assignment is a
    * batch-cadence operation too (one plan per append/micro-batch),
    * and a literal would re-ship the centroid arrays with every
    * batch's task binary. */
  private def packedRows(vecs: DataFrame, idCol: String, vecCol: String,
      bc: org.apache.spark.broadcast.Broadcast[
        graft.functions.NearestCellsBc.Quantizer]): DataFrame = {
    val sc = VectorOps.maxAbs(col(vecCol))
    vecs.select(
      element_at(graft.functions.NearestCellsBc(col(vecCol), bc, 1), 1)
        .as("cell"),
      col(idCol).as("id"),
      VectorOps.packQuant(col(vecCol), sc).as("qc"), sc.as("scale"))
  }

  /** The persisted quantizer of [[writeIvfAdcIndex]], read back in cell
    * order — an nlist-row collect, the same bounded driver state
    * [[trainCoarseQuantizer]] holds. Reads the ACTIVE epoch's rows: a
    * crashed retrain's centroids sit inert under a never-activated
    * epoch. */
  def readIvfCentroids(spark: SparkSession, table: String)
      : Array[Array[Double]] =
    readIvfCentroidsAt(spark, table, activeAdcEpoch(spark, table))

  private def readIvfCentroidsAt(spark: SparkSession, table: String,
      epoch: Long): Array[Array[Double]] = {
    // heal a compactor killed inside the centroid-GC swap window
    MergeTables.recoverCompactCrash(spark, table + "_c")
    spark.catalog.refreshTable(table + "_c")
    spark.table(table + "_c").filter(col("epoch") === epoch)
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
  }

  /** Append a vector batch to a persisted IVF-ADC index (qc3): the
    * archive-maintenance story for [[writeIvfAdcIndex]]'s write-once
    * build, mirroring [[graft.pipeline.TextAnalysis.appendBm25Index]]
    * on the dense tier. The coarse quantizer stays FROZEN — the batch
    * is assigned to the STORED centroids (the production contract:
    * retraining would re-assign the whole archive) — and the packed
    * (cell, id, qc, scale) rows land as new files in the existing cell
    * buckets, so probes keep bucket pruning and the stored side is
    * never read, rewritten, or shuffled. Cost per batch: one map-side
    * pass over the batch plus its bucketed-sink exchange.
    *
    * Frozen centroids DRIFT as the corpus grows — cells seeded from the
    * build-time distribution slowly mismatch the appended mass, which
    * degrades recall before it degrades anything visible. That is a
    * monitored quantity, not a hope: [[recallAuditIndexed]] gates the
    * stored index's recall against an exact scan (qc3), and a fallen
    * floor is the retrain signal.
    *
    * CRASH SAFETY (r13): the same generation protocol as the lexical
    * tier — the batch's rows land tagged with a fresh generation,
    * INVISIBLE until a 1-row commit appends that generation to the
    * `table_g` set (single task, single file, one rename). A crash
    * anywhere (including a partially-committed row-append job) leaves
    * probes on the exact pre-append state; a retry commits under a
    * fresh generation, so orphans can never double-count; compaction
    * reclaims them physically (spec-gated by killing the writer
    * between steps). */
  def appendIvfAdcIndex(newVecs: DataFrame, idCol: String, vecCol: String,
      table: String, dim: Int = 64): Unit =
      MergeTables.withTableLock(table) {
    val spark = newVecs.sparkSession
    MergeTables.recoverCmpSwapCrash(spark, table)
    // a retrain killed inside its commit swap leaves table_g under the
    // shadow name — finish that rename before existence checks
    MergeTables.recoverCompactCrash(spark, table + "_g")
    require(spark.catalog.tableExists(table + "_g"),
      s"$table has no generation table — not an ADC index")
    val gen = graft.sources.MapFiles.freshGen()
    val epoch = appendAdcRowsOnly(newVecs, idCol, vecCol, table, gen)
    commitAdcGen(spark, table, gen, epoch)
  }

  /** Step 1 of [[appendIvfAdcIndex]] — the row append WITHOUT the
    * commit. Returns the active epoch the rows packed against, which
    * the caller's [[commitAdcGen]] commits under (ONE epoch resolution
    * per append, and the two steps cannot straddle a flip — both run
    * under the caller's table lock). Package-visible for the
    * atomicity spec. */
  private[graft] def appendAdcRowsOnly(newVecs: DataFrame, idCol: String,
      vecCol: String, table: String, gen: Long): Long = {
    val spark = newVecs.sparkSession
    VectorOps.ensureRegistered(spark)
    // bucket count from the table's own metadata (the appendBm25Index
    // convention) — a caller cannot desync the layout by re-threading a
    // different count than the build used
    val buckets = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(
        throw new IllegalStateException(s"$table is not a bucketed index"))
    val epoch = activeAdcEpoch(spark, table)
    val bc = adcQuantBc(spark, table, epoch)
    require(bc.value.norms2.nonEmpty, s"$table has no stored centroids")
    writePackedRows(newVecs, idCol, vecCol, table, bc, gen, epoch,
      buckets)
    epoch
  }

  /** The ONE bucketed packed-row append — shared by [[appendAdcRowsOnly]]
    * and [[retrainIvfAdcIndex]]'s re-pack so the two write paths cannot
    * silently diverge (options, layout, columns). */
  private def writePackedRows(vecs: DataFrame, idCol: String,
      vecCol: String, table: String,
      bc: org.apache.spark.broadcast.Broadcast[
        graft.functions.NearestCellsBc.Quantizer],
      gen: Long, epoch: Long, buckets: Int): Unit =
    packedRows(vecs, idCol, vecCol, bc)
      .withColumn("gen", lit(gen)).withColumn("epoch", lit(epoch))
      .write.mode("append")
      .option("parquet.bloom.filter.enabled#cell", "true")
      .bucketBy(buckets, "cell").sortBy("cell")
      .saveAsTable(table)

  /** Step 2 of [[appendIvfAdcIndex]] — the commit: one generation row
    * appended to `table_g`. `batchKey` is the LOGICAL identity of the
    * operation (−1 for plain batch appends): streaming appends commit
    * under a deterministic per-micro-batch key so a REPLAYED micro-batch
    * — foreachBatch's at-least-once window between a commit and the
    * checkpoint offset write — is detected and skipped instead of
    * double-appended ([[startStreamAppendIvfAdcIndex]]). The physical
    * generation stays a fresh random id per ATTEMPT, so a partially
    * written crashed attempt remains invisible forever even when its
    * batch is retried under the same key. */
  private[graft] def commitAdcGen(spark: SparkSession, table: String,
      gen: Long, epoch: Long, batchKey: Long = -1L): Unit = {
    import spark.implicits._
    Seq((gen, batchKey, epoch))
      .toDF("gen", "batch_key", "epoch").coalesce(1)
      .write.mode("append").bucketBy(1, "gen").sortBy("gen")
      .saveAsTable(table + "_g")
  }

  /** Base of the deterministic streaming commit keys:
    * `base + lineage·2^28 + batchId` ([[MergeTables.streamKey]]).
    * Spark's micro-batch ids are stable across checkpointed restarts
    * AND across replays, which is what makes the replay check sound
    * WITHIN a lineage; they restart at 0 for a FRESH checkpoint
    * lineage, which is why every `start()` folds a fresh lineage id
    * into its keys ([[MergeTables.allocLineage]]) — without it a
    * second streaming writer against the same uncompacted index would
    * see the first lineage's keys and silently skip its own early
    * batches. Compaction clears the live keys but carries each
    * lineage's high-water mark into the `_hwm` sidecar
    * ([[MergeTables.carryHwms]], r16), so replay detection — and with
    * it mid-lineage compaction — survives the rewrite on every
    * tier. */
  private[graft] val streamBatchKeyBase: Long = 1L << 40

  /** The foreachBatch body of [[startStreamAppendIvfAdcIndex]], exposed
    * for the replay spec: append `batch` under the deterministic key of
    * (`lineage`, `batchId`) unless that key is already committed (the
    * replayed-after-commit case → exact no-op). */
  private[graft] def streamAppendAdcBatch(batch: DataFrame,
      batchId: Long, idCol: String, vecCol: String, table: String,
      lineage: Long = 0L): Unit = {
    val spark = batch.sparkSession
    val key = MergeTables.streamKey(lineage, batchId)
    // live keys OR the compacted-away high-water marks — how replay
    // exactness survives a mid-lineage compaction or retrain (r16;
    // marks carried by compactIvfAdcIndex/retrainIvfAdcIndex). The
    // table lock keeps a concurrent same-process query's compaction
    // from swapping this landing generation away — and it covers the
    // REPLAY PROBE too (ADVICE r16): probing outside it could observe
    // (or worse, heal) a concurrent compactor's intentional
    // DROP->RENAME window mid-swap.
    MergeTables.withTableLock(table) {
      if (!MergeTables.replayed(spark, table + "_g", key)) {
        MergeTables.recoverCmpSwapCrash(spark, table)
        val gen = graft.sources.MapFiles.freshGen()
        val epoch = appendAdcRowsOnly(batch, idCol, vecCol, table, gen)
        commitAdcGen(spark, table, gen, epoch, key)
      }
    }
  }

  /** [[appendIvfAdcIndex]] with the NEW VECTORS ARRIVING AS A STREAM —
    * the dense tier's twin of
    * [[graft.pipeline.TextAnalysis.streamAppendBm25Index]] (qd6),
    * completing the streaming-maintenance matrix across the persisted
    * indexes: qa6 streams queries AGAINST this index; this streams the
    * corpus INTO it. Each micro-batch runs the gated batch append
    * verbatim inside foreachBatch — assignment against the stored
    * frozen centroids, packed rows into the existing cell buckets,
    * one committed generation per micro-batch. Exactness needs no
    * scalar arithmetic on this tier (no corpus scalars exist): batches
    * are new vectors, so their packed rows concatenate, and the
    * generation commit keeps a crashed micro-batch invisible until a
    * restart re-appends it under a fresh generation — K streamed
    * micro-batches == one one-shot append == a rebuild under the same
    * quantizer, down to stored rows (two-micro-batch MemoryStream
    * spec; qe1 gates the grown index's probe against the
    * frozen-quantizer ADC oracle). foreachBatch is at-least-once: a
    * crash AFTER a commit but BEFORE the checkpoint offset write
    * replays the micro-batch, so commits carry a deterministic
    * per-batch key ([[streamBatchKeyBase]] + batchId) and a replayed
    * committed batch is detected and skipped — exactly-once index
    * state under both crash windows WITHIN A LINEAGE, i.e. for the
    * life of one started query ([[streamAppendAdcBatch]], replay
    * spec-gated; the [[MergeTables.streamAppend]] scope note). A query
    * killed and re-RUN from scratch is a fresh lineage re-reading its
    * source — new vectors re-append under new keys; a caller needing
    * crash-RESUME wires a checkpointLocation plus its persisted
    * lineage id through the foreachBatch form, as on the MergeTables
    * tiers. Centroid drift accrues exactly as in batch
    * appends and stays monitored by the qc3 recall gate. */
  def streamAppendIvfAdcIndex(vecStream: DataFrame, idCol: String,
      vecCol: String, table: String, dim: Int = 64): Unit = {
    val q = startStreamAppendIvfAdcIndex(vecStream, idCol, vecCol, table,
      dim)
    try q.processAllAvailable() finally q.stop()
  }

  /** The started-but-undrained form of [[streamAppendIvfAdcIndex]] —
    * the caller owns the trigger cadence (StreamingSpec drives TWO
    * micro-batches through it). */
  def startStreamAppendIvfAdcIndex(vecStream: DataFrame, idCol: String,
      vecCol: String, table: String, dim: Int = 64,
      maxGen: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // deterministic fresh lineage per started query (allocated from
    // the commit table's own keys — MergeTables.allocLineage doc): a
    // second streaming writer's batchIds restart at 0 and must not
    // collide with the first lineage's committed keys. dim rides the
    // signature for API symmetry with writeIvfAdcIndex; the append
    // derives the true dimension from the stored centroids.
    val spark = vecStream.sparkSession
    val lineage = MergeTables.allocLineage(spark, table + "_g")
    MergeTables.startLeased(spark, Seq(table + "_g"))(
      vecStream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          streamAppendAdcBatch(batch, batchId, idCol, vecCol, table,
            lineage)
          // the unattended policy (qfn): compaction is safe
          // MID-LINEAGE since r16 — the rewrite carries the replay
          // high-water marks
          maxGen.foreach(mg =>
            maybeCompactIvfAdcIndex(spark, table, mg))
        }
        .start())
  }

  /** [[compactIvfAdcIndex]] iff more than `maxGen` generations have
    * committed — the auto-compaction policy on the dense index tier
    * (committed operations = rows of the generation table). Safe
    * inside a live streaming lineage since r16
    * ([[compactIvfAdcIndex]] carries the replay marks). Returns true
    * iff it compacted. */
  def maybeCompactIvfAdcIndex(spark: SparkSession, table: String,
      maxGen: Int = MergeTables.defaultMaxGen): Boolean =
      MergeTables.withTableLock(table) {
    require(maxGen >= 1, s"maxGen=$maxGen")
    MergeTables.recoverCmpSwapCrash(spark, table)
    MergeTables.recoverCompactCrash(spark, table + "_g")
    spark.catalog.refreshTable(table + "_g")
    if (spark.table(table + "_g").count() <= maxGen) false
    else { compactIvfAdcIndex(spark, table); true }
  }

  /** RETRAIN a persisted IVF-ADC index — the consumer of the qc3 drift
    * gate's signal, closing the maintenance loop the frozen-centroid
    * appends leave open: when [[recallAuditIndexed]]'s floor falls, the
    * answer is a retrain, and this is that operation. The coarse
    * quantizer is retrained from scratch over the LIVE corpus (the
    * caller's vector frame minus any tombstoned ids — deletion state
    * lives in the index, so the retrain consults it), every surviving
    * vector re-packs against the new centroids, and the fresh index
    * swaps in via the shadow-table protocol, dropping tombstones and
    * collapsing generations to one.
    *
    * The retrained PROBE state is BY CONSTRUCTION the one-shot
    * [[writeIvfAdcIndex]] state over the live corpus — same training
    * sample, same Lloyd loop, same packing functions — so qe3 gates it
    * against the full-corpus ADC oracle VERBATIM (the q99 chain): a
    * drifted 2×-grown index probes back bit-equal to a fresh build
    * after the retrain. Cost: one training pass + one corpus re-pack +
    * the bucketed write — the full-rebuild price, paid when the drift
    * gate says so, never per probe or per append.
    *
    * ATOMICITY (r16 verdict item 2 — the pre-r17 retrain was a
    * three-table swap a crash could leave unhealable): everything new
    * lands INERT first — the new quantizer's centroids under a fresh
    * EPOCH (allocated as max stored epoch + 1, so a crashed attempt's
    * orphans can never be adopted by a retry), then every re-packed
    * live row as (gen 0, new epoch) appends into the existing cell
    * buckets, then the replay high-water marks carry — and the ONE
    * commit point is `table_g`'s shadow-then-rename swap to the new
    * epoch's generation set. Probes resolve centroids, rows and
    * tombstones through the active epoch, so every pre-commit crash
    * leaves the old index bit-exact and every post-commit crash the
    * new one; the swap window itself heals on next writer touch like
    * every compaction's ([[MergeTables.recoverCompactCrash]]). Old
    * epochs' rows stay physically present but epoch-pruned at the scan
    * (parquet row-group stats skip their files) until the next
    * [[compactIvfAdcIndex]] reclaims them. The whole operation holds
    * the table's mutation lock — INCLUDING the live-corpus read and
    * re-pack (ADVICE r16: a same-process streamed batch committing
    * between an unlocked re-pack and the swap would be dropped by the
    * swap while its carried mark said committed — permanent silent
    * loss); concurrent same-process appends block for the retrain's
    * duration rather than lose data, and other PROCESSES stay excluded
    * by the writer lease as everywhere on this tier. Returns the new
    * quantizer. */
  def retrainIvfAdcIndex(vecs: DataFrame, idCol: String, vecCol: String,
      table: String, nlist: Int, dim: Int = 64): Array[Array[Double]] =
      MergeTables.withTableLock(table) {
    val spark = vecs.sparkSession
    VectorOps.ensureRegistered(spark)
    MergeTables.recoverCmpSwapCrash(spark, table)
    MergeTables.recoverCompactCrash(spark, table + "_g")
    require(spark.catalog.tableExists(table + "_g"),
      s"$table has no generation table — not an ADC index")
    val epoch = activeAdcEpoch(spark, table)
    // the attempt's epoch comes from the CENTROID table's max (not the
    // active epoch): a crashed attempt leaves its centroids behind, so
    // the retry allocates PAST them and can never adopt the orphan's
    // half-landed rows
    spark.catalog.refreshTable(table + "_c")
    val attempt = 1L + math.max(epoch,
      spark.table(table + "_c").agg(max("epoch")).head().getLong(0))
    val live =
      if (!spark.catalog.tableExists(table + "_t")) vecs
      else vecs.join(
        broadcast(spark.table(table + "_t")
          .filter(col("epoch") === epoch).select("id").distinct()
          .withColumnRenamed("id", idCol)),
        Seq(idCol), "left_anti")
    val quantizer = trainCoarseQuantizer(
      trainingSample(live, idCol, vecCol, trainingCap(nlist)),
      vecCol, nlist, dim)
    // inert land 1: the attempt's centroids FIRST — they are also the
    // epoch allocation marker a retry must see
    centroidRows(spark, quantizer, attempt)
      .write.mode("append").bucketBy(1, "cell").sortBy("cell")
      .saveAsTable(table + "_c")
    // inert land 2: every live vector re-packed, as (gen 0, attempt)
    // into the existing cell buckets — invisible while the active
    // epoch is not `attempt`. gen 0 keeps the compaction invariant
    // ("gen 0 of the active epoch is committed in every reachable
    // state") across the flip.
    val buckets = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(
        throw new IllegalStateException(s"$table is not a bucketed index"))
    val packBc = spark.sparkContext.broadcast(
      graft.functions.NearestCellsBc.quantizerOf(quantizer))
    try writePackedRows(live, idCol, vecCol, table, packBc,
      gen = 0L, epoch = attempt, buckets = buckets)
    finally packBc.unpersist(false)
    // the retrained rows INCLUDE every committed streamed batch (the
    // live corpus is the input), so the old keys' high-water marks
    // must survive the generation reset — a checkpoint-resumed lineage
    // re-delivering a committed batch post-retrain would otherwise
    // re-append rows the retrain already packed
    MergeTables.carryHwms(spark, table + "_g")
    // THE commit: one swap of the generation set to the new epoch
    MergeTables.swapInKeyed(spark,
      { import spark.implicits._
        Seq((0L, -1L, attempt)).toDF("gen", "batch_key", "epoch") },
      "gen", table + "_g")
    // post-commit, inert either way: stale tombstones reference the
    // RETIRED epoch (probes filter them out) and ids the new rows
    // never contained
    spark.sql(s"DROP TABLE IF EXISTS `${table}_t`")
    spark.catalog.refreshTable(table)
    // hygiene for TTL-cached serving loops in THIS process: the flip
    // re-keys by epoch anyway, but dropping the retired entries now
    // frees them and covers a same-epoch re-listing race exactly
    invalidateQuantKeyCache(table)
    quantizer
  }

  /** Delete vectors from a persisted IVF-ADC index — the takedown /
    * dedup-verdict consumer on the dense tier (the r12 verdict's #4),
    * mirroring [[graft.pipeline.TextAnalysis.deleteBm25Docs]]. This
    * tier keeps NO corpus scalars (ADC ranking is per-candidate code
    * arithmetic only), so logical deletion is just tombstone id rows
    * in `table_t`: the single append IS the commit — present means
    * deleted, absent means live, no multi-table window exists. Every
    * probe anti-joins the (distinct) tombstones as a broadcast —
    * delete-batch-sized — and [[compactIvfAdcIndex]] later removes
    * the rows physically. Re-deleting or deleting absent ids is
    * trivially idempotent (membership is a set test). */
  def deleteIvfVecs(spark: SparkSession, table: String, ids: DataFrame,
      idCol: String): Unit = MergeTables.withTableLock(table) {
    require(spark.catalog.tableExists(table),
      s"$table does not exist — not an ADC index")
    graft.sources.MapFiles.clearStaleLocation(spark, table + "_t")
    // epoch-stamped: a retrain consumes tombstones (its input is the
    // post-delete live corpus), so rows surviving a crash between its
    // commit and its tombstone drop must read as RETIRED, not re-apply
    // to ids a later append legitimately re-adds
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("epoch", lit(activeAdcEpoch(spark, table)))
      .write.mode("append").saveAsTable(table + "_t")
  }

  /** The probe-visible rows of a persisted ADC index: the ACTIVE
    * epoch's rows of COMMITTED generations (lazy broadcast semi-join
    * against the tiny `table_g` set — no driver collect, orphans of
    * crashed appends cost only their own read) minus the active
    * epoch's tombstones (if any). Shared by every probe and by
    * compaction so the two cannot disagree on liveness. Lockless
    * reader note: a probe whose plan resolved the epoch immediately
    * before a retrain's flip lands serves, for that one run, at worst
    * the old epoch's gen-0 subset (gen 0 is the one generation id
    * both epochs commit) — a consistent stale view, never a mix of
    * quantizers. */
  private[graft] def liveAdcRows(spark: SparkSession, table: String,
      bucketedRead: Boolean = false, epoch: Option[Long] = None)
      : DataFrame = {
    // heal a compactor crash's DROP/RENAME window first (the
    // committedIndex discipline — this read is the first touch of
    // every probe and delete)
    MergeTables.recoverCmpSwapCrash(spark, table)
    val e = epoch.getOrElse(activeAdcEpoch(spark, table))
    val stored = (
      if (bucketedRead) graft.sources.MapFiles.readBucketed(spark, table)
      else spark.table(table))
      // active-epoch rows only: retired/orphan epochs' files are
      // skipped at the scan from their row-group stats
      .filter(col("epoch") === e)
    // committed-generation restriction as a pushed In(gen) predicate
    // (r22): `_g` is protocol-sized and already read driver-side for
    // the epoch — the broadcast semi-join re-scanned it in-plan per
    // probe. Same healed fresh listing; row-group stats prune on gen.
    val gens = graft.sources.SidecarRead.rows(spark, table + "_g")
      .map(_.getLong("gen")).distinct
    val committed =
      if (gens.isEmpty) stored.filter(lit(false))
      else stored.filter(col("gen").isInCollection(gens))
    if (!spark.catalog.tableExists(table + "_t")) committed
    else committed.join(
      broadcast(spark.table(table + "_t").filter(col("epoch") === e)
        .select("id").distinct()),
      Seq("id"), "left_anti")
  }

  /** Rewrite a persisted ADC index's file generations into ONE,
    * physically removing tombstoned vectors — the dense-tier
    * compaction beside [[graft.pipeline.TextAnalysis.compactBm25Index]]
    * (reference analog: the MapFile sorted-single-file rewrite,
    * io/MapFile.java:49). The quantizer stays frozen — re-clustering
    * is a retrain decision, gated separately by the qc3 drift audit —
    * but retired/orphan epochs' centroid rows (nlist per retrain
    * attempt) are GC'd with the rewrite. Crash exposure: only the
    * two-catalog-op DROP/RENAME swap window, as on the lexical tier,
    * healed on next touch ([[MergeTables.recoverCmpSwapCrash]], r16).
    * Gated: probe-after-compact == probe-before == an index built over
    * the surviving vectors against the same frozen quantizer (spec +
    * qd4's oracle row). */
  def compactIvfAdcIndex(spark: SparkSession, table: String): Unit =
      MergeTables.withTableLock(table) {
    MergeTables.recoverCmpSwapCrash(spark, table)
    // list fresh before the rewrite: an in-loop compaction runs in the
    // MAIN session while the batches landed from micro-batch CLONE
    // sessions — a stale relation cached here would silently compact
    // away the just-streamed generations (the session relation-cache
    // trap, MergeTables.freshView's argument)
    for (s <- Seq("", "_g", "_t")
         if spark.catalog.tableExists(table + s))
      spark.catalog.refreshTable(table + s)
    val buckets = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(
        throw new IllegalStateException(s"$table is not a bucketed index"))
    val epoch = activeAdcEpoch(spark, table)
    // carry every streaming lineage's replay high-water mark into the
    // table_g_hwm sidecar BEFORE the generation reset clears the keys
    // — what makes this compaction safe inside a live lineage (r16)
    MergeTables.carryHwms(spark, table + "_g")
    // bucket-preserving read (one scan partition per bucket) -> the
    // bucketed sink plans exchange-free: one compacted file per bucket.
    // The rewrite also physically reclaims RETIRED/orphan epochs' rows
    // (liveAdcRows keeps only the active epoch's committed rows).
    val live = liveAdcRows(spark, table, bucketedRead = true,
        epoch = Some(epoch))
      .select("cell", "id", "qc", "scale")
      .withColumn("gen", lit(0L)).withColumn("epoch", lit(epoch))
      .repartition(buckets, col("cell"))
    val shadow = table + "_cmp"
    graft.sources.MapFiles.write(live, "cell", buckets, shadow)
    spark.sql(s"DROP TABLE `$table`")
    // tolerant: a probe's heal may have completed this rename already
    MergeTables.renameInto(spark, shadow, table)
    // the compacted rows are all (gen 0, active epoch), which is
    // committed in every reachable state — stale extra generations are
    // inert, so each remaining step is individually crash-safe; the
    // rewrite also clears the streaming batch keys, which is what
    // permits a FRESH streaming lineage after a compaction
    // (streamBatchKeyBase doc). Swap-written (r17): a plain
    // drop+recreate would open an unhealable no-generations window — a
    // crash inside it stranded the index
    import spark.implicits._
    MergeTables.swapInKeyed(spark,
      Seq((0L, -1L, epoch)).toDF("gen", "batch_key", "epoch"), "gen",
      table + "_g")
    spark.sql(s"DROP TABLE IF EXISTS `${table}_t`")
    // centroid GC, last and optional (inert rows either way): retired
    // or orphan epochs' centroids — nlist rows per retrain attempt —
    // leave with the rewrite. Materialized first (the rewrite replaces
    // the table it reads) and swapped through the healed shadow
    // protocol: a plain drop+recreate would open an unhealable
    // no-centroids window, the exact class the r17 retrain closed.
    spark.catalog.refreshTable(table + "_c")
    if (spark.table(table + "_c").select("epoch").distinct().count() > 1)
      MergeTables.swapInKeyed(spark,
        spark.table(table + "_c").filter(col("epoch") === epoch)
          .localCheckpoint(),
        "cell", table + "_c")
    spark.catalog.refreshTable(table)
    // the GC rewrote the centroid part files (content unchanged for
    // the active epoch): drop any TTL-cached listings so the next
    // probe re-keys instead of re-listing at expiry
    invalidateQuantKeyCache(table)
  }

  // ============ sharded ADC index (one-plan, one-table layout) ============
  // The 100 TB horizontal dial (r17 verdict item 3), re-laid in r20 as
  // ONE physical table so the probe is ONE Catalyst plan at any shard
  // count (r19 verdict item 1). The r17-r19 layout was one full
  // writeIvfAdcIndex tier PER SHARD and the probe a per-shard plan
  // fan-out; that paid a MEASURED ~0.1 s/shard of per-branch EXECUTION
  // floor (N bucketed scans, N broadcasts, N exchanges — task count
  // linear in the shard count; decomposed r20: construction ~0.25 s and
  // Catalyst planning ~0.15 s both FLAT in shards, execution 0.9/1.9/3.4 s
  // at s8/s16/s32), re-paid per probe batch and per micro-batch (the r19
  // streaming-amortization measurement falsified plan reuse). Now the
  // fan-out is DATA: rows carry their shard and a GLOBAL cell id
  // `gcell = shard·2^32 + cell` ([[graft.functions.NearestCellsSharded]]),
  // all shards' packed rows live in ONE bucketed table, every shard's
  // quantizer rides ONE broadcast, and a probe is one scan + one join +
  // one rank regardless of shard count. Each shard KEEPS its own
  // quantizer, epoch, nlist and dials — sharding still multiplies
  // training locality and write parallelism — but the per-shard state
  // is rows and broadcast slices, not tables and plan branches.
  // Reference contract: MapFileOutputFormat opens the partitioned
  // reader set ONCE and every getEntry routes within it
  // (mapred/MapFileOutputFormat.java:93-107) — the reader set is state,
  // not per-probe construction.
  //
  // Physical layout at reshard generation g (generation 0 omits `_r{g}`):
  //   <table>_r{g}_sv        (gcell, shard, cell, id, qc, scale, gen, epoch)
  //                          bucketed+sorted+bloomed by gcell
  //   <table>_r{g}_sv_c      (shard, cell, cent, epoch) — all quantizers
  //   <table>_r{g}_sv_g      (shard, gen, batch_key, epoch) — committed
  //                          generations, one row per shard per commit
  //   <table>_r{g}_sv_t      (shard, id, epoch) — tombstones
  //   <table>_r{g}_sv_g_hwm  (lineage, hwm) — replay marks
  //   <table>_sh             (nshards, rsgen) — THE routing sidecar
  //   <table>_serve          per-shard serving rows (dials/mode/depth)
  //
  // Protocol inheritance: generation commits, epoch flips, tombstones,
  // replay marks and crash heals are the single-table tier's protocol
  // verbatim, with shard as a KEY COLUMN instead of a table-name
  // suffix. One change is an improvement: an append/stream batch
  // commits ALL shards' generation rows in ONE single-file append, so
  // the old per-shard partial-commit crash window no longer exists
  // (a batch is committed for every shard or for none).

  /** Shard routing: `pmod(id, nShards)` — for integer keys this IS the
    * reference partitioner's law (HashPartitioner of an IntWritable is
    * `value % partitions`, the exact function
    * MapFileOutputFormat.getEntry replays at lookup). Deterministic,
    * balanced for dense id spaces, and trivially reproducible by an
    * external SQL oracle.
    *
    * NON-NEGATIVE ids only (enforced by every sharded mutator —
    * [[requireNonNegIds]] for batch-sized mutations,
    * [[shardCountsChecked]]'s fused pass for corpus-sized builds):
    * for a negative id `pmod` (always-positive) and the `%` a SQL
    * oracle or Java's HashPartitioner computes (sign-of-dividend)
    * route to DIFFERENT shards, so the claimed oracle parity and
    * partitioner equivalence both silently break. */
  private def shardOf(idCol: String, nShards: Int): Column =
    pmod(col(idCol), lit(nShards.toLong))

  /** Loud precondition of the sharded tier's routing law — see
    * [[shardOf]]. ONE min() aggregation job over the caller's frame —
    * batch-sized for appends/deletes, but a FULL PASS on a filtered/
    * joined corpus frame (min/max pushdown cannot serve those), which
    * is why the corpus-sized entry points (build/reshard) fold the
    * check into [[shardCountsChecked]]'s routing pass instead of
    * calling this (ADVICE r19). */
  private def requireNonNegIds(df: DataFrame, idCol: String,
      op: String): Unit = {
    val row = df.agg(min(col(idCol)).cast("long")).head()
    require(row.isNullAt(0) || row.getLong(0) >= 0L,
      s"$op: sharded ADC ids must be non-negative (min ${row.get(0)}) — " +
        "pmod routing and the oracle's sign-of-dividend % diverge below 0")
  }

  /** Per-shard routed counts AND the id-sign check in ONE corpus pass
    * (ADVICE r19: the old separate min() agg re-scanned the corpus) —
    * the build/reshard entry derives each shard's occupancy-constant
    * nlist from exactly this. Fails loudly on a negative id or an
    * empty shard (nothing to train that shard's quantizer on — choose
    * fewer shards). */
  private def shardCountsChecked(vecs: DataFrame, idCol: String,
      nShards: Int, op: String): Array[Long] = {
    val rows = vecs.groupBy(shardOf(idCol, nShards).cast("int").as("s"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).cast("long").as("m"))
      .collect()
    val counts = new Array[Long](nShards)
    rows.foreach { r =>
      require(!r.isNullAt(2) && r.getLong(2) >= 0L,
        s"$op: sharded ADC ids must be non-negative (min ${r.get(2)}) " +
          "— pmod routing and the oracle's sign-of-dividend % diverge " +
          "below 0")
      counts(r.getInt(0)) = r.getLong(1)
    }
    (0 until nShards).foreach(s => require(counts(s) > 0,
      s"$op: shard $s of $nShards is empty — id space too sparse for " +
        "this shard count"))
    counts
  }

  /** The sharded index's ONE data table at reshard generation `rsgen`:
    * generation 0 is the build's `table_sv`; a [[reshardIvfAdcIndex]]
    * lands generation g > 0 under `table_r{g}_sv` — the one level of
    * naming indirection that gives RESHARD a single commit point (the
    * `_sh` sidecar swap flips every probe/mutator to the new layout
    * atomically). */
  private def svDataTable(table: String, rsgen: Long): String =
    if (rsgen == 0L) s"${table}_sv" else s"${table}_r${rsgen}_sv"

  /** ENFORCE the generation-name-grammar reservation at build time
    * (ADVICE r19, medium): [[dropStaleShardGens]] sweeps every catalog
    * name matching `<table>(_r<g>)?_sv(...)`, so a sharded index whose
    * OWN name ends in `_r<g>` or `_sv` would make another index's
    * sweep (or its own) ambiguous. Refusing the name at build beats
    * silently destroying a colliding index at the next rebuild. */
  private def requireShardableName(table: String): Unit =
    require(!table.matches(".*_r\\d+$") && !table.endsWith("_sv"),
      s"$table: sharded index names ending in _r<g> or _sv are " +
        "reserved by the reshard-generation name grammar — pick " +
        "another name")

  /** (shard count, reshard generation) from the sidecar — every
    * sharded entry point resolves layout through this one read. A
    * sidecar written before the reshard operation existed has no
    * `rsgen` column and reads as generation 0 (the original naming).
    * Heals a reshard commit's crashed sidecar swap first, like every
    * swap-written sidecar. */
  private def readShardMeta(spark: SparkSession, table: String)
      : (Int, Long) = {
    val t = table + "_sh"
    MergeTables.recoverCompactCrash(spark, t)
    require(spark.catalog.tableExists(t),
      s"$table has no shard sidecar — not a sharded ADC index")
    // driver-side sidecar read (r22): one-row layout table, was a
    // head() job per probe plan; same healed fresh listing.
    val row = graft.sources.SidecarRead.rows(spark, t).head
    (row.getInt("nshards"),
      if (row.values.contains("rsgen")) row.getLong("rsgen") else 0L)
  }

  private def readShardCount(spark: SparkSession, table: String): Int =
    readShardMeta(spark, table)._1

  /** Sweep the one-table layouts of every reshard generation OTHER
    * than `liveGen` — the heal for a reshard's one non-atomic residue:
    * its post-commit GC. A crash between the sidecar commit and the GC
    * leaves the retired generation's tables orphaned (inert — no
    * reader resolves them — but residue), and a crashed ATTEMPT leaves
    * its next-generation tables half-built; both match the
    * generation-name grammar and neither is the live generation, so
    * one catalog sweep at the next reshard/build entry removes them.
    * Regex-precise (NOT a glob — `_sh` and `_serve` must survive), and
    * the grammar is RESERVED at build time ([[requireShardableName]],
    * ADVICE r19) so no unrelated index can sit inside it. */
  private def dropStaleShardGens(spark: SparkSession, table: String,
      liveGen: Long): Unit = {
    val q = java.util.regex.Pattern.quote(table)
    val gen0 = s"^${q}_sv(_c|_g|_g_hwm|_t|_cmp)?$$".r
    val genR = s"^${q}_r(\\d+)_sv(_c|_g|_g_hwm|_t|_cmp)?$$".r
    spark.sessionState.catalog
      .listTables(spark.catalog.currentDatabase).map(_.table)
      .foreach { t =>
        val gen: Option[Long] = t match {
          case genR(g, _) => Some(g.toLong)
          case gen0(_)    => Some(0L)
          case _          => None
        }
        if (gen.exists(_ != liveGen))
          spark.sql(s"DROP TABLE IF EXISTS `$t`")
      }
  }

  /** One probe/mutation's resolved view of the sharded index:
    * generation layout plus the per-shard PROTOCOL state — active
    * epoch per shard and the committed (shard, gen, epoch) set — from
    * ONE read of the `_g` table (the single-table tier paid one epoch
    * job PER SHARD here). The `_g` row count is compaction-bounded, so
    * the collect is protocol-sized, never corpus-sized. */
  private[graft] final case class SvState(table: String, nShards: Int,
      rsgen: Long, dataT: String, epochs: Array[Long],
      committed: Array[(Int, Long, Long)])

  /** TTL cache over [[svState]]'s protocol read — the sharded twin of
    * [[epochCache]]/[[quantKeyCache]], same conf
    * (`graft.adc.quantKeyTtlMs`), same contract: a foreign process's
    * mutation inside a TTL window is seen at the next expiry or an
    * explicit [[invalidateQuantKeyCache]]; mutators always read fresh.
    * Default 0 = fresh per plan (the oracle-gated rows keep it). */
  private val svStateCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, SvState)]()

  private[graft] def svState(spark: SparkSession, table: String,
      fresh: Boolean = false): SvState = {
    val ttlMs =
      if (fresh) 0L
      else spark.conf.getOption("graft.adc.quantKeyTtlMs")
        .map(_.toLong).getOrElse(0L)
    val ck = spark.sparkContext.applicationId + ":" + table + ":"
    if (ttlMs > 0L) {
      val hit = svStateCache.get(ck)
      if (hit != null &&
          System.nanoTime() - hit._1 < ttlMs * 1000000L) return hit._2
    }
    val (nShards, rsgen) = readShardMeta(spark, table)
    val dataT = svDataTable(table, rsgen)
    val gt = dataT + "_g"
    MergeTables.recoverCmpSwapCrash(spark, dataT)
    MergeTables.recoverCompactCrash(spark, gt)
    require(spark.catalog.tableExists(gt),
      s"$table has no generation table at $gt — not a sharded ADC index")
    // driver-side sidecar read (r22): the per-shard protocol rows are
    // compaction-bounded; the collect here was one blocking job per
    // probe plan. Same healed fresh listing, identical rows.
    val rows = graft.sources.SidecarRead.rows(spark, gt)
      .map(r => (r.getInt("shard"), r.getLong("gen"), r.getLong("epoch")))
    val epochs = Array.fill(nShards)(-1L)
    rows.foreach { case (s, _, e) => if (e > epochs(s)) epochs(s) = e }
    (0 until nShards).foreach(s => require(epochs(s) >= 0L,
      s"$table: shard $s has no committed generations — corrupt index"))
    val committed = rows.iterator
      .filter { case (s, _, e) => e == epochs(s) }.toArray
    val st = SvState(table, nShards, rsgen, dataT, epochs, committed)
    if (ttlMs > 0L) svStateCache.put(ck, (System.nanoTime(), st))
    else svStateCache.remove(ck)
    st
  }

  /** Drop every in-process cached handle on a sharded index — state
    * TTL entries, quantizer-listing TTL entries and the combined
    * broadcasts — after any layout/epoch mutation. */
  private def invalidateSvCaches(table: String, dataT: String): Unit = {
    val it = svStateCache.keySet().iterator()
    while (it.hasNext) if (it.next().contains(":" + table + ":"))
      it.remove()
    Option(svQuantMemo.remove(dataT)).foreach(_._2.unpersist(false))
    Option(svHierMemo.remove(dataT)).foreach(_._2.unpersist(false))
    invalidateQuantKeyCache(dataT)
  }

  /** The combined-broadcast memo key: per-shard active epochs PLUS the
    * centroid table's file snapshot — ONE listing for every shard
    * (the per-shard layout paid one per shard), TTL-served like
    * [[quantStateKey]]'s and scoped to this SparkContext for the same
    * dead-handle reason. */
  private def svQuantKey(spark: SparkSession, st: SvState,
      fresh: Boolean = false): String = {
    val ttlMs =
      if (fresh) 0L
      else spark.conf.getOption("graft.adc.quantKeyTtlMs")
        .map(_.toLong).getOrElse(0L)
    val ck = spark.sparkContext.applicationId + ":" + st.dataT + ":" +
      st.epochs.mkString(",")
    if (ttlMs > 0L) {
      val hit = quantKeyCache.get(ck)
      if (hit != null &&
          System.nanoTime() - hit._1 < ttlMs * 1000000L) return hit._2
    }
    val key = spark.sparkContext.applicationId + ":" +
      st.epochs.mkString(",") + ":" +
      MergeTables.freshInputFiles(spark, st.dataT + "_c").mkString(",")
    if (ttlMs > 0L) {
      quantKeyCache.put(ck, (System.nanoTime(), key))
      evictOtherEpochs(quantKeyCache,
        spark.sparkContext.applicationId, st.dataT, ck)
    } else quantKeyCache.remove(ck)
    key
  }

  /** The PERSISTED serving-state key of a sharded index: per-shard
    * epochs + the centroid file snapshot + layout meta, WITHOUT the
    * application id — stored dials must survive a driver restart (the
    * whole point of persisting them), while the broadcast MEMO keys
    * keep the app id for dead-handle scoping. Any shard's retrain, a
    * reshard, a rebuild or a centroid GC changes it. */
  private def svStateKey(spark: SparkSession, st: SvState): String =
    st.epochs.mkString(",") + "|" +
      MergeTables.freshInputFiles(spark, st.dataT + "_c").mkString(",") +
      s"|n=${st.nShards}|g=${st.rsgen}"

  /** Every shard's centroids at its active epoch, read in ONE pass of
    * the shared `_c` table (nlist-bounded rows, the same driver state
    * the trainers hold). */
  private def readSvCentroids(spark: SparkSession, st: SvState)
      : Array[Array[Array[Double]]] = {
    MergeTables.recoverCompactCrash(spark, st.dataT + "_c")
    spark.catalog.refreshTable(st.dataT + "_c")
    val rows = spark.table(st.dataT + "_c")
      .select(col("shard").cast("int"), col("cell"), col("cent"),
        col("epoch"))
      .collect()
    (0 until st.nShards).map { s =>
      val cs = rows.filter(r =>
          r.getInt(0) == s && r.getLong(3) == st.epochs(s))
        .sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
      require(cs.nonEmpty, s"${st.table}: shard $s has no stored " +
        s"centroids at epoch ${st.epochs(s)}")
      cs
    }.toArray
  }

  /** Process-level memos of the COMBINED quantizer broadcasts — one
    * shipped ShardedQuant/ShardedHier per (data table, epochs,
    * centroid snapshot), the sharded twins of [[quantBcMemo]]. */
  private val svQuantMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.broadcast.Broadcast[
      graft.functions.NearestCellsSharded.ShardedQuant])]()
  private val svHierMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.broadcast.Broadcast[
      graft.functions.NearestCellsSharded.ShardedHier])]()

  private def svQuantBc(spark: SparkSession, st: SvState)
      : org.apache.spark.broadcast.Broadcast[
        graft.functions.NearestCellsSharded.ShardedQuant] =
    memoBc(svQuantMemo, spark, st.dataT, svQuantKey(spark, st))(
      graft.functions.NearestCellsSharded.ShardedQuant(
        readSvCentroids(spark, st)
          .map(graft.functions.NearestCellsBc.quantizerOf)))

  private def svHierBc(spark: SparkSession, st: SvState)
      : org.apache.spark.broadcast.Broadcast[
        graft.functions.NearestCellsSharded.ShardedHier] =
    memoBc(svHierMemo, spark, st.dataT, svQuantKey(spark, st))(
      graft.functions.NearestCellsSharded.ShardedHier(
        readSvCentroids(spark, st)
          .map(graft.functions.NearestCellsHier.group)))

  /** The packed (gcell, shard, cell, id, qc, scale) rows of a
    * mixed-shard vector frame in ONE pass: each row routes by
    * [[shardOf]] and assigns to ITS shard's quantizer through the
    * combined broadcast ([[graft.functions.NearestCellsSharded]]'s
    * assign kernel — the single-shard kernel on that shard's slice, so
    * assignment is bit-identical to the retired per-shard pass).
    * `epochOf(shardCol)` stamps each row with its shard's target epoch
    * (a map literal at the callers — shards retrain independently). */
  private def svPackedRows(vecs: DataFrame, idCol: String,
      vecCol: String,
      bc: org.apache.spark.broadcast.Broadcast[
        graft.functions.NearestCellsSharded.ShardedQuant],
      nShards: Int, gen: Long, epochOf: Column => Column): DataFrame = {
    val sc = VectorOps.maxAbs(col(vecCol))
    val shardC = shardOf(idCol, nShards).cast("int")
    vecs.select(
        shardC.as("shard"),
        graft.functions.NearestCellsSharded.assign(col(vecCol), shardC,
          bc).as("cell"),
        col(idCol).as("id"),
        VectorOps.packQuant(col(vecCol), sc).as("qc"), sc.as("scale"))
      .select(
        (col("shard").cast("long") * lit(4294967296L) +
          col("cell").cast("long")).as("gcell"),
        col("shard"), col("cell"), col("id"), col("qc"), col("scale"))
      .withColumn("gen", lit(gen))
      .withColumn("epoch", epochOf(col("shard")))
  }

  /** A shard→active-epoch map literal from the resolved state — how
    * write paths stamp mixed-shard batches and probes prune the scan
    * to active epochs. */
  private def svEpochMap(st: SvState): Column =
    typedLit(st.epochs.zipWithIndex.map { case (e, s) => s -> e }.toMap)

  /** Train one shard's coarse quantizer over its routed subset — the
    * single-table build's derivation verbatim (same sample, same Lloyd
    * loop, same init), which is what keeps the qg oracles' per-shard
    * CTE chains valid across the re-layout. */
  private def svTrainShard(vecs: DataFrame, idCol: String,
      vecCol: String, nShards: Int, s: Int, n: Long,
      targetRecall: Double, dim: Int, init: String)
      : Array[Array[Double]] = {
    val sub = vecs.filter(shardOf(idCol, nShards) === s)
    val (nlist, _) = ivfParams(n, targetRecall)
    trainCoarseQuantizer(
      trainingSample(sub, idCol, vecCol, trainingCap(nlist)),
      vecCol, nlist, dim, init = init)
  }

  /** The (shard, cell, cent, epoch) rows of trained quantizers —
    * build/retrain/reshard share it so the stored form cannot
    * diverge. */
  private def svCentroidRows(spark: SparkSession,
      quants: Seq[(Int, Array[Array[Double]])], epoch: Long)
      : DataFrame = {
    import spark.implicits._
    quants.flatMap { case (s, cents) =>
      cents.zipWithIndex.map { case (c, i) => (s, i, c.toSeq, epoch) }
    }.toDF("shard", "cell", "cent", "epoch")
  }

  /** Land a complete one-table layout at `dataT` over `vecs` — the
    * shared body of [[writeIvfAdcIndexSharded]] (generation 0) and
    * [[reshardIvfAdcIndex]] (the inert next generation): per-shard
    * training, ONE packed corpus pass through the combined broadcast
    * (the per-shard layout re-scanned the corpus once per shard), the
    * bucketed write, centroids and the gen-0 commit rows. */
  private def svBuildLayout(vecs: DataFrame, idCol: String,
      vecCol: String, dataT: String, nShards: Int, counts: Array[Long],
      dim: Int, targetRecall: Double, buckets: Int, init: String)
      : Unit = {
    val spark = vecs.sparkSession
    VectorOps.ensureRegistered(spark)
    // a fresh layout has no committed batches, no tombstones, no stale
    // replay marks and no stale broadcasts
    MergeTables.dropHwms(spark, dataT + "_g")
    spark.sql(s"DROP TABLE IF EXISTS `${dataT}_t`")
    graft.sources.MapFiles.clearStaleLocation(spark, dataT + "_t")
    val quants = (0 until nShards).map(s =>
      s -> svTrainShard(vecs, idCol, vecCol, nShards, s, counts(s),
        targetRecall, dim, init))
    val bc = spark.sparkContext.broadcast(
      graft.functions.NearestCellsSharded.ShardedQuant(
        quants.map(q => graft.functions.NearestCellsBc.quantizerOf(q._2))
          .toArray))
    try graft.sources.MapFiles.write(
      svPackedRows(vecs, idCol, vecCol, bc, nShards, gen = 0L,
        _ => lit(0L)),
      "gcell", buckets, dataT)
    finally bc.unpersist(false)
    graft.sources.MapFiles.write(
      svCentroidRows(spark, quants, 0L), "cell", 1, dataT + "_c")
    import spark.implicits._
    graft.sources.MapFiles.write(
      (0 until nShards).map(s => (s, 0L, -1L, 0L))
        .toDF("shard", "gen", "batch_key", "epoch"),
      "gen", 1, dataT + "_g")
  }

  /** Build the SHARDED persisted ADC index: route by [[shardOf]],
    * train one coarse quantizer PER SHARD on its own rows
    * (occupancy-constant nlist from each shard's OWN count — the same
    * derivation a single-table build uses on its whole corpus), pack
    * the whole corpus in ONE pass against the combined broadcast into
    * ONE bucketed table keyed by the global cell id, then commit the
    * shard count as the `_sh` sidecar so probes and lifecycle ops are
    * self-describing. Every shard must be non-empty (an empty shard
    * has nothing to train a quantizer on — choose fewer shards). */
  def writeIvfAdcIndexSharded(vecs: DataFrame, idCol: String,
      vecCol: String, table: String, nShards: Int, dim: Int = 64,
      targetRecall: Double = 0.8, buckets: Int = ivfIndexBuckets,
      init: String = "first"): Unit = {
    require(nShards >= 1, s"nShards=$nShards")
    requireShardableName(table)
    val spark = vecs.sparkSession
    // counts + id-sign check in one routed pass (ADVICE r19)
    val counts = shardCountsChecked(vecs, idCol, nShards,
      "writeIvfAdcIndexSharded")
    // a rebuild replaces ANY previous layout at this name: sweep EVERY
    // generation (liveGen = -1 keeps nothing) — a live reshard
    // generation, a crashed attempt's half-build, a crashed GC's
    // orphans. The sweep is CONDITIONAL on the `_sh` sidecar (ADVICE
    // r20 low): requireShardableName reserves the grammar only among
    // SHARDED names, so without the sidecar a grammar-matching table
    // (`foo_sv`, …) may be an unrelated committed single-table index —
    // refuse loudly instead of silently destroying it. A crashed FIRST
    // build (half-built tables, sidecar never written) trips the same
    // refusal; its message lists the tables to drop to proceed.
    if (spark.catalog.tableExists(table + "_sh"))
      dropStaleShardGens(spark, table, liveGen = -1L)
    else {
      val q = java.util.regex.Pattern.quote(table)
      val grammar = s"^${q}(_r\\d+)?_sv(_c|_g|_g_hwm|_t|_cmp)?$$"
      val colliding = spark.sessionState.catalog
        .listTables(spark.catalog.currentDatabase).map(_.table)
        .filter(_.matches(grammar))
      require(colliding.isEmpty,
        s"building sharded index '$table' would sweep existing " +
          s"tables ${colliding.sorted.mkString(", ")} which no '" +
          table + "_sh' sidecar claims — they may be an unrelated " +
          "single-table index (or a crashed first build's residue): " +
          "drop them explicitly or pick another name")
    }
    val dataT = svDataTable(table, 0L)
    invalidateSvCaches(table, dataT)
    svBuildLayout(vecs, idCol, vecCol, dataT, nShards, counts, dim,
      targetRecall, buckets, init)
    import spark.implicits._
    // a previous JVM's sidecar directory survives in the shared
    // warehouse while this session's catalog has no row for it —
    // overwrite-mode saveAsTable refuses the orphan location, so clear
    // it first (the MapFiles.write discipline)
    graft.sources.MapFiles.clearStaleLocation(spark, table + "_sh")
    Seq((nShards, 0L)).toDF("nshards", "rsgen").write.mode("overwrite")
      .saveAsTable(table + "_sh")
  }

  /** The probe-visible rows of the sharded index: active-epoch rows of
    * committed (shard, gen) pairs minus each shard's active tombstones
    * — ONE scan + one LOCAL-relation semi-join + one anti-join at ANY
    * shard count (the per-shard layout planned one scan + two
    * broadcasts PER SHARD). The commit set rides the already-collected
    * protocol state ([[svState]]) as a local relation, so liveness
    * resolution costs the plan nothing beyond the broadcast; the epoch
    * In-filter reaches the scan and prunes retired/orphan epochs'
    * files from their row-group stats. */
  private def svLiveRows(spark: SparkSession, st: SvState,
      bucketedRead: Boolean = false): DataFrame = {
    import spark.implicits._
    val stored = (
      if (bucketedRead)
        graft.sources.MapFiles.readBucketed(spark, st.dataT)
      else spark.table(st.dataT))
      .filter(col("epoch").isin(
        st.epochs.distinct.sorted.map(Long.box): _*))
    val commits = st.committed.toSeq.toDF("shard", "gen", "epoch")
    val committed = stored.join(broadcast(commits),
      Seq("shard", "gen", "epoch"), "left_semi")
    val tt = st.dataT + "_t"
    if (!spark.catalog.tableExists(tt)) committed
    else {
      val actives = st.epochs.zipWithIndex
        .map { case (e, s) => (s, e) }.toSeq.toDF("shard", "epoch")
      committed.join(
        broadcast(spark.table(tt)
          .join(broadcast(actives), Seq("shard", "epoch"), "left_semi")
          .select("id").distinct()),
        Seq("id"), "left_anti")
    }
  }

  /** The ONE-PLAN sharded candidate stage — [[adcProbeCandidatesVia]]'s
    * discipline (bounded query snapshot, gcell In-pushdown with the
    * driver-side twin kernel, bucket co-partitioning, vector-free
    * candidate rows) over the one-table layout. `cellsOf` is the
    * plan-side combined-kernel column (flat or two-level, per-shard
    * dials baked into the expression), `localSel` its driver twin.
    * Candidates keep the `shard` column for the served path's
    * per-shard re-rank branch. */
  private def svProbeCandidates(queries: DataFrame, idCol: String,
      vecCol: String, st: SvState, buckets: Int,
      cellsOf: Column => Column,
      localSel: Array[Double] => Array[Long]): DataFrame = {
    val spark = queries.sparkSession
    VectorOps.ensureRegistered(spark)
    val snapped: Option[Array[org.apache.spark.sql.Row]] =
      if (queries.isStreaming ||
          spark.conf.getOption("graft.adc.pushdown").contains("false"))
        None
      else {
        val rows = queries.select(col(idCol), col(vecCol))
          .limit(maxPushdownQueries + 1).collect()
        if (rows.length > maxPushdownQueries) None else Some(rows)
      }
    val probeSrc = snapped match {
      case Some(rows) => spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        queries.select(col(idCol), col(vecCol)).schema)
      case None => queries
    }
    // qscale rides along (r21, ADVICE r20 high): the query-side maxAbs
    // the mixed-mode served merge needs to put quantized estimates on
    // the exact-dot scale — idot × (scale/127) × (qscale/127) ≈ the
    // true dot. Probe-only rankings ignore it (per-query constant).
    val probes = probeSrc.select(col(idCol).as("q_id"),
        VectorOps.packQuant(col(vecCol), VectorOps.maxAbs(col(vecCol)))
          .as("q_qc"),
        VectorOps.maxAbs(col(vecCol)).as("qscale"),
        explode(cellsOf(col(vecCol))).as("gcell"))
      .repartition(buckets, col("gcell"))
    val stored = svLiveRows(spark, st)
    val prunable = snapped match {
      case None => stored
      case Some(rows) =>
        val vecIdx = 1 // (idCol, vecCol) projection above
        val cellSet = rows.iterator
          .filterNot(_.isNullAt(vecIdx))
          .flatMap(r => localSel(r.getSeq[Number](vecIdx)
            .map(x => if (x == null) 0.0 else x.doubleValue()).toArray))
          .toSet
        if (cellSet.size > 4096) stored
        else stored.filter(
          col("gcell").isin(cellSet.toSeq.sorted.map(Long.box): _*))
    }
    probes.join(prunable, Seq("gcell"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id").as("nb_id"),
        VectorOps.i8Dot(col("q_qc"), col("qc")).as("idot"),
        col("scale"), col("qscale"), col("shard"))
  }

  /** Each shard's fraction-law nprobe from its OWN stored nlist — the
    * oracle-gated probe law, unchanged from the per-shard layout
    * (what keeps qg1–qg4's per-shard CTE chains valid). */
  private def svFracNprobes(
      bc: org.apache.spark.broadcast.Broadcast[
        graft.functions.NearestCellsSharded.ShardedQuant],
      targetRecall: Double): Array[Int] = {
    val frac = probeFracEighths(targetRecall) / 8.0
    bc.value.quants.map { q =>
      val nlist = q.norms2.length
      math.max(1L, math.min(nlist.toLong,
        math.ceil(frac * nlist).toLong)).toInt
    }
  }

  /** Probe the sharded index: every query probes EVERY shard's own
    * quantizer at that shard's fraction-law nprobe (derived from its
    * STORED nlist — no corpus count at probe time), all shards'
    * candidates emerge from ONE join on the global cell id, and ONE
    * global rank merges them — exact by construction (shards partition
    * the corpus, so the union is the complete fraction-law candidate
    * set and a stored row appears from exactly one shard). Per-query
    * coarse work is sum(nprobe_s) with nprobe_s ~ frac·nlist_s and
    * sum(nlist_s) = nlist — the fan-out costs what the single table
    * cost, while write/maintenance parallelism and per-quantizer
    * training locality scale with the shard count. ONE Catalyst plan
    * at any shard count: scan, broadcasts, exchange and task count are
    * all shard-count-independent (r19 verdict item 1 — the retired
    * per-shard plan fan-out paid ~0.1 s/shard of execution floor). */
  def ivfAdcTopKIndexedSharded(queries: DataFrame, idCol: String,
      vecCol: String, k: Int, table: String, dim: Int = 64,
      targetRecall: Double = 0.8, buckets: Int = ivfIndexBuckets)
      : DataFrame = {
    val spark = queries.sparkSession
    val st = svState(spark, table)
    val bc = svQuantBc(spark, st)
    val nprobes = svFracNprobes(bc, targetRecall)
    rankByScaledIdot(svProbeCandidates(queries, idCol, vecCol, st,
      buckets,
      v => graft.functions.NearestCellsSharded.flat(v, bc, nprobes),
      v => graft.functions.NearestCellsSharded.nearestFlat(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
        isFloat = false, bc.value, nprobes)), k)
  }

  /** Per-shard serving dials of the TUNED sharded probe — what
    * [[tuneShardDials]] derives and [[ivfAdcTopKIndexedShardedTuned]]
    * consumes. `probeRecall`/`hierRecall` are the measured gates the
    * dials were accepted at (nprobe vs the shard's quantizer ceiling,
    * gprobe vs the same ceiling at that nprobe). */
  final case class ShardDials(nprobe: Int, probeRecall: Double,
      gprobe: Int, hierRecall: Double)

  /** One shard's SERVING decision (r19 verdict item 2 — the
    * plateau→re-rank escalation composed onto the sharded tier):
    * `mode` is "probe" (the tuned two-level probe met the end-to-end
    * gate) or "rerank" (the probe dial PLATEAUED below it — loss
    * probing cannot fix, the density regime — so the shard escalates
    * to an exact-dot re-rank of its top-`depth` candidates).
    * `recall` is the measured end-to-end mean recall@k of the decided
    * path against the shard's float-exact reference. */
  final case class ShardServing(mode: String, dials: ShardDials,
      depth: Int, recall: Double)

  /** The shard-pure candidate leg: the ONE-PLAN probe with every other
    * shard dialed to 0 (the combined kernel skips them) — what the
    * per-shard tuner and the served path's re-rank branch rank
    * against. `gprobe` <= 0 selects the flat kernel. */
  private def svShardCandidates(queries: DataFrame, idCol: String,
      vecCol: String, st: SvState, shard: Int, nprobe: Int,
      gprobe: Int, buckets: Int = ivfIndexBuckets): DataFrame = {
    val spark = queries.sparkSession
    if (gprobe <= 0) {
      val bc = svQuantBc(spark, st)
      val nps = Array.tabulate(st.nShards)(s =>
        if (s == shard) nprobe else 0)
      svProbeCandidates(queries, idCol, vecCol, st, buckets,
        v => graft.functions.NearestCellsSharded.flat(v, bc, nps),
        v => graft.functions.NearestCellsSharded.nearestFlat(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
          isFloat = false, bc.value, nps))
    } else {
      val bc = svHierBc(spark, st)
      val nps = Array.tabulate(st.nShards)(s =>
        if (s == shard) nprobe else 0)
      val gps = Array.tabulate(st.nShards)(s =>
        if (s == shard) gprobe else 0)
      svProbeCandidates(queries, idCol, vecCol, st, buckets,
        v => graft.functions.NearestCellsSharded.hier(v, bc, gps, nps),
        v => graft.functions.NearestCellsSharded.nearestHier(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
          isFloat = false, bc.value, gps, nps))
    }
  }

  /** One shard's quantizer CEILING — [[adcFullTopK]]'s contract on the
    * shard: every live stored row of the shard scored for every query
    * (nprobe = the shard's full nlist), i.e. probing loss excluded,
    * quantization loss kept. */
  private def svShardCeiling(queries: DataFrame, idCol: String,
      vecCol: String, k: Int, st: SvState, shard: Int, nlist: Int)
      : DataFrame =
    rankByScaledIdot(svShardCandidates(queries, idCol, vecCol, st,
      shard, nprobe = nlist, gprobe = 0), k)
      .select(col("q_id"), col("nb_id"))

  /** Run `body(shard)` for every shard on a bounded pool (r19 verdict
    * item 3 — the per-shard tunes are independent multi-audit Spark
    * workloads and ran SEQUENTIALLY; concurrent driver threads submit
    * jobs the scheduler interleaves). Pool width capped like the old
    * fan-out's. */
  private def svPerShard[A](nShards: Int)(body: Int => A): Seq[A] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(nShards, 8))
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try Await.result(
      Future.sequence((0 until nShards).map(s => Future(body(s)))),
      scala.concurrent.duration.Duration.Inf)
    finally pool.shutdown()
  }

  /** Recall-gated ABSOLUTE dials for EVERY shard of a sharded ADC
    * index — the serving dial composed onto the horizontal dial. Each
    * shard tunes AGAINST ITS OWN AUDIT, exactly the single-table
    * discipline ([[tuneNprobe]] / [[tuneGprobe]] at monitoring
    * cadence), and BOTH dials gate against the shard's quantizer
    * ceiling ([[svShardCeiling]] — probing loss, not quantization
    * loss): gating gprobe against the flat probe at nprobe instead
    * (the single-row diagnostic) lets the two gates COMPOUND — a
    * 0.8-vs-flat hier on a 0.8-vs-ceiling flat is ~0.64 end-to-end,
    * measured exactly that in the spec — while one end-to-end gate per
    * shard composes across shards: shards partition the corpus, a
    * global top-k member lives in exactly one shard and ranks at least
    * as high in that shard's local top-k as globally. Shards tune
    * CONCURRENTLY on a bounded pool (r19 verdict item 3); the
    * quantizer-state guard spans the whole run. `queries` should be
    * the monitoring panel (~hundreds of rows), never the corpus. */
  def tuneShardDials(queries: DataFrame, idCol: String, vecCol: String,
      k: Int, table: String, targetRecall: Double, dim: Int = 64,
      minGain: Double = 0.005): Seq[ShardDials] = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall=$targetRecall")
    val spark = queries.sparkSession
    val st = svState(spark, table, fresh = true)
    val key0 = svStateKey(spark, st)
    val nlists = svQuantBc(spark, st).value.quants.map(_.norms2.length)
    val res = svPerShard(st.nShards) { s =>
      val ceiling = svShardCeiling(queries, idCol, vecCol, k, st, s,
        nlists(s)).localCheckpoint()
      try {
        val (np, rec) = tuneDial(nlists(s), targetRecall, minGain)(np =>
          recallOfApprox(ceiling,
              rankByScaledIdot(svShardCandidates(queries, idCol, vecCol,
                st, s, np, gprobe = 0), k), k)
            .agg(avg("recall")).head().getDouble(0))
        val groups = math.max(1,
          math.ceil(math.sqrt(nlists(s).toDouble)).toInt)
        val (gp, gRec) = tuneDial(groups, targetRecall, minGain)(gp =>
          recallOfApprox(ceiling,
              rankByScaledIdot(svShardCandidates(queries, idCol, vecCol,
                st, s, np, gprobe = gp), k), k)
            .agg(avg("recall")).head().getDouble(0))
        ShardDials(np, rec, gp, gRec)
      } finally dropCheckpoint(ceiling)
    }
    require(svStateKey(spark, svState(spark, table, fresh = true)) ==
      key0,
      s"$table was retrained/resharded/rebuilt mid-tune — the measured " +
        "recalls mix quantizer states; rerun the tune")
    res
  }

  /** One shard's exact-dot RE-RANK leg: the shard-pure flat candidates
    * at `nprobe` ranked to top-`depth`, then ONLY those survivors join
    * the full float vectors for the exact dot — [[ivfAdcRerankIndexed]]'s
    * scale shape (corpus vectors never enter an exchange; the only
    * float payload moving is the query vectors riding a
    * candidate-scale broadcast). */
  private def svShardRerank(vecs: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, depth: Int, nprobe: Int,
      st: SvState, shard: Int): DataFrame = {
    val survivors = rankByScaledIdot(
      svShardCandidates(queries, idCol, vecCol, st, shard, nprobe,
        gprobe = 0), depth)
      .select(col("q_id"), col("nb_id"))
    val qs = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val withQ = qs.join(broadcast(survivors), Seq("q_id"))
      .select(col("q_id"), col("nb_id"), col("qv"))
    val rescored = vecs
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(broadcast(withQ), col("id") === col("nb_id"))
      .select(col("q_id"), col("nb_id"),
        dot(col("qv"), col("v")).as("cos"))
    rankTopK(rescored, k).withColumnRenamed("cos", "score")
  }

  /** THE PER-SHARD SERVING POLICY (r19 verdict item 2) —
    * [[tuneServing]] composed onto the sharded tier: each shard tunes
    * its probe dial against its OWN float-exact end-to-end reference
    * (deliberately not the quantizer ceiling: the policy exists to see
    * the quantization loss the ceiling excludes, because re-ranking
    * can fix it). A shard whose dial meets `targetRecall` serves
    * probe-mode through the two-level kernel (gprobe tuned against the
    * shard ceiling, then the end-to-end recall of the hier path
    * re-measured against the exact leg); a shard whose dial PLATEAUS
    * below it — the density regime — escalates to the exact-dot
    * re-rank at a tuned depth ([[svShardRerank]]), per shard, inside
    * the same fan-out. Monitoring-cadence; shards run concurrently;
    * the state guard spans the whole policy run. `vecs` is the live
    * corpus frame (the exact legs and the re-rank audits need the
    * float vectors). */
  def tuneShardServing(vecs: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, table: String,
      targetRecall: Double, dim: Int = 64, minGain: Double = 0.005,
      maxDepthFactor: Int = 32): Seq[ShardServing] = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall=$targetRecall")
    require(maxDepthFactor >= 1, s"maxDepthFactor=$maxDepthFactor")
    val spark = queries.sparkSession
    val st = svState(spark, table, fresh = true)
    val key0 = svStateKey(spark, st)
    val nlists = svQuantBc(spark, st).value.quants.map(_.norms2.length)
    val res = svPerShard(st.nShards) { s =>
      val exact = exactMipsTopK(
        vecs.filter(shardOf(idCol, st.nShards) === s), queries, idCol,
        vecCol, k).localCheckpoint()
      try {
        val (np, npRec) = tuneDial(nlists(s), targetRecall, minGain)(
          np => recallOfApprox(exact,
              rankByScaledIdot(svShardCandidates(queries, idCol, vecCol,
                st, s, np, gprobe = 0), k), k)
            .agg(avg("recall")).head().getDouble(0))
        // density regime / last resort: no probe dial meets the gate —
        // escalate to the exact-dot re-rank, depth as a multiplier
        // over k (depth = k reorders but cannot change recall)
        def escalate(): ShardServing = {
          val (mult, rrRec) = tuneDial(maxDepthFactor, targetRecall,
            minGain)(m => recallOfApprox(exact,
                svShardRerank(vecs, queries, idCol, vecCol, k,
                  depth = m * k, nprobe = np, st, s), k)
              .agg(avg("recall")).head().getDouble(0))
          ShardServing("rerank", ShardDials(np, npRec, 0, 0.0),
            depth = mult * k, recall = rrRec)
        }
        if (npRec >= targetRecall) {
          // probe mode: the serving path is the two-level kernel, so
          // tune gprobe against the shard CEILING at np (the
          // tuneShardDials gate), then re-measure the decided path
          // END-TO-END against the exact leg — the stored recall is
          // always the decided path's, like tuneServing's
          val ceiling = svShardCeiling(queries, idCol, vecCol, k, st,
            s, nlists(s)).localCheckpoint()
          try {
            val groups = math.max(1,
              math.ceil(math.sqrt(nlists(s).toDouble)).toInt)
            val (gp, gRec) = tuneDial(groups, targetRecall, minGain)(
              gp => recallOfApprox(ceiling,
                  rankByScaledIdot(svShardCandidates(queries, idCol,
                    vecCol, st, s, np, gprobe = gp), k), k)
                .agg(avg("recall")).head().getDouble(0))
            def e2eAt(g: Int): Double = recallOfApprox(exact,
                rankByScaledIdot(svShardCandidates(queries, idCol,
                  vecCol, st, s, np, gprobe = g), k), k)
              .agg(avg("recall")).head().getDouble(0)
            val e2e = e2eAt(gp)
            if (e2e >= targetRecall)
              ShardServing("probe", ShardDials(np, npRec, gp, gRec),
                depth = 0, recall = e2e)
            else {
              // the decided hier path's END-TO-END recall missed the
              // gate even though the flat dial met it — the compounding
              // -gates seam (ADVICE r20 medium): never persist a
              // below-gate probe decision. Fall back to gprobe = the
              // full group count (the hier kernel's flat-equivalent
              // clamp) and re-measure; if even that misses — a panel
              // shift between the two measurements — escalate to the
              // re-rank leg, which tunes until the gate clears.
              val e2eFlat = e2eAt(groups)
              if (e2eFlat >= targetRecall) {
                val gRecFlat = recallOfApprox(ceiling,
                    rankByScaledIdot(svShardCandidates(queries, idCol,
                      vecCol, st, s, np, gprobe = groups), k), k)
                  .agg(avg("recall")).head().getDouble(0)
                ShardServing("probe",
                  ShardDials(np, npRec, groups, gRecFlat),
                  depth = 0, recall = e2eFlat)
              } else escalate()
            }
          } finally dropCheckpoint(ceiling)
        } else escalate()
      } finally dropCheckpoint(exact)
    }
    require(svStateKey(spark, svState(spark, table, fresh = true)) ==
      key0,
      s"$table was retrained/resharded/rebuilt mid-policy — rerun")
    res
  }

  /** Persist per-shard SERVING rows — one row per shard in the
    * swap-written `<table>_serve` sidecar, keyed by [[svStateKey]]
    * (NO application id — stored dials must survive a driver restart)
    * so ANY shard's retrain, a reshard, or a rebuild refuses the
    * stored rows stale at read. The sidecar name is SHARED with the
    * single-table tier's [[writeServingDecision]]; the schemas differ
    * (per-shard rows carry `shard`), and each writer REFUSES to
    * overwrite the other tier's rows (r19 verdict item 6 — in correct
    * use a sharded logical name never names a single-table index, so
    * the refusal only ever fires on misuse). */
  def writeShardServing(spark: SparkSession, table: String,
      servings: Seq[ShardServing]): Unit = {
    import spark.implicits._
    val t = table + "_serve"
    MergeTables.recoverCompactCrash(spark, t)
    if (spark.catalog.tableExists(t)) {
      spark.catalog.refreshTable(t)
      require(spark.table(t).schema.fieldNames.contains("shard"),
        s"$t holds a SINGLE-TABLE serving decision — refusing the " +
          "sharded write over it (is this name really a sharded index?)")
    }
    val key = svStateKey(spark,
      svState(spark, table, fresh = true))
    MergeTables.swapInKeyed(spark,
      servings.zipWithIndex.map { case (sv, s) =>
        (s, sv.mode, sv.dials.nprobe, sv.dials.probeRecall,
          sv.dials.gprobe, sv.dials.hierRecall, sv.depth, sv.recall,
          key)
      }.toDF("shard", "mode", "nprobe", "probe_recall", "gprobe",
        "hier_recall", "depth", "recall", "state_key"),
      "shard", t)
  }

  /** Persist [[tuneShardDials]]' probe-only dials — [[writeShardServing]]
    * with every shard in probe mode (the dial-only loop has no
    * escalation leg; its hier recall doubles as the recorded serving
    * recall). */
  def writeShardDials(spark: SparkSession, table: String,
      dials: Seq[ShardDials]): Unit =
    writeShardServing(spark, table,
      dials.map(d => ShardServing("probe", d, depth = 0,
        recall = d.hierRecall)))

  /** Read the persisted per-shard serving rows, REFUSING them stale:
    * None when nothing is stored or any shard's quantizer state
    * changed since the tune (a retrain, reshard, rebuild or centroid
    * GC — [[svStateKey]]). Metadata + one sidecar read; no ceiling or
    * exact leg. */
  def readShardServing(spark: SparkSession, table: String)
      : Option[Seq[ShardServing]] = {
    val t = table + "_serve"
    MergeTables.recoverCompactCrash(spark, t)
    if (!spark.catalog.tableExists(t)) return None
    // driver-side sidecar read (r22): per-shard decision rows, was a
    // collect job per serving-stack plan; same healed fresh listing.
    // The single-table tier's rows carry no `shard` field — same
    // refusal as the old schema check, now from the file schema.
    val rows = graft.sources.SidecarRead.rows(spark, t)
      .sortBy(r => if (r.fields.contains("shard")) r.getInt("shard") else -1)
    if (rows.isEmpty || !rows.head.fields.contains("shard")) None
    else if (rows.head.getString("state_key") !=
        svStateKey(spark, svState(spark, table, fresh = true))) None
    else Some(rows.map(r => ShardServing(r.getString("mode"),
      ShardDials(r.getInt("nprobe"), r.getDouble("probe_recall"),
        r.getInt("gprobe"), r.getDouble("hier_recall")),
      r.getInt("depth"), r.getDouble("recall"))).toSeq)
  }

  /** Read the persisted rows as probe-only DIALS — None when stale,
    * absent, OR any shard is escalated (serving an escalated shard
    * through the probe-only path would silently serve below its gate:
    * use [[ivfAdcTopKIndexedShardedServed]] instead). */
  def readShardDials(spark: SparkSession, table: String)
      : Option[Seq[ShardDials]] =
    readShardServing(spark, table).filter(_.forall(_.mode == "probe"))
      .map(_.map(_.dials))

  /** [[tuneShardDials]] + [[writeShardDials]] — the monitoring-cadence
    * loop of the probe-only sharded serving deployment. */
  def tuneShardDialsPersist(queries: DataFrame, idCol: String,
      vecCol: String, k: Int, table: String, targetRecall: Double,
      dim: Int = 64, minGain: Double = 0.005): Seq[ShardDials] = {
    val dials = tuneShardDials(queries, idCol, vecCol, k, table,
      targetRecall, dim, minGain)
    writeShardDials(queries.sparkSession, table, dials)
    dials
  }

  /** [[tuneShardServing]] + [[writeShardServing]] — the escalating
    * monitoring-cadence loop (r19 verdict item 2). */
  def tuneShardServingPersist(vecs: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, table: String,
      targetRecall: Double, dim: Int = 64, minGain: Double = 0.005,
      maxDepthFactor: Int = 32): Seq[ShardServing] = {
    val servings = tuneShardServing(vecs, queries, idCol, vecCol, k,
      table, targetRecall, dim, minGain, maxDepthFactor)
    writeShardServing(queries.sparkSession, table, servings)
    servings
  }

  /** [[ivfAdcTopKIndexedShardedTuned]] serving from the STORED
    * per-shard dials — refusing stale ones loudly, like the stacks'
    * stored-decision path. */
  def ivfAdcTopKIndexedShardedTuned(queries: DataFrame, idCol: String,
      vecCol: String, k: Int, table: String): DataFrame =
    ivfAdcTopKIndexedShardedTuned(queries, idCol, vecCol, k, table,
      readShardDials(queries.sparkSession, table).getOrElse(
        throw new IllegalStateException(
          s"$table has no fresh probe-only per-shard dials — a shard " +
            "was retrained, the index was resharded/rebuilt, it was " +
            "never tuned, or a shard is ESCALATED (rerank mode: serve " +
            "through ivfAdcTopKIndexedShardedServed): run " +
            "tuneShardDialsPersist at monitoring cadence, then serve")))

  /** TUNED serving probe of the SHARDED index: ONE plan — the shared
    * bounded query snapshot, one scan, one join, one global
    * [[rankByScaledIdot]] merge — with each shard selected through the
    * TWO-LEVEL combined kernel at its own recall-gated absolute dials
    * instead of the fraction law. Per-query work per shard is
    * nprobe_s × occupancy = CONSTANT in the shard's corpus, the
    * fan-out adds shards' constants, and since r20 the PLAN adds
    * nothing per shard (the GrowthBench qshard rows gate both).
    *
    * OPT-IN serving path like [[ivfAdcTopKIndexedHier]]: recall is a
    * measured, gated quantity (the dials come from [[tuneShardDials]],
    * and nShards=1 at its dials is bit-equal to the single-table hier
    * probe — spec-gated); never substituted under an oracle-gated
    * query. */
  def ivfAdcTopKIndexedShardedTuned(queries: DataFrame, idCol: String,
      vecCol: String, k: Int, table: String, dials: Seq[ShardDials],
      dim: Int = 64, buckets: Int = ivfIndexBuckets): DataFrame = {
    val spark = queries.sparkSession
    val st = svState(spark, table)
    require(dials.length == st.nShards,
      s"${dials.length} dials for ${st.nShards} shards — tune with " +
        "tuneShardDials against this index")
    val bc = svHierBc(spark, st)
    val nps = dials.map(_.nprobe).toArray
    val gps = dials.map(_.gprobe).toArray
    rankByScaledIdot(svProbeCandidates(queries, idCol, vecCol, st,
      buckets,
      v => graft.functions.NearestCellsSharded.hier(v, bc, gps, nps),
      v => graft.functions.NearestCellsSharded.nearestHier(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
        isFloat = false, bc.value, gps, nps)), k)
  }

  /** Serve through the STORED per-shard serving rows with PER-SHARD
    * MODES (r19 verdict item 2): probe-mode shards contribute their
    * two-level tuned candidates scored by the quantized dot estimate
    * (idot × scale — [[rankByScaledIdot]]'s key); rerank-mode shards
    * contribute their top-`depth` flat candidates RE-SCORED by the
    * exact float dot ([[svShardRerank]]'s join shape, all rerank
    * shards in ONE branch); one global rank merges on the shared
    * dot-estimate key (exact where it matters — the density shards
    * whose quantized margins are noise — and quantized where the gate
    * said quantized is enough). Still O(1) plan branches in the shard
    * count: one probe branch + one rerank branch. With every shard in
    * probe mode the output ranks are [[ivfAdcTopKIndexedShardedTuned]]'s
    * (same key, same tiebreak; spec-gated). `vecs` is the live corpus
    * frame (the rerank branch joins full vectors); refuses stale or
    * missing serving rows loudly. Output: (q_id, nb_id, rank, score).
    */
  def ivfAdcTopKIndexedShardedServed(vecs: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, table: String,
      buckets: Int = ivfIndexBuckets): DataFrame = {
    val spark = queries.sparkSession
    val servings = readShardServing(spark, table).getOrElse(
      throw new IllegalStateException(
        s"$table has no fresh per-shard serving rows — a shard was " +
          "retrained, the index was resharded/rebuilt, or it was " +
          "never tuned: run tuneShardServingPersist at monitoring " +
          "cadence, then serve"))
    val st = svState(spark, table)
    require(servings.length == st.nShards,
      s"${servings.length} serving rows for ${st.nShards} shards")
    val parts = scala.collection.mutable.ListBuffer[DataFrame]()
    val mixedModes = servings.exists(_.mode == "probe") &&
      servings.exists(_.mode == "rerank")
    if (servings.exists(_.mode == "probe")) {
      val bc = svHierBc(spark, st)
      val nps = servings.map(sv =>
        if (sv.mode == "probe") sv.dials.nprobe else 0).toArray
      val gps = servings.map(_.dials.gprobe).toArray
      // Scoring (ADVICE r20 high): in a MIXED-MODE index the probe
      // branch's rows merge into one global rank with the rerank
      // branch's EXACT float dots, so they must be on the exact-dot
      // scale — idot × (scale/127) × (qscale/127), the dequantized dot
      // estimate (error ≤ the int8 reconstruction bound, which is what
      // the tuned recall gate measures). The raw idot × scale key is
      // ~127²/qscale times the true dot: positive probe scores would
      // starve every rerank shard's true top-k out of the merge. With
      // ONE mode present the branches never meet, and the all-probe
      // key stays the raw idot × scale — bit-identical ranks to
      // ivfAdcTopKIndexedShardedTuned (the spec-gated contract).
      val probeScore =
        if (mixedModes)
          col("idot").cast("double") * col("scale") * col("qscale") /
            lit(127.0 * 127.0)
        else col("idot").cast("double") * col("scale")
      parts += svProbeCandidates(queries, idCol, vecCol, st, buckets,
          v => graft.functions.NearestCellsSharded.hier(v, bc, gps,
            nps),
          v => graft.functions.NearestCellsSharded.nearestHier(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
            isFloat = false, bc.value, gps, nps))
        .select(col("q_id"), col("nb_id"), probeScore.as("score"))
    }
    if (servings.exists(_.mode == "rerank")) {
      val bc = svQuantBc(spark, st)
      val nps = servings.map(sv =>
        if (sv.mode == "rerank") sv.dials.nprobe else 0).toArray
      val cands = svProbeCandidates(queries, idCol, vecCol, st, buckets,
        v => graft.functions.NearestCellsSharded.flat(v, bc, nps),
        v => graft.functions.NearestCellsSharded.nearestFlat(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
          isFloat = false, bc.value, nps))
      val depths = typedLit(servings.zipWithIndex.collect {
        case (sv, s) if sv.mode == "rerank" => s -> sv.depth
      }.toMap)
      val survivors = cands
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("q_id", "shard")
            .orderBy((-col("idot").cast("double") * col("scale")).asc,
              col("nb_id").asc)))
        .filter(col("r") <= element_at(depths, col("shard")))
        .select(col("q_id"), col("nb_id"))
      val qs = queries.select(col(idCol).as("q_id"),
        col(vecCol).as("qv"))
      val withQ = qs.join(broadcast(survivors), Seq("q_id"))
        .select(col("q_id"), col("nb_id"), col("qv"))
      parts += vecs
        .select(col(idCol).as("id"), col(vecCol).as("v"))
        .join(broadcast(withQ), col("id") === col("nb_id"))
        .select(col("q_id"), col("nb_id"),
          dot(col("qv"), col("v")).as("score"))
    }
    parts.reduce(_ unionByName _)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy((-col("score")).asc, col("nb_id").asc)))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("nb_id"), col("rank"), col("score"))
  }

  /** Streaming queries against the SHARDED index — [[streamAdcTopK]]'s
    * serving shape (qa6) on the one-table layout: query vectors
    * arriving as a stream probe every shard inside ONE stream-static
    * join (the qa6 plan shape — since r20 there is no per-shard branch
    * to construct or re-execute per micro-batch); the per-batch rank
    * is EXACT for the same reason qa6's is — the static side emits a
    * candidate row only for a probe row of the current batch, so a
    * query's entire merged candidate set lives in the one micro-batch
    * that carried it. Drains the stream and reads the sink back; the
    * `start` form owns the trigger cadence. Gate: qg4 shares qg1's
    * oracle verbatim (stream == batch == oracle at N shards — the
    * q70s/qa6/qe1 discipline). */
  def streamAdcTopKSharded(stream: DataFrame, idCol: String,
      vecCol: String, k: Int, table: String, sinkDir: String,
      dim: Int = 64, targetRecall: Double = 0.8,
      buckets: Int = ivfIndexBuckets): DataFrame = {
    val q = startStreamAdcTopKSharded(stream, idCol, vecCol, k, table,
      sinkDir, dim, targetRecall, buckets)
    try q.processAllAvailable() finally q.stop()
    stream.sparkSession.read.parquet(sinkDir)
  }

  /** The started-but-undrained form of [[streamAdcTopKSharded]] —
    * schema-initialized overwrite first (reruns replace; an empty
    * stream reads back empty and well-typed), one appended rank per
    * micro-batch. */
  def startStreamAdcTopKSharded(stream: DataFrame, idCol: String,
      vecCol: String, k: Int, table: String, sinkDir: String,
      dim: Int = 64, targetRecall: Double = 0.8,
      buckets: Int = ivfIndexBuckets)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = stream.sparkSession
    val st = svState(spark, table)
    val bc = svQuantBc(spark, st)
    val nprobes = svFracNprobes(bc, targetRecall)
    def candsOf(src: DataFrame): DataFrame =
      svProbeCandidates(src, idCol, vecCol, st, buckets,
        v => graft.functions.NearestCellsSharded.flat(v, bc, nprobes),
        v => graft.functions.NearestCellsSharded.nearestFlat(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
          isFloat = false, bc.value, nprobes))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      stream.schema)
    initEmptySink(rankByScaledIdot(candsOf(empty), k), sinkDir)
    candsOf(stream)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        rankByScaledIdot(batch, k).write.mode("append").parquet(sinkDir)
      }
      .start()
  }

  /** Step 1 of a sharded append — the packed-row write WITHOUT the
    * commit: one assignment pass of the mixed-shard batch against the
    * combined broadcast (each row to ITS shard's FROZEN quantizer at
    * that shard's active epoch), rows landing as new files in the
    * existing gcell buckets. Package-visible for the atomicity spec. */
  private[graft] def svAppendRowsOnly(newVecs: DataFrame, idCol: String,
      vecCol: String, st: SvState, gen: Long): Unit = {
    val spark = newVecs.sparkSession
    VectorOps.ensureRegistered(spark)
    val buckets = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(st.dataT))
      .bucketSpec.map(_.numBuckets).getOrElse(
        throw new IllegalStateException(
          s"${st.dataT} is not a bucketed index"))
    val bc = svQuantBc(spark, st)
    val em = svEpochMap(st)
    svPackedRows(newVecs, idCol, vecCol, bc, st.nShards, gen,
        sh => element_at(em, sh))
      .write.mode("append")
      .option("parquet.bloom.filter.enabled#gcell", "true")
      .bucketBy(buckets, "gcell").sortBy("gcell")
      .saveAsTable(st.dataT)
  }

  /** Step 2 — the commit: ONE single-file append of every shard's
    * generation row (shard, gen, batchKey, that shard's epoch). One
    * file rename = the whole batch commits for EVERY shard or for
    * none — the per-shard layout's between-shard-commits crash window
    * no longer exists. */
  private[graft] def svCommitGen(spark: SparkSession, st: SvState,
      gen: Long, batchKey: Long = -1L): Unit = {
    import spark.implicits._
    (0 until st.nShards).map(s => (s, gen, batchKey, st.epochs(s)))
      .toDF("shard", "gen", "batch_key", "epoch").coalesce(1)
      .write.mode("append").bucketBy(1, "gen").sortBy("gen")
      .saveAsTable(st.dataT + "_g")
  }

  /** Append to the sharded index: ONE routed assignment pass (each
    * row against its own shard's frozen quantizer), one bucketed row
    * append, one atomic commit — qe1's frozen-quantizer contract per
    * shard, at one-table cost. */
  def appendIvfAdcIndexSharded(newVecs: DataFrame, idCol: String,
      vecCol: String, table: String, dim: Int = 64): Unit =
      MergeTables.withTableLock(table) {
    val spark = newVecs.sparkSession
    requireNonNegIds(newVecs, idCol, "appendIvfAdcIndexSharded")
    val st = svState(spark, table, fresh = true)
    val gen = graft.sources.MapFiles.freshGen()
    svAppendRowsOnly(newVecs, idCol, vecCol, st, gen)
    svCommitGen(spark, st, gen)
  }

  /** Delete ids from the sharded index: tombstones carry their own
    * shard and that shard's active epoch (an id's rows live in exactly
    * one shard; a retrain retires the shard's tombstones by epoch).
    * The single append IS the commit, as on the single-table tier. */
  def deleteIvfVecsSharded(spark: SparkSession, table: String,
      ids: DataFrame, idCol: String): Unit =
      MergeTables.withTableLock(table) {
    requireNonNegIds(ids, idCol, "deleteIvfVecsSharded")
    val st = svState(spark, table, fresh = true)
    graft.sources.MapFiles.clearStaleLocation(spark, st.dataT + "_t")
    val em = svEpochMap(st)
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("shard", pmod(col("id"), lit(st.nShards.toLong))
        .cast("int"))
      .withColumn("epoch", element_at(em, col("shard")))
      .select("shard", "id", "epoch")
      .write.mode("append").saveAsTable(st.dataT + "_t")
  }

  /** The foreachBatch body of the SHARDED streaming append: each
    * micro-batch appends under the deterministic key of (`lineage`,
    * `batchId`) unless that key is already committed — and since the
    * commit is ONE file covering every shard, replay detection is
    * whole-batch (the per-shard layout's shard-by-shard replay
    * recovery is no longer needed: there is no state in which some
    * shards committed a batch and others did not). */
  private[graft] def streamAppendAdcBatchSharded(batch: DataFrame,
      batchId: Long, idCol: String, vecCol: String, table: String,
      lineage: Long = 0L): Unit = {
    val spark = batch.sparkSession
    val key = MergeTables.streamKey(lineage, batchId)
    MergeTables.withTableLock(table) {
      val st = svState(spark, table, fresh = true)
      if (!MergeTables.replayed(spark, st.dataT + "_g", key)) {
        val gen = graft.sources.MapFiles.freshGen()
        svAppendRowsOnly(batch, idCol, vecCol, st, gen)
        svCommitGen(spark, st, gen, key)
      }
    }
  }

  /** [[streamAppendIvfAdcIndex]] on the SHARDED tier — the corpus
    * streaming INTO a sharded index. Drains the available stream and
    * stops; the `start` form below owns the trigger cadence. */
  def streamAppendIvfAdcIndexSharded(vecStream: DataFrame,
      idCol: String, vecCol: String, table: String, dim: Int = 64)
      : Unit = {
    val q = startStreamAppendIvfAdcIndexSharded(vecStream, idCol,
      vecCol, table, dim)
    try q.processAllAvailable() finally q.stop()
  }

  /** The started-but-undrained form of
    * [[streamAppendIvfAdcIndexSharded]]. One lineage per started
    * query, allocated from the ONE key table (the per-shard layout
    * needed a cross-table allocation), and a reshard folds the marks
    * into the new generation's mark table ([[reshardIvfAdcIndex]]) so
    * the committed-lineage read survives the layout change. `maxGen`
    * wires the unattended in-loop compaction (qfn's discipline —
    * replay marks carried). The writer lease covers the key table for
    * the life of the query, and since r20 a reshard REFUSES IN CODE
    * while the lease is live (stop the query, reshard, restart; the
    * carried marks make the restart replay-exact). */
  def startStreamAppendIvfAdcIndexSharded(vecStream: DataFrame,
      idCol: String, vecCol: String, table: String, dim: Int = 64,
      maxGen: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = vecStream.sparkSession
    val st = svState(spark, table, fresh = true)
    val lineage = MergeTables.allocLineage(spark, st.dataT + "_g")
    MergeTables.startLeased(spark, Seq(st.dataT + "_g"))(
      vecStream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          streamAppendAdcBatchSharded(batch, batchId, idCol, vecCol,
            table, lineage)
          maxGen.foreach(mg =>
            maybeCompactIvfAdcIndexSharded(spark, table, mg))
        }
        .start())
  }

  /** [[compactIvfAdcIndexSharded]] iff more than `maxGen` generations
    * have committed PER SHARD (the `_g` table holds one row per shard
    * per commit) — the auto-compaction policy on the sharded tier.
    * Returns true iff it compacted. */
  def maybeCompactIvfAdcIndexSharded(spark: SparkSession, table: String,
      maxGen: Int = MergeTables.defaultMaxGen): Boolean =
      MergeTables.withTableLock(table) {
    require(maxGen >= 1, s"maxGen=$maxGen")
    val st = svState(spark, table, fresh = true)
    spark.catalog.refreshTable(st.dataT + "_g")
    if (spark.table(st.dataT + "_g").count() <=
        maxGen.toLong * st.nShards) false
    else { compactIvfAdcIndexSharded(spark, table); true }
  }

  /** Rewrite the sharded index's file generations into ONE, physically
    * removing tombstoned vectors and retired/orphan epochs' rows — the
    * dense-tier compaction on the one-table layout. Every shard's
    * quantizer stays frozen; each shard's rows land back under ITS
    * active epoch (gen 0, which is committed in every reachable
    * state). One whole-layout rewrite replaces the per-shard layout's
    * N table rewrites. Replay marks carried first; crash exposure is
    * the same two-catalog-op DROP/RENAME window, healed on next touch. */
  def compactIvfAdcIndexSharded(spark: SparkSession, table: String)
      : Unit = MergeTables.withTableLock(table) {
    val st = svState(spark, table, fresh = true)
    val dataT = st.dataT
    for (s <- Seq("", "_g", "_t", "_c")
         if spark.catalog.tableExists(dataT + s))
      spark.catalog.refreshTable(dataT + s)
    val buckets = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(dataT))
      .bucketSpec.map(_.numBuckets).getOrElse(
        throw new IllegalStateException(
          s"$dataT is not a bucketed index"))
    // carry every streaming lineage's replay high-water mark BEFORE
    // the generation reset clears the keys — what makes this
    // compaction safe inside a live lineage (the r16 discipline)
    MergeTables.carryHwms(spark, dataT + "_g")
    val em = svEpochMap(st)
    // bucket-preserving read -> the bucketed sink plans exchange-free
    val live = svLiveRows(spark, st, bucketedRead = true)
      .select("gcell", "shard", "cell", "id", "qc", "scale")
      .withColumn("gen", lit(0L))
      .withColumn("epoch", element_at(em, col("shard")))
      .repartition(buckets, col("gcell"))
    val shadow = dataT + "_cmp"
    graft.sources.MapFiles.write(live, "gcell", buckets, shadow)
    spark.sql(s"DROP TABLE `$dataT`")
    MergeTables.renameInto(spark, shadow, dataT)
    import spark.implicits._
    MergeTables.swapInKeyed(spark,
      (0 until st.nShards).map(s => (s, 0L, -1L, st.epochs(s)))
        .toDF("shard", "gen", "batch_key", "epoch"),
      "gen", dataT + "_g")
    spark.sql(s"DROP TABLE IF EXISTS `${dataT}_t`")
    // centroid GC: retired or orphan epochs' centroids leave with the
    // rewrite — swap-written through the healed shadow protocol
    spark.catalog.refreshTable(dataT + "_c")
    val actives = st.epochs.zipWithIndex
      .map { case (e, s) => (s, e) }.toSeq.toDF("shard", "epoch")
    if (spark.table(dataT + "_c").select("shard", "epoch").distinct()
        .count() > st.nShards)
      MergeTables.swapInKeyed(spark,
        spark.table(dataT + "_c")
          .join(broadcast(actives), Seq("shard", "epoch"), "left_semi")
          .localCheckpoint(),
        "cell", dataT + "_c")
    spark.catalog.refreshTable(dataT)
    invalidateSvCaches(table, dataT)
  }

  /** RETRAIN ONE SHARD's quantizer — the per-shard maintenance unit
    * (a drift gate fires per shard; the whole-index loop below is just
    * this over every shard). The single-table retrain protocol
    * verbatim, keyed by shard: the attempt epoch allocates past the
    * shard's centroid max (a crashed attempt's orphans are never
    * adopted), the shard's live vectors re-pack against the new
    * quantizer as (gen 0, attempt) — INERT until the commit — and the
    * commit is one `_g` swap replacing ONLY this shard's generation
    * rows (other shards' rows, keys included, pass through). The
    * shard's tombstones are consumed by the survivor rule and retire
    * by epoch (physically reclaimed at the next compaction). Returns
    * the new quantizer. */
  def retrainIvfAdcShard(vecs: DataFrame, idCol: String,
      vecCol: String, table: String, shard: Int, dim: Int = 64,
      targetRecall: Double = 0.8): Array[Array[Double]] =
      MergeTables.withTableLock(table) {
    val spark = vecs.sparkSession
    VectorOps.ensureRegistered(spark)
    requireNonNegIds(vecs, idCol, "retrainIvfAdcShard")
    val st = svState(spark, table, fresh = true)
    require(shard >= 0 && shard < st.nShards,
      s"shard $shard outside [0, ${st.nShards})")
    val dataT = st.dataT
    spark.catalog.refreshTable(dataT + "_c")
    val cMax = spark.table(dataT + "_c").filter(col("shard") === shard)
      .agg(max("epoch")).head()
    val attempt = 1L + math.max(st.epochs(shard),
      if (cMax.isNullAt(0)) -1L else cMax.getLong(0))
    val sub = vecs.filter(shardOf(idCol, st.nShards) === shard)
    val live =
      if (!spark.catalog.tableExists(dataT + "_t")) sub
      else sub.join(
        broadcast(spark.table(dataT + "_t")
          .filter(col("shard") === shard &&
            col("epoch") === st.epochs(shard))
          .select("id").distinct().withColumnRenamed("id", idCol)),
        Seq(idCol), "left_anti")
    val (nlist, _) = ivfParams(math.max(1L, live.count()), targetRecall)
    val quantizer = trainCoarseQuantizer(
      trainingSample(live, idCol, vecCol, trainingCap(nlist)),
      vecCol, nlist, dim)
    // inert land 1: the attempt's centroids FIRST — they are also the
    // epoch allocation marker a retry must see
    svCentroidRows(spark, Seq(shard -> quantizer), attempt)
      .write.mode("append").bucketBy(1, "cell").sortBy("cell")
      .saveAsTable(dataT + "_c")
    // inert land 2: the shard's live vectors re-packed under (gen 0,
    // attempt) into the existing gcell buckets
    val buckets = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(dataT))
      .bucketSpec.map(_.numBuckets).getOrElse(
        throw new IllegalStateException(
          s"$dataT is not a bucketed index"))
    val bcQ = spark.sparkContext.broadcast(
      graft.functions.NearestCellsBc.quantizerOf(quantizer))
    try {
      val sc = VectorOps.maxAbs(col(vecCol))
      live.select(
          lit(shard).as("shard"),
          element_at(graft.functions.NearestCellsBc(col(vecCol), bcQ,
            1), 1).as("cell"),
          col(idCol).as("id"),
          VectorOps.packQuant(col(vecCol), sc).as("qc"), sc.as("scale"))
        .select(
          (col("shard").cast("long") * lit(4294967296L) +
            col("cell").cast("long")).as("gcell"),
          col("shard"), col("cell"), col("id"), col("qc"),
          col("scale"))
        .withColumn("gen", lit(0L)).withColumn("epoch", lit(attempt))
        .write.mode("append")
        .option("parquet.bloom.filter.enabled#gcell", "true")
        .bucketBy(buckets, "gcell").sortBy("gcell")
        .saveAsTable(dataT)
    } finally bcQ.unpersist(false)
    // committed streamed keys appear on EVERY shard's rows, so this
    // shard's reset alone cannot lose replay detection — but fold the
    // marks anyway (belt and braces, and the nShards=1 case needs it)
    MergeTables.carryHwms(spark, dataT + "_g")
    // THE commit: one swap replacing this shard's generation rows
    import spark.implicits._
    val others = MergeTables.freshView(spark, dataT + "_g")
      .filter(col("shard") =!= shard)
      .select(col("shard").cast("int"), col("gen"), col("batch_key"),
        col("epoch"))
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    MergeTables.swapInKeyed(spark,
      (others :+ ((shard, 0L, -1L, attempt)))
        .toSeq.toDF("shard", "gen", "batch_key", "epoch"),
      "gen", dataT + "_g")
    spark.catalog.refreshTable(dataT)
    invalidateSvCaches(table, dataT)
    quantizer
  }

  /** Retrain every shard's quantizer from its own live rows —
    * occupancy-constant nlist from the shard's live count, each shard
    * under its own epoch-flip commit ([[retrainIvfAdcShard]]). */
  def retrainIvfAdcIndexSharded(vecs: DataFrame, idCol: String,
      vecCol: String, table: String, dim: Int = 64,
      targetRecall: Double = 0.8): Unit =
    (0 until readShardCount(vecs.sparkSession, table)).foreach(s =>
      retrainIvfAdcShard(vecs, idCol, vecCol, table, s, dim,
        targetRecall))

  /** RESHARD — the growth operation: when shards outgrow their
    * quantizers (or more write parallelism is needed), route the LIVE
    * corpus into a fresh `newShards`-shard layout under new per-shard
    * quantizers. Semantically reshard(S→S′) IS a fresh
    * [[writeIvfAdcIndexSharded]](S′) over the SURVIVORS — the caller's
    * corpus minus every shard's live tombstones — down to bit-equal
    * stored rows (spec-gated), the same contract qe3's retrain has to
    * a fresh build. What a fresh build would lose and reshard keeps:
    * (a) ATOMICITY — the new one-table layout lands INERT under the
    * next reshard-generation name (`table_r{g}_sv`, [[svDataTable]])
    * and ONE sidecar swap flips every probe/mutator to it; and (b)
    * REPLAY MARKS — the old generation's committed streaming keys fold
    * (max per lineage, floors kept) into the new generation's mark
    * table, so a checkpoint-resumed lineage re-delivering a committed
    * batch after the reshard is still refused exactly. REFUSES IN CODE
    * under a live streaming writer lease on the old generation's key
    * table (r19 verdict item 4 — a doc comment guarded this seam
    * before): stop the query, reshard, restart. Old-generation tables
    * are dropped post-commit — inert leftovers under a crash either
    * way. Reference analog: growing the partition count of a
    * partitioned MapFile output is a new job writing a new partitioned
    * set and swapping the readers' view
    * (mapred/MapFileOutputFormat.java:39,101-107). */
  def reshardIvfAdcIndex(vecs: DataFrame, idCol: String, vecCol: String,
      table: String, newShards: Int, dim: Int = 64,
      targetRecall: Double = 0.8, buckets: Int = ivfIndexBuckets,
      init: String = "first"): Unit = MergeTables.withTableLock(table) {
    require(newShards >= 1, s"newShards=$newShards")
    val spark = vecs.sparkSession
    val st = svState(spark, table, fresh = true)
    // r19 verdict item 4: the old generation's key table is rewritten
    // away below — refuse while a live streaming lineage holds it
    MergeTables.requireNoWriterLease(spark, st.dataT + "_g",
      "reshardIvfAdcIndex: a live streaming lineage holds this sharded " +
        "index — stop the query, reshard, then restart (the carried " +
        "replay marks make the restart replay-exact)")
    val g2 = st.rsgen + 1L
    // heal residue first: a previous reshard's crashed post-commit GC
    // (or a crashed attempt's half-built next generation) leaves inert
    // tables no reader resolves — swept here, under the lock
    dropStaleShardGens(spark, table, liveGen = st.rsgen)
    // survivors: the live corpus minus every shard's tombstones at
    // that shard's ACTIVE epoch (an id lives in exactly one shard, so
    // the union is the global delete set)
    import spark.implicits._
    val survivors =
      if (!spark.catalog.tableExists(st.dataT + "_t")) vecs
      else {
        val actives = st.epochs.zipWithIndex
          .map { case (e, s) => (s, e) }.toSeq.toDF("shard", "epoch")
        vecs.join(
          broadcast(spark.table(st.dataT + "_t")
            .join(broadcast(actives), Seq("shard", "epoch"),
              "left_semi")
            .select("id").distinct().withColumnRenamed("id", idCol)),
          Seq(idCol), "left_anti")
      }
    // inert land 1: the fresh one-table layout at the NEXT generation's
    // names — invisible to every reader until the sidecar flips
    val counts = shardCountsChecked(survivors, idCol, newShards,
      "reshardIvfAdcIndex")
    val dataT2 = svDataTable(table, g2)
    svBuildLayout(survivors, idCol, vecCol, dataT2, newShards, counts,
      dim, targetRecall, buckets, init)
    // inert land 2: carry the replay marks — the old generation's live
    // stream keys and prior marks, folded to max-per-lineage (floor
    // rows ride along as MaxValue maxes), into the new generation's
    // mark table
    val base = streamBatchKeyBase
    val kt = st.dataT + "_g"
    val liveKeys = MergeTables.freshView(spark, kt)
      .filter(col("batch_key") >= base)
      .select(expr(s"shiftright(batch_key - ${base}L, 28)")
          .as("lineage"),
        expr(s"(batch_key - ${base}L) & ${(1L << 28) - 1}L").as("hwm"))
    val ht = MergeTables.hwmTable(kt)
    MergeTables.recoverCompactCrash(spark, ht)
    val withPrior =
      if (!spark.catalog.tableExists(ht)) liveKeys
      else {
        spark.catalog.refreshTable(ht)
        liveKeys.unionByName(spark.table(ht).select("lineage", "hwm"))
      }
    val folded = withPrior
      .groupBy("lineage").agg(max("hwm").as("hwm"))
      .localCheckpoint()
    try {
      if (!folded.isEmpty)
        MergeTables.swapInKeyed(spark, folded, "lineage",
          MergeTables.hwmTable(dataT2 + "_g"))
      // THE commit: one sidecar swap to (newShards, g2)
      MergeTables.swapInKeyed(spark,
        Seq((newShards, g2)).toDF("nshards", "rsgen"),
        "nshards", table + "_sh")
    } finally dropCheckpoint(folded)
    invalidateSvCaches(table, st.dataT)
    // post-commit GC, inert either way
    for (sfx <- Seq("", "_c", "_g", "_g_hwm", "_t"))
      spark.sql(s"DROP TABLE IF EXISTS `${st.dataT}$sfx`")
  }

  /** Recall audit of a PERSISTED ADC index (qc3's drift gate): the
    * stored-index probe ([[ivfAdcTopKIndexed]], frozen centroids and
    * all) against the exact brute-force MIPS top-k over the same
    * corpus — SAME objective on both legs (the ADC tier ranks by dot,
    * so a cosine exact leg would fold objective mismatch into the
    * number; here recall isolates quantization + cell approximation +
    * centroid drift, the quantities an append degrades). Returns
    * (q_id, hits, recall) like [[recallAudit]]; overlay shape
    * identical — the approximate list broadcasts at sample × k rows. */
  def recallAuditIndexed(vecs: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int, table: String,
      dim: Int = 64): DataFrame =
    recallVsExact(exactMipsTopK(vecs, queries, idCol, vecCol, k),
      queries, idCol, vecCol, k, nprobe, table, dim)

  /** The audit's exact leg — brute-force MIPS top-k of `queries`
    * against the corpus, (q_id, nb_id) rows. One sampled-panel-sized
    * corpus pass; split out so [[tuneNprobe]] pays it ONCE across its
    * whole search instead of once per probed candidate. */
  private def exactMipsTopK(vecs: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val corpus = vecs.select(col(idCol).as("id"),
      col(vecCol).as("v"))
    val qs = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    broadcast(qs).crossJoin(corpus)
      .filter(col("q_id") =!= col("id"))
      .withColumn("d", dot(col("qv"), col("v")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("d").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id").as("nb_id"))
  }

  /** Per-query recall of the indexed probe at `nprobe` against a
    * precomputed exact leg — the body [[recallAuditIndexed]] and
    * [[tuneNprobe]] share. */
  private def recallVsExact(exact: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int, table: String,
      dim: Int): DataFrame =
    recallOfApprox(exact,
      ivfAdcTopKIndexed(queries, idCol, vecCol, k, nprobe, table, dim), k)

  /** Per-query recall of ANY approximate (q_id, nb_id) result against
    * a precomputed exact leg — shared by the flat and two-level
    * audits/tuners. */
  private def recallOfApprox(exact: DataFrame, approx: DataFrame,
      k: Int): DataFrame = {
    val hits = approx
      .select(col("q_id"), col("nb_id"), lit(1L).as("hit"))
    exact.join(broadcast(hits), Seq("q_id", "nb_id"), "left_outer")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("q_id"), col("hits"),
        (col("hits") / lit(k.toDouble)).as("recall"))
  }

  /** The ADC-EXHAUSTIVE top-k — every live stored row scored for every
    * query, no cell restriction: what probing all `nlist` cells would
    * return, i.e. the QUANTIZER'S CEILING. [[tuneNprobe]] takes it as
    * the `reference` to dial PROBING loss in isolation: the two loss
    * sources of an IVF-ADC index are separately dialed — cell
    * selection by nprobe/gprobe, quantization by re-rank depth or a
    * retrain ([[ivfAdcRerank]], [[maybeRetrainIvfAdcIndex]]) — and on
    * corpora whose neighbor margins sit at the int8 noise floor,
    * end-to-end recall is quantization-bounded no matter the probe
    * dial, so tuning against float-exact MIPS would escalate the probe
    * for loss it cannot fix. Same ordering as [[ivfAdcTopKIndexed]]
    * (scaled idot descending, ties to the lower id; spec-gated equal
    * at `nprobe = nlist`), but ranked through a WINDOW — sort-based,
    * spilling — because the candidate volume is |panel| × corpus, the
    * one shape the grouped-collect ranker must never see ([[rankTopK]]
    * holds per-group arrays in memory: a 200-query panel over a 200k
    * archive is 40M rows — fine through a sort, an OOM through a
    * collect). Monitoring-cadence cost, like the audits. */
  def adcFullTopK(queries: DataFrame, idCol: String, vecCol: String,
      k: Int, table: String): DataFrame = {
    val spark = queries.sparkSession
    VectorOps.ensureRegistered(spark)
    val epoch = activeAdcEpoch(spark, table)
    val probes = queries.select(col(idCol).as("q_id"),
      VectorOps.packQuant(col(vecCol), VectorOps.maxAbs(col(vecCol)))
        .as("q_qc"))
      // a null vector packs to a null code and would rank FIRST under
      // the ascending window (nulls-first) — the flat probe drops such
      // queries entirely (null cells explode to nothing), and this
      // reference must match it
      .filter(col("q_qc").isNotNull)
    probes.crossJoin(
        liveAdcRows(spark, table, epoch = Some(epoch))
          .select(col("id"), col("qc"), col("scale")))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id").as("nb_id"),
        (-VectorOps.i8Dot(col("q_qc"), col("qc")).cast("double") *
          col("scale")).as("nk"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("nk"), col("nb_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("nb_id"))
  }

  /** Recall-gated ABSOLUTE nprobe — the scale dial the second-decade
    * growth measurement prescribes (BASELINE.md r17): [[ivfParams]]'
    * fraction law probes `frac × nlist` cells because on CLUSTERLESS
    * vectors recall tracks the probed fraction of the corpus — per-query
    * candidates are then linear in corpus size (the measured 0.44
    * exponent on the hash-random growth corpus, documented as the IVF
    * recall contract, not a plan defect). On REAL clustered embeddings
    * — low intrinsic dimension, neighbors inside the query's own
    * cluster neighborhood — a FIXED nprobe already covers the top-k
    * ball at every corpus size (occupancy-constant nlist shrinks cells
    * at the same rate nearest-neighbor distances shrink), so the right
    * production dial is an absolute nprobe tuned against a measured
    * recall gate, probed work per query = nprobe × occupancy =
    * CONSTANT. This derives that dial: the smallest nprobe (up to
    * quantization-tie non-monotonicity) whose measured mean recall@k
    * on the caller's query sample meets `targetRecall`, by doubling
    * then binary search — ~2·log2(nlist) audits, each one
    * sampled-panel-sized, with the exact brute-force leg paid ONCE for
    * the whole search. The same monitoring-cadence machinery as the
    * retrain gate ([[maybeRetrainIvfAdcIndex]]): run it when the drift
    * audit runs, never per probe.
    *
    * Returns (nprobe, measured mean recall at it). If the recall stops
    * IMPROVING while still under the target — a doubling that buys
    * less than `minGain` — the search stops and returns the measured
    * ceiling: the residual shortfall is quantization/assignment
    * ranking error, which MORE PROBING CANNOT FIX (re-rank or retrain
    * territory: [[ivfAdcRerank]], [[retrainIvfAdcIndex]]), and
    * escalating toward an exhaustive probe would turn the audit
    * corpus-sized for nothing (observed: a 100× tune OOMing the
    * driver's rank on 400M candidate rows it could never need). The
    * caller's contract is therefore: recall below target in the
    * result = probing is not the bottleneck. */
  def tuneNprobe(vecs: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, table: String, targetRecall: Double,
      dim: Int = 64, minGain: Double = 0.005,
      reference: DataFrame = null): (Int, Double) = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall=$targetRecall")
    val spark = vecs.sparkSession
    val nlist = readIvfCentroids(spark, table).length
    require(nlist > 0, s"$table has no stored centroids")
    // one exact pass for the whole search; sample × k rows, pinned so
    // every audit reuses it instead of re-scanning the corpus. The
    // default reference is the float-exact MIPS top-k (end-to-end
    // recall); pass [[adcFullTopK]]'s result instead to tune PROBING
    // loss against the quantizer's own ceiling — the right reference
    // when neighbor margins sit at the int8 noise floor, where
    // end-to-end recall is quantization-bounded no matter the dial.
    // quantizer state captured BEFORE the reference materializes: the
    // localCheckpoint can take minutes at monitoring panel sizes, and
    // a flip inside it must fail the stability check, not slip past
    // it (a CALLER-built reference should be constructed immediately
    // before this call for the same reason)
    val state0 = quantStateKey(spark, table,
      activeAdcEpoch(spark, table), fresh = true)
    val exact = (if (reference != null) reference
      else exactMipsTopK(vecs, queries, idCol, vecCol, k))
      .localCheckpoint()
    try {
      val res = tuneDial(nlist, targetRecall, minGain)(np =>
        recallVsExact(exact, queries, idCol, vecCol, k, np, table, dim)
          .agg(avg("recall")).head().getDouble(0))
      requireQuantStable(spark, table, state0)
      res
    } finally dropCheckpoint(exact)
  }

  /** [[tuneNprobe]] for the TWO-LEVEL probe's group-coverage dial:
    * the smallest `gprobe` whose [[ivfAdcTopKIndexedHier]] at the
    * caller's (already tuned) `nprobe` meets `targetRecall` on the
    * query sample. The natural `reference` is the FLAT probe's result
    * at the same nprobe — then the measured quantity is exactly the
    * loss the sqrt-scan level introduces, zero by construction at
    * `gprobe` = group count; null falls back to float-exact MIPS like
    * [[tuneNprobe]]. Same doubling + binary search + plateau cutoff. */
  def tuneGprobe(vecs: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int, table: String,
      targetRecall: Double, dim: Int = 64, minGain: Double = 0.005,
      reference: DataFrame = null): (Int, Double) = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall=$targetRecall")
    val spark = vecs.sparkSession
    val nlist = readIvfCentroids(spark, table).length
    require(nlist > 0, s"$table has no stored centroids")
    val groups = math.max(1, math.ceil(math.sqrt(nlist.toDouble)).toInt)
    val state0 = quantStateKey(spark, table, // before the checkpoint
      activeAdcEpoch(spark, table), fresh = true)
    val exact = (if (reference != null) reference
      else exactMipsTopK(vecs, queries, idCol, vecCol, k))
      .localCheckpoint()
    try {
      val res = tuneDial(groups, targetRecall, minGain)(gp =>
        recallOfApprox(exact,
            ivfAdcTopKIndexedHier(queries, idCol, vecCol, k, nprobe, gp,
              table, dim), k)
          .agg(avg("recall")).head().getDouble(0))
      requireQuantStable(spark, table, state0)
      res
    } finally dropCheckpoint(exact)
  }

  /** Fail LOUDLY if a retrain flipped the index's epoch during a
    * multi-audit tune: each audit's probe resolves the epoch per plan
    * (the probe path's own discipline), so a mid-tune flip would mix
    * recalls measured against different quantizers and the returned
    * dial would describe no actual index state. The lock cannot be
    * held for a minutes-long tune (it would block every append), so
    * the tuners verify instead: stale result → loud error → rerun.
    * The comparison is the full [[quantStateKey]] (centroid file
    * snapshot), not the epoch number alone (ADVICE r17): a concurrent
    * same-name rebuild by ANOTHER process restarts epochs at 0, so a
    * mid-tune external rebuild can present a MATCHING epoch number
    * over a different quantizer — the file snapshot cannot. */
  /** The current quantizer state key, cache-bypassing — what the
    * tuners capture at start and verify at end. Carries the
    * application id (it shares [[quantStateKey]] with the broadcast
    * memos) — fine within one tune, wrong for PERSISTED keys
    * ([[persistedQuantState]]). */
  private[graft] def quantStateNow(spark: SparkSession, table: String)
      : String =
    quantStateKey(spark, table, activeAdcEpoch(spark, table),
      fresh = true)

  /** The quantizer state key WITHOUT the application id — what the
    * PERSISTED serving decision is keyed by (r20; the sharded tier's
    * [[svStateKey]] discipline): a stored decision must survive a
    * driver restart — that is the point of persisting it — while still
    * refusing stale after any retrain/rebuild/GC (epoch + the centroid
    * table's file snapshot both change). The pre-r20 key carried the
    * app id, so every new process silently re-refused a perfectly
    * fresh stored decision. */
  private def persistedQuantState(spark: SparkSession, table: String)
      : String = {
    val epoch = activeAdcEpoch(spark, table)
    epoch + ":" +
      MergeTables.freshInputFiles(spark, table + "_c").mkString(",")
  }

  private[graft] def requireQuantStable(spark: SparkSession, table: String,
      state0: String): Unit = {
    val now = quantStateKey(spark, table, activeAdcEpoch(spark, table),
      fresh = true)
    require(now == state0,
      s"$table was retrained or rebuilt mid-tune (quantizer state " +
        s"changed: $state0 -> $now): the measured recalls mix " +
        "quantizers — rerun the tune against the new index state")
  }

  /** Free a `localCheckpoint()`'d frame's cached blocks once its
    * consumer is done (r18 verdict audit note): the tuners' audit legs
    * are monitoring-cadence temporaries, and a long-lived serving
    * driver should not keep panel × k rows pinned in the block manager
    * until session GC. A localCheckpoint returns a LogicalRDD over the
    * cached internal RDD — unpersisting that RDD is the release; no-op
    * on any other plan shape. */
  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Doubling + binary search for the smallest dial value in [1, max]
    * whose measured recall meets `target`, with the plateau cutoff —
    * the shared machinery of [[tuneNprobe]] and [[tuneGprobe]]. */
  private def tuneDial(max: Int, target: Double, minGain: Double)(
      recallAt: Int => Double): (Int, Double) = {
    var lo = 1
    var hi = 1
    var rHi = recallAt(1)
    if (rHi >= target) return (1, rHi)
    // the plateau cutoff waits for TWO consecutive dry doublings: a
    // single sub-minGain (or negative — recall is non-monotone up to
    // quantization ties) step can precede large gains, e.g. when the
    // first extra cells land in the same wrong cluster; one more
    // doubling distinguishes a flat spot from the ceiling at the cost
    // of at most 4x-past-the-knee audit candidates
    var dry = 0
    while (rHi < target && hi < max) {
      val prev = rHi
      lo = hi
      hi = math.min(max, hi * 2)
      rHi = recallAt(hi)
      dry = if (rHi - prev < minGain) dry + 1 else 0
      if (rHi < target && dry >= 2)
        return (hi, rHi) // ceiling reached — this dial is not the bottleneck
    }
    if (rHi < target) return (max, rHi) // bounded by the other dials
    // recall(lo) < target <= recall(hi)
    while (hi - lo > 1) {
      val mid = lo + (hi - lo) / 2
      val r = recallAt(mid)
      if (r >= target) { hi = mid; rHi = r } else lo = mid
    }
    (hi, rHi)
  }

  /** The RETRAIN POLICY — the qc3 drift gate wired to its consumer
    * (qe3's retrain), the dense tier's analog of the compaction
    * policy ([[MergeTables.maybeCompact]]): audit the stored index's
    * recall@k on the caller's query sample and retrain the quantizer
    * from the live corpus iff the MEAN recall fell below `minRecall`.
    * The audit's exact leg prices this as a MONITORING-cadence
    * operation (one brute-force pass over the corpus for the sample),
    * never per probe — exactly the deployment the r14 drift-curve
    * measurement prescribed ("the gate watches real traffic"). Returns
    * (measured mean recall, whether a retrain ran); on retrain the
    * index is bit-equal to a fresh build over the live corpus (the
    * gated qe3 claim). */
  def maybeRetrainIvfAdcIndex(vecs: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, table: String, k: Int,
      nprobe: Int, nlist: Int, minRecall: Double, dim: Int = 64)
      : (Double, Boolean) = {
    require(minRecall >= 0.0 && minRecall <= 1.0, s"minRecall=$minRecall")
    val mean = recallAuditIndexed(vecs, queries, idCol, vecCol, k,
        nprobe, table, dim)
      .agg(avg("recall")).head().getDouble(0)
    if (mean >= minRecall) (mean, false)
    else {
      retrainIvfAdcIndex(vecs, idCol, vecCol, table, nlist, dim)
      (mean, true)
    }
  }

  /** [[ivfAdcTopK]] probing the PERSISTED index instead of retraining
    * the quantizer and re-packing every code per run — the production
    * ADC retrieval shape (the r8 verdict's #1): centroids read back from
    * `table_c` (nlist rows), the query side packs its codes map-side and
    * repartitions on `cell` to the index's OWN bucket count — one
    * query-sized exchange that is simultaneously (a) the documented
    * materialization barrier keeping pack_quant out of the candidate
    * stage (Similarity.ivfAdcTopK's 39.6 s collapse signature) and
    * (b) co-partitioning with the bucketed layout, so the stored side
    * joins with NO shuffle at any broadcast setting (plan-asserted).
    * Identical output contract and ranking to [[ivfAdcTopK]] — q99
    * shares q89's oracle, proving the stored index loses nothing. */
  def ivfAdcTopKIndexed(queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, table: String, dim: Int = 64,
      buckets: Int = ivfIndexBuckets): DataFrame =
    rankByScaledIdot(
      adcProbeCandidates(queries, idCol, vecCol, nprobe, table, buckets), k)

  /** Streaming ADC retrieval (qa6) — [[ivfAdcTopKIndexed]] with the
    * query vectors ARRIVING AS A STREAM: the online serving shape of the
    * persisted index (an ingest feed, a query service, a backfill
    * replay). Candidate generation runs INSIDE the streaming query —
    * the probe projection (pack codes + nearest cells) is a stateless
    * map-side transform of each micro-batch, and the stream-static join
    * consumes the stored table's bucketed layout with no archive-side
    * shuffle per micro-batch (spec-asserted on the micro-batch plan).
    * The top-k rank runs per micro-batch via foreachBatch — and that is
    * EXACT, not an approximation: the static side emits a candidate row
    * only for a probe row of the current batch, so a query's entire
    * candidate set lives in the one micro-batch that carried the query,
    * and per-batch ranking IS global ranking (spec-gated: a two-batch
    * stream equals the one-shot [[ivfAdcTopKIndexed]] on the union).
    * Batch and stream share [[adcProbeCandidates]] + the ADC ranking
    * verbatim, and qa6 shares q99's DuckDB oracle — stream == batch ==
    * oracle, the §2.8 gate shape q70s established.
    *
    * Results append to `sinkDir` (schema-initialized overwrite first, so
    * an empty stream still returns an empty, well-typed frame); the
    * returned DataFrame reads the sink back. At scale the sink is any
    * append target — the per-batch work is probe-sized, the archive
    * never recomputes. */
  def streamAdcTopK(stream: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, table: String, sinkDir: String, dim: Int = 64,
      buckets: Int = ivfIndexBuckets): DataFrame = {
    val q = startStreamAdcTopK(stream, idCol, vecCol, k, nprobe, table,
      sinkDir, dim, buckets)
    try q.processAllAvailable() finally q.stop()
    stream.sparkSession.read.parquet(sinkDir)
  }

  /** Initialize a streaming sink with a ZERO-ROW parquet of `probe`'s
    * schema WITHOUT executing its plan (r21): the previous inits ran
    * the full probe plan over empty input, but the init only exists to
    * make reruns replace and an empty stream read back well-typed —
    * analysis (`.schema`) delivers that; executing paid optimizer +
    * codegen + a real scan/broadcast job + commit per run (~0.3 s on
    * the qb4 shape). The written footer schema is the analyzed
    * schema, identical to what executing the empty plan wrote. */
  private[pipeline] def initEmptySink(probe: DataFrame,
      sinkDir: String): Unit = {
    val spark = probe.sparkSession
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        probe.schema)
      .write.mode("overwrite").parquet(sinkDir)
  }

  /** The started-but-undrained form of [[streamAdcTopK]] — the caller
    * owns the trigger cadence (StreamingSpec drives TWO micro-batches
    * through it to gate the per-batch-rank-is-exact claim). Overwrites
    * `sinkDir` with a zero-row schema-typed init first, so reruns
    * replace rather than accumulate and an empty stream still reads
    * back as an empty, well-typed frame. */
  def startStreamAdcTopK(stream: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, table: String, sinkDir: String, dim: Int = 64,
      buckets: Int = ivfIndexBuckets)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = stream.sparkSession
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stream.schema)
    initEmptySink(rankByScaledIdot(
      adcProbeCandidates(empty, idCol, vecCol, nprobe, table, buckets), k),
      sinkDir)
    adcProbeCandidates(stream, idCol, vecCol, nprobe, table, buckets)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        rankByScaledIdot(batch, k).write.mode("append").parquet(sinkDir)
      }
      .start()
  }

  /** The candidate stage of [[ivfAdcTopKIndexed]] — probe rows joined
    * against the stored bucketed table, pre-rank. Package-visible so
    * PlanQualitySpec can assert the stored side scans `Bucketed: true`
    * with exactly one (probe-side) exchange. */
  /** Process-level broadcast memos: ONE shipped quantizer (and, for
    * the two-level path, one grouping) per (table, epoch). The probe
    * expressions carry only the broadcast HANDLE, so a serving batch's
    * plan is nlist-INDEPENDENT — the literal form serialized the
    * centroid arrays into every stage's task binary of every probe
    * plan (measured ~0.4 µs/cell/plan; ~0.5 GB per plan at a 10^6-cell
    * shard). A retrain's epoch flip swaps the entry and unpersists the
    * old broadcast (non-blocking — in-flight plans holding the old
    * handle just re-fetch). */
  private val quantBcMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.broadcast.Broadcast[
      graft.functions.NearestCellsBc.Quantizer])]()
  private val hierBcMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.broadcast.Broadcast[
      graft.functions.NearestCellsHier.Grouping])]()

  private def memoBc[T: scala.reflect.ClassTag](
      memo: java.util.concurrent.ConcurrentHashMap[
        String, (String, org.apache.spark.broadcast.Broadcast[T])],
      spark: SparkSession, table: String, key: String)(make: => T)
      : org.apache.spark.broadcast.Broadcast[T] =
    memo.compute(table, (_, prev) =>
      if (prev != null && prev._1 == key) prev
      else {
        if (prev != null) prev._2.unpersist(false)
        (key, spark.sparkContext.broadcast(make))
      })._2

  private[graft] def adcProbeCandidates(queries: DataFrame, idCol: String,
      vecCol: String, nprobe: Int, table: String,
      buckets: Int = ivfIndexBuckets,
      skipPushdown: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    adcProbeCandidatesVia(queries, idCol, vecCol, table, buckets,
      skipPushdown) {
      epoch =>
        val bc = adcQuantBc(spark, table, epoch)
        (vec => graft.functions.NearestCellsBc(vec, bc, nprobe),
          v => {
            val q = bc.value
            graft.functions.NearestCells.nearest(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
              isFloat = false, q.flat, q.norms2, q.dim, nprobe)
          })
    }
  }

  /** The memoized per-(table, state) quantizer broadcast — shared by
    * the probe paths AND the append's assignment, so every
    * batch-cadence operation on the index is nlist-independent after
    * the first touch of an epoch. */
  private[graft] def adcQuantBc(spark: SparkSession, table: String,
      epoch: Long): org.apache.spark.broadcast.Broadcast[
        graft.functions.NearestCellsBc.Quantizer] =
    memoBc(quantBcMemo, spark, table, quantStateKey(spark, table, epoch))(
      graft.functions.NearestCellsBc.quantizerOf(
        readIvfCentroidsFresh(spark, table, epoch)))

  /** [[adcQuantBc]] for the two-level grouping (its construction runs
    * Lloyd over the centroids — paid only on the hier path's memo
    * miss). */
  private def adcHierBc(spark: SparkSession, table: String,
      epoch: Long): org.apache.spark.broadcast.Broadcast[
        graft.functions.NearestCellsHier.Grouping] =
    memoBc(hierBcMemo, spark, table, quantStateKey(spark, table, epoch))(
      graft.functions.NearestCellsHier.group(
        readIvfCentroidsFresh(spark, table, epoch)))

  /** TTL cache over [[quantStateKey]]'s catalog listing, keyed by
    * (application, table, epoch) → (listed-at nanos, key) — the
    * serving metadata floor (r17 verdict item 5). The age test runs
    * against the CURRENT conf TTL at read time, so lowering (or
    * clearing) the TTL takes effect on the very next plan instead of
    * whenever old entries happen to expire. Bounded: one live entry
    * per probed table — caching a key for one epoch EVICTS the same
    * table's entries at other epochs (a superseded epoch's listing
    * can never be asked for again by an in-process probe, and leaving
    * it would grow the map one entry per retrain forever).
    *
    * Staleness contract under the TTL (ADVICE r18): an IN-PROCESS
    * retrain flips the epoch its mutators read fresh, so its first
    * post-flip probe misses this cache and re-keys. A FOREIGN
    * process's retrain inside a TTL window is different — the cached
    * epoch keeps filtering the (already swapped) stored table, whose
    * rows now all carry the NEW epoch, so the probe returns EMPTY
    * results (not stale ones) until the TTL expires or the serving
    * loop calls [[invalidateQuantKeyCache]]. Empty-not-stale is the
    * safer failure (no silently wrong neighbors), and the window is
    * the TTL the operator chose; loops that coordinate retrains out
    * of band must invalidate explicitly. */
  private val quantKeyCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, String)]()

  /** Evict `cache` entries for `table` other than the live key `keep`
    * — the one-live-entry-per-table bound of [[quantKeyCache]] (its
    * only call site; [[epochCache]] needs no eviction — its keys carry
    * an EMPTY epoch suffix, so it is naturally one-entry-per-table —
    * and wiring it here would be a behavior-free no-op, ADVICE r19).
    * Key format is `appId:table:epochSuffix`. */
  private def evictOtherEpochs[V](
      cache: java.util.concurrent.ConcurrentHashMap[String, V],
      appId: String, table: String, keep: String): Unit = {
    val prefix = appId + ":" + table + ":"
    val it = cache.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k != keep && k.startsWith(prefix)) it.remove()
    }
  }

  /** Drop any cached [[quantStateKey]] listings for `table` — the
    * explicit invalidation hook for a serving loop that learns of a
    * FOREIGN rebuild out of band (its own mutators key by epoch and a
    * retrain flips it, so they need no hook). The next probe re-lists
    * the centroid files and re-keys the quantizer broadcast. */
  def invalidateQuantKeyCache(table: String): Unit = {
    val it = quantKeyCache.keySet().iterator()
    while (it.hasNext) if (it.next().contains(":" + table + ":")) it.remove()
    val it2 = epochCache.keySet().iterator()
    while (it2.hasNext) if (it2.next().contains(":" + table + ":"))
      it2.remove()
  }

  /** The broadcast-memo key: epoch PLUS the centroid table's file
    * snapshot. Epoch alone is not unique across same-name REBUILDS —
    * in-process ones invalidate the memo explicitly, but ANOTHER
    * process's rebuild (the per-process-catalog topology) restarts
    * epochs at 0 and would silently serve the old quantizer; any
    * rewrite of the centroids changes their part files. Metadata-only
    * and corpus-independent (the centroid table is nlist-row) — but
    * still a catalog refresh + file listing PER PLAN, which at high
    * serving QPS becomes the per-plan floor (r17 verdict). Setting
    * `graft.adc.quantKeyTtlMs` > 0 serves the listing from a bounded
    * cache for that long: a warm serving loop pays metadata once per
    * TTL instead of once per plan, at the documented cost that a
    * foreign same-epoch rebuild is detected at the NEXT expiry (or an
    * explicit [[invalidateQuantKeyCache]]) instead of the next plan.
    * Default 0 = list per plan, the exact pre-cache semantics — the
    * oracle-gated rows keep it. `fresh = true` bypasses the cache
    * (tune-time stability checks must see the actual state). */
  private def quantStateKey(spark: SparkSession, table: String,
      epoch: Long, fresh: Boolean = false): String = {
    val ttlMs =
      if (fresh) 0L
      else spark.conf.getOption("graft.adc.quantKeyTtlMs")
        .map(_.toLong).getOrElse(0L)
    val ck = spark.sparkContext.applicationId + ":" + table + ":" + epoch
    if (ttlMs > 0L) {
      val hit = quantKeyCache.get(ck)
      if (hit != null &&
          System.nanoTime() - hit._1 < ttlMs * 1000000L) return hit._2
    }
    // the application id scopes the key to THIS SparkContext: a
    // broadcast memoized under a stopped context is a dead handle, and
    // a same-JVM session restart with unchanged table state would
    // otherwise serve it to the first append/probe after recovery
    val key = spark.sparkContext.applicationId + ":" + epoch + ":" +
      MergeTables.freshInputFiles(spark, table + "_c").mkString(",")
    if (ttlMs > 0L) {
      quantKeyCache.put(ck, (System.nanoTime(), key))
      evictOtherEpochs(quantKeyCache,
        spark.sparkContext.applicationId, table, ck)
    } else quantKeyCache.remove(ck)
    key
  }

  /** [[readIvfCentroidsAt]] minus the heal + refresh — for the memo
    * miss path, where [[quantStateKey]] just did both. */
  private def readIvfCentroidsFresh(spark: SparkSession, table: String,
      epoch: Long): Array[Array[Double]] =
    spark.table(table + "_c").filter(col("epoch") === epoch)
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)

  /** [[adcProbeCandidates]] with the cell selection pluggable — the
    * shared body of the flat and two-level probe paths, so the join
    * shape (epoch threading, bucket co-partitioning, vector-free
    * candidate rows) cannot diverge between them. `probeFns` receives
    * the resolved epoch and returns the pair (plan-side cell column
    * factory, driver-side twin kernel for the pushdown's cell set) —
    * both backed by the same memoized quantizer broadcast. */
  private def adcProbeCandidatesVia(queries: DataFrame, idCol: String,
      vecCol: String, table: String, buckets: Int,
      skipPushdown: Boolean = false)(
      probeFns: Long => (Column => Column, Array[Double] => Array[Int]))
      : DataFrame = {
    val spark = queries.sparkSession
    VectorOps.ensureRegistered(spark)
    // one epoch resolution per probe plan, threaded to centroids and
    // rows so the two can never straddle a retrain's flip. probeFns
    // resolves the memoized quantizer broadcast for it ONCE
    // ([[adcQuantBc]] — a warm serving batch's plan never reads the
    // centroid ROWS, only the key's metadata listing) and returns the
    // plan-side cell column plus the driver-side twin kernel. Under
    // the serving TTL conf the resolution itself is cached
    // ([[probeEpoch]]).
    val epoch = probeEpoch(spark, table)
    val (cellsOf, localSel) = probeFns(epoch)
    // CELL PUSHDOWN (the lexical tier's term-In discipline applied to
    // the dense tier): the join alone never prunes the stored PARQUET —
    // every probe batch was paying a corpus-sized scan of the codes
    // (measured: the tuned-dial growth exponent stayed ~0.47 with
    // CONSTANT candidates, all of it the stored side emerging from the
    // floor). A BOUNDED snapshot of the query side (limit-probed, so a
    // backfill-sized panel costs one truncated scan, never a driver
    // OOM) becomes BOTH the probe source and the input to the
    // driver-side cell derivation — one materialization, so a
    // nondeterministic query source (a sample(), a growing table)
    // cannot diverge between the In set and the joined probes. Cells
    // are derived with the SAME kernel the plan runs (bit-identical:
    // float→double widening is exact; null elements read as 0.0 like
    // the unsafe-row getters) — deliberately NOT a second Spark job,
    // which would re-pay the quantizer's plan-side costs. The In
    // filter reaches the scan, where the bucketed layout's cell bloom
    // filter + sorted min/max skip non-probed row groups — probe I/O
    // becomes candidate-sized, not corpus-sized. Batch plans only (a
    // streaming probe side cannot be collected), and skipped when the
    // query side outgrows the snapshot cap or the set stops being
    // selective (the fraction-law regime probes most cells — an In
    // list that size prunes nothing). Result-identical by
    // construction: a stored row whose cell no probe emits can never
    // join.
    // the snapshot collect runs a Spark job at DataFrame-CONSTRUCTION
    // time (ADVICE r17) — bounded (≤ maxPushdownQueries+1 rows), but a
    // plan-construction-only caller (a plan spec, a lazily composed
    // pipeline that may never execute) can opt out via
    // graft.adc.pushdown=false and keep the join-only shape,
    // distributed end to end with zero eager work. `skipPushdown` is
    // the SHARDED fan-out's signal (ADVICE r18): when its shared
    // snapshot already found the panel oversize (or the conf opted
    // out), each shard's probe must not re-run its own
    // limit(cap+1).collect() — that re-pays per shard the Spark-job
    // floor the shared snapshot exists to remove.
    val snapped: Option[Array[org.apache.spark.sql.Row]] =
      if (queries.isStreaming || skipPushdown ||
          spark.conf.getOption("graft.adc.pushdown").contains("false"))
        None
      else {
        val rows = queries.select(col(idCol), col(vecCol))
          .limit(maxPushdownQueries + 1).collect()
        if (rows.length > maxPushdownQueries) None else Some(rows)
      }
    val probeSrc = snapped match {
      case Some(rows) => spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        queries.select(col(idCol), col(vecCol)).schema)
      case None => queries
    }
    val probes = probeSrc.select(col(idCol).as("q_id"),
        VectorOps.packQuant(col(vecCol), VectorOps.maxAbs(col(vecCol)))
          .as("q_qc"),
        explode(cellsOf(col(vecCol))).as("cell"))
      .repartition(buckets, col("cell"))
    val stored = liveAdcRows(spark, table, epoch = Some(epoch))
    val prunable = snapped match {
      case None => stored
      case Some(rows) =>
        val vecIdx = 1 // (idCol, vecCol) projection above
        val cellSet = rows.iterator
          .filterNot(_.isNullAt(vecIdx))
          .flatMap(r => localSel(r.getSeq[Number](vecIdx)
            .map(x => if (x == null) 0.0 else x.doubleValue()).toArray))
          .toSet
        if (cellSet.size > 4096) stored
        else stored.filter(
          col("cell").isin(cellSet.toSeq.sorted.map(Int.box): _*))
    }
    probes.join(prunable, Seq("cell"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id").as("nb_id"),
        VectorOps.i8Dot(col("q_qc"), col("qc")).as("idot"),
        col("scale"))
  }

  /** Snapshot cap for the probe-side cell pushdown: a query batch up
    * to this many rows is collected once (≤ ~16 MB of 64-float
    * vectors) and drives both the probe plan and the pushed In set; a
    * larger batch keeps the join-only shape, distributed end to
    * end. */
  private val maxPushdownQueries = 65536

  /** [[ivfAdcTopKIndexedHier]]'s candidate stage — package-visible for
    * the plan spec, like [[adcProbeCandidates]]. */
  private[graft] def adcProbeCandidatesHier(queries: DataFrame,
      idCol: String, vecCol: String, nprobe: Int, gprobe: Int,
      table: String, buckets: Int = ivfIndexBuckets,
      skipPushdown: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    adcProbeCandidatesVia(queries, idCol, vecCol, table, buckets,
      skipPushdown) {
      epoch =>
        val bc = adcHierBc(spark, table, epoch)
        (vec => graft.functions.NearestCellsBc.hier(vec, bc, gprobe,
            nprobe),
          v => graft.functions.NearestCellsHier.nearest(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
            isFloat = false, bc.value, gprobe, nprobe))
    }
  }

  /** [[ivfAdcTopKIndexed]] with TWO-LEVEL cell selection
    * ([[graft.functions.NearestCellsHier]]): the probe scans
    * ceil(sqrt(nlist)) group centroids and only the `gprobe` nearest
    * groups' member cells — O(sqrt(nlist)) coarse work per query
    * instead of the flat scan's O(nlist), the term that turns linear
    * in the corpus under the occupancy-constant law (nlist ~ n/32: at
    * a 10^6-cell production shard the flat scan is 64M multiplies per
    * query; two-level is ~128k). Everything after cell selection is
    * [[adcProbeCandidates]]' shape verbatim (shared body): one
    * query-sized exchange co-partitioned with the bucketed stored
    * side, int8 codes through the join, never a vector.
    *
    * OPT-IN serving path: `gprobe` < group count changes WHICH cells
    * are probed, so results can differ from the flat fraction law —
    * recall is a measured, gated quantity here exactly like nprobe's
    * ([[recallAuditIndexed]]; with `gprobe` = group count the output
    * is bit-identical to [[ivfAdcTopKIndexed]], spec-gated). Never
    * substituted under an oracle-gated query. */
  def ivfAdcTopKIndexedHier(queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int, gprobe: Int, table: String,
      dim: Int = 64, buckets: Int = ivfIndexBuckets): DataFrame =
    rankByScaledIdot(
      adcProbeCandidatesHier(queries, idCol, vecCol, nprobe, gprobe,
        table, buckets), k)

  /** Two-stage quantized retrieval (qa1) — the composition
    * [[Quantize]]'s Scaladoc promises, closed: [[ivfAdcTopK]] generates
    * the per-query top-`depth` candidates over PACKED INT8 CODES (cheap,
    * integer-exact, 64-byte shuffle rows), then ONLY those survivors —
    * `depth` rows per query, never the corpus — join back to the full
    * float vectors for an exact-cosine re-rank to top-`k`. This is the
    * standard ADC serving recipe: quantized candidate generation at
    * corpus scale, full-precision scoring at candidate scale.
    *
    * Scale: the CORPUS float vectors never enter an exchange — in both
    * re-rank joins the corpus side is the STREAMED side, scored in its
    * own scan, while the survivor-derived side is broadcast
    * (plan-asserted: no shuffle carries a float array, no broadcast
    * carries the corpus `v`/`nrm`). The only float payload that moves is
    * the query vectors riding the second broadcast at candidate scale
    * (`n_queries × depth` rows — a serving batch, not the corpus).
    * Without the hints Spark broadcasts the corpus vector table instead
    * (cheap at bench scale, a corpus-sized vector movement at 100 TB) —
    * the r10 regression this shape fixes. The re-rank itself is
    * [[rankTopK]]'s grouped partial collect over depth-bounded groups.
    * Output: (q_id, nb_id, rank, cos) — [[bruteForceTopK]]'s contract,
    * restricted to the quantized tier's candidates. */
  def ivfAdcRerank(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, depth: Int, nlist: Int = 16, nprobe: Int = 4, dim: Int = 64,
      cents: Array[Array[Double]] = null): DataFrame = {
    require(depth >= k, s"depth=$depth < k=$k")
    val survivors = ivfAdcTopK(vecs, idCol, vecCol, depth, nlist, nprobe,
      dim, cents).select(col("q_id"), col("nb_id"))
    val base = withNorm(vecs, idCol, vecCol)
    // id-only broadcast: each corpus partition tags its own rows that
    // serve as queries — qv/qn are produced IN the corpus scan
    val withQ = base.join(broadcast(survivors), col("id") === col("q_id"))
      .select(col("q_id"), col("nb_id"),
        col("v").as("qv"), col("nrm").as("qn"))
    // candidate-scale broadcast (ids + query vectors): corpus v/nrm again
    // stay in their scan; only the depth-bounded query side moves
    val rescored = base.join(broadcast(withQ), col("id") === col("nb_id"))
      .select(col("q_id"), col("nb_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
    rankTopK(rescored, k)
  }

  /** [[ivfAdcRerank]] against a PERSISTED index: [[ivfAdcTopKIndexed]]
    * generates the per-query top-`depth` candidates over the stored
    * int8 codes, then ONLY those survivors join the full float vectors
    * for a FULL-PRECISION re-rank to top-`k` — the escalation target
    * of [[tuneServing]]. The re-rank objective is the exact DOT, not
    * cosine: the ADC tier IS a maximum-inner-product tier (its ranking
    * key is the quantized dot), so its escalation must be the same
    * objective at full precision — the loss it removes is exactly the
    * int8 quantization error (qa1's cosine re-rank serves the
    * [[bruteForceTopK]] composition instead). Same scale shape as
    * qa1's: the corpus float vectors never enter an exchange (scored
    * in their own scan); the only float payload that moves is the
    * query vectors riding a candidate-scale broadcast (`n_queries ×
    * depth` rows). Output: (q_id, nb_id, rank, score). */
  def ivfAdcRerankIndexed(vecs: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, depth: Int, nprobe: Int,
      table: String, dim: Int = 64): DataFrame = {
    require(depth >= k, s"depth=$depth < k=$k")
    val survivors = ivfAdcTopKIndexed(queries, idCol, vecCol, depth,
      nprobe, table, dim).select(col("q_id"), col("nb_id"))
    val qs = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val withQ = qs.join(broadcast(survivors), Seq("q_id"))
      .select(col("q_id"), col("nb_id"), col("qv"))
    val rescored = vecs
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(broadcast(withQ), col("id") === col("nb_id"))
      .select(col("q_id"), col("nb_id"),
        dot(col("qv"), col("v")).as("cos"))
    rankTopK(rescored, k)
      .withColumnRenamed("cos", "score")
  }

  /** A tuned ANN serving decision — what [[tuneServing]] returns.
    * `recall` is always the MEASURED mean recall@k of the decided
    * path on the caller's query sample, against the float-exact
    * end-to-end reference. */
  sealed trait AnnServing { def nprobe: Int; def recall: Double }
  /** Probe-only serving: the tuned nprobe met the recall gate. */
  final case class ProbeServing(nprobe: Int, recall: Double)
    extends AnnServing
  /** Probe + exact re-rank serving: the probe dial PLATEAUED below the
    * gate (loss probing cannot fix — quantization/assignment ranking
    * error, the density regime), so the policy escalated to
    * [[ivfAdcRerankIndexed]] at the tuned `depth`. A `recall` still
    * below the gate here means even full-precision re-ranking of the
    * probed candidates cannot reach it — cell coverage itself is the
    * residual, which is retrain territory
    * ([[maybeRetrainIvfAdcIndex]]). */
  final case class RerankServing(nprobe: Int, depth: Int, recall: Double)
    extends AnnServing

  /** THE SERVING POLICY (r17 verdict item 2) — [[tuneNprobe]]'s
    * plateau signal wired to its consumer, the way the qc3 drift gate
    * is wired to qe3's retrain: tune the probe dial against the
    * FLOAT-EXACT end-to-end reference (deliberately not the quantizer
    * ceiling: the policy's whole point is to see the quantization loss
    * the ceiling reference excludes, because re-ranking can fix it);
    * if the dial meets `targetRecall`, serve probe-only. If the dial
    * PLATEAUS below it — the regime the r17 growth measurement
    * documented as "re-rank territory" in prose (density-growth: dial
    * inflated to ~a cluster's cell count, recall stuck at 0.815) —
    * escalate: tune a re-rank depth (doubling multiples of k through
    * the same [[tuneDial]] machinery, each audit candidate-scale)
    * for [[ivfAdcRerankIndexed]] at the plateaued nprobe, and return
    * the priced escalation instead of the deficient dial.
    *
    * Monitoring-cadence like the tuners it composes: ONE exact
    * brute-force leg for the whole search (panel-sized), run when the
    * drift audit runs, never per probe. The quantizer-state guard
    * spans the whole policy run (a mid-policy retrain fails loudly).
    * `maxDepthFactor` bounds the escalation at `maxDepthFactor × k`
    * candidates per query — re-rank cost is linear in it, so the cap
    * is the caller's price ceiling. */
  def tuneServing(vecs: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, table: String, targetRecall: Double,
      dim: Int = 64, minGain: Double = 0.005, maxDepthFactor: Int = 32)
      : AnnServing = {
    require(maxDepthFactor >= 1, s"maxDepthFactor=$maxDepthFactor")
    val spark = vecs.sparkSession
    val state0 = quantStateNow(spark, table)
    val exact = exactMipsTopK(vecs, queries, idCol, vecCol, k)
      .localCheckpoint()
    try {
      val (np, probeRecall) = tuneNprobe(vecs, queries, idCol, vecCol,
        k, table, targetRecall, dim, minGain, reference = exact)
      val res =
        if (probeRecall >= targetRecall) ProbeServing(np, probeRecall)
        else {
          // depth = k (re-ranking exactly k candidates) reorders but
          // cannot change recall, so the dial is the MULTIPLIER over k,
          // starting where the probe left off
          val (mult, rerankRecall) =
            tuneDial(maxDepthFactor, targetRecall, minGain)(m =>
              recallOfApprox(exact,
                  ivfAdcRerankIndexed(vecs, queries, idCol, vecCol, k,
                    depth = m * k, nprobe = np, table, dim), k)
                .agg(avg("recall")).head().getDouble(0))
          RerankServing(np, mult * k, rerankRecall)
        }
      requireQuantStable(spark, table, state0)
      res
    } finally dropCheckpoint(exact)
  }

  /** Persist [[tuneServing]]'s decision (r18 verdict item 3): the
    * policy's output previously lived only in the caller, so every
    * serving session re-paid the exact brute-force leg — while qc2's
    * derived depths live in a maintained table
    * ([[graft.RelationalQueries]]'s qc2Depths discipline). The
    * decision lands in `<table>_serve` (one row: mode, nprobe, gprobe,
    * depth, recall, state_key) via the crash-safe shadow swap
    * ([[MergeTables.swapInKeyed]]), KEYED BY THE QUANTIZER STATE
    * ([[persistedQuantState]] — epoch + centroid file snapshot,
    * application-independent since r20 so the store survives a
    * driver restart): any
    * retrain, rebuild or centroid GC changes the key, so the stored
    * decision self-invalidates ([[readServingDecision]]'s stale
    * refusal) instead of silently serving dials tuned against a
    * quantizer that no longer exists. `gprobe` > 0 additionally
    * records a separately tuned two-level dial ([[tuneGprobe]]) for
    * stacks that serve through [[ivfAdcTopKIndexedHier]]; 0 = flat. */
  def writeServingDecision(spark: SparkSession, table: String,
      serving: AnnServing, gprobe: Int = 0): Unit = {
    import spark.implicits._
    // the `_serve` name is shared with the sharded tier's per-shard
    // rows (schema carries `shard`) — refuse the cross-write loudly
    // instead of silently replacing the other tier's store (r19
    // verdict item 6; in correct use the two tiers never share a name)
    locally {
      val t = table + "_serve"
      MergeTables.recoverCompactCrash(spark, t)
      if (spark.catalog.tableExists(t)) {
        spark.catalog.refreshTable(t)
        require(!spark.table(t).schema.fieldNames.contains("shard"),
          s"$t holds SHARDED per-shard serving rows — refusing the " +
            "single-table write over it (is this name really a " +
            "single-table index?)")
      }
    }
    val (mode, depth) = serving match {
      case ProbeServing(_, _)     => ("probe", 0)
      case RerankServing(_, d, _) => ("rerank", d)
    }
    MergeTables.swapInKeyed(spark,
      Seq((mode, serving.nprobe, gprobe, depth, serving.recall,
        persistedQuantState(spark, table)))
        .toDF("mode", "nprobe", "gprobe", "depth", "recall",
          "state_key"),
      "mode", table + "_serve")
  }

  /** Read the persisted serving decision, REFUSING a stale one: None
    * when nothing is stored OR the stored state key no longer matches
    * the index's live quantizer state (a retrain/rebuild happened
    * since the tune — re-run [[tuneServingPersist]]). The read is one
    * sidecar row plus the metadata-only state key: NO exact leg, NO
    * corpus pass — by construction (no corpus argument exists), a
    * serving session starts from the stored dials for free. */
  def readServingDecision(spark: SparkSession, table: String)
      : Option[(AnnServing, Int)] = {
    val t = table + "_serve"
    MergeTables.recoverCompactCrash(spark, t)
    if (!spark.catalog.tableExists(t)) return None
    // driver-side sidecar read (r22): the one-row decision store was a
    // collect job per serving-stack plan; same healed fresh listing.
    val rows = graft.sources.SidecarRead.rows(spark, t)
    if (rows.isEmpty) return None
    val r = rows.head
    if (r.getString("state_key") !=
        persistedQuantState(spark, table)) None
    else {
      val np = r.getInt("nprobe")
      val rec = r.getDouble("recall")
      val serving: AnnServing =
        if (r.getString("mode") == "rerank")
          RerankServing(np, r.getInt("depth"), rec)
        else ProbeServing(np, rec)
      Some((serving, r.getInt("gprobe")))
    }
  }

  /** [[tuneServing]] + [[writeServingDecision]]: run the policy at
    * monitoring cadence and store its decision for every subsequent
    * serving session — the deployment loop the r18 verdict asked for.
    * Pass `gprobe` from a caller-run [[tuneGprobe]] when the serving
    * path is the two-level probe. */
  def tuneServingPersist(vecs: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, table: String,
      targetRecall: Double, dim: Int = 64, minGain: Double = 0.005,
      maxDepthFactor: Int = 32, gprobe: Int = 0): AnnServing = {
    val s = tuneServing(vecs, queries, idCol, vecCol, k, table,
      targetRecall, dim, minGain, maxDepthFactor)
    writeServingDecision(vecs.sparkSession, table, s, gprobe)
    s
  }

  /** SemDeDup-style semantic deduplication: partition the corpus into
    * coarse k-means cells (the [[ivfTopK]] quantizer, occupancy-constant
    * `nlist` from [[ivfParams]]), then inside each cell drop every vector
    * that has a smaller-id neighbor with cosine >= `tau` — one pass of the
    * published cluster-then-prune recipe (Abbas et al., "SemDeDup", 2023),
    * with keep-lowest-id as the deterministic representative rule (a
    * transitive chain prunes to its earliest member, exactly like
    * [[Dedup.exact]]'s min-id winner).
    *
    * Returns one row per input vector: (vec_id, cell, kept) — integer/
    * boolean only, so the cross-engine gate never hashes a float. The
    * fp exposure is the q35c class (cell-argmin and threshold margins,
    * ~1e-1 data gaps vs ~1e-13 drift; tau must not sit on a data value).
    *
    * Scale: pairwise work is within-cell only — occupancy is held
    * constant by construction, so candidate pairs grow linearly with the
    * corpus, never quadratically. The dropped-id set re-joins id-only
    * (broadcast-sized at real dup rates); vectors cross the wire once,
    * keyed by cell. */
  def semDedup(vecs: DataFrame, idCol: String, vecCol: String, tau: Double,
      targetOccupancy: Int = defaultOccupancy, dim: Int = 64,
      iters: Int = defaultLloydIters): DataFrame = {
    val (nlist, _) = ivfParams(vecs.count(), targetOccupancy = targetOccupancy)
    val cents = trainCoarseQuantizer(
      trainingSample(vecs, idCol, vecCol, trainingCap(nlist)),
      vecCol, nlist, dim, iters)
    val assigned = withNorm(vecs, idCol, vecCol).withColumn("cell",
      element_at(nearestCells(col("v"),
        broadcastQuantizer(vecs.sparkSession, cents), 1), 1))
    val dropped = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .filter(dot(col("a.v"), col("b.v")) /
        (col("a.nrm") * col("b.nrm")) >= tau)
      .select(col("b.id").as("vec_id")).distinct()
    assigned.select(col("id").as("vec_id"), col("cell"))
      .join(dropped.withColumn("hit", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("hit").isNull.as("kept"))
  }

  /** Embedding-space outlier audit (q92): flag, per coarse cell, the
    * `pctNum`% most centroid-distant members — the standard
    * embedding-space pruning step before training (mislabeled points,
    * encoder failures, and off-distribution scrapes sit far from every
    * cluster center). Reuses the [[semDedup]] cell geometry: quantizer
    * trained on the bounded sample, assignment map-side via broadcast
    * centroids.
    *
    * Cutoff is integer-exact both engines: a member is an outlier iff
    * its rank by (distance² desc, id) within the cell is ≤
    * `greatest(1, (cnt*pctNum + 99) div 100)` (ceiling of pctNum%, at
    * least one per cell). distance² = v·v − 2·v·c + c·c with each term a
    * sequential left fold over identical doubles in both engines (the
    * centroids are bit-equal since the ordered-fold oracle mean), so the
    * only cross-engine fp exposure is a distance near-tie between
    * distinct vectors — ~1e-1 margins on this data family, the same
    * accepted class as q35c's cos ordering.
    *
    * Scale: assignment and distance are one map-side projection over the
    * scan (centroid matrix broadcast); the only exchange carries
    * (vec_id, cell, d2) — 20 bytes/row, never the embedding — and the
    * window partitions are cell-sized (occupancy-constant ~32 rows), so
    * no partition grows with n. Returns (vec_id, cell, outlier). */
  def outlierAudit(vecs: DataFrame, idCol: String, vecCol: String,
      pctNum: Int = 5, targetOccupancy: Int = defaultOccupancy,
      dim: Int = 64, iters: Int = defaultLloydIters): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pctNum >= 0 && pctNum <= 100, s"pctNum=$pctNum")
    val spark = vecs.sparkSession
    VectorOps.ensureRegistered(spark)
    val (nlist, _) = ivfParams(vecs.count(), targetOccupancy = targetOccupancy)
    val cents = trainCoarseQuantizer(
      trainingSample(vecs, idCol, vecCol, trainingCap(nlist)),
      vecCol, nlist, dim, iters)
    // centroid lookup rides as a broadcast table (nlist rows); cn2 is the
    // same fold the oracle's cn CTE computes
    val centRows = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
    val centDf = spark.createDataFrame(centRows).toDF("cell", "cent")
    val assigned = vecs.select(col(idCol).as("vec_id"),
      col(vecCol).as("e"),
      element_at(nearestCells(col(vecCol),
        broadcastQuantizer(spark, cents), 1), 1).as("cell"))
    val d2 = assigned.join(broadcast(centDf), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        (dot(col("e"), col("e")) - lit(2) * dot(col("e"), col("cent"))
          + dot(col("cent"), col("cent"))).as("d2"))
    val byCell = Window.partitionBy("cell")
    val byDist = byCell.orderBy(col("d2").desc, col("vec_id"))
    d2.select(col("vec_id"), col("cell"),
        row_number().over(byDist).cast("long").as("rk"),
        count(lit(1)).over(byCell).as("cnt"))
      .select(col("vec_id"), col("cell"),
        (col("rk") <= greatest(lit(1L),
          expr(s"(cnt * $pctNum + 99) div 100"))).as("outlier"))
  }

  /** (q_id, nb_id, rank, cos) top-k per query from a candidate frame —
    * a hash aggregation, not a window: window row_number must shuffle
    * and fully sort EVERY candidate pair by (q_id, cos); here candidates
    * group map-side (partial collect_list) and only the per-query lists
    * cross the wire, sorted per group (tens of items) instead of
    * globally. All codegen'd builtins — measured ~2× faster than the
    * typed-Aggregator equivalent on 1M candidates (encoder-free).
    * Candidates per query are bounded by nprobe × cell size; for an
    * unbounded candidate stream use [[graft.agg.TopKAggregator]] (q45),
    * whose partial buffers truncate to k map-side.
    * Ordering: cos desc, nb_id asc — deterministic tie-break. */
  private def rankTopK(candidates: DataFrame, k: Int): DataFrame =
    candidates
      // sort key: -cos ascending, with NaN cos (zero-norm vectors) mapped
      // to -Infinity so it ranks FIRST — matching window `ORDER BY cos
      // DESC`, where Spark treats NaN as greater than any double; the
      // original cos rides along as a payload field
      .groupBy("q_id").agg(slice(array_sort(collect_list(struct(
        when(isnan(col("cos")), lit(Double.NegativeInfinity))
          .otherwise(-col("cos")).as("nc"),
        col("nb_id"), col("cos")))), 1, k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "v")))
      .select(col("q_id"), col("v.nb_id").as("nb_id"),
        (col("pos") + 1).cast("int").as("rank"), col("v.cos").as("cos"))

  /** LSH-bucketed approximate top-k: candidates share the query's sign
    * bucket; exact cosine re-ranks within the bucket. Recall depends on
    * bucket granularity (`planes`); the shuffle is keyed on the bucket. */
  def lshTopK(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, planes: Int = 4, dim: Int = 64): DataFrame = {
    val hp = hyperplanes(planes, dim)
    val bucketed = withNorm(vecs, idCol, vecCol)
      .withColumn("bucket", bucketOf(col("v"), hp))
    val candidates = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("q_id"), col("b.id").as("nb_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .as("cos"))
    rankTopK(candidates, k)
  }

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (Cormack/Clarke/Buettcher, SIGIR'09): each leg (a ranked list per
    * query, e.g. the BM25 lexical leg and a dense ANN leg) contributes
    * 1/(c + rank) per hit; candidates re-rank by the summed score. Rank-
    * based, so legs with incomparable score scales fuse without
    * normalization.
    *
    * Each leg must carry (qCol, idCol, rankCol). Returns
    * (q_id, doc_id, rank, rrf_u) with rank <= k, where
    * `rrf_u = floor(Σ 1/(c+rank) · 1e9)` — nano-units on the same
    * quantize-before-rank contract as [[TextAnalysis.bm25TopK]]. With
    * IEEE doubles the sum is bit-identical across engines for ≤2 legs
    * (two-term addition is exactly commutative), so for the common
    * lexical+dense pair the quantization is belt-and-braces, not load-
    * bearing.
    *
    * Scale shape: inputs are already top-k lists — queries × k rows per
    * leg, orders of magnitude below any corpus — so the union + grouped
    * sum shuffle is rank-list-sized, carries two longs and a double per
    * row, and never touches text or vectors; the per-query cut reuses
    * the bounded-state [[graft.agg.TopKAggregator]] partial-agg path. */
  /** Cross-tier retrieval agreement — the audit overlay for hybrid
    * search (qa4's sibling: qa4 audits the dense tier's approximation
    * quality; this audits how much the lexical and dense legs AGREE,
    * the quantity that decides whether fusion adds value): per query,
    * the result-list sizes of each leg and their intersection. All
    * INTEGER outputs — set membership inherits each leg's own gated
    * ranking, and the counts themselves are exact on any engine.
    * Returns (q_id, n_a, n_b, n_both); queries absent from a leg count
    * 0 for it.
    *
    * Scale shape: inputs are top-k rank lists (queries × k rows), so
    * every join and aggregate here is rank-list-sized — nothing corpus-
    * scaled moves, as with [[rrfFuse]]. */
  def retrievalAgreement(legA: DataFrame, legB: DataFrame, qCol: String,
      idCol: String): DataFrame = {
    // ONE pass over each leg (r21): the na/nb/nBoth three-aggregate
    // form referenced each leg twice, and Spark plans no common-subtree
    // reuse — both retrieval legs EXECUTED twice (qb5's plan carried
    // 2x qb2's scans; zero ReusedExchange). Tag-and-union computes the
    // identical integers from a single execution of each leg: per
    // (q_id, doc_id), ca/cb are the legs' row counts, so sum(ca) is
    // leg A's row count per query, and sum(ca*cb) equals the inner
    // join's match count (for rank lists ca, cb are 0/1 and it is the
    // intersection size). Same rows, same schema, half the work.
    val a = legA.select(col(qCol).as("q_id"),
      col(idCol).cast("long").as("doc_id"),
      lit(1L).as("ca"), lit(0L).as("cb"))
    val b = legB.select(col(qCol).as("q_id"),
      col(idCol).cast("long").as("doc_id"),
      lit(0L).as("ca"), lit(1L).as("cb"))
    // NULL doc_id guard (ADVICE r21): the three-aggregate form's inner
    // join never matched NULL keys, so a NULL id in both legs counted
    // toward n_a/n_b but never n_both; groupBy treats NULLs as equal,
    // so the product term must exclude them explicitly.
    a.unionByName(b)
      .groupBy("q_id", "doc_id")
      .agg(sum("ca").as("ca"), sum("cb").as("cb"))
      .groupBy("q_id")
      .agg(sum("ca").as("n_a"), sum("cb").as("n_b"),
        sum(when(col("doc_id").isNotNull, col("ca") * col("cb"))
          .otherwise(lit(0L))).as("n_both"))
  }

  /** Candidate screening for a production retrieval stack (qc2): keep
    * only candidates that pass a DOC-LEVEL predicate (`allowed`, e.g. a
    * relational filter over a metadata table) and a PER-QUERY
    * verification pair set (`verified`, e.g. phrase-occurrence pairs
    * from [[graft.pipeline.TextAnalysis.phraseMatches]]), then re-rank
    * the survivors per query by their original leg rank — the
    * filter → candidate → verify shape that sits in front of fusion.
    *
    * Scale shape: the join direction is deliberate — `allowed` is
    * corpus-scale, so the query-scale candidate list BROADCASTS into
    * allowed's scan (whose predicate and column pruning push to
    * parquet; plan-asserted), never the reverse: per query batch the
    * cluster pays one pruned metadata scan, and nothing corpus-sized
    * shuffles or broadcasts. `verified` is candidate-scale by
    * construction and rides a second broadcast. The re-rank window
    * partitions by query over ≤k survivors each. */
  def screenCandidates(leg: DataFrame, qCol: String, idCol: String,
      rankCol: String, allowed: DataFrame, allowedIdCol: String,
      verified: DataFrame, vQCol: String, vIdCol: String): DataFrame =
    screenCandidatesTagged(Seq(leg), qCol, idCol, rankCol, allowed,
      allowedIdCol, verified, vQCol, vIdCol).drop("leg")

  /** [[screenCandidates]] over SEVERAL legs in ONE pass (r21): the
    * per-leg form made each leg's caller pay the `allowed` metadata
    * scan and the whole `verified` subplan ONCE PER LEG — Spark plans
    * no common-subtree reuse, so qc2's stack executed its phrase probe
    * twice (plan evidence: plans/r21/qc2_before vs _after). Tagging and
    * unioning the legs first screens them through a single scan +
    * semi-join; the re-rank window partitions by (q_id, leg), which on
    * disjoint leg tags equals each leg's own per-query window row for
    * row. Output adds the `leg` index column (the input Seq position). */
  def screenCandidatesTagged(legs: Seq[DataFrame], qCol: String,
      idCol: String, rankCol: String, allowed: DataFrame,
      allowedIdCol: String, verified: DataFrame, vQCol: String,
      vIdCol: String): DataFrame = {
    require(legs.nonEmpty, "screenCandidatesTagged: no legs")
    val tagged = legs.zipWithIndex.map { case (leg, i) =>
      leg.select(col(qCol).as("q_id"),
        col(idCol).cast("long").as("doc_id"),
        col(rankCol).as("orig_rank"), lit(i).as("leg"))
    }.reduce(_ unionByName _)
    val elig = allowed.select(col(allowedIdCol).cast("long").as("doc_id"))
    val pairs = verified.select(col(vQCol).as("q_id"),
      col(vIdCol).cast("long").as("doc_id"))
    elig.join(broadcast(tagged), Seq("doc_id"))
      .join(broadcast(pairs), Seq("q_id", "doc_id"), "left_semi")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id", "leg")
          .orderBy(col("orig_rank"))))
      .select("q_id", "doc_id", "rank", "leg")
  }

  /** Hybrid serving (qb7) with the QUERIES AS A STREAM (qc4) — the
    * full online retrieval twin: each micro-batch carries query rows
    * holding BOTH representations (q_id, query text, query vector);
    * inside foreachBatch the batch probes the persisted postings index
    * ([[graft.pipeline.TextAnalysis.bm25TopKIndexed]]) and the
    * persisted ADC index ([[ivfAdcTopKIndexed]]) — neither corpus is
    * re-scanned, both stored sides keep their gated bucketed-probe
    * shapes — and [[rrfFuse]] fuses the two rank lists. Per-batch
    * fusion is EXACT, not approximate: every ranking here (each leg's
    * top-k and the fused rank) is per-query, and a query's whole
    * candidate set lives in the micro-batch that carried it — so
    * stream == batch by construction, and qc4 shares qb7's oracle
    * verbatim (the q70s gate shape on the full hybrid stack). A
    * two-batch MemoryStream spec gates the equality. */
  def streamHybridTopK(queries: DataFrame, qIdCol: String,
      qTextCol: String, qVecCol: String, lexTable: String,
      adcTable: String, lexDepth: Int, denseDepth: Int, nprobe: Int,
      k: Int, sinkDir: String, c: Int = 60, k1: Double = 1.2,
      b: Double = 0.75, dim: Int = 64): DataFrame = {
    val q = startStreamHybridTopK(queries, qIdCol, qTextCol, qVecCol,
      lexTable, adcTable, lexDepth, denseDepth, nprobe, k, sinkDir, c,
      k1, b, dim)
    try q.processAllAvailable() finally q.stop()
    queries.sparkSession.read.parquet(sinkDir)
  }

  /** The started-but-undrained form of [[streamHybridTopK]] — the
    * caller owns the trigger cadence (StreamingSpec drives TWO
    * micro-batches through it). Overwrites `sinkDir` with a zero-row
    * schema-typed init first, the qb4/qa6 sink convention. */
  def startStreamHybridTopK(queries: DataFrame, qIdCol: String,
      qTextCol: String, qVecCol: String, lexTable: String,
      adcTable: String, lexDepth: Int, denseDepth: Int, nprobe: Int,
      k: Int, sinkDir: String, c: Int = 60, k1: Double = 1.2,
      b: Double = 0.75, dim: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = queries.sparkSession
    def fuse(batch: DataFrame): DataFrame = {
      val lex = graft.pipeline.TextAnalysis.bm25TopKIndexed(
        batch.select(col(qIdCol), col(qTextCol)), qIdCol, qTextCol,
        lexTable, k = lexDepth, k1 = k1, b = b)
      // a query WITHOUT a vector (null qVecCol — e.g. an un-embedded
      // document) still serves its lexical leg; only the dense probe
      // skips it. The sf0.1 corpus exposed this: documents outnumber
      // embeddings, and an inner composition silently dropped every
      // lexical-only query — diverging from the batch tier (qb7),
      // whose legs are independent.
      val dense = ivfAdcTopKIndexed(
          batch.filter(col(qVecCol).isNotNull)
            .select(col(qIdCol), col(qVecCol)), qIdCol, qVecCol,
          k = denseDepth, nprobe = nprobe, table = adcTable, dim = dim)
        .withColumnRenamed("nb_id", "doc_id")
      rrfFuse(Seq(lex, dense), "q_id", "doc_id", "rank", k = k, c = c)
    }
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      queries.schema)
    initEmptySink(fuse(empty), sinkDir)
    queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        fuse(batch).write.mode("append").parquet(sinkDir)
      }
      .start()
  }

  def rrfFuse(legs: Seq[DataFrame], qCol: String, idCol: String,
      rankCol: String, k: Int, c: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse: no legs")
    val norm = legs.map(_.select(col(qCol).as("q_id"),
      col(idCol).cast("long").as("doc_id"),
      col(rankCol).cast("double").as("rank_d")))
    rrfFuseUnioned(norm.reduce(_ unionByName _), k, c)
  }

  /** [[rrfFuse]] over an ALREADY-UNIONED rank frame (r21) — the fusion
    * tail for callers whose legs arrive pre-tagged in one frame
    * ([[screenCandidatesTagged]]), so the screened union is planned
    * once instead of once per leg. Row-for-row the same aggregation
    * rrfFuse runs on its internal union: contributions per (q_id,
    * doc_id) are ≤ #legs doubles whose sum is order-independent at two
    * terms, and the nano-unit quantization + TopK cut are shared. */
  def rrfFuseTagged(tagged: DataFrame, qCol: String, idCol: String,
      rankCol: String, k: Int, c: Int = 60): DataFrame =
    rrfFuseUnioned(tagged.select(col(qCol).as("q_id"),
      col(idCol).cast("long").as("doc_id"),
      col(rankCol).cast("double").as("rank_d")), k, c)

  private def rrfFuseUnioned(unioned: DataFrame, k: Int, c: Int)
      : DataFrame = {
    val su = unioned
      .select(col("q_id"), col("doc_id"),
        (lit(1.0) / (lit(c.toDouble) + col("rank_d"))).as("contrib"))
      .groupBy("q_id", "doc_id").agg(sum("contrib").as("rrf"))
      .withColumn("rrf_u", floor(col("rrf") * 1e9).cast("long"))
    val topk = udaf(new graft.agg.TopKAggregator(k),
      org.apache.spark.sql.Encoders.product[(Double, Long)])
    su.groupBy("q_id")
      .agg(topk(col("rrf_u").cast("double"), col("doc_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "v")))
      .select(col("q_id"), col("v._2").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("v._1").cast("long").as("rrf_u"))
  }
}
