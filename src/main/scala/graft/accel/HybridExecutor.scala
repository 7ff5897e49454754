package graft.accel

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Accelerator-aware operator execution, Spark-idiomatic.
  *
  * The reference runs the SAME logical map operator as either a CPU
  * binary or a GPU binary, chosen per task by the scheduler
  * (MapTask.java:375-379 picks the runner; Application.java:133-136 execs
  * DistributedCache file [runOnGPU ? 1 : 0]). Two Spark-native shapes of
  * that idea:
  *
  *  1. [[HybridExecutor.hybridMapPartitions]] — partition-level device
  *     split: the α-policy assigns the first y partitions to the
  *     accelerated implementation and the rest to the CPU one, exactly
  *     like the fork marks y of the pending tasks setRunOnGPU(true).
  *     On a real cluster the accelerated branch would additionally run
  *     under a stage-level ResourceProfile requesting "gpu" task
  *     resources; the variant-choice mechanics are identical.
  *
  *  2. [[AccelSwapRule]] — plan-level variant swap: an optimizer rule
  *     (injectable via SparkSessionExtensions or
  *     spark.experimental.extraOptimizations) that rewrites a registered
  *     scalar UDF to its accelerated twin when the measured α favors it.
  *
  * Both are OPTIONAL and flagged — the CPU path is authoritative for
  * correctness (SURVEY §4.3); no GPU exists in CI, so specs drive the
  * policy with injected timings.
  */
object HybridExecutor {

  /** Run `cpu` on some partitions and `accel` on others, split by the
    * measured-means policy. Both functions MUST be semantically
    * equivalent; results are unioned by partition. */
  def hybridMapPartitions[T, U: Encoder](
      ds: Dataset[T],
      cpu: Iterator[T] => Iterator[U],
      accel: Iterator[T] => Iterator[U],
      profile: DeviceProfile,
      times: Option[TaskTimes] = None): Dataset[U] = {
    val nPart = ds.rdd.getNumPartitions
    val (_, gpuParts) = HybridPolicy.split(nPart, profile)
    ds.mapPartitions { it =>
      val onAccel = TaskContext.getPartitionId() < gpuParts
      val t0 = System.nanoTime()
      // Record exactly one duration sample per task: hasNext() is commonly
      // called again on a drained iterator, and early-terminating consumers
      // (limit) never drain it at all — the completion listener covers those.
      var recorded = false
      def record(): Unit = if (!recorded) {
        recorded = true
        val sec = (System.nanoTime() - t0) / 1e9
        times.foreach(t => if (onAccel) t.recordGpu(sec) else t.recordCpu(sec))
      }
      Option(TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => record()))
      val out = if (onAccel) accel(it) else cpu(it)
      new Iterator[U] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h) record()
          h
        }
        def next(): U = out.next()
      }
    }
  }

  /** The measure→schedule loop CLOSED end-to-end (r18 verdict item 6):
    * run `waves` rounds of the hybrid operator, recomputing the device
    * split BEFORE EVERY WAVE from the listener's MEASURED profile —
    * the reference recomputes y per heartbeat
    * (JobQueueTaskScheduler.java:171-214 consuming
    * JobInProgress.java:338-364 mean task times); until r19 the
    * measured profile fed the policy in a spec but no job re-split
    * mid-run. Each wave's two branches run as separately
    * job-group-tagged ACTIONS (the heartbeat-visible unit
    * [[TaskTimeListener]] attributes), and the loop drains the async
    * listener bus before the next wave's profile read — so wave N+1's
    * split follows what waves 1..N actually measured, shifting when
    * the measurements shift. Returns the per-wave (gpuPartitions,
    * results); the result set is split-invariant (both bodies are
    * semantically equal by contract), which is what makes mid-run
    * re-splitting safe. */
  def measuredWaves[T, U: scala.reflect.ClassTag](
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[T],
      cpu: Iterator[T] => Iterator[U],
      accel: Iterator[T] => Iterator[U],
      listener: TaskTimeListener,
      nCpu: Int, nGpu: Int, waves: Int,
      defaultMean: Double = 1.0): Seq[(Int, Array[U])] =
    waveLoop(spark, rdd, listener, nCpu, nGpu, waves, defaultMean) {
      (accelRdd, cpuRdd) =>
        // DEMO-SCALE API: both branches collect to the driver — right
        // for the k-means-fixture scale the accelerator demo runs at,
        // wrong for data scale ([[measuredWavesDistributed]])
        val g = MeasuredAlpha.measured(spark, "gpu")(
          accelRdd.mapPartitions(accel).collect())
        val c = MeasuredAlpha.measured(spark, "cpu")(
          cpuRdd.mapPartitions(cpu).collect())
        g ++ c
    }

  /** [[measuredWaves]] at DATA SCALE (r19 verdict item 5): the same
    * measure→re-split loop with each wave's branches consumed as
    * distributed ACTIONS — nothing but the listener's metrics and the
    * per-wave row counts ever reach the driver. `sinkOf(wave, device)`
    * returns a parquet path when the wave's branch outputs should
    * persist (the production shape: each wave writes its device's
    * results); None counts rows instead. Returns the per-wave
    * (gpuPartitions, rows) trajectory — split-shift semantics
    * identical to [[measuredWaves]] by construction (shared loop;
    * spec-gated on the same body). */
  def measuredWavesDistributed[T, U: Encoder: scala.reflect.ClassTag](
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[T],
      cpu: Iterator[T] => Iterator[U],
      accel: Iterator[T] => Iterator[U],
      listener: TaskTimeListener,
      nCpu: Int, nGpu: Int, waves: Int,
      defaultMean: Double = 1.0,
      sinkOf: (Int, String) => Option[String] = (_, _) => None)
      : Seq[(Int, Long)] = {
    var wave = 0
    waveLoop(spark, rdd, listener, nCpu, nGpu, waves, defaultMean) {
      (accelRdd, cpuRdd) =>
        wave += 1
        def drain(device: String,
            branch: org.apache.spark.rdd.RDD[U]): Long =
          sinkOf(wave, device) match {
            case None =>
              MeasuredAlpha.measured(spark, device)(branch.count())
            case Some(path) =>
              // only the WRITE is genuine device work — the read-back
              // count runs OUTSIDE the measured block (ADVICE r20 low:
              // attributing the read job's tasks to the device job
              // group inflated its task counts and diluted its mean
              // task time in the profile driving the next wave's split)
              val ds = spark.createDataset(branch)(
                implicitly[Encoder[U]])
              MeasuredAlpha.measured(spark, device)(
                ds.write.mode("overwrite").parquet(path))
              spark.read.parquet(path).count()
          }
        drain("gpu", accelRdd.mapPartitions(accel)) +
          drain("cpu", cpuRdd.mapPartitions(cpu))
    }
  }

  /** The shared wave loop of [[measuredWaves]] and
    * [[measuredWavesDistributed]]: re-read the measured profile, split,
    * prune the two partition ranges, hand them to `runWave`, then drain
    * the async listener bus by THIS WAVE'S OWN COUNT DELTA —
    * snapshotting [[TaskTimeListener.taskCounts]] before the wave
    * instead of accumulating expected totals, so speculative or
    * retried tasks from earlier waves can no longer satisfy the gate
    * before this wave's events actually land (ADVICE r19). A tripped
    * drain deadline is LOGGED (the next wave then runs on an
    * under-weighted profile — degraded, but visibly so, never
    * silently). */
  private def waveLoop[T, A](
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[T],
      listener: TaskTimeListener,
      nCpu: Int, nGpu: Int, waves: Int, defaultMean: Double)(
      runWave: (org.apache.spark.rdd.RDD[T],
        org.apache.spark.rdd.RDD[T]) => A): Seq[(Int, A)] = {
    val nPart = rdd.getNumPartitions
    (1 to waves).map { w =>
      val profile = listener.profile(nCpu, nGpu, defaultMean)
      val (_, gpuParts) = HybridPolicy.split(nPart, profile)
      val (cpu0, gpu0) = listener.taskCounts
      val accelRdd = org.apache.spark.rdd.PartitionPruningRDD
        .create(rdd, _ < gpuParts)
      val cpuRdd = org.apache.spark.rdd.PartitionPruningRDD
        .create(rdd, _ >= gpuParts)
      val res = runWave(accelRdd, cpuRdd)
      // drain the async event bus until THIS wave's task deltas land,
      // or the next profile read would under-weigh the wave just run
      val expCpu = (nPart - gpuParts).toLong
      val expGpu = gpuParts.toLong
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while ((listener.taskCounts._1 - cpu0 < expCpu ||
          listener.taskCounts._2 - gpu0 < expGpu) &&
          System.nanoTime() < deadline)
        Thread.sleep(10)
      if (listener.taskCounts._1 - cpu0 < expCpu ||
          listener.taskCounts._2 - gpu0 < expGpu)
        System.err.println(s"[graft.accel] wave $w drain deadline " +
          s"tripped: saw ${listener.taskCounts._1 - cpu0}/" +
          s"${listener.taskCounts._2 - gpu0} of $expCpu cpu/$expGpu " +
          "gpu task events within 30s — the next wave's profile is " +
          "under-weighted")
      (gpuParts, res)
    }
  }

  /** Stage-level resource request for the accelerated branch — the
    * Spark-idiomatic form of the fork's GPU slot (the reference models
    * "a GPU" as a dedicated TaskTracker slot type,
    * JobQueueTaskScheduler.java:171-214 + TaskTracker GPU slot config):
    * a profile whose tasks each claim `gpusPerTask` of the executor's
    * discovered "gpu" resources, applied per-stage via
    * `rdd.withResources`. */
  def accelResourceProfile(cpusPerTask: Int = 1, gpusPerTask: Double = 1.0)
      : org.apache.spark.resource.ResourceProfile =
    new org.apache.spark.resource.ResourceProfileBuilder()
      .require(new org.apache.spark.resource.TaskResourceRequests()
        .cpus(cpusPerTask).resource("gpu", gpusPerTask))
      .build()

  /** The cluster-grade form of [[hybridMapPartitions]]: the α-policy
    * decides how many partitions run accelerated, and that branch becomes
    * its OWN stage carrying a GPU [[accelResourceProfile]] — Spark's
    * scheduler then places those tasks on executors with free "gpu"
    * addresses, exactly the role the fork's scheduler plays when it marks
    * y of the pending tasks setRunOnGPU(true). Returns
    * (cpuBranch, acceleratedBranch); union/consume them as one job.
    *
    * Attaching a task ResourceProfile requires standalone/YARN/k8s (and
    * executing it, executors with discovered "gpu" addresses);
    * `local[n]` rejects even the attachment — Spark's
    * ResourceProfileManager.isSupported throws. CI therefore gates the
    * split arithmetic + branch semantics with `accelResources = None`
    * and asserts the documented rejection with `Some(profile)`
    * (AccelSpec) — the same injected-measurement discipline the α-policy
    * specs use. */
  def stagedBranches[T, U: scala.reflect.ClassTag](
      rdd: org.apache.spark.rdd.RDD[T],
      cpu: Iterator[T] => Iterator[U],
      accel: Iterator[T] => Iterator[U],
      profile: DeviceProfile,
      accelResources: Option[org.apache.spark.resource.ResourceProfile])
      : (org.apache.spark.rdd.RDD[U], org.apache.spark.rdd.RDD[U]) = {
    val (_, gpuParts) = HybridPolicy.split(rdd.getNumPartitions, profile)
    val mapped = org.apache.spark.rdd.PartitionPruningRDD
      .create(rdd, _ < gpuParts).mapPartitions(accel)
    val accelRdd = accelResources.fold(mapped)(mapped.withResources)
    val cpuRdd = org.apache.spark.rdd.PartitionPruningRDD
      .create(rdd, _ >= gpuParts).mapPartitions(cpu)
    (cpuRdd, accelRdd)
  }
}

/** Registry of CPU-UDF → accelerated-UDF variant pairs for the plan-level
  * swap. `decide` is consulted at optimization time (the α-policy, or a
  * feature flag). */
object VariantRegistry {
  final case class Variant(accelName: String, accelFn: AnyRef,
      decide: () => Boolean)
  private val variants =
    new java.util.concurrent.ConcurrentHashMap[String, Variant]()

  def register(cpuName: String, v: Variant): Unit = variants.put(cpuName, v)
  def lookup(cpuName: String): Option[Variant] = Option(variants.get(cpuName))
  def clear(): Unit = variants.clear()
}

/** Optimizer rule swapping registered UDFs to their accelerated variants.
  * Install per-session with [[Accel.install]] or globally via
  * `spark.sql.extensions=graft.accel.AccelExtensions`. */
object AccelSwapRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case udf: ScalaUDF if udf.udfName.exists(n =>
          VariantRegistry.lookup(n).exists(_.decide())) =>
        val v = VariantRegistry.lookup(udf.udfName.get).get
        udf.copy(function = v.accelFn, udfName = Some(v.accelName))
    }
}

/** SparkSessionExtensions entry point (spark.sql.extensions config). */
class AccelExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => AccelSwapRule)
}

object Accel {
  /** Install the swap rule into an existing session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(AccelSwapRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AccelSwapRule
}
