package graft.accel

import org.apache.spark.SparkContext

/** The reference fork's hybrid CPU/GPU scheduling policy, extracted as a
  * pure function (hadoop-gpu-0.20.1/src/mapred/org/apache/hadoop/mapred/
  * JobQueueTaskScheduler.java:171-214): given measured mean task times per
  * device and slot counts, split the pending task load (x CPU, y GPU) to
  * minimize
  *
  *   f(x, y) = max( ceil(x / nCpu) · cpuMean, ceil(y / nGpu) · gpuMean )
  *
  * The reference normalizes by gpuMean and works with the acceleration
  * factor α = cpuMean / gpuMean; multiplying through by gpuMean is the
  * same objective. The reference also logs the fcpu_only / fgpu_only /
  * fgreedy comparators (JobQueueTaskScheduler.java:195-213) — exposed
  * here for the same observability.
  */
final case class DeviceProfile(
    nCpu: Int, nGpu: Int, cpuMeanSec: Double, gpuMeanSec: Double) {

  /** α = cpuMean/gpuMean (JobQueueTaskScheduler.java:171-174). */
  def alpha: Double = if (gpuMeanSec > 0) cpuMeanSec / gpuMeanSec else 1.0
}

object HybridPolicy {

  /** Estimated makespan of running x tasks on CPU slots and y on GPU. */
  def makespan(x: Int, y: Int, p: DeviceProfile): Double = {
    val cpu = if (p.nCpu == 0) (if (x > 0) Double.PositiveInfinity else 0.0)
              else math.ceil(x.toDouble / p.nCpu) * p.cpuMeanSec
    val gpu = if (p.nGpu == 0) (if (y > 0) Double.PositiveInfinity else 0.0)
              else math.ceil(y.toDouble / p.nGpu) * p.gpuMeanSec
    math.max(cpu, gpu)
  }

  /** Optimal (cpuTasks, gpuTasks) split of `pending` tasks — the
    * reference enumerates all splits per heartbeat; pending counts are
    * small enough that O(pending) enumeration is exact and cheap. */
  def split(pending: Int, p: DeviceProfile): (Int, Int) = {
    require(pending >= 0)
    if (p.nGpu == 0 || p.gpuMeanSec <= 0) return (pending, 0)
    if (p.nCpu == 0 || p.cpuMeanSec <= 0) return (0, pending)
    var best = (pending, 0)
    var bestF = Double.MaxValue
    var y = 0
    while (y <= pending) {
      val f = makespan(pending - y, y, p)
      if (f < bestF) { bestF = f; best = (pending - y, y) }
      y += 1
    }
    best
  }

  /** The reference's logged comparators. */
  def fCpuOnly(pending: Int, p: DeviceProfile): Double = makespan(pending, 0, p)
  def fGpuOnly(pending: Int, p: DeviceProfile): Double = makespan(0, pending, p)

  /** CPU slots are only offered work when the pending load exceeds what
    * the GPUs could absorb α-times faster
    * (JobQueueTaskScheduler.java:265-303). */
  def offerCpu(pending: Int, p: DeviceProfile): Boolean =
    pending.toDouble >= p.alpha * p.nGpu
}

/** Measured per-device mean task times — the analogue of
  * JobInProgress.getCPUMapTaskMeanTime / getGPUMapTaskMeanTime
  * (JobInProgress.java:338-364). Backed by Spark accumulators so task
  * wall-clock recorded on EXECUTORS merges back to the driver (the role
  * the TaskTracker heartbeat plays in the reference) — works identically
  * on local[n] and a 1000-executor cluster. Injectable in tests: no GPU
  * exists in this environment, so specs drive the policy with synthetic
  * timings, the same way the fork's scheduler logs were validated. */
final class TaskTimes(sc: SparkContext) extends Serializable {
  private val cpuTime = sc.doubleAccumulator("graft.accel.cpuTimeSec")
  private val cpuN = sc.longAccumulator("graft.accel.cpuTasks")
  private val gpuTime = sc.doubleAccumulator("graft.accel.gpuTimeSec")
  private val gpuN = sc.longAccumulator("graft.accel.gpuTasks")

  def recordCpu(sec: Double): Unit = { cpuTime.add(sec); cpuN.add(1) }
  def recordGpu(sec: Double): Unit = { gpuTime.add(sec); gpuN.add(1) }

  def profile(nCpu: Int, nGpu: Int, defaultMean: Double = 1.0): DeviceProfile =
    DeviceProfile(nCpu, nGpu,
      if (cpuN.value == 0) defaultMean else cpuTime.value / cpuN.value,
      if (gpuN.value == 0) defaultMean else gpuTime.value / gpuN.value)
}
