package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Job counters — the reference's hierarchical named counters
  * (mapred/Counters.java; incremented via `Reporter.incrCounter` from
  * inside map/reduce code throughout mapred/Task.java and merged job-wide
  * at the JobTracker). Two Spark-native idioms cover the capability:
  *
  *  - [[observed]]: `df.observe` (Catalyst CollectMetrics) — aggregate
  *    metrics computed ON the rows flowing through the plan, zero extra
  *    scan and zero shuffle; the closest analog of a counter incremented
  *    inside a mapper, and the scale-safe default (metrics ride the
  *    existing action).
  *  - [[counter]]: a named `LongAccumulator` for imperative increments
  *    from inside typed lambdas (`map`/`mapPartitions`) where the
  *    condition isn't expressible as a Column. Accumulators double-count
  *    under task retries on a real cluster, exactly as the reference's
  *    counters over-count on speculative/retried attempts — documented
  *    parity, use [[observed]] when exactness matters.
  *
  * Common counter shapes: [[countWhere]] mirrors the reference's
  * "records matching a condition" counters (e.g. the skipped-records and
  * map-input-records counters).
  */
object Counters {

  /** A metric column counting rows satisfying `pred` — the canonical
    * reference counter (count of records where ...). */
  def countWhere(pred: Column): Column =
    sum(when(pred, 1L).otherwise(0L))

  /** Attach named observed metrics to `df`. Returns the instrumented
    * frame and the [[Observation]]; after ANY action on the frame,
    * `obs.get` yields the metric map without a second scan. */
  def observed(df: DataFrame, obsName: String,
      metrics: Seq[(String, Column)]): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric required")
    val obs = Observation(obsName)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }

  /** A named job-global accumulator (imperative counter). */
  def counter(df: DataFrame, name: String): LongAccumulator =
    df.sparkSession.sparkContext.longAccumulator(name)
}
