package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's `ValueAggregator` descriptor library (hadoop-gpu-0.20.1/
  * src/mapred/org/apache/hadoop/mapred/lib/aggregate/ — LongValueSum:28,
  * DoubleValueSum:29, LongValueMax/Min:28, StringValueMax/Min:28,
  * UniqValueCount:30, ValueHistogram:78) re-expressed as Catalyst aggregate
  * columns. Every one of these maps to a partial/final HashAggregate pair —
  * i.e. the reference's combiner (map-side partial aggregation,
  * mapred/Task.java:1094) is applied automatically, which is exactly what
  * keeps the shuffle small at 100 TB.
  */
object ValueAggregators {

  def longValueSum(v: Column): Column   = sum(v.cast("long"))
  def doubleValueSum(v: Column): Column = sum(v.cast("double"))
  def valueMax(v: Column): Column       = max(v)
  def valueMin(v: Column): Column       = min(v)

  /** Exact distinct count (UniqValueCount.java:30). The reference caps the
    * in-memory set; at scale prefer [[uniqValueCountApprox]]. */
  def uniqValueCount(v: Column): Column = countDistinct(v)

  /** HLL sketch — the 100 TB-safe variant of UniqValueCount: constant
    * memory per group instead of an unbounded hash set. */
  def uniqValueCountApprox(v: Column, rsd: Double = 0.02): Column =
    approx_count_distinct(v, rsd)

  /** ValueHistogram (ValueHistogram.java:78-127): per key, build the item →
    * frequency map, then report statistics OF THE FREQUENCY DISTRIBUTION:
    * distinct-item count, min/median/max/mean/stddev of the counts.
    *
    * The reference's "median" is `counts[len/2]` after an ascending sort —
    * the element at 0-based index len/2, NOT an interpolated percentile
    * (SURVEY §7.3). We reproduce it with a row_number pick so oracle hashes
    * match exactly.
    *
    * Two-level aggregation: groupBy(key, item).count → groupBy(key).stats.
    * Both levels get map-side partials; the windowed median pick shares the
    * second shuffle's partitioning (hash by key), so the whole report costs
    * two shuffles regardless of data size.
    */
  def histogramReport(df: DataFrame, key: Column, item: Column): DataFrame = {
    val freq = df.groupBy(key.as("key"), item.as("item"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("key")).orderBy(col("cnt"), col("item"))
    val ranked = freq
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("key"))))
    ranked.groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_items"),
        min(col("cnt")).as("min_cnt"),
        max(when(col("rn") === floor(col("n") / lit(2)) + 1, col("cnt")))
          .as("median_cnt"),
        max(col("cnt")).as("max_cnt"),
        round(avg(col("cnt")), 6).as("avg_cnt"),
        round(coalesce(stddev_pop(col("cnt")), lit(0.0)), 6).as("stddev_cnt"))
  }
}
