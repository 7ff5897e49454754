package graft.sources

import org.apache.spark.sql.DataFrame

/** Several named outputs from one job — the reference's MultipleOutputs
  * (mapred/lib/MultipleOutputs.java:116,283): a single map/reduce pass
  * feeds N independently-formatted named outputs.
  *
  * Spark-native: cache the shared input once, derive and write each named
  * sink from the cached data, then release. The scan and any shared
  * upstream work run once (the cache materializes on the first write);
  * each sink only pays its own derivation — the same economics as the
  * reference's single-pass multi-collector. (Dynamic key-derived paths —
  * MultipleOutputFormat — are `partitionBy`, covered separately.)
  */
object MultiSink {

  /** Write each (derive, path) sink from one cached pass over `df`. */
  def writeNamed(df: DataFrame,
      sinks: Seq[(DataFrame => DataFrame, String)]): Unit = {
    val cached = df.cache()
    try sinks.foreach { case (derive, path) =>
      derive(cached).write.mode("overwrite").parquet(path)
    } finally cached.unpersist(false)
  }
}
