package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-way keyed joins mirroring the reference's composite-join grammar
  * `inner/outer/override(tbl,...)` (hadoop-gpu-0.20.1/src/mapred/org/apache/
  * hadoop/mapred/join/CompositeInputFormat.java:61-85) re-expressed as
  * Catalyst join trees. The reference requires all sources pre-sorted and
  * identically partitioned and then streams a merge join; Spark's
  * SortMergeJoin *is* that algorithm, with the sort/partition step handled
  * by the shuffle — and when one side is small we broadcast instead, which
  * the reference could not do at all.
  */
object Joins {

  /** inner(a, b, ...) — key must be present in every source
    * (join/InnerJoinRecordReader.java:41). Per-key duplicates produce the
    * cross-product, exactly like the reference's per-key iterators. */
  def inner(key: String, sources: DataFrame*): DataFrame =
    sources.reduce((a, b) => a.join(b, Seq(key), "inner"))

  /** outer(a, b, ...) — emit every key; absent sources contribute nulls
    * (join/OuterJoinRecordReader.java:41, TupleWritable presence bits →
    * nullable columns). */
  def outer(key: String, sources: DataFrame*): DataFrame =
    sources.reduce((a, b) => a.join(b, Seq(key), "full_outer"))

  /** override(a, b, ...) — per key, the value comes from the RIGHTMOST
    * source holding it (join/OverrideRecordReader.java:36). Within the
    * preferred source, the reference's fillJoinCollector emits EVERY
    * value it holds for the key; collapsing duplicates to ONE row per key
    * is a deliberate deviation (the upsert semantics users actually want
    * from "override"). The tie-break within the winning source is
    * CONTENT-BASED: the greatest row by the non-key column tuple wins —
    * a pure function of the data, so the result is identical across
    * partition layouts, shuffles and replays (an ingestion-order ordinal
    * like `monotonically_increasing_id` is none of those).
    *
    * Implementation: tag each source with its index; per key keep the
    * max of struct(source, non-key columns) — rightmost source first,
    * row content as tie-break. A single hash aggregation — one shuffle,
    * map-side partial agg, no join explosion, skew-safe under AQE. All
    * sources must share a schema.
    */
  def overrideJoin(key: String, sources: DataFrame*): DataFrame = {
    require(sources.nonEmpty)
    val cols = sources.head.columns.toSeq
    val tagged = sources.zipWithIndex.map { case (df, i) =>
      df.select(cols.map(col): _*).withColumn("__src", lit(i))
    }.reduce(_.unionByName(_))
    val payload = struct(
      (col("__src") +: cols.filterNot(_ == key).map(col)): _*)
    tagged
      .groupBy(col(key))
      .agg(max(payload).as("__win"))
      .select(col(key) +: cols.filterNot(_ == key)
        .map(c => col(s"__win.$c").as(c)): _*)
  }
}
