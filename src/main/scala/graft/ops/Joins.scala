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

  /** Range (interval) join (q95) — beyond the reference, the other
    * half of SURVEY §2's "theta/range/as-of: declare only equi-join
    * parity" row: emit every (left, right) pair whose timestamps lie
    * within `toleranceMicros` of each other (inclusive both ends);
    * `joinType = "left_outer"` keeps unmatched left rows with null
    * right columns.
    *
    * NOT a theta join: Spark plans a bare inequality predicate as
    * BroadcastNestedLoopJoin — all pairs scanned, quadratic. This is the
    * standard time-binning rewrite: bucket each side by
    * floor(micros / tolerance), explode the RIGHT side to its three
    * adjacent bins, equi-join on the bin, then filter the exact band.
    * |Δt| <= tol implies the bins differ by at most 1, so no pair is
    * missed, and each pair meets in exactly ONE bin (the left side is
    * not exploded), so no dedup pass is needed. Cost at 100 TB: a 3x
    * replication of the smaller-projection side and one hash shuffle
    * keyed by time bin — candidate pairs are bounded by per-bin
    * occupancy (event density x tolerance), linear for constant density,
    * and a hot bin is an AQE-splittable skew key, not a driver problem.
    *
    * The floor division uses `(m - pmod(m, tol)) div tol` — exact floor
    * for negative epochs too, so pre-1970 timestamps bin uniformly.
    * Column names must be disjoint between the sides.
    *
    * Only `inner` and `left_outer` are supported: the right side is
    * exploded 3x before the join, so right_outer/full would surface each
    * unmatched right row once per bin copy (3 null-extended rows). Those
    * types need an unmatched-right dedup pass this operator does not do,
    * so they fail loudly instead of returning silently-wrong rows. */
  def rangeJoin(left: DataFrame, right: DataFrame, leftTs: String,
      rightTs: String, toleranceMicros: Long,
      joinType: String = "inner"): DataFrame = {
    require(toleranceMicros > 0, s"tolerance=$toleranceMicros")
    require(joinType == "inner" || joinType == "left_outer",
      s"rangeJoin supports inner/left_outer only, got $joinType " +
        "(right side is bin-exploded; right/full outer would emit " +
        "unmatched right rows once per bin copy)")
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    require(lCols.intersect(rCols).isEmpty,
      s"range: overlapping columns ${lCols.intersect(rCols)}")
    // `div` (integral) on the pmod-floored numerator: exact at any
    // epoch magnitude, unlike `/` which widens longs to double.
    // The inner cast makes the operator NTZ-tolerant: unix_micros only
    // accepts TIMESTAMP, and parquet timestamp[us] without
    // isAdjustedToUTC arrives as TIMESTAMP_NTZ. Under the UTC session
    // tz every graft session pins, the cast is a lossless re-label (and
    // a no-op for columns already TIMESTAMP).
    def micros(ts: String): String = s"unix_micros(cast($ts as timestamp))"
    def floorBin(ts: String): Column = expr(
      s"(${micros(ts)} - pmod(${micros(ts)}, ${toleranceMicros}L))" +
      s" div ${toleranceMicros}L")
    val l = left.withColumn("__bin", floorBin(leftTs))
    val r = right.withColumn("__rbin", floorBin(rightTs))
      .withColumn("__bin", explode(array(col("__rbin") - 1,
        col("__rbin"), col("__rbin") + 1)))
      .drop("__rbin")
    val band = abs(expr(micros(leftTs)) - expr(micros(rightTs))) <=
      toleranceMicros
    l.join(r, l("__bin") === r("__bin") && band, joinType)
      .select((lCols ++ rCols).map(col): _*)
  }

  /** As-of join (q94) — beyond the reference (SURVEY §2 declares only
    * equi-join parity): for every left row, attach the latest right row
    * with the same `key` and `rightTs <= leftTs` (inclusive, DuckDB
    * `ASOF JOIN` semantics); unmatched left rows keep null payload
    * (left-outer).
    *
    * NOT a range join: a range/theta join materializes every (l, r)
    * pair inside the time band before picking the max — quadratic in
    * dense keys. This is the scalable union-tag shape: tag both sides,
    * union, ONE hash shuffle by key, sort by (ts, side), and a running
    * `last(payload, ignoreNulls)` window fills each left row from the
    * nearest preceding right row. Cost at 100 TB: one exchange of
    * (key, ts, payload), one sort — the same bill as any keyed window,
    * no pair explosion, AQE-skew-splittable.
    *
    * Right rows sort BEFORE left rows at equal ts (`side` 0 vs 1), so
    * an exactly-simultaneous right row matches (>= not >). Right rows
    * that tie on (key, ts) resolve to the MAX payload struct — the
    * trailing sort on `__pay` is content-based like [[overrideJoin]],
    * not partition-order (DuckDB ASOF leaves the tie pick unspecified;
    * OpsSpec pins ours). Right rows with a null `rightTs` are dropped
    * before the union: a null `__ts` sorts first under nulls-first
    * ascending and would otherwise become a universal fallback match
    * for every left row, where ASOF semantics never match them. Column
    * names must be disjoint between the sides (pre-rename the right
    * side). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lCols = left.columns.filterNot(_ == key).toSeq
    val rCols = right.columns.filterNot(_ == key).toSeq
    require(lCols.intersect(rCols).isEmpty,
      s"as-of: overlapping columns ${lCols.intersect(rCols)}")
    val payload = struct(rCols.map(col): _*)
    val payType = right.select(payload).schema.head.dataType
    val lTagged = left.select(
      Seq(col(key), col(leftTs).as("__ts"), lit(1).as("__side")) ++
        lCols.map(col) ++
        Seq(lit(null).cast(payType).as("__pay")): _*)
    val rTagged = right.filter(col(rightTs).isNotNull).select(
      Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(payload.as("__pay")): _*)
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key)) ++ lCols.map(col) ++
        rCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
