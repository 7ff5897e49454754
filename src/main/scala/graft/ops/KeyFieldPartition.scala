package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KeyFieldBasedPartitioner (mapred/lib/KeyFieldBasedPartitioner.java:43,
  * 53-56,96-102): route records to reducers by a hash of SELECTED FIELDS
  * of a delimited text key, so that e.g. `-k1,2` co-locates all records
  * sharing their first two fields regardless of the rest of the key.
  *
  * Spark-native: `repartition(n, expr)` over the same field projection —
  * the hash partitioning is Catalyst's, the field selection reuses the
  * `sort -k` field grammar from [[KeyFieldSort]]. Co-location is the
  * point: a later `groupBy`/window over the same fields reuses the
  * partitioning without another shuffle (Exchange reuse), which is the
  * reference's reason for partitioning by a key PREFIX while sorting by
  * the full key (secondary sort).
  */
object KeyFieldPartition {

  /** The concatenated selected fields (1-based from..to, inclusive) of a
    * delimited line — the byte range KeyFieldBasedPartitioner hashes. */
  def fieldKey(line: Column, fromField: Int, toField: Int,
      sep: String = "\t"): Column = {
    val parts = split(line, java.util.regex.Pattern.quote(sep))
    // get() is null-safe where parts(i) under ANSI mode (Spark 4 default)
    // throws INVALID_ARRAY_INDEX on short lines; concat_ws skips nulls,
    // matching the reference partitioner's tolerance of short keys
    concat_ws(sep, (fromField to toField).map(i => get(parts, lit(i - 1))): _*)
  }

  /** Repartition so rows sharing fields [fromField, toField] co-locate. */
  def partitionByFields(df: DataFrame, line: Column, fromField: Int,
      toField: Int, numPartitions: Int, sep: String = "\t"): DataFrame =
    df.repartition(numPartitions, fieldKey(line, fromField, toField, sep))
}
