package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MapFile — the reference's sorted, indexed K/V store and its partitioned
  * point lookup (io/MapFile.java; `MapFileOutputFormat.getEntry`,
  * mapred/MapFileOutputFormat.java:39,96-115: hash the key to pick the
  * partition's MapFile, then binary-search its index).
  *
  * Spark-native layout: a bucketed, per-bucket-sorted parquet table
  * (`bucketBy(n, key).sortBy(key)`) is the same physical contract —
  * hash-partitioned files, keys sorted inside each, with parquet
  * row-group min/max + optional bloom filters playing the MapFile index.
  *
  * [[getEntry]] is the reference lookup re-expressed as pruning: the
  * bucketed-scan rule keeps ONLY the key's bucket (1 of n file groups —
  * `getEntry`'s `partitioner.getPartition` step), and the pushed `key = k`
  * predicate lets parquet skip row groups by min/max stats (the index
  * seek). At 100 TB a point probe touches one bucket's files and, within
  * them, only the row groups whose range covers the key — no job-wide
  * scan, no shuffle. */
object MapFiles {

  /** Persist the MapFile layout: `buckets` hash buckets, each sorted by
    * `keyCol` (MapFileOutputFormat.getRecordWriter's sorted writer). */
  def write(df: DataFrame, keyCol: String, buckets: Int,
      table: String): Unit = {
    require(!table.contains("."),
      "MapFiles tables are unqualified names in the current database " +
      s"(got '$table')")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // an in-memory catalog restarts empty while its warehouse directory
    // survives on disk; saveAsTable then refuses the stale location
    // (LOCATION_ALREADY_EXISTS) — clear it before writing. Managed tables
    // live at <warehouse>/<table> in default, <warehouse>/<db>.db/<table>
    // elsewhere.
    val db = spark.catalog.currentDatabase
    val dbDir = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val parent = if (db == "default") dbDir
      else new org.apache.hadoop.fs.Path(dbDir, s"${db.toLowerCase}.db")
    val loc = new org.apache.hadoop.fs.Path(parent, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#" + keyCol, "true")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)
  }

  /** Point-probe queries only prune buckets when the scan stays bucketed:
    * Spark's DisableUnnecessaryBucketedScan rule trades the bucketed
    * layout for plain codegen scans when it sees no join/agg downstream —
    * which also silently discards bucket PRUNING. For MapFile-style point
    * reads the layout IS the index, so lookups pin the auto rule off for
    * the session (lazily-executed frames see the execution-time conf, so
    * a set-and-restore around construction would not stick). */
  private def pinBucketedScan(spark: SparkSession): Unit =
    spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")

  /** Point lookup — `MapFileOutputFormat.getEntry`: all rows for `key`,
    * read from exactly one bucket with the predicate pushed to the scan. */
  def getEntry(spark: SparkSession, table: String, keyCol: String,
      key: Any): DataFrame = {
    pinBucketedScan(spark)
    spark.table(table).filter(col(keyCol) === lit(key))
  }

  /** Batched point lookups (IN-list) — still bucket-pruned: only the
    * buckets holding any of the probed keys are read. */
  def getEntries(spark: SparkSession, table: String, keyCol: String,
      keys: Seq[Any]): DataFrame = {
    pinBucketedScan(spark)
    spark.table(table).filter(col(keyCol).isin(keys: _*))
  }

  /** SetFile (io/SetFile.java:27) — a MapFile holding keys only. The
    * layout is the distinct sorted key set; [[containsKey]] is the
    * membership probe, bucket-pruned like [[getEntry]]. */
  def writeSet(df: DataFrame, keyCol: String, buckets: Int,
      table: String): Unit =
    write(df.select(keyCol).distinct(), keyCol, buckets, table)

  /** SetFile membership probe — reads one bucket, and inside it the
    * bloom filter + min/max stats answer most negatives from metadata. */
  def containsKey(spark: SparkSession, table: String, keyCol: String,
      key: Any): Boolean =
    !getEntry(spark, table, keyCol, key).isEmpty

  /** ArrayFile (io/ArrayFile.java:29) — values addressed by their long
    * append position. The index is assigned by zipWithIndex over the
    * frame's current row order (the ArrayFile contract IS append order;
    * fix the order upstream with sort/coalesce if it must be stable),
    * then persisted in the MapFile layout keyed by `idx`. */
  def writeArray(df: DataFrame, buckets: Int, table: String): Unit = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("idx",
        org.apache.spark.sql.types.LongType, nullable = false)
        +: df.schema.fields)
    val indexed = spark.createDataFrame(
      df.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(i +: r.toSeq) },
      schema)
    write(indexed, "idx", buckets, table)
  }

  /** ArrayFile.get(n): the n-th appended row (bucket-pruned point read). */
  def getNth(spark: SparkSession, table: String, n: Long): DataFrame =
    getEntry(spark, table, "idx", n)

  /** The smallest row with key >= `key` — MapFile.Reader.getClosest
    * (io/MapFile.java, the seek primitive getEntry is built on). A range
    * probe cannot bucket-prune (hash buckets scatter the order), but the
    * pushed >= predicate skips row groups by min/max stats and the plan
    * is a TakeOrderedAndProject — per-partition top-1, no global sort. */
  def getClosest(spark: SparkSession, table: String, keyCol: String,
      key: Any): DataFrame =
    spark.table(table).filter(col(keyCol) >= lit(key))
      .orderBy(col(keyCol)).limit(1)
}
