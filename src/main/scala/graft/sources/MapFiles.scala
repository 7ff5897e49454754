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
    clearStaleLocation(spark, table)
    df.write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#" + keyCol, "true")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)
  }

  /** Point-probe queries only prune buckets when the scan stays bucketed:
    * Spark's DisableUnnecessaryBucketedScan rule trades the bucketed
    * layout for plain codegen scans when it sees no join/agg downstream —
    * which also silently discards bucket PRUNING. For MapFile-style point
    * reads the layout IS the index, so lookups plan against a dedicated
    * child session (shared SparkContext + catalog, private SQLConf) with
    * the auto rule off. The caller's session conf is never touched — a
    * set-and-restore there cannot work because lazily-executed frames
    * read the execution-time conf, and a permanent set would silently
    * de-optimize unrelated bucketed scans session-wide. */
  private val lookupSessions =
    new java.util.WeakHashMap[SparkSession, SparkSession]()

  private def lookupSession(spark: SparkSession): SparkSession =
    lookupSessions.synchronized {
      var s = lookupSessions.get(spark)
      if (s == null) {
        s = spark.newSession()
        s.conf.set(
          "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        lookupSessions.put(spark, s)
      }
      // permanent tables ride the shared external catalog; only the
      // database pointer needs mirroring
      if (s.catalog.currentDatabase != spark.catalog.currentDatabase)
        s.catalog.setCurrentDatabase(spark.catalog.currentDatabase)
      s
    }

  /** The child session's table frame, cache-refreshed: a rewrite through
    * the CALLER's session (write → DROP TABLE) invalidates only the
    * caller's relation cache — the child session would keep serving the
    * replaced table's stale file listing (FAILED_READ_FILE on the next
    * probe). One refresh per probe = one directory listing, noise next
    * to the read itself.
    *
    * Contract: `table` must be a CATALOG table (what [[write]] creates).
    * Session-scoped temp views are not visible from the child session —
    * they also lack the bucketed layout this whole lookup path exists
    * to exploit. */
  private def lookupTable(spark: SparkSession, table: String): DataFrame = {
    val s = lookupSession(spark)
    s.catalog.refreshTable(table)
    s.table(table)
  }

  /** A write-generation id no prior (possibly crashed) attempt can
    * have used — the retry-safety primitive of the persisted-index
    * maintenance protocol (BM25 `appendBm25Index`, ADC
    * `appendIvfAdcIndex`): a failed append's orphan rows stay
    * invisible forever because the retry commits under a FRESH id (a
    * deterministic sequence would re-collide with the orphan and
    * double-count the batch once committed). The value never reaches
    * any result — probes only test membership in the committed set —
    * so it carries no determinism exposure. Never 0, the build
    * generation. */
  def freshGen(): Long = math.abs(System.nanoTime()) | 1L

  /** An in-memory catalog restarts empty while its warehouse directory
    * survives on disk; creating a table at that name then refuses the
    * stale location (LOCATION_ALREADY_EXISTS). Clear the orphan dir —
    * only when the CATALOG doesn't know the table (a known table's dir
    * is live data). Resolve the database's real location from the
    * catalog (honors CREATE DATABASE ... LOCATION) rather than
    * deriving it from the warehouse conf. Used by [[write]] and by
    * create-on-first-append side tables (index tombstones). */
  def clearStaleLocation(spark: SparkSession, table: String): Unit = {
    if (spark.catalog.tableExists(table)) return
    val db = spark.catalog.currentDatabase
    val parent = new org.apache.hadoop.fs.Path(
      new java.net.URI(spark.catalog.getDatabase(db).locationUri))
    val loc = new org.apache.hadoop.fs.Path(parent, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** The table read through the bucketed-scan-preserving child session:
    * the scan keeps one partition per bucket even with no join
    * downstream (the auto rule would otherwise trade the layout for
    * plain splits). This is what lets a bucket-aligned REWRITE — index
    * compaction — stream bucket i straight into file i with ZERO
    * shuffle: the scan's hash partitioning already satisfies the
    * bucketed sink's distribution, so the rewrite plans exchange-free
    * and lands exactly one file per bucket. */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    lookupTable(spark, table)

  /** Point lookup — `MapFileOutputFormat.getEntry`: all rows for `key`,
    * read from exactly one bucket with the predicate pushed to the scan. */
  def getEntry(spark: SparkSession, table: String, keyCol: String,
      key: Any): DataFrame =
    lookupTable(spark, table).filter(col(keyCol) === lit(key))

  /** Batched point lookups (IN-list) — still bucket-pruned: only the
    * buckets holding any of the probed keys are read. */
  def getEntries(spark: SparkSession, table: String, keyCol: String,
      keys: Seq[Any]): DataFrame =
    lookupTable(spark, table).filter(col(keyCol).isin(keys: _*))

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
    * append position. The index derives from the frame's current row
    * order (the ArrayFile contract IS append order; fix the order
    * upstream with sort/coalesce if it must be stable), then the rows are
    * persisted in the MapFile layout keyed by `idx`.
    *
    * Kept fully in Catalyst: `monotonically_increasing_id` encodes
    * (partition << 33 | position-within-partition); one tiny job collects
    * the per-partition row counts (O(num partitions), the same extra pass
    * zipWithIndex would make) and the global index is then pure offset
    * arithmetic — idx = cumulative_offset[p] + within-partition position
    * — so the write plan stays native (codegen + AQE), no RDD round-trip.
    * Like zipWithIndex, the source is evaluated twice; both passes see
    * the same order for deterministic inputs. */
  def writeArray(df: DataFrame, buckets: Int, table: String): Unit = {
    val mid = "_mapfile_mid"
    val withMid = df.withColumn(mid, monotonically_increasing_id())
    val counts = withMid
      .groupBy(shiftright(col(mid), 33).as("p"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    if (counts.isEmpty) {
      write(df.withColumn("idx", lit(0L)).select(
        col("idx") +: df.columns.map(col): _*), "idx", buckets, table)
      return
    }
    // idx = cum[p] + (mid - (p << 33)); fold the partition-base term into
    // the per-partition constant so the row expression is one map lookup
    // plus one add
    var cum = 0L
    val adjusted = counts.map { case (p, c) =>
      val base = cum - (p << 33); cum += c; (p, base)
    }.toMap
    val indexed = withMid
      .withColumn("idx",
        element_at(typedLit(adjusted), shiftright(col(mid), 33)) + col(mid))
      .select(col("idx") +: df.columns.map(col): _*)
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
