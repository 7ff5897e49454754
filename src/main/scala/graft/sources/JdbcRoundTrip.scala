package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink — the reference's `DBInputFormat` (SELECT with ORDER
  * BY + LIMIT/OFFSET splits, mapred/lib/db/DBInputFormat.java:49,87-115)
  * and `DBOutputFormat` (batched INSERTs, DBOutputFormat.java:44,109-115),
  * and the `DBCountPageView` example's JDBC-in → agg → JDBC-out shape
  * (examples/DBCountPageView.java:72,340,358).
  *
  * Spark-native: `df.write.jdbc` batches inserts per partition;
  * `spark.read.jdbc` with (partitionColumn, lowerBound, upperBound,
  * numPartitions) generates predicated range splits — the sane version of
  * DBInputFormat's LIMIT/OFFSET pagination (OFFSET splits re-scan the
  * prefix per split; predicate splits push a WHERE range instead, which
  * is what you want against a real warehouse at scale).
  *
  * Tests/queries use in-memory Derby (ships with Spark for the Hive
  * metastore) — one JVM in local mode, so every task thread sees the same
  * database; on a cluster the URL would point at a real DB server.
  */
object JdbcRoundTrip {

  def memUrl(dbName: String): String = s"jdbc:derby:memory:$dbName;create=true"

  def write(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("overwrite").jdbc(url, table, new java.util.Properties)

  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new java.util.Properties)

  /** Range-partitioned read — DBInputFormat's split concept. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partCol: String, lower: Long, upper: Long, n: Int): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, n,
      new java.util.Properties)
}
