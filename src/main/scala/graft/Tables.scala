package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). All queries take the sf directory as a
  * parameter so the same plan runs at any scale factor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    // events needs the nanos-timestamp workaround; never read it raw
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  /** events.ts has shipped in two non-TIMESTAMP flavors, both normalized
    * here so every event-time operator downstream (watermarks, windows,
    * range/as-of joins) sees a plain TIMESTAMP:
    *  - parquet TIMESTAMP(NANOS), which Spark 4 rejects by default: read
    *    nanos as long (legacy conf) and convert; the corpus is
    *    microsecond-granular (verified epoch_ns % 1000 = 0 corpus-wide)
    *    so `div 1000` is lossless.
    *  - parquet timestamp[us] without isAdjustedToUTC, which Spark reads
    *    as TIMESTAMP_NTZ: cast to TIMESTAMP. All graft sessions pin
    *    spark.sql.session.timeZone=UTC, so the cast re-labels the same
    *    micros value (no wall-clock shift) and matches what a DuckDB
    *    oracle reads from the identical file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** ts-flavor normalization shared by the batch loader above and the
    * streaming file source ([[graft.streaming.EventStreams.readEventStream]]). */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
