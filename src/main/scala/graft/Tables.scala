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
  /** documents/embeddings normalization — the r10 lesson (the driver
    * regenerated events.parquet with a new physical type and every
    * event-time operator went red) applied to the other two pipeline
    * tables BEFORE it happens: ids arrive as whatever integer width the
    * writer chose (int32 today would be a legal regeneration), and the
    * embedding column could ship float64. Downstream contracts are
    * LongType ids and array<float> vectors (the native VectorOps
    * kernels' input type), so both loaders pin them here. All casts are
    * no-ops on the current testdata; on a drifted regeneration they keep
    * the tier running instead of analysis-erroring 60 queries at once
    * (float64 -> float32 costs ~1e-7 relative, inside the driver's 1e-6
    * float tolerance). */
  def documents(spark: SparkSession, dir: String): DataFrame =
    normalizeDocuments(apply(spark, dir, "documents"))

  def normalizeDocuments(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (raw.schema("doc_id").dataType ==
        org.apache.spark.sql.types.LongType) raw
    else raw.withColumn("doc_id", col("doc_id").cast("long"))
  }

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    normalizeEmbeddings(apply(spark, dir, "embeddings"))

  def normalizeEmbeddings(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
    val idFixed =
      if (raw.schema("vec_id").dataType == LongType) raw
      else raw.withColumn("vec_id", col("vec_id").cast("long"))
    idFixed.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => idFixed
      case _ => idFixed.withColumn("embedding",
        col("embedding").cast(ArrayType(FloatType)))
    }
  }

  /** Streaming twin of the batch loaders: same file, same normalization.
    *
    * A file stream needs an explicit schema, and it must be the file's
    * PHYSICAL schema — passing the batch loaders' post-cast schema
    * (e.g. long ids over an int32 file) makes Spark's vectorized parquet
    * reader throw on the type mismatch instead of converting, so a
    * driver-side testdata regeneration would break every streaming twin
    * while its batch tier survives. Read the physical schema from a
    * (metadata-only) batch read, then apply the SAME defensive casts to
    * the streamed frame, so stream and batch share one normalization
    * path and drift in either is caught by the other's gates. */
  def streamOf(spark: SparkSession, dir: String, name: String)
      : DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical = spark.read.parquet(s"$dir/$name.parquet").schema
    // layout-robust listing (r18): the testdata tables are single
    // FILES named `<name>.parquet`, which the glob filter over `dir`
    // matches; a GENERATED corpus (GrowthBench, Sf1Gen) writes each
    // table as a DIRECTORY of part files whose names the glob can
    // never match — the stream silently read ZERO rows there (found
    // by qf4's negative-count guard at sf1: the stream-appended half
    // of the counter build was empty, so the retraction went
    // negative). A directory streams by its own path; a file keeps
    // the glob form (the streaming source rejects a bare file path).
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val isDir = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).isDirectory
    val raw =
      if (isDir) spark.readStream.schema(physical).parquet(p.toString)
      else spark.readStream.schema(physical)
        .option("pathGlobFilter", s"$name.parquet").parquet(dir)
    name match {
      case "documents"  => normalizeDocuments(raw)
      case "embeddings" => normalizeEmbeddings(raw)
      case "events"     => normalizeEventTs(raw)
      case _            => raw
    }
  }
}
