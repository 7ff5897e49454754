package graft.sources

import org.apache.hadoop.io.Text
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hadoop SequenceFile interop — the reference's workhorse binary K/V
  * container (io/SequenceFile.java:186, read/written by
  * SequenceFileInputFormat / SequenceFileOutputFormat,
  * mapred/SequenceFileInputFormat.java:36).
  *
  * Parquet is this engine's canonical binary format (columnar, pruned,
  * statistics) — but a migrating user's existing data IS SequenceFiles,
  * so the engine reads and writes the real container through Spark's
  * Hadoop-format RDD bridge, converting at the edge to a (key, value)
  * DataFrame. Text K/V here (the dominant reference usage); the same
  * bridge pattern extends to any Writable pair.
  *
  * Scale: SequenceFiles are block-compressed with sync markers, so they
  * split — a 100 TB directory parallelizes per-block like the reference's
  * FileInputFormat.getSplits. Migration recipe: read once, write parquet,
  * query columnar thereafter.
  */
object SequenceFiles {

  private def codecClass(name: String) = name match {
    case "none"    => None
    case "deflate" => Some(classOf[org.apache.hadoop.io.compress.DefaultCodec])
    case "gzip"    => Some(classOf[org.apache.hadoop.io.compress.GzipCodec])
    case "bzip2"   => Some(classOf[org.apache.hadoop.io.compress.BZip2Codec])
    case other => throw new IllegalArgumentException(
      s"unknown SequenceFile codec '$other' (none|deflate|gzip|bzip2)")
  }

  /** Write (key string, value string) rows as a Text/Text SequenceFile.
    * Overwrite semantics (the RDD save API has none of its own).
    *
    * `codec` + `compressionType` mirror the reference's
    * SequenceFileOutputFormat.setOutputCompressorClass /
    * setOutputCompressionType (mapred/SequenceFileOutputFormat.java:41,
    * 58-77): BLOCK compresses runs of records together (the
    * splittable-and-dense default — sync markers between blocks keep a
    * 100 TB directory splittable), RECORD compresses each value alone.
    * The read side is codec-transparent, like the reference's reader. */
  def write(df: DataFrame, keyCol: String, valueCol: String,
      path: String, codec: String = "none",
      compressionType: String = "BLOCK"): Unit = {
    val sc = df.sparkSession.sparkContext
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val rdd = df.select(keyCol, valueCol).rdd
      .map(r => (new Text(r.getString(0)), new Text(r.getString(1))))
    codecClass(codec) match {
      case None => rdd.saveAsSequenceFile(path)
      case Some(c) =>
        require(compressionType == "BLOCK" || compressionType == "RECORD",
          s"compressionType must be BLOCK or RECORD, got $compressionType")
        val conf = new org.apache.hadoop.mapred.JobConf(sc.hadoopConfiguration)
        conf.set("mapreduce.output.fileoutputformat.compress", "true")
        conf.set("mapreduce.output.fileoutputformat.compress.codec", c.getName)
        conf.set("mapreduce.output.fileoutputformat.compress.type",
          compressionType)
        rdd.saveAsHadoopFile(path, classOf[Text], classOf[Text],
          classOf[org.apache.hadoop.mapred.SequenceFileOutputFormat[Text, Text]],
          conf)
    }
  }

  /** Read a Text/Text SequenceFile directory as a (key, value) frame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[Text], classOf[Text])
      .map { case (k, v) => (k.toString, v.toString) }
      .toDF("key", "value")
  }

  /** The RAW-BYTES K/V view — `SequenceFileAsBinaryOutputFormat`
    * (mapred/SequenceFileAsBinaryOutputFormat.java:42): write arbitrary
    * `binary` columns as a BytesWritable/BytesWritable SequenceFile,
    * byte-for-byte, no charset in the path. The typed [[write]] covers
    * the reference's dominant Text usage; this covers its opaque-payload
    * one (serialized records, media blobs — the [[graft.pipeline.Multimodal]]
    * columns' container when parquet isn't an option). */
  def writeBinary(df: DataFrame, keyCol: String, valueCol: String,
      path: String): Unit = {
    import org.apache.hadoop.io.BytesWritable
    val sc = df.sparkSession.sparkContext
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    df.select(keyCol, valueCol).rdd
      .map(r => (new BytesWritable(r.getAs[Array[Byte]](0)),
        new BytesWritable(r.getAs[Array[Byte]](1))))
      .saveAsSequenceFile(path)
  }

  /** `SequenceFileAsBinaryInputFormat`
    * (mapred/SequenceFileAsBinaryInputFormat.java:38): read any
    * SequenceFile's K/V pairs back as raw bytes — (key binary,
    * value binary). `copyBytes`, not `getBytes`: the record reader
    * REUSES the BytesWritable instances and pads the backing buffer, so
    * the raw reference would alias the last record's (oversized)
    * buffer across the whole partition. */
  def readBinary(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.io.BytesWritable
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[BytesWritable], classOf[BytesWritable])
      .map { case (k, v) => (k.copyBytes(), v.copyBytes()) }
      .toDF("key", "value")
  }
}
