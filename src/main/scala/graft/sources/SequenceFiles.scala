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

  /** Write (key string, value string) rows as a Text/Text SequenceFile.
    * Overwrite semantics (the RDD save API has none of its own). */
  def write(df: DataFrame, keyCol: String, valueCol: String,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    df.select(keyCol, valueCol).rdd
      .map(r => (new Text(r.getString(0)), new Text(r.getString(1))))
      .saveAsSequenceFile(path)
  }

  /** Read a Text/Text SequenceFile directory as a (key, value) frame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[Text], classOf[Text])
      .map { case (k, v) => (k.toString, v.toString) }
      .toDF("key", "value")
  }
}
