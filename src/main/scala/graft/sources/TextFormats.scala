package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Line-oriented text source/sink — the reference's `TextInputFormat` /
  * `LineRecordReader` (mapred/TextInputFormat.java:35, gzip-aware),
  * `KeyValueTextInputFormat` (line split at the first separator,
  * mapred/KeyValueTextInputFormat.java:34) and `TextOutputFormat`
  * ("key<sep>value" lines, mapred/TextOutputFormat.java:40).
  *
  * `spark.read.text` gives the LineRecordReader semantics (splittable
  * plain text, whole-file for gzip); the first-separator split is
  * `split(value, sep, 2)` — a limit-2 split exactly matching
  * KeyValueLineRecordReader's findSeparator behavior.
  */
object TextFormats {

  /** TextOutputFormat: write "key<sep>value" lines; codec optional
    * (gzip/bzip2 readable back for free, like the reference's
    * gzip-aware LineRecordReader).
    *
    * `numFiles > 0` repartitions before the write. This matters for
    * compressed text: gzip files are UNSPLITTABLE on read (one task per
    * file, exactly the reference's isSplitable=false for codec'd inputs,
    * mapred/TextInputFormat.java:45-49), so a single-partition upstream —
    * e.g. one small parquet file — would serialize the whole write AND
    * every downstream read. One file per available core keeps both sides
    * parallel. bzip2 (io/compress/BZip2Codec.java) IS block-splittable on
    * read, so it tolerates fewer/larger files — at 100 TB prefer bzip2 or
    * a container format over gzip for anything re-read in parallel. */
  def writeKeyValueText(df: DataFrame, key: Column, value: Column,
      path: String, sep: String = "\t", compression: String = "none",
      numFiles: Int = 0): Unit = {
    val lines = df.select(concat_ws(sep, key, value).as("value"))
    val sized = if (numFiles > 0) lines.repartition(numFiles) else lines
    sized.write.mode("overwrite").option("compression", compression).text(path)
  }

  /** KeyValueTextInputFormat: (key, value) split at the FIRST separator. */
  def readKeyValueText(spark: SparkSession, path: String,
      sep: String = "\t"): DataFrame = {
    val parts = split(col("value"), java.util.regex.Pattern.quote(sep), 2)
    spark.read.text(path).select(
      parts.getItem(0).as("key"),
      // a line with no separator has a null value, like the reference's
      // empty-Text value fallback
      when(size(parts) > 1, parts.getItem(1)).as("value"))
  }
}
