package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tag-delimited record text — the reference's StreamXmlRecordReader
  * (contrib/streaming/.../StreamXmlRecordReader.java:46): records are the
  * byte ranges between a begin tag and an end tag, independent of line
  * boundaries.
  *
  * Spark-native: `spark.read.option("lineSep", "</tag>")` makes the END
  * TAG the record delimiter — the scan stays splittable and streaming
  * (Hadoop's own reader scans for the same tag boundaries), and each
  * resulting chunk holds exactly one record's fields, extracted with
  * dotall regexes. Field values must not contain the end tag (same
  * restriction as the reference's tag scan).
  */
object XmlRecords {

  /** Write one multi-line `<tag>...</tag>` element per row. NULL fields
    * are written as empty elements (a null would null the whole concat and
    * concat_ws would silently drop the element) — so nulls round-trip as
    * empty strings, the reference's Text-based behavior. */
  def writeXml(df: DataFrame, tag: String, fields: Seq[String],
      path: String, numFiles: Int = 0): Unit = {
    val body = fields.map(f =>
      concat(lit(s"  <$f>"),
        coalesce(col(f).cast("string"), lit("")), lit(s"</$f>")))
    val lines = df.select(
      concat_ws("\n", lit(s"<$tag>") +: body :+ lit(s"</$tag>"): _*)
        .as("value"))
    val sized = if (numFiles > 0) lines.repartition(numFiles) else lines
    sized.write.mode("overwrite").text(path)
  }

  /** Read records back: split the stream at `</tag>`, keep chunks that
    * contain a begin tag, extract each field with a dotall regex. All
    * fields come back as strings (schema-on-read, like the reference). */
  def readXml(spark: SparkSession, path: String, tag: String,
      fields: Seq[String]): DataFrame = {
    val recs = spark.read.option("lineSep", s"</$tag>").text(path)
      .filter(col("value").contains(s"<$tag>"))
    recs.select(fields.map(f =>
      regexp_extract(col("value"), s"(?s)<$f>(.*?)</$f>", 1).as(f)): _*)
  }
}
