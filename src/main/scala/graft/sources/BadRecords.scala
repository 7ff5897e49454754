package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Poison-record skipping — the reference's SkipBadRecords machinery
  * (mapred/SkipBadRecords.java, wired at mapred/MapTask.java:360-363):
  * records that crash the user map function are blacklisted and skipped
  * on retry, trading completeness for progress.
  *
  * Spark-native: malformed input is a PARSER-level concern, not a
  * task-retry concern — `DROPMALFORMED` mode drops records that fail to
  * parse (wrong arity, unparseable types) in one pass, with no retry
  * loop. The same knob family covers the reference's other failure modes:
  * `spark.sql.files.ignoreCorruptFiles` for unreadable files, PERMISSIVE +
  * columnNameOfCorruptRecord to quarantine instead of drop.
  */
object BadRecords {

  /** Write `df` as CSV lines, replacing rows matching `poisonWhen` with a
    * deliberately malformed line. The poison keeps the column arity but
    * every field is unparseable garbage — an under-length line would just
    * be null-padded by the CSV reader, not flagged malformed; a type
    * failure is what marks the record bad.
    *
    * CAVEAT: fields are joined unquoted (concat_ws) — a string field
    * containing the separator or a newline would itself parse as
    * malformed downstream. Fine for the numeric/enum test columns this
    * harness feeds it; quote upstream (or use df.write.csv with quoting)
    * for free-text fields. */
  def writeWithPoison(df: DataFrame, poisonWhen: Column, path: String,
      numFiles: Int = 0): Unit = {
    val line = concat_ws(",", df.columns.map(col): _*)
    val poison = df.columns.map(_ => "@@CORRUPT@@").mkString(",")
    val lines = df.select(
      when(poisonWhen, lit(poison)).otherwise(line).as("value"))
    val sized = if (numFiles > 0) lines.repartition(numFiles) else lines
    sized.write.mode("overwrite").text(path)
  }

  /** Read CSV skipping malformed records (SkipBadRecords semantics).
    *
    * Deliberately NOT `csv(path)` + DROPMALFORMED: the csv datasource
    * decides malformedness during parsing, and both the count-star fast
    * path and parser column pruning skip parsing — so the set of dropped
    * rows would depend on the downstream projection (count(*) keeps
    * poison rows that collect() drops). The reference skips a bad record
    * for every consumer identically. Parsing with the `from_csv`
    * EXPRESSION over a text scan puts the malformed test into the query
    * plan itself — one deterministic row set for all consumers, still
    * distributed, still whole-stage-codegen. */
  def readSkippingBad(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val full = schema.add("_corrupt", "string")
    val parsed = spark.read.text(path).select(from_csv(col("value"),
      full, Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt")).as("r"))
    parsed.filter(col("r._corrupt").isNull)
      .select(schema.fieldNames.map(f => col(s"r.$f").as(f)).toSeq: _*)
  }
}
