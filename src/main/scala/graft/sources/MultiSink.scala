package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Several named outputs from one job — the reference's MultipleOutputs
  * (mapred/lib/MultipleOutputs.java:116,283): a single map/reduce pass
  * feeds N independently-formatted named outputs.
  *
  * Spark-native: cache the shared input once, derive and write each named
  * sink from the cached data, then release. The scan and any shared
  * upstream work run once (the cache materializes on the first write);
  * each sink only pays its own derivation — the same economics as the
  * reference's single-pass multi-collector. (Dynamic key-derived paths —
  * MultipleOutputFormat — are `partitionBy`, covered separately.)
  */
object MultiSink {

  /** Write each (derive, path) sink from one cached pass over `df`. */
  def writeNamed(df: DataFrame,
      sinks: Seq[(DataFrame => DataFrame, String)]): Unit = {
    val cached = df.cache()
    try sinks.foreach { case (derive, path) =>
      derive(cached).write.mode("overwrite").parquet(path)
    } finally cached.unpersist(false)
  }

  /** Free-form, row-derived output FILE names —
    * `MultipleTextOutputFormat.generateFileNameForKeyValue`
    * (mapred/lib/MultipleOutputFormat.java:51,118: the writer keys a
    * record to an arbitrary file name computed from (key, value)).
    *
    * Spark-native: the name expression is just a column; `partitionBy`
    * routes rows to per-name directories in ONE distributed pass (the
    * task-parallel part), then a driver-side commit pass renames each
    * committed leaf to the bare generated name — `<dir>/<name>` for a
    * single part, `<dir>/<name>-NNNNN` for multi-part names (the
    * reference's writer appends nothing because one reducer owns one
    * file; multi-part names come from multi-task names there too).
    * The rename pass is O(distinct names) driver FS calls — the same
    * cardinality bound the reference hits with one open RecordWriter
    * per name (MultipleOutputFormat.java:104-126 caches them).
    *
    * Rows are written as text lines from `lineCol`. With `onePerName`
    * (default), rows are first repartitioned on the name so each name
    * commits exactly ONE file — the reference's one-RecordWriter-per-name
    * layout; pass false to keep the upstream partitioning (one part per
    * task per name, suffixed -NNNNN), the choice a 100 TB writer makes
    * when single name groups exceed one task's output. */
  def writeNamedByRow(df: DataFrame, nameCol: org.apache.spark.sql.Column,
      lineCol: org.apache.spark.sql.Column, dir: String,
      onePerName: Boolean = true): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = df.sparkSession
    val staging = new Path(dir, "_staging")
    val named = df.select(nameCol.as("_name"),
      lineCol.cast("string").as("value"))
    (if (onePerName) named.repartition(col("_name")) else named)
      .write.mode("overwrite").partitionBy("_name").text(staging.toString)
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // commit renames go through the RAW filesystem: the local checksum
    // wrapper builds its .crc sidecar path with the colon-parsing Path
    // child-constructor (the bug worked around below) and fails on names
    // containing ':'; committed outputs don't need local crc sidecars
    val rawFs = fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    val out = new Path(dir)
    fs.listStatus(staging).filter(_.isDirectory).foreach { d =>
      // invert Hive partition-path escaping exactly (%XX sequences only —
      // URLDecoder would additionally rewrite a literal '+' to a space)
      val name = unescapePathName(d.getPath.getName.stripPrefix("_name="))
      val parts = fs.listStatus(d.getPath)
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        // mergePaths, not new Path(parent, name): the child-constructor
        // URI-parses the name, so a ':' in it reads as a scheme and throws
        val target = Path.mergePaths(out,
          new Path(if (parts.length == 1) s"/$name" else f"/$name-$i%05d"))
        // names may contain '/' (the reference's generateFileNameFor-
        // KeyValue returns relative paths) — materialize the parent
        if (target.getParent != null) rawFs.mkdirs(target.getParent)
        if (rawFs.exists(target)) rawFs.delete(target, false)
        // a silent rename failure would drop every row of this name when
        // staging is deleted below — fail the job loudly instead
        if (!rawFs.rename(f.getPath, target))
          throw new java.io.IOException(
            s"rename ${f.getPath} -> $target failed; staging preserved")
      }
    }
    fs.delete(staging, true)
  }

  /** Inverse of Hive's escapePathName: decode %XX escapes, pass every
    * other character (including '+') through untouched. */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        sb.append((Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16)).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
