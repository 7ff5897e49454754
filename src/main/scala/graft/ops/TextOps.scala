package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Map-side text transforms: the reference's `TokenCountMapper`
  * (mapred/lib/TokenCountMapper.java:38), `RegexMapper`
  * (mapred/lib/RegexMapper.java:35) and the two-stage `Grep` example
  * (examples/Grep.java:48-82), re-expressed as single declarative plans.
  * Where the reference runs two chained MapReduce jobs through a temp
  * directory, Catalyst fuses extract→count→sort into one 2-stage DAG with a
  * map-side partial aggregate (the reference's combiner) for free.
  */
object TextOps {

  /** `(token, 1)` tokenization + count — WordCount (examples/WordCount.java:17). */
  def tokenCount(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(text, "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** All matches of `pattern` (group `group`) counted — RegexMapper. */
  def regexExtractCount(df: DataFrame, text: Column, pattern: String,
                        group: Int = 0): DataFrame =
    df.select(explode(
        regexp_extract_all(text, lit(pattern), lit(group))).as("match"))
      .groupBy("match").agg(count(lit(1)).as("cnt"))

  /** Full Grep: extract-count then sort descending by count
    * (job 2's `LongWritable.DecreasingComparator`, examples/Grep.java:71-82),
    * with a deterministic tiebreak on the matched text. */
  def grep(df: DataFrame, text: Column, pattern: String, group: Int = 0,
           topK: Option[Int] = None): DataFrame = {
    val counted = regexExtractCount(df, text, pattern, group)
      .orderBy(col("cnt").desc, col("match").asc)
    topK.fold(counted)(counted.limit)
  }
}
