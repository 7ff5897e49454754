package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unix-`cut`-style field selection over a separator-delimited string
  * column — the Spark-native re-expression of the reference's
  * `FieldSelectionMapReduce` (hadoop-gpu-0.20.1/src/mapred/org/apache/hadoop/
  * mapred/lib/FieldSelectionMapReduce.java:37-53).
  *
  * Spec grammar (same as the reference doc block): a comma-separated list of
  * field specs, each one of
  *   - `N`    — field N (1-based, as in `cut`)
  *   - `N-M`  — fields N..M inclusive
  *   - `N-`   — field N through the last field
  *
  * The whole selection is re-joined with the separator. Everything stays a
  * Catalyst expression (split / slice / concat_ws) so it runs inside
  * whole-stage codegen — no UDF, scales linearly at 100 TB.
  */
object FieldSelection {

  sealed trait Spec
  final case class Single(i: Int) extends Spec
  final case class Range(from: Int, to: Int) extends Spec
  final case class OpenRange(from: Int) extends Spec

  def parseSpec(spec: String): Seq[Spec] =
    spec.split(",").toSeq.filter(_.nonEmpty).map { s =>
      if (s.endsWith("-")) OpenRange(s.dropRight(1).toInt)
      else if (s.contains("-")) {
        val Array(a, b) = s.split("-", 2); Range(a.toInt, b.toInt)
      } else Single(s.toInt)
    }

  /** Select fields of `col` (split by `sep`) per `spec`, re-joined by `sep`. */
  def select(col: Column, spec: String, sep: String = "\t"): Column = {
    val fields = split(col, java.util.regex.Pattern.quote(sep))
    val parts: Seq[Column] = parseSpec(spec).map {
      case Single(i)    => slice(fields, lit(i), lit(1))
      case Range(f, t)  => slice(fields, lit(f), lit(math.max(0, t - f + 1)))
      // slice truncates when length overruns the array, so size() is a safe
      // "to the end" length.
      case OpenRange(f) => slice(fields, lit(f), size(fields))
    }
    val all = if (parts.size == 1) parts.head else concat(parts: _*)
    array_join(all, sep)
  }
}
