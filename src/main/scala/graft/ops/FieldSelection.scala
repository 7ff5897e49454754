package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unix-`cut`-style field selection over a separator-delimited string
  * column — the Spark-native re-expression of the reference's
  * `FieldSelectionMapReduce` (hadoop-gpu-0.20.1/src/mapred/org/apache/hadoop/
  * mapred/lib/FieldSelectionMapReduce.java:37-53).
  *
  * Spec grammar (same shape as the reference doc block): a comma-separated
  * list of field specs, each one of
  *   - `N`    — field N
  *   - `N-M`  — fields N..M inclusive
  *   - `N-`   — field N through the last field
  *   - `-M`   — first field through field M
  *
  * DELIBERATE DEVIATION from the reference: field numbers here are 1-based
  * (unix `cut` convention, and Spark's own `element_at`/`slice` convention),
  * while `FieldSelectionMapReduce` is 0-based (its `"-3"` means fields
  * 0..3). Callers translating reference specs must add 1 to each index.
  * An empty range start (`-M`) defaults to the first field, matching the
  * reference's empty-start handling (FieldSelectionMapReduce.java:202-208).
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
      if (s.endsWith("-")) {
        val start = s.dropRight(1)
        OpenRange(if (start.isEmpty) 1 else start.toInt)
      } else if (s.contains("-")) {
        val Array(a, b) = s.split("-", 2)
        Range(if (a.isEmpty) 1 else a.toInt, b.toInt)
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
