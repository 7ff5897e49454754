package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unix `sort -k` semantics over delimited text lines — Spark-native
  * re-expression of the reference's `KeyFieldBasedComparator` +
  * `KeyFieldHelper` (hadoop-gpu-0.20.1/src/mapred/org/apache/hadoop/mapred/
  * lib/KeyFieldBasedComparator.java:35-57, KeyFieldHelper.java).
  *
  * Supported option grammar (KeyFieldHelper.parseOption/parseKey,
  * exercised by the reference's TestKeyFieldHelper):
  *   [-n|-r|-nr] -kF[.C][opts][,T[.C2][opts]] ...
  * where F/T are 1-based field numbers, C/C2 1-based char offsets within
  * the field, and opts ⊆ {n (numeric), r (reverse)}. A char offset may
  * cross fields (`-k1.2,3.4` = char 2 of field 1 through char 4 of field
  * 3, separators included); C2 = 0 (or omitted) means the END of field T.
  * Global `-n`/`-r`/`-nr` flags apply to every spec that carries no opts
  * of its own (KeyFieldHelper.java:185-190). Multiple `-k` specs compose
  * left-to-right (primary, secondary, ...).
  *
  * Each spec compiles to a Catalyst sort expression over `split(line, sep)`
  * — fully codegen'd, and Spark turns the final `orderBy` into sampled range
  * partitioning (the reference's `TotalOrderPartitioner` + `InputSampler`,
  * mapred/lib/TotalOrderPartitioner.java:41), so a global sort at 100 TB
  * stays balanced without any custom partitioner.
  */
object KeyFieldSort {

  final case class KeySpec(
      fromField: Int, fromChar: Int,
      toField: Option[Int], toChar: Option[Int],
      numeric: Boolean, reverse: Boolean)

  private val SpecRe =
    """(\d+)(?:\.(\d+))?([nr]*)(?:,(\d+)(?:\.(\d+))?([nr]*))?""".r

  def parse(options: String): Seq[KeySpec] = {
    val toks = options.trim.split("\\s+").filter(_.nonEmpty)
    var gNum = false; var gRev = false
    val specs = scala.collection.mutable.ArrayBuffer[KeySpec]()
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case "-n"         => gNum = true
        case "-r"         => gRev = true
        case "-nr" | "-rn" => gNum = true; gRev = true
        case t if t.startsWith("-k") =>
          // -k<spec> and "-k <spec>" are both accepted (parseKey:198-205)
          val body =
            if (t.length > 2) t.substring(2)
            else { i += 1; if (i < toks.length) toks(i) else "" }
          SpecRe.findPrefixMatchOf(body).foreach { m =>
            val opts = Option(m.group(3)).getOrElse("") +
              Option(m.group(6)).getOrElse("")
            specs += KeySpec(
              fromField = m.group(1).toInt,
              fromChar = Option(m.group(2)).map(_.toInt).getOrElse(1),
              toField = Option(m.group(4)).map(_.toInt),
              toChar = Option(m.group(5)).map(_.toInt),
              numeric = opts.contains('n'),
              reverse = opts.contains('r'))
          }
        case _ => // unknown tokens are ignored, like the reference
      }
      i += 1
    }
    // global flags reach only specs with no opts of their own; with no -k
    // specs at all, the globals become a whole-line key (KeyFieldHelper
    // .parseOption adds the global flags as one allKeySpecs entry, so
    // "sort -n" means numeric over the whole line, not lexicographic)
    if (specs.isEmpty && (gNum || gRev))
      Seq(KeySpec(1, 1, None, None, gNum, gRev))
    else
      specs.toSeq.map(k =>
        if (!k.numeric && !k.reverse) k.copy(numeric = gNum, reverse = gRev)
        else k)
  }

  /** Compile one spec to a sort Column over the line column.
    *
    * Malformed lines never fail the job (GNU sort behavior): a line with
    * fewer fields than `fromField` sorts as the empty string
    * (`try_element_at` + coalesce instead of an ANSI out-of-bounds error).
    * Under `n`, the LEADING numeric prefix is parsed first — GNU `sort -n`
    * and the reference's numeric comparator both read "123abc" as 123 —
    * and only a field with no numeric prefix at all sorts as 0.
    */
  def sortKey(line: Column, spec: KeySpec, sep: String = "\t"): Column = {
    val fields = split(line, java.util.regex.Pattern.quote(sep))
    val raw: Column = spec.toField match {
      case Some(t) =>
        // fields F..T joined with sep; char offsets count THROUGH the
        // separators, exactly KeyFieldHelper.getStartOffset/getEndOffset
        // (position = Σ field lengths + separators, then the 1-based char)
        val joined = array_join(slice(fields, lit(spec.fromField),
          lit(math.max(0, t - spec.fromField + 1))), sep)
        // 1-based end position inside `joined`; None = end of field T
        // (endChar 0 / omitted, KeyFieldHelper.getEndOffset:152-154)
        val endPos: Option[Column] = spec.toChar.filter(_ > 0).map { c2 =>
          if (t == spec.fromField) lit(c2)
          else length(array_join(slice(fields, lit(spec.fromField),
            lit(t - spec.fromField)), sep)) + lit(sep.length + c2)
        }
        (spec.fromChar, endPos) match {
          case (1, None) => joined
          case (c, None) => substring(joined, c, Int.MaxValue / 2)
          case (c, Some(e)) =>
            // an end before the start yields the empty key, like the
            // reference's -1/end-clamped offsets
            joined.substr(lit(c), greatest(e - lit(c - 1), lit(0)))
        }
      case None =>
        // open range: field..end of line
        val joined = array_join(
          slice(fields, lit(spec.fromField), size(fields)), sep)
        if (spec.fromChar > 1) substring(joined, spec.fromChar, Int.MaxValue / 2)
        else joined
    }
    val typed =
      if (spec.numeric) {
        // leading numeric prefix, GNU sort -n style: optional blanks and
        // sign, digits with optional decimal point ("12.5x" -> 12.5,
        // "abc" -> "" -> 0.0)
        val prefix = regexp_extract(raw, "^[ \\t]*([-+]?[0-9]*\\.?[0-9]+)", 1)
        coalesce(prefix.try_cast("double"), lit(0.0))
      } else raw
    if (spec.reverse) typed.desc else typed.asc
  }

  /** All sort columns for an option string like "-k2,2nr -k1,1". */
  def sortKeys(line: Column, options: String, sep: String = "\t"): Seq[Column] =
    parse(options).map(sortKey(line, _, sep))
}
