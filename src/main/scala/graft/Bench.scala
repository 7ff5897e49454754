package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the sf directory given
  * by SPARK_GRAFT_SF_DIR and prints one JSON line. A warmup pass (the
  * flagship aggregate) is run first so JIT/codegen/parquet-footer costs are
  * not billed to whichever query happens to run first; queries then run in
  * sorted name order so successive rounds are comparable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: touch every table's footer + run one agg end-to-end.
    try {
      Tables.names.foreach(n => Tables(spark, sfDir, n).schema)
      SparkEntry.queries.get("q05_sum").foreach(_(spark, sfDir).count())
    } catch { case scala.util.control.NonFatal(_) => () }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Three timed runs per query, report the MEDIAN: the first run pays the
    // query's one-time Catalyst/codegen cost and is exposed to box noise
    // (the shared runner showed 2-6x per-query variance between rounds —
    // r5 flagged 7 queries, r6 flagged 4, every one cleared by session
    // medians); median-of-3 measures the plan, not the weather, and unlike
    // min it cannot be flattered by one lucky cache-hot run.
    // optional comma-separated subset for local bisection
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, fn) =>
      // A failed run yields no timing sample: the median must never mix a
      // fast-failure duration with a real run, and one success clears a
      // transient first-run error.
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case scala.util.control.NonFatal(e) =>
            // 60-char cap: one query's error must never cost the whole
            // suite its per-query resolution (r10: a ~200-char analysis
            // error pushed every metricLine rung past the window and the
            // terminal fallback shipped unparseable)
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString.take(60)
            None
        }
      }
      val runs = Seq(once(), once(), once())
      val samples = runs.flatten
      // only a fully clean triple clears the error: a mix of success and
      // failure is a real (non-idempotent / flaky) defect worth surfacing
      if (samples.length == runs.length) errors.remove(name)
      // median of however many samples survived (1 -> itself; 2 -> lower
      // of the two, i.e. the min-of-2 the r4 baselines were recorded with)
      val sec = if (samples.isEmpty) None
        else Some(samples.sorted.apply((samples.length - 1) / 2))
      System.err.println(f"[bench] $name%-22s ${sec.getOrElse(0.0)}%8.3f s" +
        (if (errors.contains(name)) "  FAILED" else ""))
      name -> sec
    }
    // queries that never produced a sample are omitted from the timing
    // map (a 0.0 entry reads as an ultra-fast success when diffed
    // against the baseline); they remain visible in the errors map.
    // the harness window is ~2000 chars and this line is the LAST stdout
    // (build.sbt sets showSuccess := false so sbt's "[success]" trailer no
    // longer prints after it — that trailer clipped the head every round
    // <= 6). The EXACT cap is 1999: line + trailing newline must fit the
    // 2000-char tail for the head to survive. At 96 queries the leanest
    // 1dp rung measures 1998, so every char of margin surrendered here
    // drops the whole suite to whole-second values.
    val outs = Bench.metricLines(results, errors.toSeq, sfDir)
    for (out <- outs if out.length > Bench.budget)
      System.err.println(s"[bench] WARNING: metric line ${out.length} chars" +
        " exceeds the ~2000-char harness capture window even at the" +
        " leanest encoding — the driver's parse will truncate")
    // Cleanup and stop BEFORE printing: the JSON line must be the absolute
    // last stdout so the harness's last-2000-chars window contains its
    // head. Both are best-effort — an exception here must never eat the
    // already-computed metric line (that would null the driver's parse,
    // the exact failure mode this ordering exists to fix).
    try RelationalQueries.cleanupTmpSinks(spark)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] tmp-sink cleanup failed: $e") }
    try spark.stop()
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] spark.stop failed: $e") }
    // continuation line(s) first, the PRIMARY metric line LAST: the
    // harness window keeps the tail, so if both don't fit the primary
    // line still parses whole and a clipped continuation head cannot
    // match a JSON-line pattern
    outs.foreach(println)
    Console.out.flush()
  }

  /** The harness reading stdout keeps only the LAST ~2000 chars, and the
    * metric line must be the absolute last output (build.sbt suppresses
    * sbt's "[success]" trailer, which clipped the head every round <= 6).
    * The EXACT cap is 1999: line + trailing newline must fit the
    * 2000-char tail for the head to survive. */
  private[graft] val budget = 1998

  /** The richest metric line that fits [[budget]]: decimals degrade
    * 3dp -> 2dp -> 1dp (10 ms is far below box noise) before any field
    * is dropped; then unit/runs, then the sf path (the driver supplies
    * it via SPARK_GRAFT_SF_DIR), then error MESSAGES degrade to
    * names-only (`{"q95":1}` — which query failed survives; why is in
    * the stderr `[bench]` log), then whole-second values, then — the
    * guaranteed-fit floor — entries drop smallest-first until the line
    * fits, so the output PARSES no matter what (r10 shipped an
    * unparseable line because the terminal fallback embedded a long
    * error with no fit check and cost the round its entire bench).
    * Exposed for BenchLineSpec, which fails the build if the current
    * query-key set can no longer fit 1dp precision (a long new key
    * silently costing the driver its per-query resolution is exactly
    * the regression six rounds paid). */
  /** JSON-safe number at `dp` decimals, trailing zeros trimmed.
    * Locale.ROOT: the f-interpolator is locale-sensitive and a
    * comma-decimal default locale would corrupt the JSON. */
  private def fmt(v: Double, dp: Int): String = {
    val s = String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
    else s
  }

  /** The primary metric line plus, when the primary's fit ladder had
    * to OMIT entries, a CONTINUATION line `{"metric":"total_extra",
    * "queries":{...}}` carrying exactly the omitted per-query values
    * (its own fit-checked mini ladder: 1dp → 0dp → drop smallest).
    * Printed BEFORE the primary so the primary stays the last stdout
    * — if the capture window holds both, the driver recovers ~100% of
    * per-query values (the r12 verdict's coverage ask: 20 of 132 were
    * dropping); if not, the primary still parses whole and the
    * clipped continuation head cannot match a JSON-line pattern. */
  private[graft] def metricLines(results: Seq[(String, Option[Double])],
      errors: Seq[(String, String)], sfDir: String): Seq[String] = {
    val main = metricLine(results, errors, sfDir)
    // which present keys the chosen rung omitted: token-match inside
    // the queries object only (everything before any "errors" field,
    // so an errors entry cannot mask a dropped timing)
    val qEnd = main.indexOf("\"errors\"") match {
      case -1 => main.length
      case i  => i
    }
    val qpart = main.substring(0, qEnd)
    val dropped = results.collect { case (k, Some(v)) => (k, v) }
      .filterNot { case (k, v) =>
        (0 to 3).exists(dp => qpart.contains("\"" + k + "\":" + fmt(v, dp)))
      }
    if (dropped.isEmpty) Seq(main)
    else {
      def cline(dp: Int, rs: Seq[(String, Double)]): String =
        "{\"metric\":\"total_extra\",\"queries\":" + rs.map { case (k, v) =>
          "\"" + k + "\":" + fmt(v, dp) }.mkString("{", ",", "}") + "}"
      val order = dropped.sortBy { case (k, v) => (v, -k.length, k) }
      val cont = Seq(cline(1, dropped), cline(0, dropped)).iterator
        .++((1 until dropped.size).iterator
          .map(nd => cline(0, order.drop(nd))))
        .find(_.length <= budget)
        .getOrElse(cline(0, Seq.empty))
      Seq(cont, main)
    }
  }

  private[graft] def metricLine(results: Seq[(String, Option[Double])],
      errors: Seq[(String, String)], sfDir: String): String = {
    // belt (capture caps at 60) AND suspenders: metricLine re-caps, so a
    // caller handing it an uncapped message cannot blow the ladder
    val errFull = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.take(60).replace("\\", "\\\\")
        .replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    // names-only rung: `"q95":1` — a flag, not a timing (timings for
    // failed queries never enter the queries map)
    val errNames = errors.map { case (k, _) => "\"" + k + "\":1" }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    // errMode: 0 = capped messages, 1 = names-only, 2 = omit entirely
    def line(dp: Int, full: Boolean, lean: Int = 0, errMode: Int = 0,
        rs: Seq[(String, Option[Double])] = results): String = {
      val qs = rs.collect { case (k, Some(v)) =>
        "\"" + k + "\":" + fmt(v, dp) }.mkString("{", ",", "}")
      val mid = if (full) s""","unit":"sec","queries":$qs,"runs":3"""
        else s""","queries":$qs"""
      val errJson = if (errMode == 0) errFull else errNames
      val tailFields = lean match {
        case 0 => s""","errors":$errJson,"sf":"$sfDir""""
        case 1 => s""","errors":$errJson"""
        case _ =>
          if (errors.isEmpty || errMode == 2) "" else s""","errors":$errJson"""
      }
      s"""{"metric":"total","value":${fmt(total, math.max(dp, 1))}$mid$tailFields}"""
    }
    // Rung between full-suite 1dp and the whole-second floor: OMIT the
    // smallest-value entries (ties broken longest-key-first — the most
    // chars saved per bit of information lost) until the 1dp line fits.
    // An omitted 0.1 s query costs the driver one trivial baseline
    // comparison; the 0dp floor costs per-query resolution for the
    // ENTIRE suite — at 96+ queries the leanest 1dp rung already sits
    // within ~10 chars of the window, so this is what lets the suite
    // keep growing by a query or two without gambling every value on
    // round-to-round drift. "value" stays the sum over ALL queries,
    // omitted included. Capped at 10% of entries (maxDropFrac=10) so a
    // pathological key set still reaches the floor instead of reporting
    // a sliver of the suite as if it were the whole; the terminal floor
    // below relaxes that cap because by then parsing at all beats
    // completeness.
    val present = results.collect { case (k, Some(v)) => (k, v) }
    val dropOrder = present.sortBy { case (k, v) => (v, -k.length, k) }
      .map(_._1)
    def droppingSmallest(dp: Int, errMode: Int,
        maxDropFrac: Int): Option[String] = {
      val maxDrop = math.max(1, present.size / maxDropFrac)
      (1 to maxDrop).iterator
        .map { nd =>
          val gone = dropOrder.take(nd).toSet
          line(dp, false, lean = 2, errMode = errMode,
            rs = results.filterNot { case (k, _) => gone(k) })
        }
        .find(_.length <= budget)
    }
    Seq(line(3, true), line(2, true), line(1, true),
      line(2, false), line(1, false), line(1, false, lean = 1),
      line(1, false, lean = 2),
      // same 1dp shape with error messages degraded to names-only: one
      // failing query (even message-capped) must never push the whole
      // suite to whole-second values
      line(1, false, lean = 2, errMode = 1))
      .find(_.length <= budget)
      // escalate the drop cap (10% -> ~14% -> 20% -> 25%) before any
      // whole-second rung: r11 crossed the point where 10% wasn't
      // enough (118 keys, all-0dp line shipped), and a quarter of the
      // suite's cheapest sub-0.2s entries is a far better loss than
      // every query's decimal
      .orElse(Seq(10, 7, 5, 4).iterator
        .flatMap(f => droppingSmallest(1, errMode = 1, maxDropFrac = f))
        .nextOption())
      .orElse { // whole-second floors, every one fit-CHECKED
        Seq(line(0, false, lean = 2, errMode = 1),
          line(0, false, lean = 2, errMode = 2))
          .find(_.length <= budget)
      }
      // guaranteed-fit terminal floor: drop entries without the 10% cap
      // (drain to one entry, then to the bare header, which at ~40 chars
      // always fits) — the line must PARSE even if it carries little
      .orElse(droppingSmallest(0, errMode = 2, maxDropFrac = 1))
      .getOrElse(line(0, false, lean = 2, errMode = 2, rs = Seq.empty))
  }
}
