package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the last ~2000 chars of bench stdout; six
  * rounds of `BENCH_r*.json parsed: null` came from this line not
  * fitting, and r14 shipped whole-second values for the entire
  * 158-query suite because even the leanest full-name 1dp line no
  * longer fit. These asserts make both regressions BUILD failures:
  * adding a query whose key pushes the primary line past ≥1dp coverage
  * fails here, not at driver time. */
class BenchLineSpec extends AnyFunSuite {

  private val keys = SparkEntry.queries.keys.toSeq.sorted
  private val short = Bench.shortIds(keys)

  test("short ids are injective over today's roster, derived by the documented rule") {
    assert(short.values.toSeq.distinct.size == keys.size,
      "two queries map to the same short bench key — rename one")
    // the rule BASELINE.md documents: id up to the first underscore;
    // the q19 pair disambiguates by the next segment's first letter
    assert(short("q19_md5_filter") == "q19m")
    assert(short("q19_percent_filter") == "q19p")
    keys.filter(k => k.contains('_') && !k.startsWith("q19")).foreach { k =>
      assert(short(k) == k.takeWhile(_ != '_'), s"$k -> ${short(k)}")
    }
    keys.filterNot(_.contains('_')).foreach(k => assert(short(k) == k))
  }

  test("the metric line fits the capture window even on a uniformly slow round") {
    // every query at 9.9 s: the ladder must find SOME rung inside the
    // window
    val slow = keys.map(_ -> Option(9.9))
    val line = Bench.metricLine(slow, Nil, "/root/testdata/sf0.1")
    assert(line.length <= Bench.budget,
      s"${line.length} chars at the leanest rung — a query key pushed " +
        "the bench line past the harness capture window")
    assert(line.startsWith("{\"metric\":\"total\"") && line.endsWith("}"))
  }

  test("the FULL roster keeps >=1dp for EVERY query in the primary line (the r14 regression)") {
    // r14: 133/158 values at 0dp. The short-key rung must now carry the
    // whole suite at >=1dp — sub-second regressions visible again —
    // even on a uniformly slow sub-second round (no 1-char values to
    // save space)
    val uniform = keys.map(_ -> Option(0.9))
    val (line, keyOf) =
      Bench.metricLineKeyed(uniform, Nil, "/root/testdata/sf0.1")
    assert(line.length <= Bench.budget, s"${line.length} chars")
    val covered = keys.count(k => line.contains("\"" + keyOf(k) + "\":0.9"))
    assert(covered == keys.size,
      s"only $covered of ${keys.size} queries kept their decimal — " +
        "the driver's regression signal degraded again")
  }

  test("small SPARK_GRAFT_ONLY subsets keep FULL query names") {
    // short keys are a fallback, not the default: a roomy line stays
    // exact-name so local bisection output needs no mapping
    val few = keys.take(25).map(_ -> Option(0.8))
    val line = Bench.metricLine(few, Nil, "/x")
    assert(keys.take(25).forall(k => line.contains("\"" + k + "\":0.8")),
      line.take(200))
  }

  test("200-query synthetic roster: >=90% in the primary, 100% with chunked continuations") {
    // next rounds' growth headroom, pinned: at 200 queries the primary
    // may drop its smallest entries but every dropped value must be
    // recovered by a continuation line that independently fits the
    // window (the r14 single continuation clipped unparseable)
    val roster = (keys ++ (1 to (200 - keys.size))
      .map(i => f"qz$i%02d_synthetic_op")).sorted
    val vals = roster.zipWithIndex.map { case (k, i) =>
      k -> Option(if (i % 5 == 0) 0.04 else 0.9)
    }
    val (line, keyOf) = Bench.metricLineKeyed(vals, Nil, "/x")
    assert(line.length <= Bench.budget, s"${line.length} chars")
    val inPrimary = roster.count(k => line.contains("\"" + keyOf(k) + "\":"))
    assert(inPrimary >= roster.size * 9 / 10,
      s"primary carries only $inPrimary of ${roster.size}")
    assert(line.contains(":0.9"), "primary lost 1dp precision")
    // drops follow the documented smallest-first order (value asc, then
    // longest key): the dropped set is a PREFIX of that order
    val missing = roster.filterNot(k =>
      line.contains("\"" + keyOf(k) + "\":")).toSet
    val order = vals.collect { case (k, Some(v)) => (k, v) }
      .sortBy { case (k, v) => (v, -k.length, k) }.map(_._1)
    assert(order.take(missing.size).toSet == missing,
      s"dropped out of order: $missing")
    // continuations recover everything, each fitting on its own
    val lines = Bench.metricLines(vals, Nil, "/x")
    assert(lines.last.startsWith("{\"metric\":\"total\""))
    for (l <- lines) assert(l.length <= Bench.budget, s"${l.length} chars")
    lines.init.foreach { c =>
      assert(c.startsWith("{\"metric\":\"total_extra\"") && c.endsWith("}"))
      assert(c.count(_ == '{') == c.count(_ == '}'), c.take(100))
    }
    val all = lines.mkString("\n")
    val covered = roster.count(k => all.contains("\"" + keyOf(k) + "\":"))
    assert(covered == roster.size,
      s"continuations left ${roster.size - covered} values unrecovered")
    // a roomy round (no drops) emits ONE line — no spurious extras
    assert(Bench.metricLines(keys.take(30).map(_ -> Option(0.2)), Nil,
      "/x").size == 1)
  }

  test("r17: the realistic 170-query roster carries 100% of values at 2dp in ONE primary line") {
    // r16 verdict item 6: the r16 headroom pushed one entry onto a
    // continuation line and the driver's parsed map MISSED it — the
    // record keeps only the primary. At realistic per-query timings
    // (the r16 bench: mostly sub-second, a handful of multi-second
    // rows) the whole roster must fit ONE line at 2dp, so
    // parsed.queries == suite size every round.
    val roster = (keys ++ (1 to math.max(0, 170 - keys.size))
      .map(i => f"qy$i%02d")).sorted
    val vals = roster.zipWithIndex.map { case (k, i) =>
      k -> Option(if (i % 11 == 0) 4.62 else ((i % 37) + 1) * 0.013)
    }
    val (_, keyOf) = Bench.metricLineKeyed(vals, Nil, "/x")
    val lines = Bench.metricLines(vals, Nil, "/x")
    assert(lines.size == 1,
      s"realistic roster spilled onto ${lines.size - 1} continuation " +
        "line(s) the driver's record would miss")
    val main = lines.head
    assert(main.length <= Bench.budget, s"${main.length} chars")
    vals.foreach { case (k, Some(v)) =>
      val want = "\"" + keyOf(k) + "\":" + {
        val s = String.format(java.util.Locale.ROOT, "%.2f",
          Double.box(v))
        if (s.contains('.'))
          s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
        else s
      }
      assert(main.contains(want),
        s"$k lost its 2dp value $want in the primary line")
    }
  }

  test("streaming rows carry incremental-plan seconds in a sproc map, fit-guarded") {
    // the r14 verdict's item 8: the ~1-2 s query-lifecycle cost
    // dominates every streaming twin's wall clock; the sproc map makes
    // the incremental plan's own time visible (lifecycle = wall −
    // sproc) without ever costing the wall-clock map its coverage
    val uniform = keys.map(_ -> Option(0.9))
    val sp = Seq("qe5" -> 0.4, "qa9" -> 1.2, "qc4" -> 0.8)
    val lines = Bench.metricLines(uniform, Nil, "/x", sp)
    val main = lines.last
    assert(main.length <= Bench.budget, s"${main.length} chars")
    assert(main.contains("\"sproc\":{"), main.takeRight(200))
    assert(main.contains("\"qa9\":1.2") && main.contains("\"qe5\":0.4"))
    assert(main.endsWith("}}") || main.endsWith("}"),
      main.takeRight(10))
    assert(main.count(_ == '{') == main.count(_ == '}'))
    // wall-clock coverage never pays for sproc: every query still there
    assert(keys.forall(k =>
      main.contains("\"" + Bench.shortIds(keys)(k) + "\":0.9") ||
        main.contains("\"" + k + "\":0.9")))
    // when space runs out, sproc truncates largest-first rather than
    // pushing the line over budget
    val manySp = keys.take(120).map(k => k -> 2.0)
    val tight = Bench.metricLines(uniform, Nil, "/x", manySp).last
    assert(tight.length <= Bench.budget, s"${tight.length} chars")
    assert(tight.count(_ == '{') == tight.count(_ == '}'))
  }

  test("high-variance rows carry their observed spread in a spread map, fit-guarded and spill-chunked") {
    // r17 verdict item 8: qb7's ±0.5 s band made round-over-round
    // regressions unadjudicable; BENCH now records each noisy row's
    // own observed spread beside its median, never at the cost of the
    // wall-clock map's coverage
    val uniform = keys.map(_ -> Option(0.9))
    val spr = Seq("qb7" -> 0.5, "qc2" -> 0.3)
    val lines = Bench.metricLines(uniform, Nil, "/x", Nil, spr)
    val main = lines.last
    assert(main.length <= Bench.budget, s"${main.length} chars")
    assert(main.contains("\"spread\":{"), main.takeRight(200))
    assert(main.contains("\"qb7\":0.5") && main.contains("\"qc2\":0.3"))
    assert(main.count(_ == '{') == main.count(_ == '}'))
    // wall-clock coverage never pays for spread
    assert(keys.forall(k =>
      main.contains("\"" + Bench.shortIds(keys)(k) + "\":0.9") ||
        main.contains("\"" + k + "\":0.9")))
    // overflow spills into its own parseable continuation, never over
    // budget
    val many = keys.take(150).map(k => k -> 1.5)
    val tLines = Bench.metricLines(uniform, Nil, "/x", Nil, many)
    assert(tLines.forall(_.length <= Bench.budget))
    assert(tLines.forall(l => l.count(_ == '{') == l.count(_ == '}')))
    val all = tLines.mkString("\n")
    assert(many.forall { case (k, _) =>
      all.contains("\"" + Bench.shortIds(keys)(k) + "\":1.5") ||
        all.contains("\"" + k + "\":1.5") },
      "a spread entry vanished instead of spilling")
  }

  test("contended rows carry loadavg and stolen CPU-seconds, fit-guarded, never at coverage's cost") {
    // r20 verdict item 5: two rounds of adjudication attributed bench
    // swings to external box load by solo re-measurement; the metric
    // line now carries the attribution as data — per noisy row, the
    // 1-min loadavg at its window and the hypervisor steal during its
    // runs (the clean signal on a virtualized box).
    val uniform = keys.map(_ -> Option(0.9))
    val ld = Seq("qb7" -> 14.2, "qa2" -> 13.0)
    val st = Seq("qb7" -> 160.3, "qc2" -> 1.6)
    val lines = Bench.metricLines(uniform, Nil, "/x", Nil, Nil, 3, ld, st)
    val main = lines.last
    assert(main.length <= Bench.budget, s"${main.length} chars")
    assert(main.contains("\"load\":{") && main.contains("\"steal\":{"),
      main.takeRight(300))
    assert(main.contains("\"qb7\":14.2") && main.contains("\"qb7\":160.3"))
    assert(main.count(_ == '{') == main.count(_ == '}'))
    // wall-clock coverage never pays for the diagnostics
    assert(keys.forall(k =>
      main.contains("\"" + Bench.shortIds(keys)(k) + "\":0.9") ||
        main.contains("\"" + k + "\":0.9")))
    // at a tight budget the maps drop largest-last entries rather than
    // corrupting the line — diagnostics are droppable, timings are not
    val many = keys.map(k => k -> 99.9)
    val tLines = Bench.metricLines(uniform, Nil, "/x", Nil, Nil, 3,
      many, many)
    assert(tLines.forall(_.length <= Bench.budget))
    assert(tLines.forall(l => l.count(_ == '{') == l.count(_ == '}')))
  }

  test("the steal map survives into the PRIMARY line at the full at-budget roster (r21 verdict item 2)") {
    // r21: the steal attribution spilled to continuation lines printed
    // BEFORE the primary, and the driver's 2000-char tail truncated
    // them — the one artifact built to explain the contended run
    // carried no steal map. Steal now takes the primary's slack FIRST
    // (top windows, capped at 5 inline), ahead of the sproc/spread
    // diagnostics.
    val uniform = keys.map(_ -> Option(0.9))
    val st = Seq("qa9" -> 8.8, "qa7" -> 6.7, "qb7" -> 3.1)
    val manySp = keys.take(120).map(k => k -> 2.0) // sproc pressure
    val lines = Bench.metricLines(uniform, Nil, "/root/testdata/sf0.1",
      manySp, Nil, 3, Nil, st)
    val main = lines.last
    assert(main.length <= Bench.budget, s"${main.length} chars")
    assert(main.contains("\"steal\":{\"qa9\":8.8"),
      "the top steal window lost the primary's slack to a diagnostic: " +
        main.takeRight(250))
    assert(main.count(_ == '{') == main.count(_ == '}'))
    // wall-clock coverage still never pays for it
    assert(keys.forall(k =>
      main.contains("\"" + Bench.shortIds(keys)(k) + "\":0.9") ||
        main.contains("\"" + k + "\":0.9")))
    // a steal-QUIET run asserts so explicitly — the artifact must
    // distinguish "no theft" from "attribution truncated"
    val quiet = Bench.metricLines(uniform, Nil, "/root/testdata/sf0.1",
      Nil, Nil, 3, Nil, Nil).last
    assert(quiet.contains("\"steal\":{}"), quiet.takeRight(120))
    // the r22-base failure case: realistic mixed values push the
    // richest rung to at-budget, where priority inline alone found no
    // slack — the reservation must still land the top windows in the
    // PRIMARY, with any shed timings recovered by continuations
    val realistic = keys.zipWithIndex.map { case (k, i) =>
      k -> Option(if (i % 11 == 0) 4.62 else ((i % 37) + 1) * 0.013)
    }
    val rLines = Bench.metricLines(realistic, Nil, "/root/testdata/sf0.1",
      Nil, Nil, 3, Nil, st)
    val rMain = rLines.last
    assert(rMain.length <= Bench.budget, s"${rMain.length} chars")
    assert(rMain.contains("\"steal\":{\"qa9\":8.8"),
      "steal lost the primary at the at-budget roster: " +
        rMain.takeRight(200))
    val rAll = rLines.mkString("\n")
    realistic.foreach { case (k, Some(v)) =>
      assert(rAll.contains("\"" + Bench.shortIds(keys)(k) + "\":"),
        s"$k vanished from primary AND continuations") }
    // past the 5-window inline cap the remainder spills, never vanishes
    val many = keys.take(9).zipWithIndex.map { case (k, i) => k -> (19.0 - i) }
    val mLines = Bench.metricLines(uniform, Nil, "/x", Nil, Nil, 3,
      Nil, many)
    val all = mLines.mkString("\n")
    assert(many.forall { case (k, v) =>
      all.contains("\"" + Bench.shortIds(keys)(k) + "\":" + v.toInt) },
      "a steal entry vanished")
    assert(mLines.forall(_.length <= Bench.budget))
  }

  test("a failed query stays visible in errors at every rung") {
    // roomy line (few keys): the message itself survives
    val typical = keys.take(20).map(_ -> Option(0.2))
    val roomy = Bench.metricLine(typical, Seq("q99" -> "boom"), "/x")
    assert(roomy.contains("\"q99\":\"boom\""), roomy.takeRight(200))
    // tight line (uniformly slow round): the message may degrade to the
    // names-only flag, but the failing query must never vanish — r10's
    // q95 disappeared from the correctness AND bench record entirely
    val slow = keys.map(_ -> Option(9.9))
    val tight = Bench.metricLine(slow, Seq("q99" -> "boom"), "/x")
    assert(tight.length <= Bench.budget, s"${tight.length} chars")
    assert(tight.contains("\"errors\":{") && tight.contains("\"q99\":"),
      tight.takeRight(200))
  }

  test("one failing query with a 200-char message still fits with >=1dp values") {
    // the r10 failure: q95's ~200-char analysis error pushed every rung
    // past the window and the unchecked terminal fallback shipped an
    // unparseable line. Now the message caps at 60 chars, and if that is
    // still too much the errors map degrades to names-only BEFORE any
    // value loses its decimal — the failing query stays identifiable and
    // every surviving timing keeps its decimal.
    val typical = keys.map(_ -> Option(0.8))
    val msg = "x" * 200
    val line = Bench.metricLine(typical.map {
      case ("q95", _) => "q95" -> None; case kv => kv
    }, Seq("q95" -> msg), "/x")
    assert(line.length <= Bench.budget, s"${line.length} chars")
    assert(line.contains(":0.8"),
      s"fell to the whole-second floor (${line.length} chars)")
    assert(line.contains("\"q95\":"), "failing query vanished from errors")
    assert(!line.contains(msg), "uncapped 200-char message embedded")
  }

  test("the line parses and fits even under a pathological error storm") {
    // every query failing with a long message: the guaranteed-fit floor
    // must still emit well-formed JSON inside the window (r10's terminal
    // fallback had no fit check at all)
    val allFail = keys.map(_ -> (None: Option[Double]))
    val errs = keys.map(_ -> ("e" * 200))
    val line = Bench.metricLine(allFail, errs, "/x")
    assert(line.length <= Bench.budget, s"${line.length} chars")
    assert(line.startsWith("{\"metric\":\"total\"") && line.endsWith("}"))
    // structurally valid JSON: balanced braces/quotes by a cheap parse
    assert(line.count(_ == '{') == line.count(_ == '}'), line.take(100))
    assert(line.count(_ == '"') % 2 == 0, line.take(100))
  }
}
