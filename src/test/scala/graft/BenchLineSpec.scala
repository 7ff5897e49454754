package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the last ~2000 chars of bench stdout; six
  * rounds of `BENCH_r*.json parsed: null` came from this line not
  * fitting. These asserts make the regression a BUILD failure: adding a
  * query whose key pushes the line past the window fails here, not at
  * driver time. */
class BenchLineSpec extends AnyFunSuite {

  private val keys = SparkEntry.queries.keys.toSeq.sorted

  test("the metric line fits the capture window even on a uniformly slow round") {
    // every query at 9.9 s (3 chars at 1dp, 2 at the 0dp floor): the
    // ladder must find SOME rung inside the window
    val slow = keys.map(_ -> Option(9.9))
    val line = Bench.metricLine(slow, Nil, "/root/testdata/sf0.1")
    assert(line.length <= Bench.budget,
      s"${line.length} chars at the leanest rung — a query key pushed " +
        "the bench line past the harness capture window")
    assert(line.startsWith("{\"metric\":\"total\"") && line.endsWith("}"))
  }

  test("today's typical value mix keeps per-query DECIMAL precision") {
    // modeled on the r7 driver shape: ~1 in 5 queries under 50 ms
    // (1-char "0"), the rest sub-second (3-char "0.x"). If this falls to
    // the whole-second rung, a new key is too long — keep new keys to
    // <= 6 chars (q86-style) or shorten them in the round they appear.
    val typical = keys.zipWithIndex.map { case (k, i) =>
      k -> Option(if (i % 5 == 0) 0.04 else 0.2)
    }
    val line = Bench.metricLine(typical, Nil, "/root/testdata/sf0.1")
    assert(line.contains(":0.2"),
      s"1dp precision lost (${line.length} chars at the chosen rung) — " +
        "shorten the newest query keys")
  }

  test("a uniformly 3-char value mix keeps 1dp by dropping at most a quarter of entries") {
    // the r11 regression this pins: every value "0.x" (no 1-char
    // sub-50ms entries to save space), which is what a loaded driver
    // box actually produces — the ladder must escalate the drop cap
    // rather than surrender the whole suite to whole seconds (BENCH_r11f
    // measured the 10% cap failing at 118 keys and shipping all-0dp)
    val uniform = keys.map(_ -> Option(0.9))
    val line = Bench.metricLine(uniform, Nil, "/root/testdata/sf0.1")
    assert(line.length <= Bench.budget, s"${line.length} chars")
    assert(line.contains(":0.9"),
      s"fell to the whole-second floor (${line.length} chars) — the " +
        "drop-cap escalation no longer reaches a fitting 1dp line")
    val present = keys.count(k => line.contains("\"" + k + "\""))
    assert(present >= (keys.size * 3) / 4,
      s"dropped more than a quarter of the suite ($present of ${keys.size})")
  }

  test("overflow drops the smallest entries, never the suite's precision") {
    // two extra short keys model next round's growth: at 96+ keys the
    // 1dp rung sits within ~10 chars of the window, so growth must land
    // on the dropping rung — the sub-50 ms entries vanish, every
    // survivor keeps its decimal, and the headline total still counts
    // the omitted queries
    val grown = (keys ++ Seq("q98", "q99")).sorted.zipWithIndex.map {
      case (k, i) => k -> Option(if (i % 7 == 0) 0.04 else 0.8)
    }
    val line = Bench.metricLine(grown, Nil, "/x")
    assert(line.length <= Bench.budget, s"${line.length} chars")
    assert(line.contains(":0.8"),
      s"fell to the whole-second floor (${line.length} chars)")
    // the invariant: drops follow the documented smallest-first order
    // (value asc, then longest key) — the dropped set must be a PREFIX
    // of that order, so no entry ever drops while a smaller/longer-keyed
    // one survives. (At 96 keys no 0.8 entry dropped at all; the suite's
    // growth to 126 makes the first post-sub-50ms drop legitimate.)
    val missing = grown.collect { case (k, Some(_)) => k }
      .filterNot(k => line.contains("\"" + k + "\"")).toSet
    val order = grown.collect { case (k, Some(v)) => (k, v) }
      .sortBy { case (k, v) => (v, -k.length, k) }.map(_._1)
    assert(order.take(missing.size).toSet == missing,
      s"dropped out of order: $missing")
    // precision must not secretly cost completeness: only a handful of
    // non-tiny entries may fall before the cap escalates (the bound
    // grows with the suite — r11 hit 1, r13's six new qd keys made 4
    // legitimate, r14's qe+qf tiers at 158 keys make 11 — and since
    // r13 every dropped value is RECOVERED by the metricLines
    // continuation, gated in its own test below)
    val smallKeys = grown.collect { case (k, Some(v)) if v == 0.04 => k }
    assert((missing -- smallKeys.toSet).size <= 11,
      s"too many full-size entries dropped: ${missing -- smallKeys.toSet}")
    val total = grown.flatMap(_._2).sum
    val expect = f"$total%.1f".reverse.dropWhile(_ == '0')
      .stripPrefix(".").reverse
    assert(line.contains(s""""value":$expect"""), line.take(60))
  }

  test("metricLines: the continuation recovers every omitted per-query value, primary stays last") {
    // the r12 coverage regression (20 of 132 values dropped from the
    // driver bench map): whenever the primary's fit ladder omits
    // entries, a continuation line must carry EXACTLY those values so
    // the two lines together cover 100% of the suite — and both must
    // fit the capture window independently
    val uniform = keys.map(_ -> Option(0.9)) // forces drops at 132+ keys
    val lines = Bench.metricLines(uniform, Nil, "/root/testdata/sf0.1")
    assert(lines.nonEmpty && lines.last.startsWith("{\"metric\":\"total\""))
    for (l <- lines) assert(l.length <= Bench.budget, s"${l.length} chars")
    val all = lines.mkString("\n")
    val covered = keys.count(k => all.contains("\"" + k + "\":0.9"))
    assert(covered == keys.size,
      s"continuation left ${keys.size - covered} of ${keys.size} values unrecovered")
    // a roomy round (no drops) emits ONE line — no spurious extras
    val fast = keys.take(30).map(_ -> Option(0.2))
    assert(Bench.metricLines(fast, Nil, "/x").size == 1)
    // the continuation parses on its own
    lines.init.foreach { c =>
      assert(c.startsWith("{\"metric\":\"total_extra\"") && c.endsWith("}"))
      assert(c.count(_ == '{') == c.count(_ == '}'), c.take(100))
    }
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

  test("one failing query with a 200-char message still fits with 1dp values") {
    // the r10 failure: q95's ~200-char analysis error pushed every rung
    // past the window and the unchecked terminal fallback shipped an
    // unparseable line. Now the message caps at 60 chars, and if that is
    // still too much the errors map degrades to names-only BEFORE any
    // value loses its decimal — the failing query stays identifiable and
    // every surviving timing keeps 1dp.
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
