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

  test("a failed query stays visible in errors at every rung") {
    val one = keys.map(_ -> Option(9.9))
    val line = Bench.metricLine(one, Seq("q99" -> "boom"), "/x")
    assert(line.contains("\"q99\":\"boom\""), line.takeRight(200))
  }
}
