package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{FieldSelection, Joins, KeyFieldSort, SecondarySort, TextOps}

class KeyFieldSortSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def sorted(lines: Seq[String], opts: String, sep: String = "|") =
    lines.toDF("line")
      .orderBy(KeyFieldSort.sortKeys(col("line"), opts, sep) :+ col("line").asc: _*)
      .as[String].collect().toSeq

  test("numeric sort parses leading numeric prefix like GNU sort -n") {
    val lines = Seq("a|123abc", "b|45", "c|xyz", "d|-2tail", "e|12.5x")
    assert(sorted(lines, "-k2,2n") ==
      Seq("d|-2tail", "c|xyz", "e|12.5x", "b|45", "a|123abc"))
  }

  test("reverse numeric on field 2") {
    val lines = Seq("x|1|9", "y|3|1", "z|2|5")
    assert(sorted(lines, "-k2,2nr") == Seq("y|3|1", "z|2|5", "x|1|9"))
  }

  test("multiple keys compose: field 2 asc then field 3 numeric desc") {
    val lines = Seq("a|k|2", "b|k|10", "c|j|1")
    assert(sorted(lines, "-k2,2 -k3,3nr") == Seq("c|j|1", "b|k|10", "a|k|2"))
  }

  test("char offsets within a field") {
    // -k1.2,1.3: chars 2-3 of field 1
    val lines = Seq("zaa", "abz", "bba")
    assert(sorted(lines, "-k1.2,1.3") == Seq("zaa", "bba", "abz"))
  }

  test("missing field sorts as empty string, not error (ANSI-safe)") {
    val lines = Seq("only", "two|b")
    assert(sorted(lines, "-k2,2") == Seq("only", "two|b"))
  }

  // cross-field char offsets — KeyFieldHelper.getStartOffset/getEndOffset
  // (positions run through the separators) with TestKeyFieldHelper's
  // canonical "-k1.2,3.4"-shaped specs
  test("cross-field char range -k2.2,3.2: char 2 of f2 through char 2 of f3") {
    val lines = Seq("a|xyz|wq|t", "b|abc|dxq|t", "c|abc|daq|t")
    // keys are "yz|wq", "bc|dx", "bc|da" -> "bc|da" < "bc|dx" < "yz|wq"
    assert(sorted(lines, "-k2.2,3.2") ==
      Seq("c|abc|daq|t", "b|abc|dxq|t", "a|xyz|wq|t"))
  }

  test("endChar 0 means end of field (-k1.2,2.0 == -k1.2,2)") {
    val lines = Seq("ba|z", "ab|y", "bb|a")
    assert(sorted(lines, "-k1.2,2.0") == sorted(lines, "-k1.2,2"))
    // key is char2 of f1 through end of f2: "a|z", "b|y", "b|a"
    assert(sorted(lines, "-k1.2,2.0") == Seq("ba|z", "bb|a", "ab|y"))
  }

  test("global -nr flags reach only specs without their own opts") {
    val lines = Seq("1|b", "3|a", "2|c")
    // "-nr -k1,1" == "-k1,1nr" (global applies)
    assert(sorted(lines, "-nr -k1,1") == sorted(lines, "-k1,1nr"))
    assert(sorted(lines, "-nr -k1,1") == Seq("3|a", "2|c", "1|b"))
    // "-nr -k1,1n" keeps ONLY the spec's own n — NOT reversed
    // (KeyFieldHelper.java:185-190; TestKeyFieldHelper's "-nr -k1.2,3.4n")
    assert(sorted(lines, "-nr -k1,1n") == Seq("1|b", "2|c", "3|a"))
  }

  test("global flags with no -k spec become a whole-line key") {
    // KeyFieldHelper.parseOption adds the bare globals as one key spec, so
    // "sort -n" is numeric-over-the-whole-line, not plain lexicographic
    assert(KeyFieldSort.parse("-n") ==
      Seq(KeyFieldSort.KeySpec(1, 1, None, None, numeric = true, reverse = false)))
    assert(KeyFieldSort.parse("-nr") ==
      Seq(KeyFieldSort.KeySpec(1, 1, None, None, numeric = true, reverse = true)))
    assert(KeyFieldSort.parse("") == Seq.empty)
    val lines = Seq("10", "9", "100")
    assert(sorted(lines, "-n") == Seq("9", "10", "100"))
    assert(sorted(lines, "-r") == Seq("9", "100", "10"))
  }

  test("detached spec body: '-k 2,2' parses like '-k2,2'") {
    val lines = Seq("a|z", "b|y")
    assert(sorted(lines, "-k 2,2") == sorted(lines, "-k2,2"))
    assert(sorted(lines, "-k 2,2") == Seq("b|y", "a|z"))
  }

  test("end position before start yields the empty key (clamped, no error)") {
    val lines = Seq("abc|q", "abd|r")
    // -k1.3,1.1: end < start -> empty key for every row; tie falls to line
    assert(sorted(lines, "-k1.3,1.1") == Seq("abc|q", "abd|r"))
  }
}

class JoinsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("overrideJoin: rightmost source wins per key") {
    val a = Seq((1, "a1"), (2, "a2"), (3, "a3")).toDF("k", "v")
    val b = Seq((2, "b2"), (3, "b3")).toDF("k", "v")
    val c = Seq((3, "c3")).toDF("k", "v")
    val out = Joins.overrideJoin("k", a, b, c)
      .as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "a1", 2 -> "b2", 3 -> "c3"))
  }

  test("overrideJoin: duplicate keys in one source break ties by content, " +
      "independent of partition layout") {
    val rows = Seq((1, "bb"), (1, "aa"), (1, "cc"), (2, "zz"))
    for (parts <- Seq(1, 7)) {
      val a = rows.toDF("k", "v").repartition(parts)
      val out = Joins.overrideJoin("k", a).as[(Int, String)].collect().toMap
      // greatest non-key tuple wins — a pure function of the data
      assert(out == Map(1 -> "cc", 2 -> "zz"), s"parts=$parts")
    }
  }

  test("asOfJoin: inclusive match, latest-prior wins, unmatched left is null") {
    // left ts=5 matches right ts=5 (inclusive >=); ts=7 picks the LATEST
    // prior (6 over 2); ts=1 has no prior right row -> null payload
    val l = Seq((1L, 5L, "e5"), (1L, 7L, "e7"), (1L, 1L, "e1"),
      (2L, 9L, "x9")).toDF("k", "ts", "lv")
    val r = Seq((1L, 2L, "r2"), (1L, 5L, "r5"), (1L, 6L, "r6"))
      .toDF("k", "rts", "rv")
    val out = Joins.asOfJoin(l, r, "k", "ts", "rts")
      .select("lv", "rv").as[(String, Option[String])].collect().toMap
    assert(out == Map("e5" -> Some("r5"), "e7" -> Some("r6"),
      "e1" -> None, "x9" -> None))
  }

  test("asOfJoin: right rows tying on (key, ts) resolve by content, " +
      "independent of partition layout") {
    val l = Seq((1L, 10L, "e")).toDF("k", "ts", "lv")
    val rows = Seq((1L, 3L, "bb"), (1L, 3L, "aa"), (1L, 3L, "cc"))
    for (parts <- Seq(1, 7)) {
      val r = rows.toDF("k", "rts", "rv").repartition(parts)
      val out = Joins.asOfJoin(l, r, "k", "ts", "rts")
        .select("rv").as[String].collect().toSeq
      // greatest payload struct wins — a pure function of the data
      assert(out == Seq("cc"), s"parts=$parts")
    }
  }

  test("asOfJoin: null right timestamps never match (no universal fallback)") {
    // a null rts sorts first under nulls-first ascending; un-filtered it
    // would become the fallback payload for every left row, where ASOF
    // semantics never match a null-timestamp row
    val l = Seq((1L, 10L, "e10"), (1L, 1L, "e1")).toDF("k", "ts", "lv")
    val r = Seq((1L, Some(5L), "r5"), (1L, None: Option[Long], "rNull"))
      .toDF("k", "rts", "rv")
    val out = Joins.asOfJoin(l, r, "k", "ts", "rts")
      .select("lv", "rv").as[(String, Option[String])].collect().toMap
    assert(out == Map("e10" -> Some("r5"), "e1" -> None))
  }

  test("rangeJoin: right_outer/full are rejected (bin explode would " +
      "triple unmatched right rows)") {
    import org.apache.spark.sql.functions.timestamp_micros
    val l = Seq((1L, 100L)).toDF("l_id", "lm")
      .select(col("l_id"), timestamp_micros(col("lm")).as("lts"))
    val r = Seq((10L, 110L)).toDF("r_id", "rm")
      .select(col("r_id"), timestamp_micros(col("rm")).as("rts"))
    for (jt <- Seq("right_outer", "full_outer", "full"))
      assertThrows[IllegalArgumentException](
        Joins.rangeJoin(l, r, "lts", "rts", 10L, jt))
  }

  test("rangeJoin: inclusive band, cross-bin pairs found once, left_outer keeps misses") {
    import org.apache.spark.sql.functions.timestamp_micros
    val tol = 10L // micros
    // 100 vs 110: exactly at tolerance (inclusive). 100 vs 111: out.
    // 109 vs 110: in-band but adjacent bins (10/11) — the explode must
    // find it. 500: isolated, survives only via left_outer.
    val l = Seq((1L, 100L), (2L, 109L), (3L, 500L)).toDF("l_id", "lm")
      .select(col("l_id"), timestamp_micros(col("lm")).as("lts"))
    val r = Seq((10L, 110L), (11L, 111L)).toDF("r_id", "rm")
      .select(col("r_id"), timestamp_micros(col("rm")).as("rts"))
    val out = Joins.rangeJoin(l, r, "lts", "rts", tol, "left_outer")
      .groupBy("l_id").agg(count(col("r_id")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 0L))
    // inner drops the isolated row; no pair is emitted twice
    val pairs = Joins.rangeJoin(l, r, "lts", "rts", tol)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
    assert(pairs.sorted == Seq((1L, 10L), (2L, 10L), (2L, 11L)))
  }

  test("inner requires the key in every source; outer keeps all keys") {
    val a = Seq((1, "a"), (2, "a")).toDF("k", "va")
    val b = Seq((2, "b"), (3, "b")).toDF("k", "vb")
    assert(Joins.inner("k", a, b).select("k").as[Int].collect().toSeq == Seq(2))
    assert(Joins.outer("k", a, b).select("k").as[Int].collect().sorted.toSeq
      == Seq(1, 2, 3))
  }

  test("nested composite expression: outer(inner(A,B), outer(C,D))") {
    // the reference's TestDatamerge.java:261-295 shape — join trees nest
    // because each join is itself a keyed source
    val a = Seq((1, "a1"), (2, "a2")).toDF("k", "va")
    val b = Seq((1, "b1"), (2, "b2"), (3, "b3")).toDF("k", "vb")
    val c = Seq((2, "c2"), (4, "c4")).toDF("k", "vc")
    val d = Seq((4, "d4"), (5, "d5")).toDF("k", "vd")
    val nested = Joins.outer("k", Joins.inner("k", a, b),
      Joins.outer("k", c, d))
    val rows = nested.orderBy("k")
      .as[(Int, Option[String], Option[String], Option[String], Option[String])]
      .collect().toSeq
    assert(rows == Seq(
      (1, Some("a1"), Some("b1"), None, None),       // inner-only key
      (2, Some("a2"), Some("b2"), Some("c2"), None), // both sides
      (4, None, None, Some("c4"), Some("d4")),       // right-outer-only
      (5, None, None, None, Some("d5"))))
    // key 3 is absent: inner(A,B) dropped it and C/D never had it
  }
}

class TextOpsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("tokenCount splits on whitespace and drops empties") {
    val df = Seq("a b  a", "b").toDF("t")
    val out = TextOps.tokenCount(df, col("t"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 2L))
  }

  test("fieldselection 2- keeps trailing fields") {
    val df = Seq("1|x|y").toDF("line")
    val out = df.select(FieldSelection.select(col("line"), "2-", "|"))
      .as[String].collect()
    assert(out.toSeq == Seq("x|y"))
  }

  test("secondary sort ranks within group") {
    val df = Seq((1, "b"), (1, "a"), (2, "z")).toDF("g", "v")
    val out = SecondarySort.ranked(df, col("g"), col("v").asc)
      .select("g", "v", "rn").as[(Int, String, Int)].collect().toSet
    assert(out == Set((1, "a", 1), (1, "b", 2), (2, "z", 1)))
  }
}

class DescriptorJobSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._
  import graft.agg.DescriptorJob

  test("descriptor strings compile to one single-shuffle aggregation") {
    val df = Seq(("a", 1L, "x"), ("a", 2L, "y"), ("b", 5L, "z"))
      .toDF("k", "v", "s")
    val out = DescriptorJob.aggregate(df, col("k"),
      Seq("LongValueSum:v", "LongValueMax:v", "StringValueMin:s",
        "UniqValueCount:s"))
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(rows("a") == ((3L, 2L, "x", 2L)))
    assert(rows("b") == ((5L, 5L, "z", 1L)))
    // Non-distinct descriptors all share ONE shuffle (map-side partials
    // feed a single Exchange, like the reference's combiner). UniqValueCount
    // is excluded: an exact distinct legitimately needs its own expansion.
    val nonDistinct = DescriptorJob.aggregate(df, col("k"),
      Seq("LongValueSum:v", "LongValueMax:v", "StringValueMin:s"))
    val shuffles = nonDistinct.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 1)
  }

  test("user-defined descriptor type (plugin by name)") {
    DescriptorJob.register("ValueConcat",
      v => concat_ws(",", sort_array(collect_list(v))))
    val df = Seq(("a", "q"), ("a", "p")).toDF("k", "v")
    val out = DescriptorJob.aggregate(df, col("k"), Seq("ValueConcat:v"))
    assert(out.collect()(0).getString(1) == "p,q")
    intercept[IllegalArgumentException] {
      DescriptorJob.compile("NoSuchAgg:v")
    }
  }
}

class KeyFieldPartitionSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._
  import graft.ops.KeyFieldPartition

  test("rows sharing the selected key fields land in one partition") {
    val lines = (1 to 200).map(i => s"g${i % 7}\t${i % 3}\tpayload$i")
    val df = lines.toDF("line")
    val parted = KeyFieldPartition.partitionByFields(
      df, col("line"), 1, 2, numPartitions = 8)
    assert(parted.rdd.getNumPartitions == 8)
    val spread = parted
      .select(KeyFieldPartition.fieldKey(col("line"), 1, 2).as("k"))
      .withColumn("pid", spark_partition_id())
      .groupBy("k").agg(countDistinct("pid").as("nparts"))
      .agg(max("nparts")).collect()(0).getLong(0)
    assert(spread == 1L) // every field-key entirely within one partition
  }
}

class StratifiedSamplingSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._
  import graft.ops.Sampling

  test("split is a pure function of the row: stable under repartition") {
    val df = (1L to 500L).toDF("id")
    val tag = Sampling.splitTag(col("id"), 0.2)
    val once = df.select(col("id"), tag).as[(Long, String)].collect().toMap
    val again = df.repartition(13).select(col("id"), tag)
      .as[(Long, String)].collect().toMap
    assert(once == again)
    val testFrac = once.values.count(_ == "test").toDouble / once.size
    assert(testFrac > 0.12 && testFrac < 0.28, s"testFrac=$testFrac")
  }

  test("stratified keeps per-class fractions; unknown classes use default") {
    val df = (1L to 3000L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "zzz"))
      .toDF("id", "cls")
    val kept = df.filter(Sampling.stratified(col("cls"), col("id"),
        Map("a" -> 1.0, "b" -> 0.3), defaultFrac = 0.0))
      .groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(kept("a") == 1000L)                       // frac 1.0 keeps all
    assert(kept("b") > 180L && kept("b") < 420L)     // ~0.3 of 1000
    assert(!kept.contains("zzz"))                    // default 0 drops all
  }
}

class SkewSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._
  import graft.ops.Skew

  test("salted join equals the plain join and joins on (key, salt)") {
    // one hot key (90% of rows) + a long tail
    val skewed = ((1 to 900).map(i => (42, s"hot$i")) ++
      (1 to 100).map(i => (i % 7, s"cold$i"))).toDF("k", "v")
    val dim = Seq((42, "d42"), (0, "d0"), (3, "d3")).toDF("k", "d")
    val salted = Skew.saltedJoin(skewed, dim, "k", salt = 8, col("v"))
    val plain = skewed.join(dim, Seq("k"), "inner")
    assert(salted.count() == plain.count())
    assert(salted.as[(Int, String, String)].collect().toSet ==
      plain.as[(Int, String, String)].collect().toSet)
    // the physical join key carries the salt column
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
  }
}

class CountersSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._
  import graft.metrics.Counters

  test("observed metrics ride the action — no second scan") {
    val df = Seq(1L, 2L, 3L, 4L, 5L).toDF("v")
    val (instrumented, obs) = Counters.observed(df, "job",
      Seq("in_records" -> count(lit(1)),
          "big" -> Counters.countWhere(col("v") > 3),
          "total" -> sum("v")))
    val out = instrumented.filter(col("v") =!= 99).count()
    assert(out == 5)
    val m = obs.get
    assert(m("in_records") == 5L)
    assert(m("big") == 2L)
    assert(m("total") == 15L)
  }

  test("accumulator counter from inside a typed lambda") {
    val df = Seq("a", "bb", "ccc").toDF("s")
    val acc = Counters.counter(df, "long_strings")
    val n = df.as[String].map { s =>
      if (s.length > 1) acc.add(1); s.length
    }.reduce(_ + _)
    assert(n == 6)
    assert(acc.value == 2L)
  }
}

class PortableHllSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("portableHllEstimate tracks exact distinct counts across regimes") {
    // small counts exercise the linear-counting branch, large ones the
    // harmonic estimator; the standard error at m=256 is ~6.5%, so a
    // 25% bound is ~4 sigma — a real sketch bug (wrong rank, wrong
    // scaling, dropped registers) lands orders of magnitude outside it
    val rows = Seq(
      ("tiny", 10), ("small", 80), ("mid", 500), ("big", 3000)
    ).flatMap { case (k, n) => (0 until n).map(i => (k, s"${k}_v$i")) } ++
      (0 until 400).map(i => ("dups", s"dup_v${i % 40}")) // 40 distinct
    val df = rows.toDF("k", "v")
    val est = graft.agg.ValueAggregators
      .portableHllEstimate(df, col("k"), col("v"))
      .as[(String, Long)].collect().toMap
    val exact = Map("tiny" -> 10, "small" -> 80, "mid" -> 500,
      "big" -> 3000, "dups" -> 40)
    for ((k, n) <- exact) {
      val e = est(k)
      assert(math.abs(e - n).toDouble / n <= 0.25,
        s"$k: est $e vs exact $n")
    }
    // determinism: a second evaluation is bit-identical
    val est2 = graft.agg.ValueAggregators
      .portableHllEstimate(df, col("k"), col("v"))
      .as[(String, Long)].collect().toMap
    assert(est == est2)
  }

  test("portableHllEstimate rejects a non-power-of-two register count") {
    val df = Seq(("a", "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      graft.agg.ValueAggregators.portableHllEstimate(df, col("k"),
        col("v"), m = 200)
    }
  }

  test("persisted HLL: build+append+compact == one-shot, replayed appends are no-ops BY ALGEBRA, one file generation after compaction") {
    // the MAX monoid's two faces: split register tables max-merge to
    // the union's registers (build+append == one-shot, bit for bit),
    // and max(a,a) = a makes a re-appended generation invisible to
    // every probe WITHOUT any replay bookkeeping — the mirror image of
    // the additive tiers' double-count hazard
    import graft.agg.ValueAggregators
    val rows = (0 until 900).map(i => (s"k${i % 3}", s"v${i % 450}"))
    val df = rows.toDF("k", "v")
    val (a, b) = (df.filter(col("v").substr(2, 9).cast("int") % 2 === 0),
      df.filter(col("v").substr(2, 9).cast("int") % 2 === 1))
    def tableDir(t: String) = new java.io.File(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t)).location)
    def dataFiles(t: String) = tableDir(t).listFiles()
      .count(f => f.getName.startsWith("part-"))
    try {
      ValueAggregators.writeHllTable(a, col("k"), col("v"), "hll_lc_t")
      ValueAggregators.appendHllTable(b, col("k"), col("v"), "hll_lc_t")
      def probe() = ValueAggregators
        .hllEstimateFromTable(spark, "hll_lc_t")
        .as[(String, Long)].collect().sorted.toSeq
      val oneShot = ValueAggregators
        .portableHllEstimate(df, col("k"), col("v"))
        .as[(String, Long)].collect().sorted.toSeq
      assert(oneShot.nonEmpty && probe() == oneShot)
      // merged registers == one-shot registers, exactly
      def regs() = ValueAggregators
        .hllRegistersFromTable(spark, "hll_lc_t")
        .as[(String, Long, Int)].collect().sorted.toSeq
      val direct = ValueAggregators.hllRegisters(df, col("k"), col("v"))
        .as[(String, Long, Int)].collect().sorted.toSeq
      assert(regs() == direct)
      // replay WITHOUT key bookkeeping: re-append the same batch as a
      // plain batch append — more stored rows, identical probe
      ValueAggregators.appendHllTable(b, col("k"), col("v"), "hll_lc_t")
      assert(regs() == direct && probe() == oneShot,
        "a duplicated register generation changed the max-merge")
      assert(dataFiles("hll_lc_t") == 3)
      // the KEYED streamed path skips a replay before it even lands
      ValueAggregators.streamAppendHllBatch(b, 4L, col("k"), col("v"),
        "hll_lc_t")
      assert(dataFiles("hll_lc_t") == 4)
      ValueAggregators.streamAppendHllBatch(b, 4L, col("k"), col("v"),
        "hll_lc_t")
      assert(dataFiles("hll_lc_t") == 4,
        "a keyed replay landed a duplicate register file")
      assert(regs() == direct && probe() == oneShot)
      ValueAggregators.compactHllTable(spark, "hll_lc_t")
      assert(dataFiles("hll_lc_t") == 1)
      // compacted stored rows == a fresh build's, gen and key included
      ValueAggregators.writeHllTable(df, col("k"), col("v"),
        "hll_lc_ref")
      def stored(t: String) = spark.table(t)
        .as[(String, Long, Int, Long, Long)].collect().sorted.toSeq
      assert(stored("hll_lc_t") == stored("hll_lc_ref"))
      assert(probe() == oneShot)
    } finally {
      spark.sql("DROP TABLE IF EXISTS hll_lc_t")
      spark.sql("DROP TABLE IF EXISTS hll_lc_t_compact_shadow")
      spark.sql("DROP TABLE IF EXISTS hll_lc_ref")
    }
  }
}
