package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Curation

class CurationSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("leakageSafeSplit: exact duplicates share a split, layout-independent") {
    val docs = Seq(
      (10L, "same body"), (3L, "same body"), (77L, "same body"),
      (5L, "unique one"), (6L, "unique two"))
    for (parts <- Seq(1, 7)) {
      val out = Curation.leakageSafeSplit(
          docs.toDF("doc_id", "text").repartition(parts),
          "doc_id", "text")
        .select("doc_id", "rep", "split")
        .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
      // all three copies carry the min-id representative and ONE split
      val dupRows = out.filter(r => Set(10L, 3L, 77L)(r._1))
      assert(dupRows.map(_._2).toSet == Set(3L), s"parts=$parts $out")
      assert(dupRows.map(_._3).toSet.size == 1, s"parts=$parts $out")
      assert(out.map(_._3).forall(Set("train", "val", "test")),
        s"parts=$parts $out")
    }
  }

  test("repetitionMetrics: hand-computed counts, fractions, and the flag") {
    val docs = Seq(
      (1L, "a a b c"),       // dup=1, top word 2, bigrams (a a)(a b)(b c)
      (2L, "x x x x x"),     // dup=4, top word 5, 4x bigram (x x)
      (3L, "p q r s t")      // no repetition at all
    ).toDF("doc_id", "text")
    // toy docs are a few tokens long, so use mid-range thresholds (the
    // corpus defaults are calibrated to real document lengths)
    val out = Curation.repetitionMetrics(docs, "doc_id", "text",
        dupFracMax = 0.5, topBigramFracMax = 0.5)
      .orderBy("doc_id")
      .select("n_tokens", "dup_words", "top_word_cnt", "top_bigram_cnt",
        "dup_word_frac", "top_bigram_frac", "repetitive")
      .as[(Int, Int, Int, Int, Double, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      (4, 1, 2, 1, 0.25, 1.0 / 3, false),
      (5, 4, 5, 4, 0.8, 1.0, true),
      (5, 0, 1, 1, 0.0, 0.25, false)))
  }

  test("repetitionMetrics: degenerate docs yield zeros, never nulls") {
    val docs = Seq((1L, ""), (2L, "solo"), (3L, "  ")).toDF("doc_id", "text")
    val out = Curation.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, Int, Double, Double, Boolean)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 0, 0, 0, 0, 0.0, 0.0, false),
      (2L, 1, 0, 1, 0, 0.0, 0.0, false),
      (3L, 0, 0, 0, 0, 0.0, 0.0, false)))
    // the composable flag agrees on the same degenerate inputs
    val flags = docs.select(Curation.repetitiveFlag(col("text")))
      .as[Boolean].collect().toSeq
    assert(flags == Seq(false, false, false))
  }

  test("repetitionMetrics plans as one map-side projection — no shuffle") {
    val df = SparkEntry.queries("q65_repetition")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("contamination finds exactly the docs sharing a 4-gram with eval") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the dog"), // shares 4-grams
      (11L, "entirely unrelated words live in this document"),
      (12L, "one quick brown fox jumps here")          // shares exactly one
    ).toDF("doc_id", "text")
    val eval = Seq(
      (90L, "the quick brown fox jumps far away")
    ).toDF("doc_id", "text")
    val out = Curation.contamination(corpus, eval, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    // doc 10 shares "the quick brown fox" and "quick brown fox jumps";
    // doc 12 shares only "quick brown fox jumps"; doc 11 nothing
    assert(out == Map(10L -> 2L, 12L -> 1L))
  }

  test("contamination probe broadcasts the eval grams; only hit rows reach an exchange") {
    val df = SparkEntry.queries("q66_contam")(spark, "/root/testdata/sf0.001")
    df.collect()
    // final plan only — AQE appends an "Initial Plan" section that would
    // double-count nodes
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val lines = p.linesIterator.toSeq
    val join = lines.indexWhere(_.contains("BroadcastHashJoin"))
    assert(join >= 0, p)
    // the streamed (corpus) side sits between the join and its broadcast
    // branch: it must reach the parquet scan with NO exchange — the
    // corpus never shuffles, not even its gram hashes
    val bcast = lines.indexWhere(_.contains("BroadcastExchange"), join)
    val streamed = lines.slice(join + 1, bcast)
    assert(streamed.exists(_.contains("FileScan")), p)
    assert(!streamed.exists(_.contains("Exchange")), p)
    // and nothing anywhere shuffles document bodies
    assert(!lines.filter(_.contains("Exchange hashpartitioning"))
      .exists(_.contains("text#")), p)
  }

  test("domainQuota and tokenBudgetSample plan one group-key exchange; bodies never shuffle") {
    for (q <- Seq("q67_quota", "q71_budget")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val exchanges = p.linesIterator
        .filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(exchanges.size == 1, s"$q:\n$p")
      assert(exchanges.head.contains("source#"), s"$q: ${exchanges.head}")
      assert(!exchanges.head.contains("text#"), s"$q: ${exchanges.head}")
    }
  }

  test("domainQuota keeps min(k, group size) rows per group, invariant to input partitioning") {
    val docs = (1L to 30L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", s"doc number $i")).toSeq
      .toDF("doc_id", "source", "text")
    val base = Curation.domainQuota(docs, "doc_id", "source", "text", k = 7)
      .as[(Long, String, Int)].collect().toSet
    val counts = base.groupBy(_._2).view.mapValues(_.size).toMap
    assert(counts == Map("a" -> 7, "b" -> 7))
    assert(base.forall(_._3 <= 7))
    val repart = Curation.domainQuota(docs.repartition(7), "doc_id",
      "source", "text", k = 7).as[(Long, String, Int)].collect().toSet
    assert(repart == base)
  }

  test("tokenBudgetSample: greedy take-while in hash order, first over-budget doc kept") {
    val docs = (1L to 40L).map(i =>
      (i, if (i <= 20) "g1" else "g2",
        Seq.fill(10)(s"w$i").mkString(" "))) // 10 tokens per doc
      .toDF("doc_id", "source", "text")
    val out = Curation.tokenBudgetSample(docs, "doc_id", "text",
      "source", budgetTokens = 35L)
      .as[(Long, String, Int, Long)].collect()
    val byGroup = out.groupBy(_._2)
    // 10-token docs against a 35-token budget: cum 10,20,30 are under,
    // the 4th doc starts at 30 < 35 so it is kept too (cum 40), the 5th
    // starts at 40 and drops -> exactly 4 docs, 40 tokens per group
    assert(byGroup.keySet == Set("g1", "g2"))
    byGroup.values.foreach { g =>
      assert(g.length == 4)
      assert(g.map(_._4).max == 40L)
    }
    // determinism: the kept set is a pure content function
    val again = Curation.tokenBudgetSample(docs.repartition(9), "doc_id",
      "text", "source", budgetTokens = 35L)
      .as[(Long, String, Int, Long)].collect()
    assert(again.toSet == out.toSet)
  }

  test("decontaminateBroadcast equals the exact join screen on batch, and runs unchanged on a stream") {
    val corpus = Seq(
      (10L, "s1", "the quick brown fox jumps over the dog"),
      (11L, "s1", "entirely unrelated words live in this document"),
      (12L, "s2", "one quick brown fox jumps here")
    ).toDF("doc_id", "source", "text")
    val eval = Seq((90L, "s9", "the quick brown fox jumps far away"))
      .toDF("doc_id", "source", "text")
    val batchKept = Curation.decontaminateBroadcast(corpus, eval,
      "doc_id", "text", n = 4).select("doc_id").as[Long].collect().toSet
    assert(batchKept == Set(11L)) // 10 and 12 share 4-grams with eval
    // the same call compiles as a streaming plan: map-side only, no state
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)](spark)
    ms.addData((10L, "s1", "the quick brown fox jumps over the dog"),
      (11L, "s1", "entirely unrelated words live in this document"),
      (12L, "s2", "one quick brown fox jumps here"))
    val streamDf = ms.toDF().toDF("doc_id", "source", "text")
    val q = Curation.decontaminateBroadcast(streamDf, eval, "doc_id",
        "text", n = 4)
      .select("doc_id")
      .writeStream.format("memory").queryName("bloom_decontam_test")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("bloom_decontam_test")
      .as[Long].collect().toSet
    assert(streamed == batchKept)
  }

  test("fuzzyDecontaminate drops exactly the >= threshold near-dups of the eval set, either similarity orientation") {
    // one verbatim copy, one near-copy (jaccard ~0.9 on 3-shingles), one
    // doc that SHARES a gram but sits far below the threshold (the case
    // that separates fuzzy-at-0.8 from q72's any-shared-gram screen:
    // exact-gram would drop it, fuzzy keeps it), one unrelated doc
    val evalDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (10L, "s1", evalDoc),                                      // copy
      (11L, "s1", evalDoc + " lambda"),                          // near-dup
      (12L, "s2", "alpha beta gamma unrelated tail of words " +
        "continues with completely different content here"),     // 1 gram
      (13L, "s2", "entirely different text with no overlap at all")
    ).toDF("doc_id", "source", "text")
    val eval = Seq((97L, "s9", evalDoc)).toDF("doc_id", "source", "text")
    val kept = Curation.fuzzyDecontaminate(corpus, eval, "doc_id", "text",
        "source", n = 3, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(12L, 13L), kept)
  }

  test("decontaminateBroadcast sketch mode is one-sided: contaminated docs never survive") {
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val eval = docs.filter(col("doc_id") % 97 === 0)
    val exactKept = Curation.decontaminateBroadcast(corpus, eval,
      "doc_id", "text", n = 4).select("doc_id").as[Long].collect().toSet
    val sketchKept = Curation.decontaminateBroadcast(corpus, eval,
      "doc_id", "text", n = 4, fpp = Some(1e-6))
      .select("doc_id").as[Long].collect().toSet
    // Bloom may over-drop (false positives) but NEVER under-drop
    assert(sketchKept.subsetOf(exactKept))
    val dropped = exactKept.size - sketchKept.size
    assert(dropped <= exactKept.size / 20,
      s"sketch over-dropped $dropped of ${exactKept.size}")
  }

  test("cleanCorpusStream equals cleanCorpus row for row (incl. dedup + rollup)") {
    val rows = Seq(
      (1L, "srcA", "the a of and to in is it that for " +
        (1 to 60).map(i => s"w$i").mkString(" ")),
      (2L, "srcA", "spam spam spam spam spam spam spam spam"),
      (3L, "srcB", "contaminated quick brown fox jumps straight over"),
      (4L, "srcB", "x"),
      (5L, "srcB", "spam spam spam spam spam spam spam spam")) // dup of 2
    val eval = Seq((90L, "srcE", "contaminated quick brown fox jumps far"))
      .toDF("doc_id", "source", "text")
    val corpus = rows.toDF("doc_id", "source", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    val batch = norm(Curation.cleanCorpus(corpus, eval,
      "doc_id", "text", "source"))
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)](spark)
    ms.addData(rows)
    val streamed = norm(graft.streaming.EventStreams.runToMemory(
      Curation.cleanCorpusStream(ms.toDF().toDF("doc_id", "source", "text"),
        corpus, eval, "doc_id", "text", "source"),
      "clean_stream_test",
      org.apache.spark.sql.streaming.OutputMode.Complete()))
    assert(batch == streamed, s"batch=$batch stream=$streamed")
    // the fixture exercises every verdict: a dup pair, a repetitive doc,
    // a contaminated doc, a low-quality doc, and one clean survivor
    assert(batch.exists(r => r._1 == "srcA" && r._7 == 1L), batch)
  }

  test("streaming curation capstone: quality + repetition + decontamination compose on one stream, matching batch verdicts") {
    import graft.pipeline.TextAnalysis
    val rows = Seq(
      (1L, "the a of and to in is it that for " + (1 to 60).map(i => s"v$i").mkString(" ")),
      (2L, "spam spam spam spam spam spam spam spam"),        // repetitive
      (3L, "contaminated quick brown fox jumps straight over"), // shares eval grams
      (4L, "x")                                                // low quality
    )
    val eval = Seq((90L, "contaminated quick brown fox jumps far"))
      .toDF("doc_id", "text")
    def pipelineOf(df: org.apache.spark.sql.DataFrame) =
      Curation.decontaminateBroadcast(
        df.filter(!Curation.repetitiveFlag(col("text"), 0.68, 0.5))
          .filter(TextAnalysis.qualityExpr(col("text")) >= 0.5),
        eval, "doc_id", "text", n = 4)
    val batchKept = pipelineOf(rows.toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect().toSet
    assert(batchKept == Set(1L), batchKept)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    ms.addData(rows)
    val q = pipelineOf(ms.toDF().toDF("doc_id", "text")).select("doc_id")
      .writeStream.format("memory").queryName("curation_capstone")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("curation_capstone").as[Long].collect().toSet
      == batchKept)
  }

  test("packBatches: whole-doc greedy fill — every batch starts under budget, assignment is content-pure") {
    val docs = (1L to 60L).map(i => (i, Seq.fill(10)(s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.packBatches(docs, "doc_id", "text", numShards = 2,
      budgetTokens = 35L).as[(Long, Long, Int, Long)].collect()
    // 10-token docs, 35-token budget: cum-before runs 0,10,20,30,40... so
    // batches hold docs starting at <35, <70, ... -> 4 docs per batch
    out.groupBy(r => (r._2, r._4)).values.foreach(g => assert(g.size <= 4))
    // batch ids are contiguous from 0 within each shard
    out.groupBy(_._2).values.foreach { g =>
      val ids = g.map(_._4).distinct.sorted.toSeq
      assert(ids == (0L until ids.length).toSeq, ids)
    }
    val again = Curation.packBatches(docs.repartition(11), "doc_id",
      "text", numShards = 2, budgetTokens = 35L)
      .as[(Long, Long, Int, Long)].collect()
    assert(again.toSet == out.toSet)
  }

  test("chunkDocuments: overlapping windows cover every token, last chunk short") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b"),                            // shorter than one window
      (3L, "   ")                             // token-less: emits nothing
    ).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(docs, "doc_id", "text",
        windowTokens = 4, overlap = 1)
      .as[(Long, Int, String, Int)].collect().toSet
    // stride 3: chunks at tokens 1-4, 4-7, 7-10 (1-based)
    assert(out == Set(
      (1L, 0, "t1 t2 t3 t4", 4),
      (1L, 1, "t4 t5 t6 t7", 4),
      (1L, 2, "t7 t8 t9 t10", 4),
      (2L, 0, "a b", 2)), out)
    // coverage property on a spread of lengths: every token index lands
    // in some chunk, consecutive chunks share exactly `overlap` tokens
    // except the (possibly short) last one
    for (n <- Seq(1, 3, 4, 5, 8, 63, 64, 65, 200); ov <- Seq(0, 8)) {
      val doc = Seq((9L, (1 to n).map(i => s"w$i").mkString(" ")))
        .toDF("doc_id", "text")
      val chunks = Curation.chunkDocuments(doc, "doc_id", "text", 64, ov)
        .orderBy("chunk_id")
        .as[(Long, Int, String, Int)].collect()
      val covered = chunks.flatMap(_._3.split(" ")).toSet
      assert(covered == (1 to n).map(i => s"w$i").toSet, s"n=$n ov=$ov")
      assert(chunks.map(_._4).sum == n + (chunks.length - 1) * ov,
        s"n=$n ov=$ov: overlap accounting")
    }
  }

  test("vocabEncode: ids by frequency rank, documents re-encoded in order") {
    val docs = Seq((1L, "b a b"), (2L, "c a b")).toDF("doc_id", "text")
    val out = graft.pipeline.TextAnalysis.vocabEncode(docs, "doc_id", "text")
      .as[(Long, Long, String)].collect()
      .map { case (id, n, ids) => id -> ((n, ids)) }.toMap
    // counts: b=3 -> id 1, a=2 -> id 2, c=1 -> id 3
    assert(out(1L) == ((3L, "1,2,1")), out)
    assert(out(2L) == ((3L, "3,2,1")), out)
  }

  test("maskPii masks emails, phones, then numbers, with per-kind counts") {
    val rows = Seq(
      (1L, "call 555-867-5309 or mail bob@example.com x2 42"),
      (2L, "no pii here at all")
    ).toDF("event_id", "props")
    val out = Curation.maskPii(rows, "event_id", "props")
      .orderBy("event_id")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      // n_numbers counts every digit run of the ORIGINAL text (5: three
      // inside the phone, the x2, the 42) — masking order then collapses
      // the phone before bare-number replacement sees it
      (1L, 1, 1, 5, "call <PHONE> or mail <EMAIL> x<NUM> <NUM>"),
      (2L, 0, 0, 0, "no pii here at all")))
  }

  test("temperatureMix: alpha=1 keeps all, alpha=0 equalizes toward the smallest source") {
    val docs = ((1L to 400L).map(i => (i, "big")) ++
      (401L to 440L).map(i => (i, "small")))
      .map { case (i, s) => (i, s, s"text $i") }
      .toDF("doc_id", "source", "text")
    val all = Curation.temperatureMix(docs, "doc_id", "source", alpha = 1.0)
    assert(all.count() == 440) // natural mix untouched
    val flat = Curation.temperatureMix(docs, "doc_id", "source", alpha = 0.0)
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // keep-rate for big = 40/400 = 0.1 -> ~40 expected of 400 (hash
    // noise ±; the threshold is exact, membership is hash-distributed)
    assert(flat("small") == 40)
    assert(flat("big") > 20 && flat("big") < 60, flat)
    // rerun determinism incl. under different partitioning
    val again = Curation.temperatureMix(docs.repartition(7), "doc_id",
      "source", alpha = 0.0).as[(Long, String)].collect().toSet
    val base = Curation.temperatureMix(docs, "doc_id", "source", alpha = 0.0)
      .as[(Long, String)].collect().toSet
    assert(again == base)
  }

  test("shardId is a pure content function: stable across partitioning, in range") {
    val docs = (1L to 100L).map(i => (i, s"document body $i")).toSeq
      .toDF("doc_id", "text")
    val a = docs.select(col("doc_id"),
      Curation.shardId(col("text"), 8).as("s")).as[(Long, Long)]
      .collect().toMap
    val b = docs.repartition(13).select(col("doc_id"),
      Curation.shardId(col("text"), 8).as("s")).as[(Long, Long)]
      .collect().toMap
    assert(a == b)
    assert(a.values.forall(s => s >= 0 && s < 8))
    assert(a.values.toSet.size > 1) // actually spreads
  }

  test("composable qualityExpr / repetitiveFlag equal the metric-frame outputs bit-for-bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaExpr = docs.select(col("doc_id"),
      graft.pipeline.TextAnalysis.qualityExpr(col("text")).as("q"),
      Curation.repetitiveFlag(col("text")).as("r"))
    val viaFrames = graft.pipeline.TextAnalysis
      .qualityScore(docs, "doc_id", "text").select("doc_id", "quality")
      .join(Curation.repetitionMetrics(docs, "doc_id", "text")
        .select("doc_id", "repetitive"), "doc_id")
    // exact equality, not tolerance: both must run the same int divisions
    assert(viaExpr.join(viaFrames, "doc_id")
      .filter(col("q") =!= col("quality") || col("r") =!= col("repetitive"))
      .count() == 0)
  }

  test("cleanCorpus: degenerate docs land in a drop bucket, never in limbo") {
    val corpus = Seq(
      (1L, "s1", ""),               // empty: NULL quality -> low_quality
      (2L, "s1", "   "),            // whitespace-only: same
      (3L, "s1", ((1 to 50).map(i => s"w$i") ++
        Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"))
        .mkString(" "))
    ).toDF("doc_id", "source", "text")
    val eval = Seq((90L, "s9", "zz yy xx ww vv uu")).toDF("doc_id", "source", "text")
    val out = Curation.cleanCorpus(corpus, eval, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val (_, n, dup, rep, cont, lowq, kept) = out(0)
    assert(n == 3 && lowq == 2 && kept == 1, out.toSeq)
    assert(kept >= n - dup - rep - cont - lowq, out.toSeq)
  }

  test("cleanCorpus: per-source totals reconcile and every doc is accounted for") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q70_clean")(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val corpus = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") % 97 =!= 0)
    assert(out.map(_._2).sum == corpus.count())
    // kept never exceeds docs minus any single drop reason
    out.foreach { case (_, n, dup, rep, cont, lowq, kept) =>
      assert(kept <= n - Seq(dup, rep, cont, lowq).max)
      assert(kept >= n - dup - rep - cont - lowq) // reasons can overlap
    }
  }

  test("cleanCorpus: no exchange carries document bodies (the 100 TB claim)") {
    val df = SparkEntry.queries("q70_clean")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(exchanges.nonEmpty && !exchanges.contains("text#"), exchanges)
  }

  test("filtered ANN pushes the label predicate into the corpus parquet scan") {
    val df = SparkEntry.queries("q76_filtered")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("LessThan(label,3)"), p)
  }

  test("writeShards roundtrip: every row lands in its content-derived shard dir") {
    val docs = (1L to 50L).map(i => (i, s"shardable text $i")).toSeq
      .toDF("doc_id", "text")
    val out = tmpDir("curation_shards")
    Curation.writeShards(docs, "text", numShards = 4, out)
    val back = spark.read.parquet(out)
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        Curation.shardId(col("text"), 4).as("expect"))
    assert(back.count() == 50)
    assert(back.filter(col("shard") =!= col("expect")).count() == 0)
  }
}
