package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dataset card as a SELF-MAINTAINING artifact (qff) — the
  * composition the four maintained tiers exist for, closed under
  * streaming: ONE maintenance loop consumes the document stream and,
  * per micro-batch, lands one generation in EACH of the four card
  * tables — per-source length sketch ([[Sketches]]), per-source
  * count-min counters ([[TextAnalysis]]), per-source distinct-token
  * HLL registers ([[graft.agg.ValueAggregators]]), and the per-source
  * min-k eval holdout ([[Samples]]) — under ONE shared deterministic
  * (lineage, batchId) key. Each table's append is the single-file
  * atomic rename of its tier, independently replay-guarded by the
  * shared key, so the multi-table "transaction" needs no coordinator:
  * a crash that lands 2 of 4 tables retries the batch, the 2 committed
  * tables skip on their keys, the other 2 append — per-table
  * exactly-once within the lineage, spec-gated. The card probe
  * ([[card]]) then reads TABLES ONLY (the qfd plan assertion's shape):
  * the dataset card maintains itself from the stream and is served
  * without ever scanning the corpus.
  *
  * Compaction note: run the tier compactors (or their `maybeCompact`
  * policies) BETWEEN lineages, not while this loop is live — a
  * compaction clears the lineage's committed replay keys (the
  * [[MergeTables]] contract), which is safe for the within-run memo
  * but would un-guard a checkpoint-resumed lineage. */
object DatasetCard {

  /** Start the maintenance loop. The four tables must exist (write
    * their generation 0 from the initial batch corpus first — the
    * tiers' append contract). One lineage id serves all four tables —
    * [[MergeTables.allocLineageAcross]] registers it on EVERY table so
    * a concurrent loop sharing any one of them cannot draw the same
    * id. */
  def startMaintain(docStream: DataFrame, lenTable: String,
      cmTable: String, hllTable: String, smpTable: String, k: Int,
      width: Int = 1024, depth: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docStream.sparkSession
    val lineage = MergeTables.allocLineageAcross(spark,
      Seq(lenTable, cmTable, hllTable, smpTable))
    val committed =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!committed.contains(batchId)) {
          maintainBatch(batch, batchId, lenTable, cmTable, hllTable,
            smpTable, k, width, depth, lineage)
          committed.add(batchId)
          ()
        }
      }
      .start()
  }

  /** One micro-batch into all four tables — exposed for the partial-
    * crash replay spec (re-deliver a batchId after only SOME tables
    * committed; the committed ones must skip, the others append). */
  private[graft] def maintainBatch(batch: DataFrame, batchId: Long,
      lenTable: String, cmTable: String, hllTable: String,
      smpTable: String, k: Int, width: Int, depth: Int,
      lineage: Long): Unit = {
    // len leg skips null text (the card oracle's baseWhere; the other
    // legs are null-transparent — split/explode skip null text rows)
    Sketches.streamAppendGroupedSketchBatch(
      batch.filter(col("text").isNotNull), batchId,
      col("source"), length(col("text")), lenTable, lineage = lineage)
    MergeTables.appendBatch(batch, batchId, "b", cmTable, lineage)(
      TextAnalysis.groupedCountMinCounters(_, "source", "text", width,
          depth)
        .withColumn("w", lit(width)).withColumn("dep", lit(depth)))
    MergeTables.appendBatch(batch, batchId, "b", hllTable, lineage)(
      b => graft.agg.ValueAggregators.hllRegisters(
        b.select(col("source"), explode(
          expr("filter(split(text, ' '), x -> length(x) > 0)"))
          .as("tok")),
        col("source"), col("tok")))
    Samples.streamAppendGroupedSampleBatch(batch, batchId, "source",
      "doc_id", k, smpTable, lineage)
  }

  /** [[startMaintain]] drained to completion. */
  def maintainBlocking(docStream: DataFrame, lenTable: String,
      cmTable: String, hllTable: String, smpTable: String, k: Int,
      width: Int = 1024, depth: Int = 4): Unit = {
    val q = startMaintain(docStream, lenTable, cmTable, hllTable,
      smpTable, k, width, depth)
    try q.processAllAvailable() finally q.stop()
  }

  /** The card probe — one row per source from TABLES ONLY (the qfd
    * plan assertion: no corpus scan exists structurally). Shared by
    * qfd (batch-maintained tables over the survivor set) and qff (the
    * self-maintained tables of [[startMaintain]]), so the two rows
    * cannot drift in shape. */
  def card(spark: SparkSession, lenTable: String, cmTable: String,
      hllTable: String, smpTable: String, auditToks: Seq[String],
      k: Int, pcts: Seq[Int], width: Int = 1024, depth: Int = 4)
      : DataFrame = {
    val lens = Sketches.groupedQuantilesFromSketchTable(spark,
        lenTable, pcts)
      .groupBy("g").agg(
        max(when(col("pct") === 50, col("est_low"))).as("len_p50_lo"),
        max(when(col("pct") === 50, col("est_high"))).as("len_p50_hi"),
        max(when(col("pct") === 99, col("est_low"))).as("len_p99_lo"),
        max(when(col("pct") === 99, col("est_high"))).as("len_p99_hi"))
    val ests = TextAnalysis.groupedCountMinTokenEstimates(spark,
      cmTable, auditToks, width = width, depth = depth)
    val hhCols = auditToks.map(t =>
      max(when(col("tok") === t, col("est"))).as(s"est_$t"))
    val hh = ests.groupBy("g").agg(hhCols.head, hhCols.tail: _*)
    val dt = graft.agg.ValueAggregators.hllEstimateFromTable(spark,
        hllTable)
      .select(col("key").as("g"), col("est").as("distinct_tokens"))
    val sm = Samples.groupedSampleFromTable(spark, smpTable, k)
      .groupBy("g").agg(concat_ws(",",
        transform(
          array_sort(collect_list(struct(col("hk"), col("id")))),
          x => x.getField("id").cast("string"))).as("holdout_ids"))
    lens.join(hh, "g").join(dt, "g").join(sm, "g")
      .select(col("g").as("source") +: col("len_p50_lo") +:
        col("len_p50_hi") +: col("len_p99_lo") +: col("len_p99_hi") +:
        auditToks.map(t => col(s"est_$t")) :+
        col("distinct_tokens") :+ col("holdout_ids"): _*)
  }
}
