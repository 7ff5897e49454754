package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE persisted-table protocol shared by every MERGEABLE-STATE
  * artifact in the approximate tier — quantile bucket counts
  * ([[Sketches]]), count-min counters
  * ([[TextAnalysis.writeCountMinTable]]), and HLL registers
  * ([[graft.agg.ValueAggregators.writeHllTable]]). All three persist a
  * bounded keyed-state table whose generations combine under an
  * associative-commutative merge, so they share one physical story:
  *
  *  - a WRITE is `MapFiles.write` of generation 0;
  *  - an APPEND lands one batch's state as one more single-file
  *    generation (the stored side is never read, merged, or rewritten
  *    — generations merge at PROBE time), so its crash safety is the
  *    file-commit rename itself: a crashed append leaves the exact
  *    pre-append state, no commit protocol needed
  *    ([[TextAnalysis.commitBm25Gen]]'s argument);
  *  - `batch_key` rides the generation's own rows (−1 for batch
  *    operations, [[streamKey]] for streamed micro-batches), so replay
  *    detection and the state it guards commit in the same rename —
  *    unlike the BM25/ADC tiers, no separate commit table exists to
  *    get out of sync;
  *  - a COMPACTION rewrites all generations into one gen-0 file via
  *    the probe's own merge (state-sized work, independent of the
  *    corpus the state summarizes), through the shadow-then-rename
  *    swap of the index tiers, clearing batch keys — which is what
  *    permits a fresh streaming lineage afterward
  *    ([[Similarity.streamBatchKeyBase]]).
  *
  * What DIFFERS per artifact is only the merge monoid, and with it the
  * delete story: SUM-merged counts ([[mergedSum]]) support deletion by
  * additive RETRACTION (negated counts cancel exactly; a negative
  * merged count fails loudly) but double-count a replayed append —
  * hence the batch keys; MAX-merged registers ([[mergedMax]]) are
  * naturally replay-IDEMPOTENT (max(a,a) = a) but cannot retract (max
  * is not invertible — deletion is a rebuild by contract).
  *
  * Reference contract: the write-once sorted-artifact story of
  * `io/MapFile.java:49` plus the aggregate framework's mergeable
  * partial states (`mapred/lib/aggregate/ValueAggregator.java`). */
private[graft] object MergeTables {

  /** Write generation 0 — drops any prior table ([[graft.sources.MapFiles.write]]). */
  def write(state: DataFrame, keyCol: String, table: String): Unit =
    graft.sources.MapFiles.write(
      state.withColumn("gen", lit(0L))
        .withColumn("batch_key", lit(-1L)).coalesce(1),
      keyCol, 1, table)

  /** Land one batch's state as one single-file generation. The
    * `batch_key` column gets a parquet bloom filter so the per-batch
    * replay probe ([[replayed]]) skips non-matching row groups from
    * the footer instead of reading every generation's rows. Recovers
    * a crashed compaction first ([[recoverCompactCrash]]). */
  def append(state: DataFrame, keyCol: String, table: String,
      batchKey: Long = -1L): Unit = {
    recoverCompactCrash(state.sparkSession, table)
    require(state.sparkSession.catalog.tableExists(table),
      s"$table does not exist — write it before appending")
    state
      .withColumn("gen", lit(graft.sources.MapFiles.freshGen()))
      .withColumn("batch_key", lit(batchKey))
      .coalesce(1)
      .write.mode("append")
      .option("parquet.bloom.filter.enabled#batch_key", "true")
      .bucketBy(1, keyCol).sortBy(keyCol)
      .saveAsTable(table)
  }

  /** Per-process registry of the highest lineage id handed out per key
    * table, so two CONCURRENT streaming queries in one driver can never
    * draw the same id even before either commits a key. Guarded by
    * [[allocLineage]]'s synchronization. */
  private val liveLineages =
    scala.collection.mutable.Map.empty[String, Long]

  /** Allocate a fresh streaming LINEAGE id — one per `start()`ed
    * streaming query. Spark's micro-batch ids restart at 0 for every
    * fresh checkpoint lineage, so a key derived from the batchId alone
    * would collide across two streaming queries against the same table
    * and the second query's first batches would be silently skipped as
    * "replays" — real data loss. Allocation is DETERMINISTIC, not
    * random (the r14 random draw had a ~2^-20 per-pair silent-skip
    * collision): the next id is max(highest lineage COMMITTED into
    * `keyTable`, highest id handed out by this process) + 1 — committed
    * state makes sequential runs collision-free, the in-process
    * registry makes concurrent queries in one driver collision-free.
    * `keyTable` is wherever the tier stores its `batch_key` column:
    * the state table itself for [[MergeTables]] tiers, `table_s` /
    * `table_g` for the BM25 / ADC generation-protocol tiers.
    *
    * SCOPE (enforced by construction, not luck): two concurrent
    * streaming writers in SEPARATE driver processes against one table
    * are outside this protocol — nothing coordinates their registries
    * until a key commits — and remain a single-writer-process
    * deployment rule, as on every tier. */
  def allocLineage(spark: SparkSession, keyTable: String): Long =
    synchronized {
      val stored =
        if (!spark.catalog.tableExists(keyTable)) 0L
        else {
          val row = spark.table(keyTable)
            .filter(col("batch_key") >= Similarity.streamBatchKeyBase)
            .agg(max("batch_key")).head()
          // drop the relation this read just cached: the streamed
          // appends that follow land from micro-batch CLONE sessions,
          // and a stale file listing cached here would hide their
          // generations from this session's later probes (observed:
          // the allocating session read back only pre-stream state)
          spark.catalog.refreshTable(keyTable)
          if (row.isNullAt(0)) 0L
          else (row.getLong(0) - Similarity.streamBatchKeyBase) >> 28
        }
      val next = math.max(stored, liveLineages.getOrElse(keyTable, 0L)) + 1
      liveLineages(keyTable) = next
      next
    }

  /** Allocate ONE lineage id valid across SEVERAL tables (the
    * multi-table maintenance loop, [[DatasetCard.startMaintain]]): the
    * max of each table's next id, REGISTERED on every table — without
    * that registration a concurrent loop sharing one of the tables
    * could draw the same id (its own table's registry never saw the
    * max) and its batches would be silently skipped as the other
    * loop's replays. */
  def allocLineageAcross(spark: SparkSession, tables: Seq[String])
      : Long = synchronized {
    require(tables.nonEmpty, "no tables")
    val next = tables.map(allocLineage(spark, _)).max
    tables.foreach(t =>
      liveLineages(t) = math.max(liveLineages.getOrElse(t, 0L), next))
    next
  }

  /** The deterministic streaming commit key of (`lineage`, `batchId`)
    * ([[Similarity.streamBatchKeyBase]] + lineage·2^28 + batchId —
    * distinct from every batch key (−1) and across lineages). The
    * per-lineage batchId budget is 2^28 (~8.5 years of one-second
    * triggers) and the lineage budget 2^34 (one allocation per started
    * query — unreachable), both ENFORCED rather than wrapped; keys
    * stay below 2^63. */
  def streamKey(lineage: Long, batchId: Long): Long = {
    require(lineage >= 0 && lineage < (1L << 34),
      s"lineage $lineage outside [0, 2^34)")
    require(batchId >= 0 && batchId < (1L << 28),
      s"batchId $batchId outside the per-lineage 2^28 key budget")
    Similarity.streamBatchKeyBase + (lineage << 28) + batchId
  }

  /** True iff `key` already committed into `table` — the replay check
    * of every streamed append. Cost: one footer-level probe per stored
    * generation (bloom on `batch_key`); the compaction contract keeps
    * the generation count bounded. */
  def replayed(spark: SparkSession, table: String, key: Long)
      : Boolean =
    !spark.table(table).filter(col("batch_key") === key).isEmpty

  /** The ONE streamed-append loop every MergeTables tier shares:
    * per micro-batch, derive the tier's state via `stateOf` and land
    * it under the deterministic (lineage, batchId) key unless that key
    * already committed. A per-run memo of committed batchIds
    * short-circuits the table probe when foreachBatch re-delivers
    * within the run; the table check stays authoritative (it alone
    * survives a driver restart). Returns the started query — callers
    * own the trigger cadence.
    *
    * Replay exactness holds WITHIN a lineage (the only place
    * foreachBatch can re-deliver a batchId through this API). A query
    * that DIES and is re-run from scratch gets a fresh lineage and
    * re-reads its source from offset 0 — on the additive tiers that
    * double-counts, by design of the scope. A caller who needs
    * crash-RESUME instead passes `checkpointLocation` (so Spark resumes
    * offsets and batchIds) together with the `lineage` id it persisted
    * from the first run — resumed batchIds then hit the committed keys
    * of the original lineage and skip exactly. */
  def streamAppend(stream: DataFrame, keyCol: String, table: String,
      checkpointLocation: Option[String] = None,
      lineage: Option[Long] = None)
      (stateOf: DataFrame => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val lin = lineage.getOrElse(
      allocLineage(stream.sparkSession, table))
    val committed =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val w = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!committed.contains(batchId)) {
          appendBatch(batch, batchId, keyCol, table, lin)(stateOf)
          committed.add(batchId)
          ()
        }
      }
    checkpointLocation.foreach(p => w.option("checkpointLocation", p))
    w.start()
  }

  /** [[streamAppend]]'s body for one micro-batch — exposed (and used
    * by the tiers' spec-visible `*Batch` functions, which default
    * `lineage` to 0 so replay specs can re-deliver a batchId
    * directly). */
  private[graft] def appendBatch(batch: DataFrame, batchId: Long,
      keyCol: String, table: String, lineage: Long)
      (stateOf: DataFrame => DataFrame): Unit = {
    val key = streamKey(lineage, batchId)
    if (!replayed(batch.sparkSession, table, key))
      append(stateOf(batch), keyCol, table, key)
  }

  /** [[streamAppend]] drained to completion — the blocking form the
    * tiers' `streamAppend*Table` wrappers share. */
  def streamAppendBlocking(stream: DataFrame, keyCol: String,
      table: String)(stateOf: DataFrame => DataFrame): Unit = {
    val q = streamAppend(stream, keyCol, table)(stateOf)
    try q.processAllAvailable() finally q.stop()
  }

  /** Probe-time merge for SUM-monoid state (counts): exact long sums
    * per key, fully-cancelled keys dropped (retraction leaves no
    * zero-count residue in any estimate), and a NEGATIVE merged count
    * — only possible by retracting state never added — fails loudly
    * instead of probing a corrupt table. */
  /** The table, crash-recovered and FRESHLY LISTED: probes interleave
    * with appends from other sessions (streaming micro-batch clones,
    * a maintenance loop's driver session), and a relation cached by an
    * earlier read in this session would silently hide their
    * generations. Listing is bounded-file work under the compaction
    * contract. */
  private[graft] def freshView(spark: SparkSession, table: String)
      : DataFrame = {
    recoverCompactCrash(spark, table)
    if (spark.catalog.tableExists(table))
      spark.catalog.refreshTable(table)
    spark.table(table)
  }

  def mergedSum(spark: SparkSession, table: String,
      keyCols: Seq[String], cntCol: String): DataFrame = {
    freshView(spark, table).groupBy(keyCols.map(col): _*)
      .agg(sum(cntCol).as(cntCol))
      .select(keyCols.map(col) :+
        when(col(cntCol) >= 0L, col(cntCol)).otherwise(raise_error(
          concat(lit(s"table $table: negative merged count (retracted " +
            s"state that was never added) at ${keyCols.head}="),
          col(keyCols.head).cast("string")))).as(cntCol): _*)
      .filter(col(cntCol) > 0L)
  }

  /** Probe-time merge for MAX-monoid state (registers): element-wise
    * max per key. Idempotent by algebra — a replayed generation cannot
    * change the merge — so this monoid needs no negative guard and has
    * no retraction. */
  def mergedMax(spark: SparkSession, table: String,
      keyCols: Seq[String], valCol: String): DataFrame =
    freshView(spark, table).groupBy(keyCols.map(col): _*)
      .agg(max(valCol).as(valCol))

  /** Number of stored generations — the input to the compaction
    * policy ([[maybeCompact]]) and the quantity every probe's
    * footer-level replay check scales with. */
  def generationCount(spark: SparkSession, table: String): Long =
    freshView(spark, table).select("gen").distinct().count()

  /** Compact iff the stored generation count exceeds `maxGen` — the
    * auto-compaction trigger the manual compactors lacked (r14 verdict
    * item 4): run it BETWEEN lineages (batch-append loops, maintenance
    * windows, after a streaming query stops) and the table never
    * accumulates more than ~maxGen generations, bounding both the
    * probe-time merge fan-in and [[replayed]]'s per-append footer
    * probes. NEVER while a streaming lineage is live on the table:
    * compaction clears the lineage's committed replay keys, so a
    * checkpoint-RESUMED query would re-append its already-committed
    * batches (the within-run memo still guards the running query, but
    * nothing guards a resume). Returns true iff it compacted. `merged`
    * is call-by-name: the probe's merged view is only constructed (and
    * only reads the table) when the threshold trips. */
  def maybeCompact(spark: SparkSession, table: String, keyCol: String,
      maxGen: Int)(merged: => DataFrame): Boolean =
    maybeCompactWith(spark, table, maxGen)(
      compact(spark, table, keyCol, merged))

  /** The threshold check alone, for tiers whose compactor is not a
    * plain [[compact]] call (param-preserving count-min, k-recording
    * samples): runs `doCompact` iff more than `maxGen` generations
    * accumulated. */
  def maybeCompactWith(spark: SparkSession, table: String, maxGen: Int)
      (doCompact: => Unit): Boolean = {
    require(maxGen >= 1, s"maxGen=$maxGen")
    if (generationCount(spark, table) <= maxGen) false
    else { doCompact; true }
  }

  /** The default compaction threshold: the measured
    * probe-cost-vs-generation-count curve (BASELINE.md r15) is flat to
    * ~16 generations, 1.5× at 256, 9× at 4096 — 64 is indistinguishable
    * from the floor on every tier while amortizing one compaction per
    * 64 appends to noise. */
  val defaultMaxGen = 64

  /** If a prior [[compact]] crashed between its DROP and RENAME —
    * the one crash window the swap has — the data survives under the
    * shadow name with no table at the live name. Finishing the rename
    * IS the recovery (the shadow holds the complete merged state, by
    * construction), so every write/probe entry point runs this first
    * and the window heals on next touch instead of stranding the
    * table. No-op unless exactly that state is found. */
  private def recoverCompactCrash(spark: SparkSession, table: String)
      : Unit = {
    val shadow = table + "_compact_shadow"
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(shadow)) {
      spark.sql(s"ALTER TABLE `$shadow` RENAME TO `$table`")
      spark.catalog.refreshTable(table)
    }
  }

  /** Rewrite all generations into one gen-0 file: `merged` must be the
    * probe's own merged view of `table` (so compacted == appended ==
    * rebuilt is definitional), materialized BEFORE the swap because it
    * reads the table being replaced. The swap is shadow-write, DROP,
    * RENAME: a crash before the DROP leaves the old table fully live
    * (the shadow is invisible to probes and overwritten by the next
    * compact); a crash BETWEEN the DROP and the RENAME leaves the
    * complete state under the shadow name, which every entry point
    * heals on next touch ([[recoverCompactCrash]]). Batch keys are
    * gone with the old generations. */
  def compact(spark: SparkSession, table: String, keyCol: String,
      merged: DataFrame): Unit = {
    recoverCompactCrash(spark, table)
    require(spark.catalog.tableExists(table),
      s"$table does not exist — nothing to compact")
    val shadow = table + "_compact_shadow"
    write(merged, keyCol, shadow)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$shadow` RENAME TO `$table`")
    spark.catalog.refreshTable(table)
  }
}
