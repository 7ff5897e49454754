package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Portable

/** Deterministic synthetic-data generators and the matching validator —
  * the reference's generator/validator example family:
  *
  *  - TeraGen's SortGenMapper derives each 100-byte record from its row id
  *    (examples/terasort/TeraGen.java:60,258); RandomWriter /
  *    RandomTextWriter are the same shape with random payloads
  *    (examples/RandomWriter.java:85, examples/RandomTextWriter.java:82).
  *    Spark-native: `spark.range(n, parts)` + deterministic key/payload
  *    expressions — a parallel, shuffle-free, map-only stage whose
  *    parallelism is the range's partition count (the reference's "one
  *    generator map per split").
  *
  *  - TeraValidate checks global order plus a checksum over the sorted
  *    output (examples/terasort/TeraValidate.java:52), and SortValidator
  *    proves sort output = input via record stats
  *    (src/test/.../SortValidator.java:93-173). Spark-native: the order
  *    check runs one pass per partition recording (first, last, misordered)
  *    and compares partition boundary keys on the driver — exactly
  *    TeraValidate's per-map min/max + single-reduce boundary compare, so
  *    no global shuffle is needed beyond the sort being validated.
  *
  * Keys hash through md5 so the DuckDB oracle reproduces every value; the
  * checksum folds mod 1000003 so a 100-TB-scale sum still fits a long.
  */
object Generators {

  /** Deterministic TeraGen-style records: (id, key, payload). Key is the
    * 10-hex-char sort key; payload is RandomTextWriter-ish filler derived
    * from the row id. */
  def teraGen(spark: SparkSession, n: Long, parts: Int): DataFrame = {
    val id = col("id")
    spark.range(0L, n, 1L, parts).select(
      id,
      substring(md5(id.cast("string")), 1, 10).as("key"),
      concat_ws(" ", (0 until 4).map(i =>
        substring(md5(concat(id.cast("string"), lit(s"_$i"))), 1, 8)): _*)
        .as("payload"))
  }

  /** TeraValidate: one row {n_rows, checksum, misordered} for a dataset
    * claimed to be globally sorted by `keyCol`. misordered counts
    * violations both inside partitions and across partition boundaries. */
  def teraValidate(sorted: DataFrame, keyCol: String): DataFrame = {
    val spark = sorted.sparkSession
    import spark.implicits._
    // Per-partition single pass: (partitionId, first, last, violations).
    val partStats = sorted.select(col(keyCol).cast("string")).as[String]
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          var prev = it.next(); val first = prev
          var bad = 0L
          while (it.hasNext) {
            val cur = it.next()
            if (cur < prev) bad += 1
            prev = cur
          }
          Iterator((pid, first, prev, bad))
        }
      }.collect().sortBy(_._1)
    val crossBad = partStats.iterator.sliding(2).withPartial(false).count {
      pair => pair(1)._2 < pair(0)._3 // next partition's first < prev's last
    }
    val misordered = partStats.map(_._4).sum + crossBad
    val agg = sorted.agg(
      count(lit(1)).as("n_rows"),
      sum(pmod(Portable.hash60(col(keyCol).cast("string")), lit(1000003L)))
        .as("checksum"))
    agg.withColumn("misordered", lit(misordered))
  }
}
