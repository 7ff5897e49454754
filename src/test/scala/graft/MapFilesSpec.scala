package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.MapFiles

/** `MapFileOutputFormat.getEntry` (mapred/MapFileOutputFormat.java:96-115)
  * over the bucketed sorted layout: a point key must read ONE bucket's
  * files with the predicate pushed into the parquet scan. */
class MapFilesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("getEntry prunes to a single bucket and pushes the key predicate") {
    val df = (1L to 10000L).map(i => (i, s"v$i")).toDF("k", "v")
    MapFiles.write(df, "k", buckets = 8, table = "mapfile_t")
    try {
      val probe = MapFiles.getEntry(spark, "mapfile_t", "k", 4242L)
      val plan = probe.queryExecution.executedPlan.toString
      // the getPartition step: 1 of 8 buckets survives pruning
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected single-bucket scan in:\n$plan")
      // the index-seek step: key predicate reaches the parquet reader
      assert(plan.contains("PushedFilters") && plan.contains("EqualTo(k,4242)"),
        s"expected pushed point predicate in:\n$plan")
      assert(probe.as[(Long, String)].collect().toSeq == Seq((4242L, "v4242")))
      // a miss is an empty frame, not an error (getClosest not emulated)
      assert(MapFiles.getEntry(spark, "mapfile_t", "k", -1L).count() == 0)
      // batched probes stay bucket-pruned (at most one bucket per key)
      val batch = MapFiles.getEntries(spark, "mapfile_t", "k",
        Seq(7L, 4242L, 9999L))
      val bplan = batch.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of 8".r
        .findFirstMatchIn(bplan).map(_.group(1).toInt)
      assert(sel.exists(_ <= 3), s"expected <=3 buckets in:\n$bplan")
      assert(batch.count() == 3)
      // the probes plan against a child session — the CALLER's conf is
      // untouched, so unrelated bucketed scans keep the auto rule
      assert(spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled") == "true",
        "point probes must not flip the caller session's bucketed-scan conf")
    } finally spark.sql("DROP TABLE IF EXISTS mapfile_t")
  }

  test("rewrite then re-probe: the child lookup session never serves a stale file listing") {
    // the Bench double-run shape: write -> probe -> REWRITE -> probe; the
    // cached child session must refresh the replaced table's files
    val df1 = (1L to 100L).map(i => (i, s"old$i")).toDF("k", "v")
    val df2 = (1L to 100L).map(i => (i, s"new$i")).toDF("k", "v")
    try {
      MapFiles.write(df1, "k", buckets = 4, table = "mapfile_rw")
      assert(MapFiles.getEntry(spark, "mapfile_rw", "k", 7L)
        .select("v").as[String].collect().toSeq == Seq("old7"))
      MapFiles.write(df2, "k", buckets = 4, table = "mapfile_rw")
      assert(MapFiles.getEntry(spark, "mapfile_rw", "k", 7L)
        .select("v").as[String].collect().toSeq == Seq("new7"))
    } finally spark.sql("DROP TABLE IF EXISTS mapfile_rw")
  }

  test("SetFile: distinct keys persisted, membership probes bucket-pruned") {
    val df = Seq(1L, 2L, 2L, 3L, 3L).toDF("k")
    MapFiles.writeSet(df, "k", buckets = 4, table = "setfile_t")
    try {
      // duplicates collapsed to the distinct sorted set
      assert(spark.table("setfile_t").as[Long].collect().sorted.toSeq
        == Seq(1L, 2L, 3L))
      assert(MapFiles.containsKey(spark, "setfile_t", "k", 2L))
      assert(!MapFiles.containsKey(spark, "setfile_t", "k", 99L))
    } finally spark.sql("DROP TABLE IF EXISTS setfile_t")
  }

  test("ArrayFile: rows addressed by append position") {
    val df = Seq("a", "b", "c", "d").toDF("v").coalesce(1)
    MapFiles.writeArray(df, buckets = 2, table = "arrayfile_t")
    try {
      assert(MapFiles.getNth(spark, "arrayfile_t", 0L)
        .select("v").as[String].collect().toSeq == Seq("a"))
      assert(MapFiles.getNth(spark, "arrayfile_t", 3L)
        .select("v").as[String].collect().toSeq == Seq("d"))
      assert(MapFiles.getNth(spark, "arrayfile_t", 9L).count() == 0)
    } finally spark.sql("DROP TABLE IF EXISTS arrayfile_t")
  }

  test("ArrayFile: multi-partition append order indexes 0..n-1 in row order") {
    import org.apache.spark.sql.functions.col
    // parallelize preserves seq order across partitions, so the global
    // index must equal the element value — exercises the per-partition
    // offset arithmetic (no RDD zipWithIndex in the write path)
    val df = spark.sparkContext.parallelize(0L until 997L, 7).toDF("v")
    MapFiles.writeArray(df, buckets = 4, table = "arrayfile_mp")
    try {
      val rows = spark.table("arrayfile_mp")
        .select(col("idx"), col("v")).as[(Long, Long)].collect()
      assert(rows.length == 997)
      assert(rows.forall { case (idx, v) => idx == v },
        s"index != append order at ${rows.filter(r => r._1 != r._2).take(5).toSeq}")
      assert(MapFiles.getNth(spark, "arrayfile_mp", 500L)
        .select("v").as[Long].collect().toSeq == Seq(500L))
    } finally spark.sql("DROP TABLE IF EXISTS arrayfile_mp")
  }

  test("getClosest seeks the smallest key >= probe, without a global sort") {
    val df = Seq(10L, 20L, 30L).flatMap(k => Seq((k, s"v$k"))).toDF("k", "v")
    MapFiles.write(df, "k", buckets = 4, table = "mapfile_c")
    try {
      val probe = MapFiles.getClosest(spark, "mapfile_c", "k", 15L)
      assert(probe.as[(Long, String)].collect().toSeq == Seq((20L, "v20")))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), plan)
      assert(plan.contains("GreaterThanOrEqual(k,15)"), plan)
      // past-the-end probe returns empty, like getClosest's null
      assert(MapFiles.getClosest(spark, "mapfile_c", "k", 99L).count() == 0)
    } finally spark.sql("DROP TABLE IF EXISTS mapfile_c")
  }
}
