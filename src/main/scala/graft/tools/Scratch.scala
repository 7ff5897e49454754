package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Throwaway profiler: which component of the indexed ADC probe scales
  * with nlist? Delete after use. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[24]")
      .config("spark.sql.shuffle.partitions", 24)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def gen(k: Int) =
      spark.range(2000L * k).select(col("id").as("vec_id"), expr(
        "transform(sequence(0, 63), i -> cast(" +
        s"pmod(hash(pmod(id, ${64L * k}), 17, i), 2000) / 1000.0d - 1.0d" +
        " + CASE WHEN i < 4 THEN pmod(hash(id, 23, i), 600)" +
        " / 1000.0d - 0.3d ELSE 0.0d END as float))").as("embedding"))
    val panel = gen(1).filter(col("vec_id") % 100 === 0).cache()
    panel.count()
    for (k <- Seq(1, 10, 25)) {
      val emb = gen(k)
      val (nl, _) = Similarity.ivfParams(emb.count())
      val tbl = s"scr_prof_$k"
      System.err.println(s"[prof] === k=$k nlist=$nl ===")
      t(s"build_$k") {
        Similarity.writeIvfAdcIndex(emb, "vec_id", "embedding", tbl,
          nlist = nl, dim = 64)
      }
      val cents = t(s"read_centroids_$k") {
        Similarity.readIvfCentroids(spark, tbl)
      }
      t(s"typedLit_$k") {
        org.apache.spark.sql.functions.typedLit(
          cents.map(_.toSeq).toSeq)
      }
      val df1 = t(s"plan_build_$k") {
        Similarity.ivfAdcTopKIndexed(panel, "vec_id", "embedding",
          k = 3, nprobe = 1, table = tbl, dim = 64)
      }
      t(s"probe1_exec_$k") { df1.count() }
      t(s"probe2_reused_df_$k") { df1.count() }
      val df2 = t(s"plan_build2_$k") {
        Similarity.ivfAdcTopKIndexed(panel, "vec_id", "embedding",
          k = 3, nprobe = 1, table = tbl, dim = 64)
      }
      t(s"probe3_fresh_df_$k") { df2.count() }
      for (sfx <- Seq("", "_c", "_g"))
        spark.sql(s"DROP TABLE IF EXISTS $tbl$sfx")
    }
    spark.stop()
  }
}
