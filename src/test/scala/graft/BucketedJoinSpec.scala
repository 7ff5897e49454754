package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketed, sorted tables — the reference's `MapFileOutputFormat`
  * (sorted+indexed sink, mapred/MapFileOutputFormat.java:39) and the
  * co-partitioned pre-sorted inputs its composite map-side join requires
  * (mapred/join/CompositeInputFormat.java:61: "all sources sorted by key
  * and identically partitioned"). Spark's `bucketBy(...).sortBy(...)`
  * saves exactly that layout, and a join of two co-bucketed tables plans
  * WITHOUT a shuffle exchange — at 100 TB this turns the nightly big-join
  * into a scan+merge, paying the shuffle once at write time. */
class BucketedJoinSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("join of co-bucketed sorted tables plans without a shuffle") {
    val d = "/root/testdata/sf0.001"
    Tables.orders(spark, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    Tables.customer(spark, d).select("c_custkey", "c_name")
      .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must pick a shuffle-or-bucket path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it is still correct
      val viaBuckets = joined.count()
      val viaShuffle = Tables.orders(spark, d).join(Tables.customer(spark, d),
        col("o_custkey") === col("c_custkey")).count()
      assert(viaBuckets == viaShuffle)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
