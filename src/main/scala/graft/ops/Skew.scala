package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * The reference hashes whole keys (or selected fields —
  * mapred/lib/HashPartitioner.java:29, KeyFieldBasedPartitioner.java:96-102)
  * to reducers and has no answer to a hot key: that reducer simply runs
  * long. At 100 TB a single hot join key can hold a whole stage hostage.
  * Spark's AQE skew-join splits oversized SMJ partitions at runtime; this
  * helper is the explicit, planner-independent form for when the skew is
  * known: the skewed (probe) side scatters each hot key across `salt`
  * sub-keys, the other (build) side replicates `salt`-fold, and the join
  * key becomes (key, salt) — every sub-partition is bounded at 1/salt of
  * the hot key's rows, at the cost of replicating the build side.
  *
  * The salt is a deterministic hash of caller-chosen columns (NOT rand():
  * retries/speculative re-execution must salt a row identically or rows
  * are lost/duplicated under task replay).
  */
object Skew {

  /** Inner-join `skewed` with `other` on `key`, scattering the skewed
    * side over `salt` sub-keys derived from `saltBy`. Result equals the
    * plain join, row for row. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salt: Int, saltBy: Column): DataFrame = {
    require(salt > 0)
    val s = skewed.withColumn("__salt", pmod(xxhash64(saltBy), lit(salt.toLong)))
    val o = other.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    s.join(o, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
