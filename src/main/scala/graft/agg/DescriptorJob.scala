package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The descriptor-driven aggregation framework — the reference's
  * ValueAggregatorJob family (mapred/lib/aggregate/ValueAggregatorJob.java:81,
  * ValueAggregatorBaseDescriptor.java:32-46,85-96): a job is DESCRIBED as a
  * list of "aggType:field" strings; the framework turns each into the
  * matching fold and runs them all in one pass, with the combiner applied
  * automatically.
  *
  * Spark-native: each descriptor string compiles to one Catalyst aggregate
  * Column, the whole list becomes a single `groupBy(key).agg(...)` —
  * one shuffle, map-side partial aggregation for every descriptor at once
  * (the reference runs ValueAggregatorCombiner for the same effect).
  * UserDefinedValueAggregatorDescriptor (plugin aggregator by class name,
  * UserDefinedValueAggregatorDescriptor.java) maps to [[register]]:
  * custom name → Column builder, e.g. a registered `Aggregator` UDAF.
  */
object DescriptorJob {

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Column => Column]()

  /** Register a user-defined descriptor type (the reference's plugin-by-
    * class-name extension point). */
  def register(aggType: String, builder: Column => Column): Unit =
    registry.put(aggType, builder)

  /** Compile one "aggType:field" descriptor to an aggregate column named
    * "<aggtype>_<field>" (lowercased — stable oracle-friendly names). */
  def compile(spec: String): Column = {
    require(spec.contains(":"),
      s"malformed descriptor '$spec': expected \"aggType:field\"")
    val Array(aggType, field) = spec.split(":", 2)
    val v = col(field)
    val agg = aggType match {
      case "LongValueSum"    => ValueAggregators.longValueSum(v)
      case "DoubleValueSum"  => ValueAggregators.doubleValueSum(v)
      case "LongValueMax"    => ValueAggregators.valueMax(v.cast("long"))
      case "LongValueMin"    => ValueAggregators.valueMin(v.cast("long"))
      case "StringValueMax"  => ValueAggregators.valueMax(v.cast("string"))
      case "StringValueMin"  => ValueAggregators.valueMin(v.cast("string"))
      case "UniqValueCount"  => ValueAggregators.uniqValueCount(v)
      case other =>
        val custom = registry.get(other)
        require(custom != null, s"unknown aggregator descriptor: $other")
        custom(v)
    }
    agg.as(s"${aggType.toLowerCase}_${field.toLowerCase}")
  }

  /** Run a descriptor list as one single-shuffle aggregation. */
  def aggregate(df: DataFrame, key: Column, specs: Seq[String]): DataFrame = {
    require(specs.nonEmpty, "at least one descriptor required")
    val cols = specs.map(compile)
    df.groupBy(key).agg(cols.head, cols.tail: _*)
  }
}
