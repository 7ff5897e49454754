package graft.sources

import org.apache.spark.sql.SparkSession

/** Driver-side reads of the tiny PROTOCOL SIDECAR tables (`_g`, `_sh`,
  * `_serve`): the same crash-healed, catalog-fresh part-file listing a
  * Spark collect would scan ([[graft.pipeline.MergeTables.freshInputFiles]]
  * — heal + refreshTable + fresh listing), decoded on the driver with the
  * parquet Group API instead of through a Spark job.
  *
  * Why: every persisted-index PROBE construction resolved its protocol
  * state (active epoch, shard layout, committed generations, stored
  * serving dials) through one-or-more blocking `collect()`/`head()` jobs
  * over tables that are BOUNDED BY THE PROTOCOL, not the corpus (a
  * handful of rows under the compaction contract). On local[32] each such
  * job costs a full plan + schedule + task round-trip (~0.1 s) — the
  * per-probe serving metadata floor the r21 verdict names. A driver-side
  * footer-and-rows read of the same fresh files is ~2-5 ms and has
  * IDENTICAL freshness semantics: the listing is re-taken per call, so a
  * foreign append/retrain/compaction is seen exactly as the job form saw
  * it (TTL=0 contract unchanged; the TTL caches above this layer are
  * untouched).
  *
  * Scope: flat primitive schemas only (long/int/double/string/boolean —
  * exactly what the protocol sidecars hold). NEVER used for data tables,
  * centroid tables (array column), or anything corpus-sized. */
object SidecarRead {

  /** One decoded sidecar row: field name → JVM value (Long, Int,
    * Double, String, Boolean); absent/null fields are absent from the
    * map. `fields` is the file-schema field-name set (presence checks —
    * the schema-evolution probes `contains("rsgen")` etc. need it even
    * when the column is null on every row). */
  final case class Row(values: Map[String, Any], fields: Set[String]) {
    def getLong(f: String): Long = values(f) match {
      case l: Long => l
      case i: Int  => i.toLong
      case x       => throw new IllegalStateException(s"$f: $x")
    }
    def getInt(f: String): Int = values(f) match {
      case i: Int  => i
      case l: Long => l.toInt
      case x       => throw new IllegalStateException(s"$f: $x")
    }
    def getDouble(f: String): Double = values(f) match {
      case d: Double => d
      case f2: Float => f2.toDouble
      case x         => throw new IllegalStateException(s"$f: $x")
    }
    def getString(f: String): String = values(f).asInstanceOf[String]
  }

  /** All rows of `table`, crash-healed and freshly listed (the
    * [[graft.pipeline.MergeTables.freshView]] discipline), decoded
    * driver-side. Throws if the table does not exist (callers check
    * `tableExists` first, as the job form did). Row order is
    * file-sorted then row-group order — NOT a contract; callers reduce
    * (max/find) or sort, exactly like the collect form's callers. */
  def rows(spark: SparkSession, table: String): Seq[Row] =
    graft.pipeline.MergeTables.freshInputFiles(spark, table)
      .flatMap(readFile(spark, _))

  private def readFile(spark: SparkSession, file: String): Seq[Row] = {
    val conf = spark.sessionState.newHadoopConf()
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        new org.apache.hadoop.fs.Path(file))
      .withConf(conf)
      .build()
    try {
      val out = scala.collection.mutable.ArrayBuffer[Row]()
      var g = reader.read()
      while (g != null) {
        val t = g.getType
        val names = (0 until t.getFieldCount)
          .map(i => t.getFieldName(i)).toSet
        val vals = (0 until t.getFieldCount).flatMap { i =>
          val f = t.getType(i)
          if (!f.isPrimitive || g.getFieldRepetitionCount(i) == 0) None
          else {
            import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
            val name = t.getFieldName(i)
            f.asPrimitiveType().getPrimitiveTypeName match {
              case INT64   => Some(name -> g.getLong(i, 0))
              case INT32   => Some(name -> g.getInteger(i, 0))
              case DOUBLE  => Some(name -> g.getDouble(i, 0))
              case FLOAT   => Some(name -> g.getFloat(i, 0))
              case BOOLEAN => Some(name -> g.getBoolean(i, 0))
              case BINARY  => Some(name -> g.getString(i, 0))
              case _       => None // sidecars hold no INT96/FIXED
            }
          }
        }.toMap
        out += Row(vals, names)
        g = reader.read()
      }
      out.toSeq
    } finally reader.close()
  }
}
