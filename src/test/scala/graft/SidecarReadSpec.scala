package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Similarity
import graft.sources.SidecarRead

/** The driver-side sidecar reader (r22 metadata-floor optimization) must
  * decode EXACTLY the rows a Spark collect over the same table returns —
  * across the index lifecycle states that rewrite the sidecars (build,
  * append, retrain, serving-decision persist, sharded layouts). */
class SidecarReadSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def sparkRows(t: String): Set[Map[String, Any]] =
    spark.table(t).collect().map { r =>
      r.schema.fieldNames.zipWithIndex.flatMap { case (f, i) =>
        if (r.isNullAt(i)) None else Some(f -> r.get(i))
      }.toMap
    }.toSet

  private def sidecarRows(t: String): Set[Map[String, Any]] =
    SidecarRead.rows(spark, t).map(_.values).toSet

  test("sidecar reader == Spark collect on the ADC protocol tables through build/append/retrain") {
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = corpus.count()
    val (nlist, _) = Similarity.ivfParams(n)
    try {
      Similarity.writeIvfAdcIndex(corpus.filter(col("vec_id") * 2 < n),
        "vec_id", "embedding", "screl_idx", nlist = nlist, dim = 64)
      assert(sidecarRows("screl_idx_g") == sparkRows("screl_idx_g"))
      Similarity.appendIvfAdcIndex(corpus.filter(col("vec_id") * 2 >= n),
        "vec_id", "embedding", "screl_idx", dim = 64)
      assert(sidecarRows("screl_idx_g") == sparkRows("screl_idx_g"))
      // epoch resolution (the probe path's read) agrees with the agg job
      val viaJob = spark.table("screl_idx_g").agg(max("epoch")).head()
        .getLong(0)
      val viaReader = SidecarRead.rows(spark, "screl_idx_g")
        .map(_.getLong("epoch")).max
      assert(viaReader == viaJob)
      Similarity.retrainIvfAdcIndex(corpus, "vec_id", "embedding",
        "screl_idx", nlist = nlist, dim = 64)
      assert(sidecarRows("screl_idx_g") == sparkRows("screl_idx_g"))
      assert(SidecarRead.rows(spark, "screl_idx_g")
        .map(_.getLong("epoch")).max ==
        spark.table("screl_idx_g").agg(max("epoch")).head().getLong(0))
    } finally Seq("screl_idx", "screl_idx_c", "screl_idx_g",
      "screl_idx_t").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("sidecar reader == Spark collect on the sharded layout + serving sidecars") {
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    try {
      Similarity.writeIvfAdcIndexSharded(corpus, "vec_id", "embedding",
        "screl_sh", nShards = 2, dim = 64)
      assert(sidecarRows("screl_sh_sh") == sparkRows("screl_sh_sh"))
      assert(sidecarRows("screl_sh_sv_g") == sparkRows("screl_sh_sv_g"))
      // the probe path's resolved state survives the reader swap: the
      // fan-out probe still answers (exercises readShardMeta + svState)
      val got = Similarity.ivfAdcTopKIndexedSharded(
        corpus.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
        k = 3, table = "screl_sh", dim = 64).count()
      assert(got > 0)
    } finally {
      Seq("screl_sh_sh", "screl_sh_sv", "screl_sh_sv_c", "screl_sh_sv_g",
        "screl_sh_sv_t", "screl_sh_serve").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }

  test("serving-decision reads decode via the sidecar reader (single-table tier)") {
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (nlist, _) = Similarity.ivfParams(corpus.count())
    try {
      Similarity.writeIvfAdcIndex(corpus, "vec_id", "embedding",
        "screl_sv1", nlist = nlist, dim = 64)
      Similarity.writeServingDecision(spark, "screl_sv1",
        Similarity.ProbeServing(3, 0.97), gprobe = 2)
      assert(sidecarRows("screl_sv1_serve") == sparkRows("screl_sv1_serve"))
      val got = Similarity.readServingDecision(spark, "screl_sv1")
      assert(got.contains((Similarity.ProbeServing(3, 0.97), 2)), got)
      // a foreign-looking epoch flip refuses the stored row (staleness
      // contract preserved through the reader swap)
      Similarity.retrainIvfAdcIndex(corpus, "vec_id", "embedding",
        "screl_sv1", nlist = nlist, dim = 64)
      assert(Similarity.readServingDecision(spark, "screl_sv1").isEmpty)
    } finally Seq("screl_sv1", "screl_sv1_c", "screl_sv1_g",
      "screl_sv1_t", "screl_sv1_serve").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }
}
