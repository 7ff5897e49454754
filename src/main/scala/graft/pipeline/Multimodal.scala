package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image / audio / video) column handling.
  *
  * Media assets are opaque `binary` payload columns plus a typed metadata
  * struct — the Spark-side plumbing (schema, partitioning, per-partition
  * batch iteration, feature schema) is real and tested; only the codec is
  * a STUB, because no image/audio libraries exist in this environment.
  * Swapping [[decodeStub]] for a real decoder (JNI, ONNX, or an Arrow
  * `mapInArrow` bridge to a Python worker) changes no plan shape: the
  * operator stays a narrow mapPartitions over the payload column, so it
  * scales linearly and never shuffles the binary data.
  */
object Multimodal {

  /** Typed metadata carried alongside each payload. */
  final case class MediaMeta(kind: String, nBytes: Long)

  /** Feature row produced by the (stubbed) decode + feature-extract. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      byte_sum: Long, fake_width: Int, fake_height: Int)

  /** Wrap a text-ish table as media rows: payload = utf-8 bytes, typed
    * meta struct. In production the payload column would come straight
    * from parquet `binary` (images) — the schema is identical. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String,
      kind: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit(kind).as("kind"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("nBytes"))
        .as("meta"))

  /** ======= STUB =======
    * Deterministic fake "decode": derives pseudo-dimensions and a byte
    * checksum from the payload instead of invoking a codec. The batch
    * shape (one Iterator per partition — the same contract a Pandas/Arrow
    * UDF batch loop has) and the output schema are the real thing. */
  def decodeStub(payload: Array[Byte], kind: String): (Long, Int, Int) = {
    var s = 0L
    var i = 0
    while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
    // ??? real codec goes here; fake dims are payload-derived so tests
    // are deterministic
    val w = 16 + (s % 64).toInt
    val h = 16 + ((s / 64) % 64).toInt
    (s, w, h)
  }

  /** Per-partition batched decode + feature extraction. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.kind").as("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { batch =>
        batch.map { case (id, payload, kind) =>
          val (sum, w, h) = decodeStub(payload, kind)
          MediaFeatures(id, kind, payload.length, sum, w, h)
        }
      }
  }

  /** ======= STUB ======= "resize": keeps the first `n` payload bytes
    * (a real implementation re-encodes; the plan shape — narrow
    * projection over binary — is what matters). */
  def resizeStub(media: DataFrame, n: Int): DataFrame =
    media.withColumn("payload",
      expr(s"substring(payload, 1, $n)").cast("binary"))

  /** ======= STUB ======= "frame sample": every k-th 8-byte block of the
    * payload as one hex frame row (media_id, frame_no, frame). Mirrors
    * video frame extraction's explode shape. Hex, not base64: Spark's
    * base64 line-wraps at 76 chars (MIME), which would break the
    * fixed-width `\G` chunking. */
  def frameSampleStub(media: DataFrame, everyK: Int): DataFrame =
    media.select(col("media_id"),
        posexplode(split(hex(col("payload")), s"(?<=\\G.{${16 * everyK}})"))
          .as(Seq("frame_no", "frame")))
      .filter(length(col("frame")) > 0)

  /** Oracle-checkable metadata projection: byte length + md5 checksum,
    * computed through the binary path. */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.nBytes").as("n_bytes"),
      md5(col("payload")).as("checksum"))
}
