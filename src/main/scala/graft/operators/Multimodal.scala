package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * BINARY columns with a typed metadata struct, and per-modality transforms
  * (decode → feature-extract → resize / frame-sample) run as distributed
  * per-row operators over those binary payloads.
  *
  * The actual codec step is STUBBED (this environment ships no image/audio
  * libraries): `fakeDecode` below is a deterministic stand-in that derives
  * "pixels" from the payload bytes. Everything around it — the schema, the
  * binary column handling, partitioning, batch shape, and the operator
  * signatures — is real Spark and is what matters at 100 TB: payloads stay
  * on executors (never collected), transforms are narrow maps, and metadata
  * extraction is codegen'd column arithmetic wherever possible.
  */
object Multimodal {

  /** Canonical multimodal schema: id, modality tag, opaque payload, typed
    * metadata. In production the payload is the raw media bytes; here we
    * synthesize it from `documents.text` (UTF-8 bytes) so the plumbing is
    * exercised end-to-end on real distributed data. */
  def assets(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id").as("asset_id"),
      // modality assignment is deterministic round-robin by id
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        octet_length(col("text")).cast("long").as("n_bytes"),
        (pmod(col("doc_id") * 7L + col("n_chars"), lit(1024)) + lit(64))
          .cast("int").as("width"),
        (pmod(col("doc_id") * 13L + col("n_chars"), lit(768)) + lit(64))
          .cast("int").as("height"),
        lit("fake/v1").as("format")).as("meta"))

  /** Metadata projection — the oracle-checkable face of the module: byte
    * length + deterministic fake decode dimensions, all pure column
    * arithmetic (no UDF, fully codegen'd). */
  def assetMeta(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir).select(
      col("asset_id"), col("modality"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))

  /** STUB decode: a real implementation would hand `payload` to an image
    * codec. This deterministic fake emits a 16-bin byte histogram as the
    * "feature vector" — the operator shape (binary → fixed-size
    * array<double>, narrow map, no shuffle) is exactly the real one. */
  val fakeDecode: Array[Byte] => Array[Double] = (payload: Array[Byte]) => {
    val hist = new Array[Double](16)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) >> 4) += 1.0
        i += 1
      }
      if (payload.length > 0) {
        var j = 0
        while (j < 16) { hist(j) /= payload.length; j += 1 }
      }
    }
    hist
  }

  /** Feature extraction over the payload column. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    val decodeUdf = udf(fakeDecode)
    assets(spark, dir).select(col("asset_id"), col("modality"),
      decodeUdf(col("payload")).as("features"))
  }

  /** Frame sampling for video assets: emit n evenly-spaced "frames" (byte
    * slices of the payload in the stub; codec-decoded frames in prod).
    * Output is exploded (one row per frame) — the shape a downstream
    * image-encoder stage consumes. */
  def frameSample(spark: SparkSession, dir: String, nFrames: Int = 4): DataFrame = {
    val sliceUdf = udf((payload: Array[Byte], n: Int) => {
      if (payload == null || payload.isEmpty) Seq.empty[Array[Byte]]
      else {
        val step = math.max(1, payload.length / n)
        (0 until n).map { i =>
          val start = math.min(i * step, payload.length - 1)
          payload.slice(start, math.min(start + step, payload.length))
        }
      }
    })
    assets(spark, dir).filter(col("modality") === "video")
      .select(col("asset_id"),
        posexplode(sliceUdf(col("payload"), lit(nFrames))))
      .withColumnsRenamed(Map("pos" -> "frame_no", "col" -> "frame_bytes"))
      .withColumn("frame_len", octet_length(col("frame_bytes")))
  }

  /** "Resize": stub transform payload → payload (truncate/pad to a target
    * byte budget), preserving the binary-in/binary-out operator contract. */
  def resize(spark: SparkSession, dir: String, targetBytes: Int = 256): DataFrame = {
    val resizeUdf = udf((payload: Array[Byte]) =>
      if (payload == null) Array.empty[Byte]
      else if (payload.length >= targetBytes) payload.take(targetBytes)
      else payload ++ Array.fill[Byte](targetBytes - payload.length)(0))
    assets(spark, dir).select(col("asset_id"), col("modality"),
      resizeUdf(col("payload")).as("payload_resized"))
      .withColumn("resized_len", octet_length(col("payload_resized")))
  }
}
