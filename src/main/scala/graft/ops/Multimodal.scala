package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns with typed metadata.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries — builder-prompt requirement): `decodeStub` produces a
  * deterministic fake decode derived from the bytes, so every downstream
  * contract — schema shape, partition sizing, batch signature, feature
  * vectors — is real and tested, and a production codec can be swapped in
  * behind the same column contract.
  *
  * Everything here is expression-based (no collect, no driver loop); the
  * binary column never leaves the executor. At 100 TB the media table
  * should be written with `spark.sql.files.maxPartitionBytes` sized so one
  * task holds a few hundred blobs, and `spark.sql.parquet.enableVectorizedReader`
  * handles binary columns natively.
  */
object Multimodal {

  /** Media-table schema contract:
    * (media_id string, mime string, payload binary,
    *  meta struct<width:int, height:int, duration_ms:int>). */
  val MediaSchemaDdl: String =
    "media_id string, mime string, payload binary, " +
      "meta struct<width:int, height:int, duration_ms:int>"

  /** Deterministic fake "decode": byte length, checksum and a stable
    * pseudo-dimensions struct in place of a real codec (marked stub). */
  def decodeStub(payload: Column): Column = struct(
    length(payload).as("n_bytes"),
    crc32(payload).as("checksum"),
    (pmod(crc32(payload), lit(1920)) + 1).cast("int").as("decoded_width"),
    (pmod(crc32(payload) / 7, lit(1080)) + 1).cast("int").as("decoded_height"))

  /** Deterministic feature vector (dim floats) from a payload — the
    * shape/plumbing of an embedding extractor: hash k windows of the
    * bytes, scale into [-1, 1]. Pure expressions → codegen, batch-shaped
    * exactly like a real extractor UDF would be. */
  def featureStub(payload: Column, dim: Int = 16): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      ((pmod(xxhash64(payload, i), lit(20001)) - lit(10000)) / lit(10000.0)).cast("float"))

  /** "Frame sampling": every k-th fixed-size byte window as a
    * frame-payload array — the partition/batch shape of video frame
    * extraction with a stubbed codec. */
  def frameSample(payload: Column, frameBytes: Int = 256, everyK: Int = 4): Column =
    filter(
      transform(sequence(lit(0),
          greatest((length(payload) / (frameBytes * everyK)) - 1, lit(0)).cast("int")),
        i => substring(payload, (i * frameBytes * everyK + 1).cast("int"), lit(frameBytes))),
      f => length(f) > 0)

  /** Resize contract: recompute meta for a target box, preserving aspect
    * ratio (pure arithmetic on meta; payload untouched by the stub). */
  def resizeMeta(meta: Column, maxW: Int, maxH: Int): Column = {
    val w = meta("width").cast("double")
    val h = meta("height").cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    struct(
      round(w * scale).cast("int").as("width"),
      round(h * scale).cast("int").as("height"),
      meta("duration_ms").as("duration_ms"))
  }

  /** End-to-end media pipeline over a media table: decode → features →
    * resize; one narrow stage, no shuffle. */
  def process(media: DataFrame, dim: Int = 16): DataFrame =
    media
      .withColumn("decoded", decodeStub(col("payload")))
      .withColumn("features", featureStub(col("payload"), dim))
      .withColumn("meta_resized", resizeMeta(col("meta"), 224, 224))
}
