package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the
  * engine as opaque `binary` payloads with a typed metadata struct,
  * and per-batch decode/feature kernels run as partition-local
  * transforms.
  *
  * The decode step is a clearly-marked deterministic STUB (this
  * container has no image/audio codecs); everything around it — the
  * schema contract, the binary column handling, the partition-batch
  * execution shape, frame-sampling arithmetic — is real and tested.
  * In production the stub body is replaced by the actual codec call
  * (or a Python `mapInPandas` worker); the engine-side plumbing is
  * identical.
  */
object Multimodal {

  /** Typed row for the partition-local feature kernel. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], format: String)
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Int, features: Array[Double])

  /** Attach a synthetic binary payload + metadata struct to the
    * documents table: payload = UTF-8 bytes of the text (standing in
    * for encoded media), format/width/height derived deterministically
    * from doc_id. This models the ingest contract: media arrives as
    * (blob, metadata) columns in parquet. */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
          (col("doc_id") % 4 + 1).cast("int")).as("format"),
        (col("doc_id") % 8 * 160 + 320).cast("int").as("width"),
        (col("doc_id") % 8 * 90 + 180).cast("int").as("height"),
        (col("doc_id") % 30 + 1).cast("int").as("n_frames")).as("meta"))

  /** Partition-batch feature extraction over the binary payload —
    * the Scala analog of a `mapInPandas` batch UDF: one kernel
    * invocation per partition, streaming over its rows, no driver
    * involvement, executor-parallel.
    *
    * STUB: the "decoder" computes an 8-bin byte histogram (normalized)
    * instead of decoding pixels — deterministic, schema-correct, and
    * shaped exactly like a real embedding/feature kernel
    * (binary in → fixed-width Array[Double] out).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("meta.format").as("format"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          // --- STUB decode: replace with real codec in production ---
          val hist = new Array[Double](8)
          var i = 0
          while (i < r.payload.length) {
            hist((r.payload(i) & 0xFF) % 8) += 1.0
            i += 1
          }
          val n = math.max(1, r.payload.length)
          MediaFeatures(r.doc_id, r.format, r.payload.length, hist.map(_ / n))
        }
      }
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * index — pure codegen'd arithmetic (explode over a sequence), the
    * shape that feeds a downstream frame-decode kernel. */
  def sampleFrames(media: DataFrame, step: Int): DataFrame =
    media.filter(col("meta.format") === "mp4")
      .select(col("doc_id"), col("meta.n_frames").as("n_frames"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(step))).as("frame_idx"))

  /** Deterministic stand-in for a resize: truncate/zero-pad the
    * payload to the target byte budget and rewrite metadata. Models a
    * payload-rewriting kernel (the real one re-encodes pixels). */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val budget = targetW * targetH / 64 + 16
    media.select(
      col("doc_id"),
      substring(col("payload"), 1, budget).as("payload"),
      struct(
        col("meta.format").as("format"),
        lit(targetW).as("width"), lit(targetH).as("height"),
        col("meta.n_frames").as("n_frames")).as("meta"))
  }
}
