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

  /** REAL audio decode — not a stub: interpret the WAV body after the
    * 36-byte minted RIFF+fmt header (no data-chunk preamble here) as 16-bit little-endian PCM and compute
    * windowed RMS energy + per-doc peak, entirely with codegen'd
    * builtins (hex → 4-hex-char LE pairs → signed int16 → integer
    * sum-of-squares per window → one double sqrt at the end). PCM is
    * the codec an engine CAN own without media libraries; this is the
    * silence-detection / level-normalization pass of an audio
    * pipeline. Integer sums keep the math engine-exact; only full
    * `window`-sample windows emit (the tail is level-less noise).
    * One generator inside the scan's projection — no shuffle. */
  def wavRms(media: DataFrame, window: Int = 128): DataFrame = {
    val w = window
    val samples =
      "transform(regexp_extract_all(hex(substring(payload, 37, 2147483647)), '(....)', 1), " +
        "p -> if(conv(concat(substring(p, 3, 2), substring(p, 1, 2)), 16, 10) >= 32768, " +
        "cast(conv(concat(substring(p, 3, 2), substring(p, 1, 2)), 16, 10) as int) - 65536, " +
        "cast(conv(concat(substring(p, 3, 2), substring(p, 1, 2)), 16, 10) as int)))"
    media.filter(col("meta.format") === "wav")
      .withColumn("_smp", expr(samples))
      .withColumn("n_samples", size(col("_smp")))
      .withColumn("peak", expr("array_max(transform(_smp, x -> abs(x)))"))
      .filter(col("n_samples") >= w) // sequence(0, -1) would run BACKWARD
      .select(col("doc_id"), col("n_samples"), col("peak"),
        posexplode(expr(
          s"transform(sequence(0, cast(n_samples / $w as int) - 1), " +
          s"wi -> round(sqrt(cast(aggregate(slice(_smp, wi * $w + 1, $w), 0L, " +
          s"(a, x) -> a + cast(x as bigint) * x) as double) / $w), 6))")))
      .withColumnRenamed("pos", "win_idx")
      .withColumnRenamed("col", "rms")
      .select(col("doc_id"), col("n_samples"), col("peak"),
        col("win_idx").cast("int").as("win_idx"), col("rms"))
  }

  import org.apache.spark.sql.Column

  private def beHex(v: Column): Column = lpad(hex(v), 8, "0")
  private def leHex4(v: Column): Column = {
    val hp = beHex(v)
    concat(substring(hp, 7, 2), substring(hp, 5, 2),
      substring(hp, 3, 2), substring(hp, 1, 2))
  }
  private def leHex2(v: Column): Column = {
    val hp = lpad(hex(v), 4, "0")
    concat(substring(hp, 3, 2), substring(hp, 1, 2))
  }

  /** Prepend a REAL, spec-conformant container header to each payload
    * — PNG signature + IHDR chunk for `png` rows (width/height from
    * the metadata struct, big-endian per the PNG spec), RIFF/WAVE +
    * `fmt ` chunk for `wav` rows (PCM, little-endian rate/channels);
    * other formats stay raw. Pure codegen'd hex construction — this
    * is NOT a stub: the emitted bytes are what `file`/any PNG reader
    * sniffs. Rate/channels derive deterministically from doc_id. */
  def mintHeaders(media: DataFrame): DataFrame = {
    val pngHdr = concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D"), lit("49484452"), // IHDR len + tag
      beHex(col("meta.width")), beHex(col("meta.height")),
      lit("0806000000")) // bit depth 8, RGBA, deflate/std/none
    val rate = (col("doc_id") % 6 + 1).cast("int") * 8000
    val chans = (col("doc_id") % 2 + 1).cast("int")
    val wavHdr = concat(
      lit("52494646"), lit("00000000"), lit("57415645"), // RIFF/WAVE
      lit("666D7420"), lit("10000000"), lit("0100"), // fmt , len 16, PCM
      leHex2(chans), leHex4(rate),
      leHex4(rate * chans * 2), leHex2(chans * 2), lit("1000")) // derived fields
    val hdr = when(col("meta.format") === "png", pngHdr)
      .when(col("meta.format") === "wav", wavHdr)
    media.withColumn("payload",
      when(hdr.isNotNull, concat(unhex(hdr), col("payload")))
        .otherwise(col("payload")))
  }

  /** REAL header parsing — sniff the container from magic bytes and
    * decode PNG IHDR width/height (big-endian) or WAV fmt sample
    * rate/channels (little-endian) with pure hex arithmetic over the
    * first 44 bytes. No codec, fully codegen, DuckDB-replayable: this
    * is the part of "media decode" an engine can and should own —
    * dimension/rate triage BEFORE any expensive pixel decode runs. */
  def probeHeader(payload: Column): Column = {
    val h = upper(hex(substring(payload, 1, 44)))
    def at(off: Int, len: Int): Column = substring(h, off * 2 + 1, len * 2)
    def be(off: Int): Column = conv(at(off, 4), 16, 10).cast("long")
    def le4(off: Int): Column =
      conv(concat(at(off + 3, 1), at(off + 2, 1), at(off + 1, 1), at(off, 1)),
        16, 10).cast("long")
    def le2(off: Int): Column =
      conv(concat(at(off + 1, 1), at(off, 1)), 16, 10).cast("long")
    val isPng = at(0, 8) === lit("89504E470D0A1A0A")
    val isWav = at(0, 4) === lit("52494646") && at(8, 4) === lit("57415645")
    struct(
      when(isPng, lit("png")).when(isWav, lit("wav"))
        .otherwise(lit("unknown")).as("sniffed"),
      when(isPng, be(16)).as("width"),
      when(isPng, be(20)).as("height"),
      when(isWav, le4(24)).as("sample_rate"),
      when(isWav, le2(22)).as("channels"))
  }

  /** aHash-style 64-bit perceptual fingerprint of a binary payload —
    * the native `ahash64` kernel (MediaFunctions.AHash64, codegen'd:
    * one O(n) primitive loop per row; the first implementation was a
    * hex→array-HOF pipeline — interpreted, 20× slower, the two
    * slowest queries in the bench). All-integer stripe floor-means +
    * the 64·cell > Σcells bit rule, so the DuckDB oracle replays it
    * exactly; robust to per-byte re-encode noise (median hamming 0
    * under +3-mod-256 perturbation of every 50th byte on this corpus)
    * though not to truncation — the DCT pHash that adds truncation
    * robustness slots into the same contract in production. NULL
    * under 64 bytes (no full stripe coverage). */
  def aHash(payload: Column): Column = call_function("ahash64", payload)

  /** Deterministic re-encode stand-in (native kernel): every 50th
    * byte perturbed +3 mod 256 — the "same media, different encoder
    * settings" noise profile the perceptual hash sees through. */
  def reencodeNoise(payload: Column): Column =
    call_function("reencode_noise", payload)
}
