package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The decode seam of the multimodal surface: binary payload column in,
 * fixed-width feature column out. Everything upstream (content hashing,
 * dedup, partitioning) and downstream (ANN, centroids, similarity) of a
 * media pipeline composes against this trait, so swapping the honest test
 * stub for a production codec is ONE class — no call-site changes.
 *
 * Production implementation contract (not buildable in this environment —
 * no image/audio libraries): a `mapPartitions` batch decoder. Per
 * partition: group rows into fixed-size batches (bounding peak decoder
 * memory to batch_size × max_payload), hand the payload byte buffers to
 * the codec (JVM lib, or a native decoder via JNI/FFM — Arrow record
 * batches if the codec is out-of-process), emit one `Array[Double]` of
 * exactly [[dims]] features per row, never materialize a partition's
 * payloads at once. Per-row cost only, no shuffle — identical to the
 * stub's plan shape, which is what the specs pin.
 */
trait BinaryDecoder {
  /** Fixed feature-vector width every decoded row must have. */
  def dims: Int

  /** Append `outCol` (`array<double>`, length [[dims]]) decoded from the
    * BinaryType column `payloadCol`. Must add no shuffle. */
  def decode(df: DataFrame, payloadCol: String, outCol: String): DataFrame
}

/** The environment-honest [[BinaryDecoder]]: deterministic pseudo-features
  * from the payload hash ([[Multimodal.decodeStub]]) — a pure codegen'd
  * expression, so the plumbing a real codec would ride (schema, per-row
  * evaluation, no shuffle) is exercised for real while the feature values
  * are clearly fake. */
final class StubDecoder(val dims: Int = 4) extends BinaryDecoder {
  def decode(df: DataFrame, payloadCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, Multimodal.decodeStub(col(payloadCol), dims))
}

/**
 * Multimodal column handling: images / audio / video ride through the
 * engine as opaque `BinaryType` payloads plus typed metadata, and every
 * relational operator (dedup, grouping, partitioning, sinks) treats them
 * like any other column — the north-star multimodal surface
 * (SURVEY.md §2.11 X4).
 *
 * The actual codec step is STUBBED: this environment has no image/audio
 * libraries, so [[decodeStub]] produces deterministic pseudo-features with
 * the real contract (binary in → fixed-width double vector out). A real
 * deployment swaps the stub for a `mapPartitions` / Arrow-batch decoder
 * with the same signature; everything around it — content hashing, byte
 * accounting, frame slicing, schema — is real and tested.
 *
 * Scale: all operators here are per-row expressions (no shuffle); binary
 * payloads stay columnar in Parquet and are never collected.
 */
object Multimodal {

  /** Deterministic fake asset from a text column: the UTF-8 bytes as the
    * binary payload. Stands in for real media bytes in tests/harness. */
  def syntheticPayload(text: Column): Column = text.cast("binary")

  /** Content address of a payload (md5 hex) — the exact-dedup key for
    * binary data: identical bytes ⇒ identical hash. */
  def contentHash(payload: Column): Column = md5(payload)

  /** Payload size in bytes. */
  def byteLength(payload: Column): Column = length(payload).cast("long")

  /**
   * Fixed-size frame slicing (the "frame-sample" shape for audio/video):
   * payload split into ⌈bytes/frameSize⌉ binary chunks. Pure expression —
   * `substr` on binary is byte-addressed.
   */
  def frames(payload: Column, frameSize: Int): Column =
    transform(
      sequence(lit(0),
        greatest(ceil(length(payload).cast("double") / frameSize).cast("int") - 1, lit(0))),
      i => payload.substr(i * frameSize + 1, lit(frameSize)))

  /**
   * STUB decoder expression: deterministic pseudo-feature vector derived
   * from the payload hash — a placeholder for a real image/audio feature
   * extractor (clearly fake values in [0,1); stable across runs and
   * engines that share xxhash64). [[StubDecoder]] wraps this as the
   * test implementation of the [[BinaryDecoder]] seam.
   */
  def decodeStub(payload: Column, dims: Int = 4): Column =
    transform(sequence(lit(0), lit(dims - 1)), i =>
      pmod(xxhash64(payload, i), lit(1000L)).cast("double") / 1000.0d)
}
