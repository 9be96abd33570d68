package graft.media

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video payloads
  * are opaque `binary` columns with typed metadata; decode / feature-extraction /
  * resizing run batch-wise over partitions. The decode step itself is STUBBED with a
  * deterministic fake (no media libs in this environment) — the Spark-side contract
  * (schema, partitioning, batch shape, typed encoders) is real and tested.
  *
  * The synthetic crawl's `html` binary column stands in for the media blob; at 100 TB
  * the same plan applies to WARC payloads: metadata extraction is pure column
  * expressions (pushdown-friendly, no decode), heavy per-blob work runs in
  * `mapPartitions` over typed rows so a partition is one batch (the Scala analog of
  * `mapInPandas` batching).
  */
object Multimodal {

  /** A blob row: key + payload + modality tag. */
  final case class MediaRow(url: String, blob: Array[Byte], modality: String)
  /** Deterministic fake "decoded features": byte-histogram + fake dims. */
  final case class MediaFeatures(url: String, n_bytes: Long, width: Int, height: Int,
                                 histogram: Array[Long])

  /** Pages -> media table (url, blob, modality). Pure projection, no decode. */
  def mediaTable(pages: DataFrame): DataFrame =
    pages.select(col("url"), col("html").as("blob"), lit("text/html").as("modality"))

  /** Cheap typed metadata from the binary column — pure expressions, no decode:
    * byte length, sha256 hex, magic prefix, frame count at `frameBytes` granularity. */
  def metadata(media: DataFrame, frameBytes: Int = 256): DataFrame =
    media.select(
      col("url"),
      length(col("blob")).cast("long").as("n_bytes"),
      sha2(col("blob"), 256).as("sha256"),
      substring(col("blob"), 1, 6).cast("string").as("magic"),
      ((length(col("blob")).cast("long") + (frameBytes - 1)) / frameBytes)
        .cast("long").as("n_frames"))

  /** "Frame sampling": every k-th fixed-size byte window of the blob, as an array of
    * binary slices — the plumbing a video frame-sampler needs (offset arithmetic +
    * bounded slice), expressed as codegen'd column functions. */
  def frameSample(blob: Column, frameBytes: Int = 256, every: Int = 4,
                  frameLen: Int = 64): Column =
    transform(
      sequence(lit(0),
        greatest(((length(blob) - 1) / (frameBytes * every)).cast("int"), lit(0))),
      i => substring(blob, i * frameBytes * every + 1, lit(frameLen)))

  /** STUB decode + feature extraction, batch-wise per partition. A real pipeline swaps
    * `fakeDecode` for an image/audio codec call; everything around it (typed encoder,
    * per-partition batching, output schema) stays. Deterministic: histogram of byte
    * values into 16 buckets + fake dimensions from the first bytes. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("url"), col("blob"), col("modality")).as[MediaRow]
      .mapPartitions { batch => batch.map(fakeDecode) }
  }

  /** The clearly-marked deterministic decode stub (would be a codec in production). */
  private def fakeDecode(r: MediaRow): MediaFeatures = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < r.blob.length) { hist((r.blob(i) & 0xff) >> 4) += 1; i += 1 }
    val w = if (r.blob.length >= 2) ((r.blob(0) & 0xff) << 8) | (r.blob(1) & 0xff) else 0
    val h = if (r.blob.length >= 4) ((r.blob(2) & 0xff) << 8) | (r.blob(3) & 0xff) else 0
    MediaFeatures(r.url, r.blob.length.toLong, w, h, hist)
  }

  /** "Resize" stub: truncate/pad the payload to exactly `targetBytes` (stands in for
    * an image resize that bounds per-row cost); pure expression. Appends `targetBytes`
    * zero bytes before the cut so blobs shorter than the target come back zero-padded
    * to full length, not short. */
  def resize(blob: Column, targetBytes: Int): Column =
    substring(concat(blob, lit(Array.fill[Byte](targetBytes)(0))), 1, targetBytes)
}
