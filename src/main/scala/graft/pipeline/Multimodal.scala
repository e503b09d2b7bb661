package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride through the pipeline
  * as opaque `binary` columns with typed metadata alongside; decode /
  * feature-extraction runs per-partition in batches (the Scala analogue
  * of `mapInPandas` — one iterator pass, no per-row task overhead).
  *
  * NOTE: this container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked DETERMINISTIC FAKE (bytes → pseudo metadata/features).
  * The Spark-side plumbing — schema, binary handling, partition-batch
  * iteration, feature array shape — is real and tested; swapping the
  * stub body for a JNI/javacv decoder changes nothing structurally.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)
  case class MediaFeature(
      doc_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Attach a synthetic binary payload column (UTF-8 of text — stands in
    * for image bytes) + typed metadata. In production this is
    * `spark.read.format("binaryFile")` or parquet with a binary column.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"))

  /** ======== STUB ========
    * Deterministic fake "decode": derives dimensions/frame count/features
    * purely from payload bytes. Replace with a real codec off-container.
    */
  def decodeStub(payload: Array[Byte]): MediaFeature = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    val feature = Array.tabulate(8) { i =>
      if (payload.isEmpty) 0f
      else (payload((i * 7) % payload.length) & 0xff) / 255.0f
    }
    MediaFeature(-1L, 16 + (b0 % 64), 16 + (b1 % 64), 1 + payload.length % 7, feature)
  }

  /** Batch feature extraction: one partition = one batch iterator, the
    * `mapInPandas` shape. Output is a typed Dataset with a fixed-width
    * feature vector ready for the Similarity operators.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("doc_id", "payload", "mime").as[MediaRecord]
      .mapPartitions { batch =>
        // per-partition init would go here (codec handles, model weights)
        batch.map(r => decodeStub(r.payload).copy(doc_id = r.doc_id))
      }
  }

  /** "Frame sampling": every k-th byte window of the payload — the
    * partition/batch shape of video frame extraction with the decode
    * stubbed to byte slicing.
    */
  def frameSample(media: DataFrame, stride: Int, frameLen: Int): DataFrame = {
    // empty payload ⇒ no frames (sequence(0,-1) would yield [0,-1]!)
    val frameIdx = when(length(col("payload")) === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), floor((length(col("payload")) - 1) / stride).cast("int")))
    media.select(
      col("doc_id"),
      posexplode(transform(frameIdx,
        i => hex(col("payload").substr(i * stride + 1, lit(frameLen)))))
        .as(Seq("frame_no", "frame_hex")))
  }
}
