package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media payloads
  * are opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / frame-sample run as partition-local transforms over the
  * binary batches (the Scala analogue of mapInPandas — one iterator pass per
  * partition, vectorizable batch shape, no shuffle).
  *
  * The actual codec step is a STUB (this container ships no image/audio
  * libraries): [[FakeDecoder]] produces a deterministic feature vector from
  * the bytes. Everything around it — schema, batching, partitioning, the
  * UDF/transform signatures — is the real plumbing a codec would slot into.
  */
object Multimodal {

  /** Typed row for the partition-local decode pass. */
  case class MediaRow(doc_id: Long, format: String, n_bytes: Long, payload: Array[Byte])
  case class FeatureRow(doc_id: Long, format: String, n_bytes: Long, features: Array[Float])
  case class HistRow(doc_id: Long, bin: Long, n_in_bin: Long)
  case class FrameRow(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Wrap a text table as a binary media table: payload = utf-8 bytes,
    * metadata = (format, n_bytes). Stands in for an Iceberg table of image /
    * audio blobs with the same shape. */
  def asMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      lit("utf8-blob").as("format"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: a real implementation would hand `payload` to an image /
    * audio codec. This deterministic fake emits a 16-bin byte histogram
    * normalized to [0,1] — stable across partitionings, so the plumbing is
    * testable end-to-end. */
  object FakeDecoder {
    val Bins = 16
    /** Integer byte histogram — the exact (engine-comparable) decode core. */
    def histogram(payload: Array[Byte]): Array[Long] = {
      val hist = new Array[Long](Bins)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) * Bins / 256) += 1
        i += 1
      }
      hist
    }
    /** Normalized float features (histogram / n) — the shape a real codec
      * feature vector has. */
    def decode(payload: Array[Byte]): Array[Float] = {
      val n = math.max(payload.length, 1).toFloat
      histogram(payload).map(_ / n)
    }
  }

  /** Partition-local feature extraction (decode stub inside): the batch shape
    * a vectorized codec UDF would use. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[FeatureRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      FeatureRow(r.doc_id, r.format, r.n_bytes, FakeDecoder.decode(r.payload))
    })
  }

  /** Exact-integer feature view for the correctness gate: one row per
    * (doc, bin) with the raw histogram count — every value is a BIGINT, so
    * the DuckDB oracle reproduces the decode bit for bit (the float
    * `features` array is not hash-comparable across engines: pandas cannot
    * lexsort array cells and float formatting differs). */
  def featureHistogram(spark: SparkSession, media: DataFrame): Dataset[HistRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      val hist = FakeDecoder.histogram(r.payload)
      (0 until FakeDecoder.Bins).iterator.map(b => HistRow(r.doc_id, b.toLong, hist(b)))
    })
  }

  /** Frame sampling: split the payload into `frames` equal byte slices —
    * the video-frame-sampling plumbing (a codec would seek keyframes). */
  def sampleFrames(spark: SparkSession, media: DataFrame, frames: Int): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val step = math.max(r.payload.length / frames, 1)
      (0 until frames).iterator.takeWhile(i => i * step < r.payload.length).map { i =>
        val from = i * step
        val until = math.min(from + step, r.payload.length)
        FrameRow(r.doc_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  /** Resize stub: truncate/pad the feature vector — the shape-normalization
    * step a real resize would perform. */
  def resizeFeatures(features: Dataset[FeatureRow], dim: Int): DataFrame =
    features.toDF().select(col("doc_id"),
      slice(concat(col("features"), array_repeat(lit(0.0f), dim)), 1, dim)
        .as("features"))
}
