package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed in partition-sized batches — the Spark-side shape
  * (schema, batching, partitioning) of an image/audio/video pipeline.
  *
  * The actual media DECODE IS A STUB (this container has no codec libs):
  * [[FakeDecode]] derives deterministic pseudo-features from the bytes.
  * Everything around it — binary column handling, metadata struct,
  * `mapPartitions` batch shape (the Scala twin of `mapInPandas`: one
  * iterator of rows per partition, amortized per-batch setup), frame
  * sampling arithmetic — is real and tested; a real decoder drops into
  * [[FakeDecode.features]] without touching any plan.
  *
  * Scale notes: media blobs dominate bytes, so the layout rule is
  * metadata-and-features in columnar Parquet, blobs either inline (small)
  * or as (uri, offset, length) pointers; all pruning/filters run on the
  * metadata columns and never touch blob bytes (column pruning keeps the
  * scan blob-free — verified by ReadSchema in the plan).
  */
object MultimodalQueries {
  import CoreQueries.t

  /** STUB decoder: deterministic features from raw bytes. A real build
    * replaces this object only.
    */
  object FakeDecode extends Serializable {
    /** 16-bin byte histogram — stands in for decoded-image statistics. */
    def features(bytes: Array[Byte]): Array[Long] = {
      val h = new Array[Long](16)
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xFF) >> 4) += 1; i += 1 }
      h
    }

    /** "Frame sample": every `stride`-th fixed-size window's first byte —
      * the video-frame-sampling access pattern over an opaque blob.
      */
    def sampleFrames(bytes: Array[Byte], frameSize: Int, stride: Int): Array[Int] = {
      val n = bytes.length / frameSize
      (0 until n by stride).map(f => bytes(f * frameSize) & 0xFF).toArray
    }
  }

  final case class MediaRow(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, hist: Array[Long], frames: Array[Int])

  /** documents.text bytes stand in for the media payload; metadata
    * (width/height) is derived deterministically. Batched feature
    * extraction via mapPartitions — per-partition setup happens once
    * (where a real decoder would init its codec context).
    */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (once, not per row)
        it.map { case (id, bytes) =>
          MediaRow(id, bytes.length.toLong,
            width = 16 + (math.abs(id * 2654435761L) % 1024).toInt,
            height = 16 + (math.abs(id * 40503L) % 1024).toInt,
            hist = FakeDecode.features(bytes),
            frames = FakeDecode.sampleFrames(bytes, 64, 4))
        }
      }
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        aggregate(col("hist"), lit(0L), (a, x) => a + x).as("hist_total"),
        size(col("frames")).cast("long").as("n_frames"))
      .orderBy("doc_id")
  }
}
