package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed in partition-sized batches — the Spark-side shape
  * (schema, batching, partitioning) of an image/audio/video pipeline.
  *
  * Two tiers:
  *   - [[mediaFeatures]] (q27): byte-level blob plumbing — histogram +
  *     the video-frame-sampling access pattern over an opaque payload
  *     ([[FakeDecode]]: deterministic byte features, no codec).
  *   - [[imageDecode]] (q66): a REAL image decode via the JDK's
  *     `javax.imageio` (zero new deps) — deterministic PNGs are encoded
  *     per row from a SQL-expressible pixel formula, round-tripped
  *     through `ImageIO.read`, and the DECODED width/height/channel sums
  *     are emitted; the DuckDB oracle recomputes them from the pixel
  *     spec, so any decoder or plumbing fault breaks the hash.
  *
  * Both run the `mapPartitions` batch shape (the Scala twin of
  * `mapInPandas`: one iterator of rows per partition, per-partition codec
  * setup amortized outside the row loop).
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
        it.map { case (id, bytes0) =>
          // a NULL blob (failed fetch / missing media) is a zero-byte
          // payload: the row keeps its metadata, features are empty —
          // the oracle coalesces octet_length the same way
          val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
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

  /** The deterministic test-image spec shared by the q66 encoder, the
    * spec suite, and (re-derived in SQL) the DuckDB oracle:
    * per doc, a `w×h` RGB image with
    *   w = 4 + doc_id % 13,  h = 4 + doc_id % 11,
    *   r(x,y) = (31·id + 7x + 13y) mod 256
    *   g(x,y) = (17·id + 11x + 5y) mod 256
    *   b(x,y) = (13·id + 3x + 29y) mod 256
    * — every quantity SQL-expressible, so the oracle can compute the
    * EXPECTED decode output without an image library. PNG is lossless
    * RGB, so decode(encode(img)) must reproduce the pixels exactly.
    */
  object ImageSpec extends Serializable {
    def width(id: Long): Int = (4 + id % 13).toInt
    def height(id: Long): Int = (4 + id % 11).toInt
    def rgb(id: Long, x: Int, y: Int): (Int, Int, Int) = (
      ((31 * id + 7 * x + 13 * y) % 256).toInt,
      ((17 * id + 11 * x + 5 * y) % 256).toInt,
      ((13 * id + 3 * x + 29 * y) % 256).toInt)

    /** Encode the doc's spec image as real PNG bytes (JDK ImageIO). */
    def encodePng(id: Long): Array[Byte] = {
      val (w, h) = (width(id), height(id))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = rgb(id, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  final case class DecodedRow(doc_id: Long, width: Int, height: Int,
      r_sum: Long, g_sum: Long, b_sum: Long)

  /** q66: REAL image decode over a binary media column. Each doc's
    * deterministic PNG ([[ImageSpec.encodePng]] — standing in for the
    * blob column a production table carries; the bytes on the wire ARE a
    * real PNG stream) is decoded with `javax.imageio.ImageIO.read` inside
    * the mapPartitions batch, and the DECODED dimensions + per-channel
    * pixel sums are emitted. The oracle recomputes all five values from
    * the pixel formula — a wrong decode (channel order, row stride,
    * color-space surprise) hash-mismatches immediately.
    *
    * Scale shape: map-only (encode+decode are per-row CPU inside one
    * narrow stage, no shuffle before the presentation sort); with blobs
    * in an object store the same batch fetches (uri, offset, length)
    * ranges per partition instead of encoding — the decode loop and the
    * output schema are unchanged.
    */
  def imageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        // per-partition codec setup would init here, once; ImageIO is
        // stateless so the spin-up cost is its first-use registry scan
        it.map { id =>
          val png = ImageSpec.encodePng(id)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png))
          val (w, h) = (img.getWidth, img.getHeight)
          var (rs, gs, bs) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              rs += (p >> 16) & 0xFF; gs += (p >> 8) & 0xFF; bs += p & 0xFF
              x += 1
            }
            y += 1
          }
          DecodedRow(id, w, h, rs, gs, bs)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }
}
