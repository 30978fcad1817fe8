package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY.md §2.J north star): images/audio/
  * video ride through the engine as opaque `binary` payloads with a typed
  * metadata struct; decode / feature-extract / resize / frame-sample run
  * as partition-local batch transforms.
  *
  * The Spark-side plumbing here — schema, encoders, mapPartitions batch
  * shape, partition sizing — is real and tested. The codec calls are
  * STUBS (deterministic fakes): this offline environment has no image/
  * audio libraries, so `decodeDims`/`resize`/`frameSample` derive their
  * outputs from payload bytes instead of actually decoding. A deployment
  * swaps the stub bodies for javax.imageio / ffmpeg / soundfile calls;
  * nothing else changes.
  *
  * Scale notes: payloads never pass through a shuffle — all transforms are
  * narrow (mapPartitions); metadata extraction projects away the payload
  * before any wide op. At 100 TB the media table is stored with payloads
  * in their own parquet column (column pruning skips them unless needed)
  * and partitioned so one task holds O(100) payloads, not O(rows).
  */
object Multimodal {

  /** Disable ImageIO's DISK-backed stream cache, once per JVM (guide §6:
    * I/O that need not exist). By default every `ImageIO.read`/`write`/
    * `createImageInput(Output)Stream` call wraps its in-memory buffer in
    * a FileCache stream — one temp FILE created, written, read and
    * deleted per image. Our payloads are kilobyte-sized and already in
    * byte arrays, so the disk round-trip is pure overhead, and at 32
    * concurrent codec tasks the tmp-dir churn serializes on the
    * filesystem (measured: the codec queries ran FASTER on 8 cores than
    * 32 before this). Memory-cached streams are seek-equivalent for
    * these sizes. Every codec mapPartitions references this val in its
    * setup so executor JVMs flip the flag before their first codec call. */
  val memOnlyStreams: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Media table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)
  ))

  case class MediaRow(media_id: Long, mime: String, payload: Array[Byte])
  case class MediaMeta(media_id: Long, mime: String, nbytes: Long,
                       width: Int, height: Int, digest: String)

  /** STUB codec: derive (width, height) deterministically from the payload
    * header bytes. Real impl: javax.imageio.ImageIO.read / ffprobe. */
  def decodeDims(payload: Array[Byte]): (Int, Int) = {
    val w = 16 + (if (payload.length > 0) (payload(0) & 0x7f) else 0)
    val h = 16 + (if (payload.length > 1) (payload(1) & 0x7f) else 0)
    (w, h)
  }

  /** The deterministic PNG fixture raster shared by every multimodal
    * codec query (the fixtures ship no binary column, so this closed
    * form doubles as the payload generator): dims are a closed form of
    * `id`, pixels a closed form of (id, x, y), and the three DuckDB
    * oracles replay the dims arithmetic — ONE definition here keeps the
    * Scala sites and the oracle SQL from drifting apart. Returns
    * (width, height, png bytes). */
  def genPng(id: Long): (Int, Int, Array[Byte]) = {
    val w = (8 + id % 24).toInt
    val h = (8 + (id * 7) % 16).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (id * 2654435761L).toInt + x * 31 + y); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    (w, h, bos.toByteArray)
  }

  /** REAL raster rescale (the declared resize stage's codec since r9;
    * the byte stub below remains only for opaque non-image payloads):
    * decode the PNG container via javax.imageio, nearest-neighbor
    * resample the raster with java.awt.image.AffineTransformOp so the
    * longest side fits `maxDim` — target dims are the aspect-preserving
    * integer closed form max(1, side·maxDim/longest), so an oracle can
    * recompute them from the source dims alone — then re-encode PNG.
    * Nearest-neighbor is chosen deliberately: it never synthesizes a
    * color (every output pixel IS some input pixel), which is the
    * pinnable exactness property interpolating kernels lack. An image
    * already inside the budget passes through byte-identical. */
  def resizeImage(payload: Array[Byte], maxDim: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    // ImageIO.read signals "no registered decoder" with null, not an
    // exception — fail with the cause named instead of an NPE deep in a
    // task (opaque non-image payloads belong to the byte-stub resize)
    require(img != null,
      s"resizeImage: undecodable image payload (${payload.length} bytes) — " +
        "no registered ImageIO reader accepts it")
    val (w, h) = (img.getWidth, img.getHeight)
    val m = math.max(w, h)
    if (m <= maxDim) return payload
    val rw = math.max(1, w * maxDim / m)
    val rh = math.max(1, h * maxDim / m)
    // draw through an RGB canvas first: AffineTransformOp refuses some
    // decoder-native color models as filter destinations
    val src = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = src.createGraphics()
    g.drawImage(img, 0, 0, null)
    g.dispose()
    val dst = new java.awt.image.BufferedImage(
      rw, rh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val op = new java.awt.image.AffineTransformOp(
      java.awt.geom.AffineTransform.getScaleInstance(
        rw.toDouble / w, rh.toDouble / h),
      java.awt.image.AffineTransformOp.TYPE_NEAREST_NEIGHBOR)
    op.filter(src, dst)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  /** STUB codec: "resize" = deterministic byte subsampling to the target
    * pixel budget, kept for OPAQUE (non-image) payloads only — the
    * declared resize stage runs [[resizeImage]], the real raster codec. */
  def resize(payload: Array[Byte], maxBytes: Int): Array[Byte] =
    if (payload.length <= maxBytes) payload
    else {
      val step = math.max(1, payload.length / maxBytes)
      payload.indices.collect { case i if i % step == 0 => payload(i) }.take(maxBytes).toArray
    }

  /** STUB codec: sample n evenly-spaced "frames" (fixed-width byte windows).
    * Real impl: ffmpeg keyframe extraction. */
  def frameSample(payload: Array[Byte], n: Int, frameBytes: Int = 16): Seq[Array[Byte]] = {
    if (payload.isEmpty || n <= 0) Seq.empty
    else (0 until n).map { k =>
      val start = ((payload.length.toLong * k) / n).toInt
      payload.slice(start, math.min(start + frameBytes, payload.length))
    }
  }

  private def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes).map("%02x".format(_)).mkString

  /** Metadata extraction: partition-local batch transform (the Scala analog
    * of a pandas-batch UDF) — one codec context per partition, payload
    * dropped from the output row. */
  def extractMeta(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition setup would initialize the real codec here, once
      rows.map { r =>
        val (w, h) = decodeDims(r.payload)
        MediaMeta(r.media_id, r.mime, r.payload.length.toLong, w, h, sha256Hex(r.payload))
      }
    }
  }

  /** Frame sampling as a generator: one output row per sampled frame. */
  def sampleFrames(ds: Dataset[MediaRow], n: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap(r => frameSample(r.payload, n).zipWithIndex.map {
      case (f, i) => (r.media_id, i, f)
    }).toDF("media_id", "frame_no", "frame")
  }

  /** Build a synthetic media table from any string column — the test
    * harness for the plumbing (fixtures ship no binary payloads). */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("application/x-fake").as("mime"),
      col("text").cast(BinaryType).as("payload"))
      .as[MediaRow]
  }
}
