package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.RenderingHints
import java.awt.image.BufferedImage

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: images/audio/video carried as opaque `binary` columns
  * with a typed metadata struct, plus the decode → feature-extract →
  * resize / frame-sample stages a training-data pipeline needs.
  *
  * The codec is pluggable behind [[MediaCodec]]:
  *   - [[JdkImageCodec]] is a REAL image codec — PNG/JPEG/BMP/GIF decode and
  *     bilinear resize via `javax.imageio` + `java.awt`, which ship with the
  *     JDK (no external dependency). Grayscale intensity comes from the
  *     raster directly for 1-band images and from integer Rec.601 luma for
  *     RGB.
  *   - [[StubCodec]] remains as the deterministic test seam (payload bytes
  *     as pixels) for specs that want codec-independent plumbing checks.
  *
  * Heavy per-record work runs in `mapPartitions` over a typed Dataset —
  * one iterator pass per partition (the Scala analog of a Pandas-batch UDF):
  * codec state is initialized once per partition via `MediaCodec.open()`,
  * not per row, and the operator composes with Catalyst on both sides
  * (narrow transformation, no shuffle; column pruning still reaches the
  * parquet scan below it).
  */
object Multimodal {

  /** Typed media record: opaque payload + metadata. */
  final case class MediaRecord(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  /** Extracted features per media record. */
  final case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      mean_intensity: Double,
      histogram: Array[Long])

  /** Codec seam: decode a payload to 0-255 intensity pixels; resize a
    * payload to new dimensions. Implementations must be serializable (they
    * ride in the `mapPartitions` closure) and may carry per-partition init
    * in `open()`.
    */
  trait MediaCodec extends Serializable {
    /** Called once per partition before any decode. */
    def open(): Unit = ()
    /** Payload → row-major 0-255 intensity pixels. Empty payload → empty. */
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Int]
    /** Payload → payload re-encoded at dstW×dstH. */
    def resize(payload: Array[Byte], srcW: Int, srcH: Int,
               dstW: Int, dstH: Int): Array[Byte]
  }

  /** STUB codec (test seam): treats the payload bytes as the "pixels" so
    * downstream feature math is exercised deterministically with no real
    * image involved; resize truncates/pads.
    */
  object StubCodec extends MediaCodec {
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Int] =
      payload.map(b => (b & 0xff)).toArray

    def resize(payload: Array[Byte], srcW: Int, srcH: Int,
               dstW: Int, dstH: Int): Array[Byte] = {
      val n = dstW * dstH
      if (payload.length >= n) payload.take(n)
      else payload ++ Array.fill[Byte](n - payload.length)(0)
    }
  }

  /** REAL codec on the JDK's own imaging stack: `javax.imageio` decodes
    * PNG/JPEG/BMP/GIF/WBMP out of the box; resize is a bilinear
    * `Graphics2D` scale re-encoded as PNG (lossless, so resize chains don't
    * accumulate codec error). No external library — safe on any executor.
    */
  object JdkImageCodec extends MediaCodec {
    override def open(): Unit =
      // keep ImageIO off executor-local disk: decode fully in memory
      ImageIO.setUseCache(false)

    private def read(payload: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null)
        throw new IllegalArgumentException(
          s"undecodable image payload (${payload.length} bytes)")
      img
    }

    def decode(payload: Array[Byte], width: Int, height: Int): Array[Int] = {
      if (payload.isEmpty) return Array.emptyIntArray
      val img = read(payload)
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Int](w * h)
      val raster = img.getRaster
      if (raster.getNumBands == 1) {
        // grayscale: raster samples ARE the intensities — exact roundtrip
        raster.getSamples(0, 0, w, h, 0, out)
      } else {
        // RGB(A): integer Rec.601 luma, same formula as OpenCV's grayscale
        var y = 0
        var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            out(i) = (299 * r + 587 * g + 114 * b) / 1000
            i += 1
            x += 1
          }
          y += 1
        }
      }
      out
    }

    def resize(payload: Array[Byte], srcW: Int, srcH: Int,
               dstW: Int, dstH: Int): Array[Byte] = {
      if (payload.isEmpty) return payload
      val src = read(payload)
      val dst = new BufferedImage(dstW, dstH, src.getType match {
        case BufferedImage.TYPE_CUSTOM => BufferedImage.TYPE_INT_RGB
        case t => t
      })
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, dstW, dstH, null)
      } finally g.dispose()
      encodePng(dst)
    }

    /** Encode a BufferedImage as PNG bytes (lossless). */
    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream(img.getWidth * img.getHeight + 64)
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Build a real grayscale PNG whose row-major pixels are `pixels`
      * (0-255). Used by fixtures and [[Multimodal.pngMediaTable]]; PNG is
      * lossless so `decode(grayPng(p)) == p` exactly.
      */
    def grayPng(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
      require(pixels.length == width * height,
        s"${pixels.length} pixels for ${width}x$height")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setSamples(0, 0, width, height, 0, pixels)
      encodePng(img)
    }
  }

  /** Build a media table from any table with (id, text) — the text bytes
    * stand in for an encoded image payload; metadata is derived
    * deterministically so tests are reproducible. Pairs with [[StubCodec]].
    */
  def fakeMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      element_at(array(lit("png"), lit("jpeg"), lit("webp")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("format"),
      (pmod(col(idCol), lit(64)) * 16 + 16).cast("int").as("width"),
      (pmod(col(idCol), lit(48)) * 16 + 16).cast("int").as("height"))

  /** Build a media table of GENUINE PNG images: each document's text bytes
    * become the grayscale pixel row of a real width×1 PNG, encoded with the
    * JDK codec executor-side. Decoding with [[JdkImageCodec]] roundtrips to
    * exactly the text's byte values (PNG is lossless), so feature oracles
    * stated over character codes remain hash-exact while the query runs a
    * real image decode per record.
    */
  def pngMediaTable(spark: SparkSession, df: DataFrame,
                    idCol: String, textCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        JdkImageCodec.open()
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          if (bytes.isEmpty)
            MediaRecord(id, Array.emptyByteArray, "png", 0, 0)
          else {
            val pixels = bytes.map(b => b & 0xff)
            MediaRecord(id, JdkImageCodec.grayPng(pixels, bytes.length, 1),
              "png", bytes.length, 1)
          }
        }
      }
  }

  /** (media_id, 8-bit perceptual hash, decoded pixel count). */
  final case class MediaHash(media_id: Long, phash: Long, n_px: Int)

  /** 8-bit block-average perceptual hash of a decoded grayscale image:
    * the pixel sequence is cut into 8 equal-share blocks
    * (`[n*b/8, n*(b+1)/8)` in integer math) and bit `b` is set iff block
    * `b`'s mean is >= the global mean — compared by CROSS-MULTIPLICATION
    * (`sum_b * n >= total * n_b`), so the hash is pure integer arithmetic
    * end-to-end and an oracle can replay it exactly. The aHash family's
    * defining property holds: images equal up to small local perturbation
    * land in the same bucket, and bucketing is a plain groupBy — image
    * near-dup dedup becomes the exact-dedup shape.
    */
  def blockAvgHash(pixels: Array[Int]): Long = {
    val n = pixels.length
    var total = 0L
    var i = 0
    while (i < n) { total += pixels(i); i += 1 }
    var h = 0L
    var b = 0
    while (b < 8) {
      val from = (n.toLong * b / 8).toInt
      val until = (n.toLong * (b + 1) / 8).toInt
      var s = 0L
      i = from
      while (i < until) { s += pixels(i); i += 1 }
      if (s * n >= total * (until - from)) h |= (1L << b)
      b += 1
    }
    h
  }

  /** decode + perceptual-hash, one codec init per partition. */
  def perceptualHashes(media: Dataset[MediaRecord],
                       codec: MediaCodec = StubCodec): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      codec.open()
      it.map { m =>
        val px = codec.decode(m.payload, m.width, m.height)
        MediaHash(m.media_id, blockAvgHash(px), px.length)
      }
    }
  }

  /** decode + feature-extract, one codec init per partition. */
  def extractFeatures(media: Dataset[MediaRecord],
                      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec/session init happens HERE (once), not per row
      codec.open()
      it.map { m =>
        val pixels = codec.decode(m.payload, m.width, m.height)
        val hist = new Array[Long](8)
        var sum = 0L
        var i = 0
        while (i < pixels.length) {
          sum += pixels(i)
          hist(pixels(i) >> 5) += 1
          i += 1
        }
        val mean =
          if (pixels.isEmpty) 0.0 else sum.toDouble / pixels.length
        MediaFeatures(m.media_id, m.format, m.payload.length.toLong,
          mean, hist)
      }
    }
  }

  /** Typed audio record: opaque PCM payload + metadata. */
  final case class AudioRecord(
      media_id: Long,
      payload: Array[Byte],
      sample_rate: Int,
      n_samples: Int)

  /** Per-frame energy (sum of squared samples — integer, so oracles over
    * it are exact). */
  final case class FrameEnergy(media_id: Long, frame: Int, energy: Long)

  /** Build an audio table of deterministic synthetic 8-bit PCM: sample i of
    * record `id` is `((id*31 + i*7) mod 256) - 128`, length
    * `256 + id mod 64`. Pure integer math, so a SQL oracle reconstructs the
    * identical waveform; the byte roundtrip (signed byte ∈ [-128, 127]) is
    * exact.
    */
  def pcmMediaTable(spark: SparkSession, df: DataFrame,
                    idCol: String): Dataset[AudioRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = (256 + id % 64).toInt
          val bytes = new Array[Byte](n)
          var i = 0
          while (i < n) {
            bytes(i) = (((id * 31 + i * 7) % 256) - 128).toByte
            i += 1
          }
          AudioRecord(id, bytes, 16000, n)
        }
      }
  }

  /** Frame-energy extraction: decode the PCM payload and emit one energy
    * row per COMPLETE frame of `frameSize` samples (the trailing partial
    * frame is dropped, as a real feature extractor does). Narrow flatMap —
    * fan-out is n_samples/frameSize per record, no shuffle.
    */
  def frameEnergies(audio: Dataset[AudioRecord],
                    frameSize: Int): Dataset[FrameEnergy] = {
    import audio.sparkSession.implicits._
    audio.flatMap { a =>
      val nFrames = a.n_samples / frameSize
      (0 until nFrames).iterator.map { f =>
        var e = 0L
        var i = f * frameSize
        val end = i + frameSize
        while (i < end) {
          val sample = a.payload(i).toLong
          e += sample * sample
          i += 1
        }
        FrameEnergy(a.media_id, f, e)
      }
    }
  }

  /** One decoded video frame: owning video, temporal index, opaque pixel
    * payload. */
  final case class VideoFrame(
      video_id: Long,
      frame_idx: Int,
      payload: Array[Byte])

  /** Build a video-frame table of deterministic synthetic frames: source
    * row `id` becomes frame `id / videos` of video `id % videos`. Pixel i
    * of a NORMAL frame is `((id*13 + i*5) mod 128) - 64` (range
    * [-64, 63], brightness ≤ 64·64²); every 7th source id is a SCENE CUT
    * whose pixels are `100 + (id + i) mod 20` (range [100, 119],
    * brightness ≥ 64·100²) — the statistic SEPARATES by construction, so
    * a threshold detector is deterministic, and the pure integer math
    * lets a SQL oracle reconstruct every byte.
    */
  def videoFrameTable(spark: SparkSession, df: DataFrame, idCol: String,
                      videos: Int, frameBytes: Int): Dataset[VideoFrame] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bytes = new Array[Byte](frameBytes)
          var i = 0
          while (i < frameBytes) {
            val v =
              if (id % 7 == 0) 100 + (id + i) % 20
              else (id * 13 + i * 5) % 128 - 64
            bytes(i) = v.toByte
            i += 1
          }
          VideoFrame(id % videos, (id / videos).toInt, bytes)
        }
      }
  }

  /** Per-frame brightness (sum of squared pixel bytes — integer, so
    * oracles over it are exact), decoded executor-side from the payload.
    * Narrow map — no shuffle; the temporal analysis downstream (scene
    * cuts via lag) is the only exchange, on video_id.
    */
  def frameBrightness(frames: Dataset[VideoFrame]): DataFrame = {
    import frames.sparkSession.implicits._
    frames.map { f =>
      var s = 0L
      var i = 0
      while (i < f.payload.length) {
        val p = f.payload(i).toLong; s += p * p; i += 1
      }
      (f.video_id, f.frame_idx, s)
    }.toDF("video_id", "frame_idx", "brightness")
  }

  /** Frame sampling: keep every `stride`-th record per partition — the
    * batch shape (iterator in, iterator out) is what a video frame-sampler
    * uses; payload-level sampling happens inside the codec in a real
    * pipeline.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.filter(m => m.media_id % stride == 0)
  }

  /** Resize stage: payload → resized payload, metadata updated in lockstep. */
  def resizeAll(media: Dataset[MediaRecord], w: Int, h: Int,
                codec: MediaCodec = StubCodec): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      codec.open()
      it.map { m =>
        val resized = codec.resize(m.payload, m.width, m.height, w, h)
        m.copy(payload = resized, width = w, height = h)
      }
    }
  }
}
