package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: images/audio/video carried as opaque `binary` columns
  * with a typed metadata struct, plus the decode → feature-extract →
  * resize / frame-sample stages a training-data pipeline needs.
  *
  * The Spark-side plumbing is real and tested: schema, partition-preserving
  * batch shape, and operator signatures are exactly what a production
  * pipeline uses. The *codec* itself is STUBBED (this container has no
  * image/audio libraries): `StubCodec.decode` produces a deterministic fake
  * "decoded frame" from the bytes. Swap `StubCodec` for a real JNI/javacpp
  * codec and nothing else changes.
  *
  * Heavy per-record work runs in `mapPartitions` over a typed Dataset —
  * one iterator pass per partition (the Scala analog of a Pandas-batch UDF):
  * codec state is initialized once per partition, not per row, and the
  * operator composes with Catalyst on both sides (narrow transformation, no
  * shuffle; column pruning still reaches the parquet scan below it).
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

  /** Build a media table from any table with (id, text) — the text bytes
    * stand in for an encoded image payload; metadata is derived
    * deterministically so tests are reproducible.
    */
  def fakeMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      element_at(array(lit("png"), lit("jpeg"), lit("webp")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("format"),
      (pmod(col(idCol), lit(64)) * 16 + 16).cast("int").as("width"),
      (pmod(col(idCol), lit(48)) * 16 + 16).cast("int").as("height"))

  /** STUB decode: a real implementation hands `payload` to a codec and gets
    * pixel rows back. The deterministic fake treats the payload bytes as
    * the "pixels" so downstream feature math is exercised end-to-end.
    */
  object StubCodec {
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Int] =
      payload.map(b => (b & 0xff)).toArray // ??? real codec goes here

    /** STUB resize: real impl interpolates pixels; fake truncates/pads. */
    def resize(pixels: Array[Int], newSize: Int): Array[Int] =
      if (pixels.length >= newSize) pixels.take(newSize)
      else pixels ++ Array.fill(newSize - pixels.length)(0)
  }

  /** decode + feature-extract, one codec init per partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec/session init happens HERE (once), not per row
      it.map { m =>
        val pixels = StubCodec.decode(m.payload, m.width, m.height)
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
  def resizeAll(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val pixels = StubCodec.decode(m.payload, m.width, m.height)
        val resized = StubCodec.resize(pixels, w * h)
        m.copy(payload = resized.map(_.toByte), width = w, height = h)
      }
    }
  }
}
