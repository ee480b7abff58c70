package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.multimodal.Multimodal

/** Catalog entry for the multimodal pipeline's relational surface: binary
  * payload + typed metadata columns, aggregated per format. The codec-side
  * stages (decode/feature/resize) are exercised in MultimodalSpec; this
  * query oracles the schema/metadata plumbing that is SQL-expressible.
  */
object MultimodalQueries {

  val defs: Seq[(String, QueryDef)] = Seq(
    "q51_multimodal_features" -> QueryDef(
      (s, dir) =>
        Multimodal.fakeMediaTable(table(s, dir, "documents"), "doc_id", "text")
          .groupBy("format")
          .agg(count(lit(1)).as("n_media"),
               round(avg(octet_length(col("payload"))), 2).as("avg_bytes"),
               round(avg(col("width").cast("long") * col("height")), 1)
                 .as("avg_pixels"))
          .orderBy("format"),
      Some("""SELECT
             | CASE (doc_id % 3) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
             |   ELSE 'webp' END AS format,
             | count(*) AS n_media,
             | round(avg(octet_length(encode(text))), 2) AS avg_bytes,
             | round(avg(((doc_id % 64) * 16 + 16) *
             |           ((doc_id % 48) * 16 + 16)), 1) AS avg_pixels
             |FROM documents GROUP BY 1 ORDER BY format""".stripMargin)),

    // ---- REAL decode + feature extraction under the oracle ----------------
    // Each document's text bytes are encoded executor-side as a genuine
    // width×1 grayscale PNG, then decoded back through javax.imageio
    // (JdkImageCodec) in the mapPartitions feature stage. PNG is lossless,
    // so decoded pixel == text byte == ascii() — the oracle recomputes the
    // same features from character codes and stays hash-exact while the
    // query exercises a real image codec per record.
    "q53_multimodal_decode" -> QueryDef(
      (s, dir) => {
        val media = Multimodal
          .pngMediaTable(s, table(s, dir, "documents"), "doc_id", "text")
        Multimodal.extractFeatures(media, Multimodal.JdkImageCodec).toDF()
          .withColumn("grp", pmod(col("media_id"), lit(3)))
          .groupBy("grp")
          .agg(count(lit(1)).as("n_media"),
               round(avg("mean_intensity"), 4).as("avg_intensity"),
               sum(element_at(col("histogram"), 4)).as("bucket3_px"))
          .orderBy("grp")
      },
      Some("""SELECT
             | doc_id % 3 AS grp,
             | count(*) AS n_media,
             | round(avg(mi), 4) AS avg_intensity,
             | CAST(sum(b3) AS BIGINT) AS bucket3_px
             |FROM (
             |  SELECT doc_id,
             |    list_avg(list_transform(range(1, length(text) + 1),
             |      i -> ascii(substr(text, i, 1)))) AS mi,
             |    len(list_filter(list_transform(range(1, length(text) + 1),
             |      i -> ascii(substr(text, i, 1))), c -> c // 32 = 3)) AS b3
             |  FROM documents)
             |GROUP BY 1 ORDER BY grp""".stripMargin)),

    // ---- audio: PCM decode + frame energy ---------------------------------
    // The audio half of the multimodal surface: synthetic-but-real 8-bit
    // PCM payloads (integer waveform, so the oracle reconstructs the exact
    // bytes), decoded executor-side and reduced to per-frame energies
    // (sum of squared samples over complete 64-sample frames, trailing
    // partial frame dropped). All-integer math -> hash-exact oracle.
    "q78_audio_frame_energy" -> QueryDef(
      (s, dir) => {
        val audio = Multimodal.pcmMediaTable(
          s, table(s, dir, "documents"), "doc_id")
        Multimodal.frameEnergies(audio, 64).toDF()
          .groupBy((col("media_id") % 8).cast("int").as("bucket"))
          .agg(count(lit(1)).as("n_frames"),
               sum("energy").as("total_energy"),
               max("energy").as("max_energy"))
          .orderBy("bucket")
      },
      // n_samples = 256 + doc_id % 64 ∈ [256, 319] -> always exactly 4
      // complete 64-sample frames
      Some("""WITH f AS (
             |  SELECT doc_id, fr,
             |    list_sum(list_transform(range(fr*64, fr*64 + 64),
             |      i -> ((doc_id*31 + i*7) % 256 - 128) *
             |           ((doc_id*31 + i*7) % 256 - 128))) AS energy
             |  FROM documents, range(0, 4) t(fr))
             |SELECT CAST(doc_id % 8 AS INT) AS bucket,
             |  count(*) AS n_frames,
             |  CAST(sum(energy) AS BIGINT) AS total_energy,
             |  CAST(max(energy) AS BIGINT) AS max_energy
             |FROM f GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ---- video: frame decode + scene-change detection ---------------------
    // The video half of the multimodal surface: frames are opaque binary
    // payloads decoded executor-side (narrow map, no shuffle) into a
    // per-frame brightness statistic; scene cuts are rising edges of the
    // lag-delta per video — the temporal-window half of a real
    // shot-segmentation pipeline. Synthetic-but-real frames: cut frames'
    // pixel range separates from normal frames by construction, so the
    // detector is deterministic and the all-integer oracle reconstructs
    // the identical brightness series from the generator formula.
    "q92_video_scene_cuts" -> QueryDef(
      (s, dir) => {
        val frames = Multimodal.videoFrameTable(
          s, table(s, dir, "documents"), "doc_id", 20, 64)
        val br = Multimodal.frameBrightness(frames)
        val w = Window.partitionBy("video_id").orderBy("frame_idx")
        br.withColumn("delta",
            col("brightness") - lag("brightness", 1).over(w))
          .groupBy("video_id")
          .agg(count(lit(1)).as("n_frames"),
               sum(when(col("delta") > 300000, 1L).otherwise(0L))
                 .as("n_cuts"),
               min(when(col("delta") > 300000, col("frame_idx")))
                 .as("first_cut"))
          .orderBy("video_id")
      },
      Some("""WITH f AS (
             |  SELECT doc_id % 20 AS video_id,
             |    CAST(doc_id // 20 AS INT) AS frame_idx,
             |    list_sum(list_transform(range(0, 64), i ->
             |      CASE WHEN doc_id % 7 = 0
             |        THEN (100 + (doc_id + i) % 20)
             |           * (100 + (doc_id + i) % 20)
             |        ELSE ((doc_id*13 + i*5) % 128 - 64)
             |           * ((doc_id*13 + i*5) % 128 - 64) END)) AS brightness
             |  FROM documents),
             |d AS (
             |  SELECT video_id, frame_idx,
             |    brightness - lag(brightness) OVER
             |      (PARTITION BY video_id ORDER BY frame_idx) AS delta
             |  FROM f)
             |SELECT video_id, count(*) AS n_frames,
             |  CAST(sum(CASE WHEN delta > 300000 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_cuts,
             |  min(CASE WHEN delta > 300000 THEN frame_idx END) AS first_cut
             |FROM d GROUP BY video_id ORDER BY video_id""".stripMargin)),

    // ---- image perceptual-hash dedup --------------------------------------
    // Near-dup detection for IMAGES, fused from the multimodal and dedup
    // families: every document's genuine width×1 PNG is decoded
    // executor-side ([[Multimodal.JdkImageCodec]]) and reduced to an
    // 8-bit block-average perceptual hash (aHash family) whose bits are
    // pure integer cross-multiplications — so the oracle replays the
    // SAME hash from the text's character codes while Spark computes it
    // from real decoded pixels. Bucketing by hash is a plain groupBy:
    // image near-dup at 100 TB has the exact-dedup shuffle shape, with
    // the decode cost map-side.
    "q118_image_phash_dedup" -> QueryDef(
      (s, dir) => {
        val media = Multimodal
          .pngMediaTable(s, table(s, dir, "documents"), "doc_id", "text")
        Multimodal.perceptualHashes(media, Multimodal.JdkImageCodec).toDF()
          .filter(col("n_px") >= 8)
          .groupBy("phash")
          .agg(count(lit(1)).as("n_images"),
               min("media_id").as("keep_id"),
               sum("media_id").as("id_sum"))
          .orderBy("phash")
      },
      Some("""WITH px AS (
             |  SELECT doc_id,
             |    list_transform(range(1, length(text) + 1),
             |      i -> ascii(substr(text, i, 1))) AS codes
             |  FROM documents WHERE length(text) >= 8),
             |h AS (
             |  SELECT doc_id,
             |    CAST(list_sum(list_transform(range(0, 8), b ->
             |      CASE WHEN
             |        list_sum(list_slice(codes, (len(codes) * b) // 8 + 1,
             |                            (len(codes) * (b + 1)) // 8))
             |          * len(codes)
             |        >= list_sum(codes) *
             |           ((len(codes) * (b + 1)) // 8 - (len(codes) * b) // 8)
             |      THEN 1 << b ELSE 0 END)) AS BIGINT) AS phash
             |  FROM px)
             |SELECT phash, count(*) AS n_images,
             |  CAST(min(doc_id) AS BIGINT) AS keep_id,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM h GROUP BY phash ORDER BY phash""".stripMargin)),
  )
}
