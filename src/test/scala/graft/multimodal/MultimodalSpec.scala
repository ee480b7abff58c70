package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.multimodal.Multimodal._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mediaDs = {
    import spark.implicits._
    val df = Seq(
      (0L, "abc"), (1L, "defg"), (2L, "hi"), (3L, "jklmno"))
      .toDF("doc_id", "text")
    fakeMediaTable(df, "doc_id", "text").as[MediaRecord]
  }

  test("fake media table has binary payload + typed metadata") {
    val rows = mediaDs.collect().sortBy(_.media_id)
    assert(rows.map(_.format).toSeq === Seq("png", "jpeg", "webp", "png"))
    assert(rows(0).payload === "abc".getBytes("UTF-8"))
    assert(rows(1).width === 32 && rows(1).height === 32)
  }

  test("feature extraction: histogram + mean intensity per record") {
    val feats = extractFeatures(mediaDs).collect().sortBy(_.media_id)
    assert(feats.map(_.n_bytes).toSeq === Seq(3L, 4L, 2L, 6L))
    val abc = feats(0)
    assert(abc.mean_intensity === ("abc".map(_.toInt).sum / 3.0))
    assert(abc.histogram.sum === 3) // every byte lands in one bucket
    assert(abc.histogram(3) === 3)  // 'a'..'c' = 97..99 -> bucket 3
  }

  test("resize updates payload and metadata in lockstep") {
    val resized = resizeAll(mediaDs, 4, 2).collect().sortBy(_.media_id)
    assert(resized.forall(m => m.width == 4 && m.height == 2))
    assert(resized.forall(_.payload.length === 8))
    // truncation/padding is deterministic
    assert(resized(0).payload.take(3) === "abc".getBytes("UTF-8"))
    assert(resized(0).payload.drop(3).forall(_ == 0))
  }

  test("PCM synthesis roundtrips bytes and frame energies drop partial frames") {
    import spark.implicits._
    val df = Seq(0L, 1L, 63L).toDF("doc_id")
    val audio = pcmMediaTable(spark, df, "doc_id").collect().sortBy(_.media_id)
    // length = 256 + id % 64
    assert(audio.map(_.n_samples).toSeq === Seq(256, 257, 319))
    // sample formula roundtrips through the signed-byte payload
    val a1 = audio(1) // id = 1
    (0 until a1.n_samples).foreach { i =>
      assert(a1.payload(i).toInt === ((1 * 31 + i * 7) % 256) - 128)
    }
    val energies = frameEnergies(
      pcmMediaTable(spark, df, "doc_id"), 64).collect()
    // every record has exactly 4 complete 64-sample frames (partial dropped)
    assert(energies.groupBy(_.media_id).view.mapValues(_.length).toMap ===
      Map(0L -> 4, 1L -> 4, 63L -> 4))
    // hand-computed energy of record 0, frame 0
    val expected = (0 until 64).map { i =>
      val v = ((0 * 31 + i * 7) % 256) - 128; (v * v).toLong
    }.sum
    assert(energies.find(e => e.media_id == 0L && e.frame == 0).get.energy
      === expected)
  }

  test("video frames roundtrip bytes and cut brightness separates") {
    import spark.implicits._
    val df = Seq(1L, 7L, 21L, 22L).toDF("doc_id")  // 7,21 are cut frames
    val frames = videoFrameTable(spark, df, "doc_id", 20, 64)
    val br = frameBrightness(frames).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // id=7 -> video 7, frame 0; id=21 -> video 1, frame 1
    // cut frames: every pixel in [100,119] -> brightness >= 64*100^2
    assert(br((7L, 0)) >= 64L * 100 * 100)
    assert(br((1L, 1)) >= 64L * 100 * 100)
    // normal frames: every pixel in [-64,63] -> brightness <= 64*64^2
    assert(br((1L, 0)) <= 64L * 64 * 64)
    assert(br((2L, 1)) <= 64L * 64 * 64)
    // byte formula roundtrip for a normal frame (id=1)
    val f1 = frames.collect().find(f => f.video_id == 1L && f.frame_idx == 0).get
    (0 until 64).foreach { i =>
      assert(f1.payload(i).toInt === ((1 * 13 + i * 5) % 128) - 64)
    }
  }

  test("block-average phash: perturbation-tolerant, structure-sensitive") {
    // a dark->bright ramp and the same ramp with small local noise must
    // collide; the reversed ramp (different structure) must not
    val ramp = Array.tabulate(64)(i => i * 4)
    val noisy = ramp.zipWithIndex.map { case (p, i) =>
      (p + (if (i % 7 == 0) 2 else -1)).max(0) }
    val reversed = ramp.reverse
    assert(blockAvgHash(ramp) === blockAvgHash(noisy))
    assert(blockAvgHash(ramp) !== blockAvgHash(reversed))
    // flat image: every block mean equals the global mean -> all bits set
    assert(blockAvgHash(Array.fill(16)(7)) === 0xffL)
    assert(blockAvgHash(Array.emptyIntArray) === 0xffL) // vacuous >= holds
  }

  test("perceptualHashes decodes real PNGs and matches the pure-array hash") {
    import spark.implicits._
    val docs = Seq((10L, "aaaaAAAAaaaaZZZZ"), (11L, "the quick brown fox"))
      .toDF("doc_id", "text")
    val got = perceptualHashes(
        pngMediaTable(spark, docs, "doc_id", "text"), JdkImageCodec)
      .collect().map(h => h.media_id -> h.phash).toMap
    def expected(s: String) = blockAvgHash(s.getBytes("UTF-8").map(_ & 0xff))
    assert(got === Map(10L -> expected("aaaaAAAAaaaaZZZZ"),
      11L -> expected("the quick brown fox")))
  }

  test("frame sampling keeps every Nth record") {
    val sampled = sampleFrames(mediaDs, 2).collect().map(_.media_id).sorted
    assert(sampled.toSeq === Seq(0L, 2L))
  }
}
