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

  test("frame sampling keeps every Nth record") {
    val sampled = sampleFrames(mediaDs, 2).collect().map(_.media_id).sorted
    assert(sampled.toSeq === Seq(0L, 2L))
  }
}
