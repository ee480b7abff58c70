package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Pins the hashSample upgrade path (SCALE.md "Accepted full-scan costs"):
  * the hash-clustered mirror layout, the pushed prefix-range draw, and —
  * the part that keeps the ANN family honest — exact equality of the drawn
  * set with the full-pass sampler on both the pruned and fallback phases.
  */
class HashSamplerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = Tables.table(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding"))
  private lazy val mirror = {
    val dir = Files.createTempDirectory("hash_mirror_").toString
    HashSampler.writeHashMirror(emb, "vec_id", dir)
    dir
  }

  /** The current full-pass draw (the hashSample formula, verbatim). */
  private def fullPass(k: Int): Seq[Long] =
    emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
      .select("vec_id").collect().map(_.getLong(0)).toSeq

  private def indexed(k: Int, bound: String): Seq[Long] =
    HashSampler.hashSampleIndexed(spark, mirror, "vec_id", k, bound)
      .select("vec_id").collect().map(_.getLong(0)).toSeq

  test("pruned-phase draw equals the full-pass sample exactly") {
    // "40" covers the smallest quarter of the hash space — hundreds of the
    // 500 fixture rows, comfortably ≥ k, so the bounded phase decides
    assert(indexed(k = 64, bound = "40") === fullPass(64))
  }

  test("fallback phase (bound too tight for k) still equals the full pass") {
    // "002" holds ~1/4096 of rows — essentially always < 64 of 500 — so
    // the draw must detect the shortfall and fall back without changing
    // the drawn set
    assert(indexed(k = 64, bound = "002") === fullPass(64))
  }

  test("the prefix range reaches the parquet scan as a pushed filter") {
    val pref = spark.read.parquet(mirror)
      .filter(col(HashSampler.HashCol) < lit("08"))
    val scan = pref.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec"))
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains(s"LessThan(${HashSampler.HashCol}"),
      s"prefix range not pushed: $pushed")
  }

  test("mirror files carry disjoint hash ranges (the layout that makes " +
      "row-group skipping selective)") {
    val files = new java.io.File(mirror).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
    assert(files.length > 1, "range layout needs multiple files to prove")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min(HashSampler.HashCol), max(HashSampler.HashCol))
        .collect().head
      (r.getString(0), r.getString(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin,
          s"file hash ranges overlap: [..,$aMax] vs [$bMin,..]")
      case _ =>
    }
  }

  test("draw schema matches the full-pass sampler (hash column dropped)") {
    val out = HashSampler.hashSampleIndexed(spark, mirror, "vec_id", 8)
    assert(out.columns.toSeq === emb.columns.toSeq)
    assert(out.count() === 8)
  }
}
