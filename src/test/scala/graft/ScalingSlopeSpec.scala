package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scaling-slope tripwire (round-7 verdict #8): SCALE.md argues the
  * catalog's most expensive queries are linear-with-bounded-constants;
  * this spec MEASURES it. Each of the historically-costliest queries (plus each
  * round's new corpus-bound heavyweights)
  * runs at sf0.01 and sf0.1 (10x the data) and the fitted power-law
  * exponent log10(t₁₀ₓ/t₁ₓ) must stay ≤ 1.25 — a plan that picked up an
  * accidental quadratic term (an unblocked self-join, a lost df cut, a
  * broadcast turned cartesian) lands at ≥ 1.7 and fails loudly, which is
  * exactly the class of regression the plan invariants cannot see because
  * the SHAPE still looks fine.
  *
  * Methodology: one discarded warmup per (query, SF) — codegen + page
  * cache — then best-of-2 timed runs through the no-op sink (full plan
  * executes, nothing collected). The sf0.01 denominator is clamped up to
  * a 0.2 s noise floor so JVM jitter on a near-instant small run cannot
  * inflate the exponent; the clamp is conservative — it can only UNDER-
  * state the slope, and a genuine quadratic blows past the ceiling from
  * the numerator alone.
  */
class ScalingSlopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The spec pins itself to the LIVE cost leaders (round-9 verdict #3 /
    * round-10 #6): the five most expensive queries are read from the
    * committed bench archive at test time instead of a hard-coded list
    * that silently goes stale as the catalog's cost profile shifts.
    * Two historically slope-prone shapes (iterative contraction, the
    * KN scorer's join chain) stay pinned unconditionally — they are the
    * reason this spec exists — plus any archive top-5 member not already
    * covered. Falls back to the historical list if no archive exists.
    */
  private val alwaysPinned = Seq(
    "q166_dedup_clusters_contraction",
    "q193_kn_surprisal_outliers")

  private val targets: Seq[String] = {
    val repoRoot = {
      val loc = new java.io.File(".").getAbsoluteFile
      Iterator.iterate(loc)(_.getParentFile).takeWhile(_ != null)
        .find(d => new java.io.File(d, "build.sbt").isFile)
        .getOrElse(new java.io.File("."))
    }
    val archive = Option(repoRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("""bench_full_r\d+_sf0\.1\.json"""))
      .sortBy(_.getName).lastOption
    val top5 = archive.toSeq.flatMap { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      // the per-query map is the "queries" object; entries are "name":sec
      val qmap = """"(q\d+[a-z0-9_]*)":(-?[0-9.]+)""".r
        .findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toSeq
        // a name can appear in queries AND queries_normalized — keep max
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      qmap.toSeq.sortBy(-_._2).take(5).map(_._1)
        .filter(SparkEntry.queries.contains)
    }
    (alwaysPinned ++ top5).distinct
  }

  private val MaxExponent = 1.25
  private val NoiseFloorSec = 0.2

  private def timeOne(name: String, sfDir: String): Double = {
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    try {
      once() // discarded warmup at this SF
      math.min(once(), once())
    } finally spark.sqlContext.clearCache()
  }

  test("most expensive queries scale ~linearly from sf0.01 to sf0.1 " +
      f"(fitted exponent <= $MaxExponent%.2f)") {
    val rows = targets.map { name =>
      val t1 = timeOne(name, "/root/testdata/sf0.01")
      val t10 = timeOne(name, "/root/testdata/sf0.1")
      val exponent = math.log10(t10 / math.max(t1, NoiseFloorSec))
      info(f"$name%-32s sf0.01 $t1%6.2f s  sf0.1 $t10%6.2f s  " +
        f"exponent $exponent%.2f")
      (name, t1, t10, exponent)
    }
    rows.foreach { case (name, t1, t10, exponent) =>
      assert(exponent <= MaxExponent,
        f"$name scaling exponent $exponent%.2f exceeds $MaxExponent%.2f " +
          f"($t1%.2f s -> $t10%.2f s over 10x data) — a super-linear term " +
          "has crept into its plan")
    }
  }
}
