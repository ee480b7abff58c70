package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pinned recall floor for the IVF ANN path — the q64-style quality gate
  * for q158: the hash oracle proves determinism, this spec proves the
  * index is GOOD, so a centroid-scheme or probe-count regression fails
  * here even if it stays deterministic.
  *
  * Floors are pinned below the measured values (sf0.01, fixed
  * SliceNlist = 8 / nprobe = 3: aggregate recall@10 = 0.58, worst query
  * 0.4 — probing 3 of 8 lists covers less of the slice than the old
  * 3-of-6, hence lower than round 5's 0.66) so ambient data regeneration
  * wiggle doesn't flake the gate while a real quality drop (e.g.
  * nprobe 3 → 1 loses two-thirds of the candidates) still trips it.
  */
class IvfRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("IVF recall@10 clears the pinned floor on the validation slice") {
    val rows = SimilarityQueries.defs.toMap
      .apply("q158_ivf_recall").fn(spark, sf)
      .collect()
    assert(rows.length == 5, "five validation queries expected")
    val nExact = rows.map(_.getLong(1)).sum
    val nHit = rows.map(_.getLong(2)).sum
    val aggregate = nHit.toDouble / nExact
    assert(aggregate >= 0.5,
      f"aggregate IVF recall@10 $aggregate%.3f fell below the 0.5 floor")
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.3,
        s"query ${r.getLong(0)} recall ${r.getDouble(3)} below per-query floor")
    }
  }
}
