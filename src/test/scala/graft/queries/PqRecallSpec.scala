package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pinned recall floor for the PQ-ADC ANN path — completes the recall-gate
  * set (q64 SRP-LSH, q158 IVF, this): the hash oracle proves q169 is
  * deterministic, this spec proves the codebook/encode/LUT pipeline is
  * GOOD, so a broken encode join or codebook regression fails here even
  * if it stays deterministic.
  *
  * Context for the floor: the synthetic embeddings are isotropic
  * (measured mean pairwise cosine ≈ 0.01, no cluster structure), the
  * hardest case for PQ — measured aggregate recall@10 at sf0.01 is 0.24
  * (fixed SliceCodebookSize = 32 per subspace) vs a ~0.03 chance level
  * (10 random picks of 299). The floors (0.15 aggregate, ≥1 hit per
  * query is NOT required — worst measured query is 0.1) sit between
  * measurement and chance so ambient data-regeneration wiggle doesn't
  * flake the gate while a pipeline break (recall → chance) always trips
  * it.
  */
class PqRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("PQ-ADC recall@10 clears the pinned floor on the validation slice") {
    val rows = SimilarityQueries.defs.toMap
      .apply("q169_pq_recall").fn(spark, sf)
      .collect()
    assert(rows.length == 5, "five validation queries expected")
    val nExact = rows.map(_.getLong(1)).sum
    val nHit = rows.map(_.getLong(2)).sum
    val aggregate = nHit.toDouble / nExact
    assert(aggregate >= 0.15,
      f"aggregate PQ recall@10 $aggregate%.3f fell below the 0.15 floor " +
        "(chance level on the 300-vector slice is ~0.03)")
  }

  // Second parameter point: proves the hashSample codebook draw and the
  // floor methodology aren't tuned to SliceCodebookSize = 32. Doubling
  // the per-subspace codebook to 64 halves the quantization cells'
  // occupancy, so recall should hold or improve (measured 0.32 aggregate
  // at sf0.01 vs 0.24 at 32); the floor stays at the first point's 0.15 —
  // a bigger codebook that LOWERED recall below the smaller one's floor
  // would mean the encode/LUT machinery, not the parameter, broke.
  test("PQ recall floors hold at a second parameter point (codebook = 64)") {
    val rows = SimilarityQueries.pqRecall(spark, sf, 64).collect()
    assert(rows.length == 5, "five validation queries expected")
    val nExact = rows.map(_.getLong(1)).sum
    val nHit = rows.map(_.getLong(2)).sum
    val aggregate = nHit.toDouble / nExact
    info(f"codebook=64 aggregate recall@10 = $aggregate%.3f")
    assert(aggregate >= 0.15,
      f"aggregate PQ recall@10 $aggregate%.3f at codebook=64 fell below " +
        "the 0.15 floor (chance level ~0.03)")
  }
}
