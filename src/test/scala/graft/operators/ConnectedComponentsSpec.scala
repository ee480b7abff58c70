package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("30-node chain clusters into one component (long-diameter graph)") {
    import spark.implicits._
    // worst case for min-label propagation: the label travels one hop per
    // round, so a 30-node path needs 29 rounds — well past the old
    // 20-round cap that silently truncated
    val chain = (0 until 29).map(i => (i.toLong, i + 1L))
      .toDF("doc_a", "doc_b")
    // target the LOOP explicitly: a 30-edge graph would otherwise take
    // the bounded-graph union-find fast path and never exercise it
    val labels = ConnectedComponents.minLabelDistributed(chain)
    assert(labels.count() === 30)
    assert(labels.select("label").distinct()
      .collect().map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("disjoint clusters keep distinct minimum labels") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val got = ConnectedComponents.minLabel(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("raises on non-convergence instead of returning a truncated labeling") {
    import spark.implicits._
    val chain = (0 until 29).map(i => (i.toLong, i + 1L))
      .toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException](
      ConnectedComponents.minLabelDistributed(chain, maxIters = 5))
    assert(e.getMessage.contains("did not converge"))
  }
}
