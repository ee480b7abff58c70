package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property test: min-label propagation against a driver-side union-find
  * on random graphs (chains, cliques, isolated pairs all emerge from the
  * generator).
  */
class ConnectedComponentsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"$name: $result")
  }

  private val genEdge: Gen[(Long, Long)] = for {
    a <- Gen.choose(0L, 19L)
    b <- Gen.choose(0L, 19L)
  } yield (a, b)

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-label convention: component id = min node id
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => ns.map(_ -> ns.min) }.toMap
  }

  test("minLabel equals union-find on random graphs (self-loops included)") {
    // both implementations behind the dispatch: the distributed loop AND
    // the public entry (which takes the bounded-graph union-find path for
    // these sizes) must match the driver-side reference
    check("cc-loop", Prop.forAll(Gen.nonEmptyListOf(genEdge)) { edges =>
      import spark.implicits._
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = ConnectedComponents.minLabelDistributed(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(edges)
    })
    check("cc-fast", Prop.forAll(Gen.nonEmptyListOf(genEdge)) { edges =>
      import spark.implicits._
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = ConnectedComponents.minLabel(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(edges)
    })
    // three-way equality: the O(log n) star-contraction path must agree
    // with both independently-derived witnesses on the same random graphs
    check("cc-star", Prop.forAll(Gen.nonEmptyListOf(genEdge)) { edges =>
      import spark.implicits._
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = ConnectedComponents.starContraction(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(edges)
    })
  }

  /** Random forest with a degraded edge LIST: node i attaches to a
    * uniform parent < i (≈70% of the time; the rest start new roots), and
    * the resulting tree edges are then duplicated (0–2 extra copies),
    * randomly re-oriented, and salted with self-loops — the shape of a
    * real dedup pair list, where the same pair surfaces from several LSH
    * bands in either orientation and trivial self-matches slip through.
    */
  private val genForest: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 40)
    rootPick <- Gen.listOfN(n - 1, Gen.choose(0, 9))
    parents <- Gen.listOfN(n - 1, Gen.choose(0, Int.MaxValue - 1))
    flips <- Gen.listOfN(n - 1, Gen.oneOf(true, false))
    dups <- Gen.listOfN(n - 1, Gen.choose(0, 2))
    loops <- Gen.listOfN(3, Gen.choose(0, n - 1))
  } yield {
    val tree = (1 until n).toList.flatMap { i =>
      if (rootPick(i - 1) < 3) Nil // i roots a new tree in the forest
      else {
        val p = (parents(i - 1) % i).toLong
        val e = if (flips(i - 1)) (i.toLong, p) else (p, i.toLong)
        List.fill(1 + dups(i - 1))(e)
      }
    }
    tree ++ loops.map(l => (l.toLong, l.toLong))
  }

  test("star contraction == union-find on 500 generated forests " +
      "(duplicate/self-loop-heavy, batched as one disjoint union)") {
    import spark.implicits._
    // components never cross graph boundaries when id spaces are disjoint,
    // so ONE distributed contraction over the union of all 500 graphs is
    // exactly 500 independent checks — at one Spark job instead of 500
    val graphs = (0 until 500).map { g =>
      val edges = genForest.pureApply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(g.toLong))
      val off = g.toLong * 1000L
      edges.map { case (a, b) => (a + off, b + off) }
    }
    // the batch is what it claims: non-trivial graphs with real edge noise
    assert(graphs.count(_.nonEmpty) === 500)
    assert(graphs.count(e => e.size != e.distinct.size) > 300,
      "duplicate-heavy generator stopped producing duplicates")

    val all = graphs.toList.flatten
    val got = ConnectedComponents.starContraction(all.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(all))
  }

  test("star contraction labels a long chain min-label's round cap rejects") {
    import spark.implicits._
    // a 300-edge path: diameter 300, so min-label propagation needs 300
    // rounds (here capped at 8 → must THROW, never silently truncate)
    // while star contraction collapses it in O(log 300) ≈ 9 rounds
    val chain = (0L until 300L).map(i => (i, i + 1))
    val pairs = chain.toDF("doc_a", "doc_b")

    intercept[IllegalStateException] {
      ConnectedComponents.minLabelDistributed(pairs, maxIters = 8)
    }

    val got = ConnectedComponents.starContraction(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(chain))
    assert(got.values.toSet == Set(0L)) // one component, labeled by its min
  }

  test("star contraction is identical with broadcast joins disabled") {
    // the regime the distributed path exists for: component state too
    // large to broadcast, every contraction round a sort-merge join —
    // prove correctness there, not only under AQE's small-side broadcast
    import spark.implicits._
    val chain = (0L until 120L).map(i => (i, i + 1)) ++
      Seq((500L, 501L), (501L, 502L), (77L, 77L))
    val pairs = chain.toDF("doc_a", "doc_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val got = ConnectedComponents.starContraction(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(chain))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("star contraction handles empty and self-loop-only edge sets") {
    import spark.implicits._
    val selfOnly = Seq((7L, 7L), (3L, 3L)).toDF("doc_a", "doc_b")
    val got = ConnectedComponents.starContraction(selfOnly)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 7L, 3L -> 3L))
  }
}
