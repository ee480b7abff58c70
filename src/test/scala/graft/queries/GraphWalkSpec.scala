package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the graph-ML wave: q248 weighted
  * Bellman-Ford SSSP, q249 distributed Lloyd k-means, q250 deterministic
  * random-walk corpus. Each query's output relation is replayed from the
  * raw tables in pure Scala (same md5-derived indices, same sign-split
  * truncating divisions, same encode-argmin tie-breaks), independent of
  * both Spark's and DuckDB's execution.
  */
class GraphWalkSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def sd(v: Long, d: Long): Long =
    if (v >= 0) v / d else -((-v) / d)

  private def hash32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Distinct (order, part<800) pairs → co-occurrence pair counts. */
  private lazy val pairCounts: Map[(Long, Long), Long] = {
    val byOrder = table(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 < 800).distinct
      .groupBy(_._1).values
    byOrder.flatMap { rows =>
      val pks = rows.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length)
        yield (pks(i), pks(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("q248: 4-round Bellman-Ford distances replay from an explicit " +
      "edge relaxation loop") {
    val rows = run("q248_sssp_bellman_ford").collect()
    assert(rows.length === 20)
    val edges: Seq[(Long, Long, Long)] = pairCounts.toSeq.flatMap {
      case ((a, b), n) =>
        val w = 1000 / n + 1
        Seq((a, b, w), (b, a, w))
    }
    val src = edges.map(_._1).min
    var dist = Map(src -> 0L)
    for (_ <- 1 to 4) {
      val relaxed = edges.flatMap { case (u, v, w) =>
        dist.get(u).map(d => v -> (d + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    val nReached = dist.size.toLong
    val expect = dist.toSeq.map { case (n, d) => (d, n) }
      .sorted.take(20)
    rows.zip(expect).foreach { case (r, (d, n)) =>
      assert(r.getLong(0) === n)
      assert(r.getLong(1) === d)
      assert(r.getLong(2) === nReached)
    }
  }

  test("q249: two Lloyd rounds replay — assignments, centroids, " +
      "inertia, and checksums all match") {
    val rows = run("q249_lloyd_kmeans_rounds").collect()
    assert(rows.nonEmpty)
    val vecs: Map[Long, Array[Long]] = table(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray
        .map(x => math.floor(x.toDouble * 1000).toLong).toArray).toMap
    val dims = vecs.head._2.length
    var cent: Map[Long, Array[Long]] =
      vecs.filter(_._1 < 4).map { case (k, v) => k -> v.clone() }
    def assign(): Map[Long, (Long, Long)] = vecs.map { case (id, v) =>
      val enc = cent.map { case (cid, c) =>
        val d2 = (0 until dims).map { i =>
          val d = v(i) - c(i); d * d
        }.sum
        d2 * 4 + cid
      }.min
      id -> (enc % 4, enc / 4)
    }
    for (_ <- 1 to 2) {
      val a = assign()
      cent = vecs.toSeq.groupBy(kv => a(kv._1)._1).view.mapValues { vs =>
        Array.tabulate(dims) { i =>
          sd(vs.map(_._2(i)).sum, vs.size.toLong)
        }
      }.toMap
    }
    val fin = assign()
    val byCid = fin.values.groupBy(_._1)
    rows.foreach { r =>
      val cid = r.getLong(0)
      val members = byCid(cid)
      assert(r.getLong(1) === members.size.toLong, s"n cid=$cid")
      assert(r.getLong(2) === members.map(_._2).sum, s"inertia cid=$cid")
      assert(r.getLong(3) ===
        (0 until dims).map(i => cent(cid)(i) * (i + 1)).sum,
        s"checksum cid=$cid")
    }
    assert(rows.map(_.getLong(1)).sum === vecs.size.toLong)
  }

  test("q250: all 8 walk trajectories replay hop-for-hop from the " +
      "sorted adjacency lists") {
    val rows = run("q250_random_walk_corpus").collect()
    assert(rows.length === 40)
    val adj: Map[Long, IndexedSeq[Long]] = pairCounts.keys.toSeq
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toIndexedSeq)
      .toMap
    val seeds = adj.keys.toSeq.sorted.take(8)
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = seeds.indices.flatMap { ix =>
      val wid = ix + 1L
      var node = seeds(ix)
      (wid, 0L, node) +: (1 to 4).map { step =>
        val nbrs = adj(node)
        val idx = hash32(s"walk_${wid}_${step}_$node") % nbrs.length
        node = nbrs(idx.toInt)
        (wid, step.toLong, node)
      }
    }
    assert(got.toSeq === want.toSeq)
  }

  /** Union-find components of an undirected edge list, min-id labeled. */
  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  test("q254: per-community modularity contributions replay from a " +
      "union-find partition and exact integer arithmetic") {
    val rows = run("q254_community_modularity").collect()
    assert(rows.nonEmpty)
    val pairs = pairCounts.filter(_._2 >= 2).keys.toSeq
    val comp = components(pairs)
    val m = pairs.size.toLong
    val deg = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byC = comp.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
    val expect = byC.toSeq.sortBy(_._1).map { case (c, nodes) =>
      val mC = pairs.count(p => comp(p._1) == c).toLong
      val dC = nodes.map(deg).sum
      (c, nodes.size.toLong, mC, dC,
        mC * 1000000L / m - dC * dC * 1000000L / (4 * m * m))
    }
    assert(rows.length === expect.length)
    rows.zip(expect).foreach { case (r, e) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)) === e)
    }
    // partition sanity: every edge is intra-community, Σm_c = m
    assert(expect.map(_._3).sum === m)
  }

  test("q255: assortativity moments and r replay from the directed " +
      "edge list") {
    val rows = run("q255_degree_assortativity").collect()
    assert(rows.length === 1)
    val pairs = pairCounts.keys.toSeq
    val dir = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = dir.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = dir.size.toLong
    val sx = dir.map(e => deg(e._1)).sum
    val sxy = dir.map(e => deg(e._1) * deg(e._2)).sum
    val sx2 = dir.map(e => deg(e._1) * deg(e._1)).sum
    val r0 = rows.head
    assert(r0.getLong(0) === n)
    assert(r0.getLong(1) === sx)
    assert(r0.getLong(2) === sxy)
    assert(r0.getLong(3) === sx2)
    val r = (n * sxy - sx * sx).toDouble / (n * sx2 - sx * sx)
    val rounded = BigDecimal(r)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r0.getDouble(4) - rounded) < 1e-9)
    // degree correlation is a genuine correlation: |r| ≤ 1
    assert(math.abs(r0.getDouble(4)) <= 1.0)
  }

  test("q257: per-node clustering coefficients replay from an " +
      "adjacency-set triangle count") {
    val rows = run("q257_local_clustering").collect()
    assert(rows.length === 20)
    val pairs = pairCounts.keys.toSeq
    val adj: Map[Long, Set[Long]] = pairs
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = adj.toSeq.collect {
      case (v, nbrs) if nbrs.size >= 2 =>
        val t = nbrs.toSeq.map(w => (nbrs & adj(w)).size.toLong).sum / 2
        val deg = nbrs.size.toLong
        (2 * t * 10000 / (deg * (deg - 1)), v, deg, t)
    }.sortBy { case (lcc, v, _, _) => (-lcc, v) }.take(20)
    rows.zip(expect).foreach { case (r, (lcc, v, deg, t)) =>
      assert(r.getLong(0) === v)
      assert(r.getLong(1) === deg)
      assert(r.getLong(2) === t, s"triangles node=$v")
      assert(r.getLong(3) === lcc)
    }
  }
}
