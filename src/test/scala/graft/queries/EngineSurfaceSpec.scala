package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the engine-surface wave: q245 recursive
  * CTE (UnionLoop), q246 AMS F₂ sketch, q247 power-iteration PCA. Each
  * query's full output relation is replayed from the raw tables in pure
  * Scala — same md5-derived hashes, same truncating sign-split integer
  * divisions — so neither an analysis-time failure nor a semantic drift
  * the DuckDB twin happens to share can pass CI.
  */
class EngineSurfaceSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Sign-split division: matches Spark's truncating DIV applied to
    * non-negative operands on both branches (and DuckDB's flooring //,
    * which agrees on non-negative operands). */
  private def sd(v: Long, d: Long): Long =
    if (v >= 0) v / d else -((-v) / d)

  /** First 8 hex chars of md5 as a long — functions.TextOps.hash32. */
  private def hash32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  test("q245: recursive-CTE depth profile replays from an explicit " +
      "parent-chain walk") {
    val rows = run("q245_recursive_cte_hierarchy").collect()
    assert(rows.nonEmpty)
    val cents: Map[Long, Long] = table(spark, sf, "customer")
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) ->
        math.floor(r.getDouble(1) * 100).toLong).toMap
    // iterative frontier walk — the UnionLoop semantics, replayed
    var frontier = Map(1L -> cents(1L))
    var depth = 0
    val expect = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long, Long)]
    while (frontier.nonEmpty) {
      expect += ((depth, frontier.size.toLong, frontier.keys.min,
        frontier.keys.max, frontier.values.sum))
      frontier = cents.collect {
        case (k, c) if k > 1 && frontier.contains(k / 2) =>
          k -> (frontier(k / 2) + c)
      }
      depth += 1
    }
    assert(rows.length === expect.length)
    rows.sortBy(_.getInt(0)).zip(expect).foreach { case (r, e) =>
      assert((r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)) === e, s"depth ${e._1}")
    }
  }

  test("q246: AMS counters, median-of-means, and error replay from " +
      "scratch frequencies; the estimate is within 2x of exact F2") {
    val rows = run("q246_ams_f2_sketch").collect()
    assert(rows.length === 4)
    val freq: Map[Long, Long] = table(spark, sf, "lineitem")
      .select("l_partkey").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val f2 = freq.values.map(f => f * f).sum
    val z = Array.tabulate(16) { j =>
      freq.iterator.map { case (k, f) =>
        if (hash32(s"ams_${j}_$k") % 2 == 0) f else -f
      }.sum
    }
    val means = Array.tabulate(4) { g =>
      (0 until 4).map(o => { val v = z(g * 4 + o); v * v }).sum / 4
    }
    val ms = means.sorted
    val est = (ms(1) + ms(2)) / 2
    val errBp = math.abs(est - f2) * 10000 / f2
    rows.sortBy(_.getLong(0)).zipWithIndex.foreach { case (r, g) =>
      assert(r.getLong(0) === g.toLong)
      assert(r.getLong(1) === means(g), s"grp $g mean")
      assert(r.getLong(2) === est)
      assert(r.getLong(3) === f2)
      assert(r.getLong(4) === errBp)
    }
    // quality witness: median-of-means of 16 ±1 counters estimates F2
    // within a factor the seeds comfortably achieve on this corpus
    assert(est > 0 && est < 2 * f2 && 2 * est > f2,
      s"AMS estimate $est vs exact $f2 outside 2x")
  }

  test("q247: three power-iteration rounds and the Rayleigh quotient " +
      "replay from the raw embeddings") {
    val rows = run("q247_power_iteration_pca").collect()
    assert(rows.length === 64)
    val vecs: Seq[Array[Long]] = table(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray
        .map(x => math.floor(x.toDouble * 1000).toLong).toArray).toSeq
    val dims = vecs.head.length
    val n = vecs.size.toLong
    val mi = Array.tabulate(dims) { i =>
      sd(vecs.iterator.map(_(i)).sum, n)
    }
    val cent = vecs.map(v => Array.tabulate(dims)(i => v(i) - mi(i)))
    var w = Array.fill(dims)(1000L)
    for (_ <- 1 to 3) {
      val s = cent.map(c =>
        sd((0 until dims).map(i => c(i) * w(i)).sum, 1000L))
      val y = Array.tabulate(dims) { i =>
        cent.iterator.zip(s.iterator).map { case (c, sv) =>
          c(i) * sv
        }.sum
      }
      val m = math.max(y.map(math.abs).max, 1L)
      w = y.map(yi => sd(yi * 1000, m))
    }
    val sF = cent.map(c =>
      sd((0 until dims).map(i => c(i) * w(i)).sum, 1000L))
    val rayNum = sF.map(s => s * s).sum
    val rayDen = w.map(x => x * x).sum
    rows.sortBy(_.getLong(0)).zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i.toLong)
      assert(r.getLong(1) === w(i), s"w[$i]")
      assert(r.getLong(2) === rayNum)
      assert(r.getLong(3) === rayDen)
    }
    // convergence witness: the dominant direction is non-degenerate
    // (some component saturates the milli scale by normalization)
    assert(w.map(math.abs).max === 1000L)
  }

  test("q256: exact join sizes and System-R estimates replay from " +
      "scratch key-frequency maps; the PK-FK estimate is exact") {
    val rows = run("q256_join_estimate_audit").collect()
    assert(rows.length === 3)
    def freqs(t: String, k: String): Map[Long, Long] =
      table(spark, sf, t).select(k).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val cases = Map(
      "li_orders" -> (freqs("lineitem", "l_orderkey"),
        freqs("orders", "o_orderkey")),
      "li_part" -> (freqs("lineitem", "l_partkey"),
        freqs("part", "p_partkey")),
      "orders_cust" -> (freqs("orders", "o_custkey"),
        freqs("customer", "c_custkey")))
    rows.foreach { r =>
      val (fR, fS) = cases(r.getString(0))
      val (nL, dL) = (fR.values.sum, fR.size.toLong)
      val (nR, dR) = (fS.values.sum, fS.size.toLong)
      val exact = fR.keys.toSeq.intersect(fS.keys.toSeq)
        .map(k => fR(k) * fS(k)).sum
      val est = nL * nR / math.max(dL, dR)
      assert(r.getLong(1) === nL); assert(r.getLong(2) === dL)
      assert(r.getLong(3) === nR); assert(r.getLong(4) === dR)
      assert(r.getLong(5) === exact, s"exact ${r.getString(0)}")
      assert(r.getLong(6) === est)
      assert(r.getLong(7) === math.abs(est - exact) * 10000 / exact)
      // a PK-FK join under containment: the estimate IS the fact count
      // when the dimension is the dominant distinct side
      if (dR >= dL) assert(est === nL * nR / dR)
    }
  }

  test("q264: variant extraction replays from a scratch JSON parse of " +
      "every props payload") {
    val rows = run("q264_variant_shred").collect()
    assert(rows.nonEmpty)
    val ev = table(spark, sf, "events")
      .select("event_type", "props").collect()
      .map { r =>
        val m = """"k":\s*(-?\d+)""".r.findFirstMatchIn(r.getString(1))
        (r.getString(0), m.map(_.group(1).toLong))
      }
    val byType = ev.groupBy(_._1)
    assert(rows.length === byType.size)
    rows.foreach { r =>
      val g = byType(r.getString(0))
      val ks = g.flatMap(_._2)
      assert(r.getLong(1) === g.length.toLong)
      assert(r.getLong(2) === ks.sum)
      assert(r.getLong(3) === ks.min)
      assert(r.getLong(4) === ks.max)
      // '$.missing' is absent from every payload: null-not-error
      assert(r.getLong(5) === g.length.toLong)
    }
  }

  test("q265: the pipe-syntax plan equals the plain-SQL spelling of " +
      "the same query, operator for operator") {
    val piped = run("q265_pipe_syntax_sql")
    table(spark, sf, "lineitem").createOrReplaceTempView("lineitem_pv")
    val plain = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem_pv
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus HAVING count(*) > 100
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    // pipes are pure surface syntax: the optimized logical plans of the
    // two spellings must be structurally identical node-for-node
    val a = piped.queryExecution.optimizedPlan
      .collect { case p => p.nodeName }
    val b = plain.queryExecution.optimizedPlan
      .collect { case p => p.nodeName }
    assert(a === b, "pipe and plain plans diverged")
    // column ORDER may differ between the spellings (AGGREGATE emits
    // aggregates before group keys); values must agree field-by-name
    val cols = plain.columns.toSeq
    val pr = piped.collect().map(r => cols.map(c =>
      r.get(r.fieldIndex(c))).mkString("|"))
    val qr = plain.collect().map(r => cols.map(c =>
      r.get(r.fieldIndex(c))).mkString("|"))
    assert(pr.sameElements(qr))
  }
}
