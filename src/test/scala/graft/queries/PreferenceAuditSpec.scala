package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the round-10 preference/valuation wave:
  * q309 Bradley–Terry, q310 Condorcet/cycles, q311 Misra–Gries merge,
  * q312 LOO influence, q313 Sinkhorn. Each query's output relation is
  * replayed from the raw tables in pure Scala (same hash family, same
  * truncating integer divisions, BigInt throughout) — an analysis-time
  * failure or a semantic drift shared with the DuckDB twin cannot pass.
  * q312 additionally pins the exact trace identity
  * Σ_rows h_num = 3·det − λ·tr(adj A), which the query's own output
  * (a top-20 slice) cannot witness.
  */
class PreferenceAuditSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Raw docs: (doc_id, source, lang, n_chars, text). */
  private lazy val docs: Seq[(Long, String, String, Long, String)] =
    table(spark, sf, "documents")
      .select("doc_id", "source", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4))).toSeq

  /** The q309/q310 pairwise win matrix, replayed from scratch. */
  private lazy val winMatrix: Map[(String, String), Long] = {
    val keyed = docs.map { case (id, src, lang, nc, _) =>
      (id, src, lang, nc, hash32(s"bt|$id") % 8)
    }
    val pairs = for {
      a <- keyed
      b <- keyed
      if a._3 == b._3 && a._5 == b._5 && a._1 < b._1 && a._2 != b._2
    } yield if (a._4 >= b._4) (a._2, b._2) else (b._2, a._2)
    pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("q309: Bradley–Terry MM fixpoint replays exactly") {
    val rows = run("q309_bradley_terry").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rows.nonEmpty)
    val srcs = docs.map(_._2).distinct.sorted
    def w(i: String, j: String) =
      BigInt(winMatrix.getOrElse((i, j), 0L))
    val bigW = srcs.map(i =>
      i -> srcs.filter(_ != i).map(j => w(i, j)).sum).toMap
    val games = srcs.map(i =>
      i -> srcs.filter(_ != i).map(j => w(i, j) + w(j, i)).sum).toMap
    val sc = BigInt(1000000000L)
    val k = srcs.length
    var p = srcs.map(_ -> BigInt(1000)).toMap
    for (_ <- 1 to 3) {
      val d = srcs.map { i =>
        i -> srcs.filter(j => j != i && (w(i, j) + w(j, i)) > 0)
          .map(j => (w(i, j) + w(j, i)) * sc / (p(i) + p(j))).sum
      }.toMap
      val praw = srcs.map { i =>
        i -> (if (d(i) == 0) BigInt(0) else bigW(i) * sc / d(i))
      }.toMap
      val tot = praw.values.sum.max(BigInt(1))
      p = srcs.map(i =>
        i -> (praw(i) * 1000 * k / tot).max(BigInt(1))).toMap
    }
    val rank = srcs.sortBy(i => (-p(i), i)).zipWithIndex
      .map { case (i, r) => i -> (r + 1L) }.toMap
    val expect = srcs.map(i => (i, games(i).toLong, bigW(i).toLong,
      p(i).toLong, rank(i))).sortBy(_._1)
    assert(rows.toSeq == expect)
  }

  test("q310: Copeland scores and majority 3-cycles replay exactly") {
    val rows = run("q310_condorcet_cycles").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val srcs = docs.map(_._2).distinct.sorted
    def w(i: String, j: String) = winMatrix.getOrElse((i, j), 0L)
    val k = srcs.length
    val expect = srcs.map { i =>
      val opps = srcs.filter(_ != i)
      val mw = opps.count(j => w(i, j) > w(j, i)).toLong
      val ml = opps.count(j => w(i, j) < w(j, i)).toLong
      val mt = opps.count(j =>
        w(i, j) == w(j, i) && w(i, j) + w(j, i) > 0).toLong
      val ng = opps.count(j => w(i, j) + w(j, i) == 0).toLong
      (i, mw, ml, mt, ng, if (mw == k - 1) 1L else 0L)
    }
    val edges = (for {
      i <- srcs; j <- srcs if i != j && w(i, j) > w(j, i)
    } yield (i, j)).toSet
    val cycles = (for {
      a <- srcs; b <- srcs; c <- srcs
      if a < b && a < c
      if edges((a, b)) && edges((b, c)) && edges((c, a))
    } yield 1).size.toLong
    assert(rows.toSeq == expect.map(e =>
      (e._1, e._2, e._3, e._4, e._5, e._6, cycles)))
  }

  /** q311's tokenizer, replayed: lowercased whitespace split of trim. */
  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+", -1).toSeq

  test("q311: Misra–Gries merge replays exactly and honors the bound") {
    val rows = run("q311_misra_gries_merge").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val k = 16
    val tok = docs.flatMap { case (id, _, _, _, text) =>
      toks(text).map(t => (id % 8, t))
    }
    val pc = tok.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val parts = pc.keys.map(_._1).toSeq.distinct
    val summaries = parts.map { p =>
      val cs = pc.collect { case ((pp, t), c) if pp == p => (t, c) }
        .toSeq.sortBy { case (t, c) => (-c, t) }
      val fk1 = if (cs.length >= k + 1) cs(k)._2 else 0L
      p -> (cs.map { case (t, c) => (t, c - fk1) }
        .filter(_._2 > 0), fk1)
    }.toMap
    val bound = summaries.values.map(_._2).sum
    val est = summaries.values.flatMap(_._1)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val exact = tok.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expect = est.toSeq.sortBy { case (t, e) => (-e, t) }
      .take(20).zipWithIndex.map { case ((t, e), i) =>
        val ex = exact(t)
        val uc = ex - e
        (i + 1L, t, e, ex, uc, bound,
          if (uc >= 0 && uc <= bound) 1L else 0L)
      }
    assert(rows.toSeq == expect)
    // the mergeability guarantee must actually HOLD, not just be flagged
    assert(expect.forall(_._7 == 1L))
  }

  /** Raw orders rows quantized as q312 does: (key, p, m, y). */
  private lazy val ordRows: Seq[(Long, Long, Long, Long)] =
    table(spark, sf, "orders")
      .selectExpr("o_orderkey",
        "CAST(substring(o_orderpriority, 1, 1) AS BIGINT)",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') " +
          "AS BIGINT) DIV 30",
        "CAST(floor(o_totalprice) AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("q312: LOO influence replays exactly and satisfies the trace identity") {
    val out = run("q312_loo_influence").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.length == 20)
    val lam = BigInt(100)
    val n = BigInt(ordRows.length)
    def S(f: ((Long, Long, Long, Long)) => BigInt) = ordRows.map(f).sum
    val s11 = n + lam
    val s12 = S(r => BigInt(r._2)); val s13 = S(r => BigInt(r._3))
    val s22 = S(r => BigInt(r._2) * r._2) + lam
    val s23 = S(r => BigInt(r._2) * r._3)
    val s33 = S(r => BigInt(r._3) * r._3) + lam
    val b1 = S(r => BigInt(r._4)); val b2 = S(r => BigInt(r._2) * r._4)
    val b3 = S(r => BigInt(r._3) * r._4)
    val c11 = s22 * s33 - s23 * s23
    val c12 = -(s12 * s33 - s13 * s23)
    val c13 = s12 * s23 - s13 * s22
    val c22 = s11 * s33 - s13 * s13
    val c23 = -(s11 * s23 - s12 * s13)
    val c33 = s11 * s22 - s12 * s12
    val det = s11 * c11 + s12 * c12 + s13 * c13
    assert(det > 0)
    val bn1 = c11 * b1 + c12 * b2 + c13 * b3
    val bn2 = c12 * b1 + c22 * b2 + c23 * b3
    val bn3 = c13 * b1 + c23 * b2 + c33 * b3
    def sdiv(a: BigInt, b: BigInt) =
      if (a.signum >= 0) a / b else -((-a) / b)
    val scored = ordRows.map { case (key, p, m, y) =>
      val hnum = c11 + 2 * c12 * p + 2 * c13 * m + c22 * p * p +
        2 * c23 * p * m + c33 * m * m
      val enum_ = BigInt(y) * det - (bn1 + bn2 * p + bn3 * m)
      assert(hnum >= 0 && hnum < det,
        s"leverage out of (0,1): $hnum / $det")
      (key, p, m, y, sdiv(hnum * 10000, det).toLong,
        sdiv(enum_ * 1000, det).toLong,
        sdiv(enum_ * 1000, det - hnum).toLong, hnum)
    }
    // exact trace identity: Σ h_num = tr(adj(A)(A−λI)) = 3·det − λ·tr(adj A)
    val traceLhs = scored.map(_._8).sum
    assert(traceLhs == 3 * det - lam * (c11 + c22 + c33))
    val expect = scored
      .sortBy { case (key, _, _, _, _, _, eloo, _) =>
        (-math.abs(eloo), key) }
      .take(20)
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7))
    assert(out.sortBy(t => (-math.abs(t._7), t._1)).toSeq == expect)
  }

  test("q313: Sinkhorn fixpoint replays exactly; final col marginals tight") {
    val rows = run("q313_sinkhorn_mixing").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))).sortBy(_._1)
    assert(rows.nonEmpty)
    val allToks = docs.flatMap { case (_, src, _, _, text) =>
      toks(text).map(t => (src, t))
    }
    val support = allToks.groupBy(_._2).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(16).map(_._1)
    val cA = support.map(t =>
      BigInt(allToks.count(x => x._1 == "src0" && x._2 == t)))
    val cB = support.map(t =>
      BigInt(allToks.count(x => x._1 == "src1" && x._2 == t)))
    val na = cA.sum; val nb = cB.sum
    val a = cA.map(_ * nb); val b = cB.map(_ * na)
    val nn = support.length
    def ker(i: Int, j: Int) = BigInt(1L << (15 - math.abs(i - j)))
    val sS = BigInt(1000000000L)
    var u = Array.fill(nn)(BigInt(0))
    var v = Array.fill(nn)(sS)
    for (_ <- 1 to 3) {
      u = Array.tabulate(nn)(i => a(i) * sS * sS /
        (0 until nn).map(j => ker(i, j) * v(j)).sum.max(1))
      v = Array.tabulate(nn)(j => b(j) * sS * sS /
        (0 until nn).map(i => ker(i, j) * u(i)).sum.max(1))
    }
    def pl(i: Int, j: Int) = u(i) * ker(i, j) * v(j) / (sS * sS)
    def devBp(m: BigInt, t: BigInt) = ((m - t).abs * 10000 / t.max(1)).toLong
    val cost = (for (i <- 0 until nn; j <- 0 until nn)
      yield BigInt(math.abs(i - j)) * pl(i, j)).sum.toLong
    val expect = support.zipWithIndex.map { case (t, i) =>
      val rm = (0 until nn).map(pl(i, _)).sum
      val cm = (0 until nn).map(pl(_, i)).sum
      (i + 1L, t, a(i).toLong, b(i).toLong, rm.toLong, cm.toLong,
        devBp(rm, a(i)), devBp(cm, b(i)), cost)
    }
    assert(rows.toSeq == expect)
    // v updated last → column marginals are exact up to the per-cell
    // floor: each |col − b_j| < n cells; in bp that is tiny for any
    // token with real mass. Assert the audit's own promise.
    rows.filter(_._4 > 1000).foreach { r =>
      assert(r._8 <= 10, s"col marginal loose for ${r._2}: ${r._8} bp")
    }
  }

  test("q314: Fellegi–Sunter weights replay exactly from raw customers") {
    val out = run("q314_fellegi_sunter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1)
    assert(out.length == 8)
    val cust = table(spark, sf, "customer")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)",
        "c_mktsegment", "CAST(floor(c_acctbal / 1000) AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // (rid, ent, nat, seg, bal)
    val recs = cust.toSeq.flatMap { case (k, nat, seg, bal) =>
      val pz = hash32(s"fsp|$k") % 10
      Seq(
        (k * 2, k, nat, seg, bal),
        (k * 2 + 1, k,
          if (pz == 0) (nat + 1) % 25 else nat,
          if (pz == 1 || pz == 2) seg + "_X" else seg,
          if (pz == 3) bal + 1 else bal))
    }
    def fl(a: (Long, Long, Long, String, Long),
           b: (Long, Long, Long, String, Long)) =
      ((if (a._3 == b._3) 1L else 0L),
        (if (a._4 == b._4) 1L else 0L),
        (if (a._5 == b._5) 1L else 0L))
    val mp = recs.groupBy(_._2).values.toSeq.flatMap { g =>
      for (a <- g; b <- g if a._1 < b._1) yield fl(a, b)
    }
    val up = recs.map(r => (r, hash32(s"fsu|${r._1}")))
      .groupBy(_._2 % 64).values.toSeq.flatMap { g =>
        val sorted = g.sortBy { case (r, h) => (h, r._1) }
        sorted.grouped(2).collect {
          case Seq((a, _), (b, _)) if a._2 != b._2 => fl(a, b)
        }
      }
    val nm = BigInt(mp.size); val nu = BigInt(up.size)
    def agr(ps: Seq[(Long, Long, Long)], f: ((Long, Long, Long)) => Long) =
      BigInt(ps.map(f).sum)
    val (man, mas, mab) = (agr(mp, _._1), agr(mp, _._2), agr(mp, _._3))
    val (uan, uas, uab) = (agr(up, _._1), agr(up, _._2), agr(up, _._3))
    val mcnt = mp.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ucnt = up.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def term(flag: Long, a: BigInt, n: BigInt) =
      if (flag == 1) a + 1 else n - a + 1
    val expect = (0L until 8L).map { pid =>
      val (fn, fs, fb) = ((pid / 4) % 2, (pid / 2) % 2, pid % 2)
      val num = term(fn, man, nm) * term(fs, mas, nm) *
        term(fb, mab, nm) * (nu + 2) * (nu + 2) * (nu + 2)
      val den = term(fn, uan, nu) * term(fs, uas, nu) *
        term(fb, uab, nu) * (nm + 2) * (nm + 2) * (nm + 2)
      (pid, fn, fs, fb,
        mcnt.getOrElse((fn, fs, fb), 0L),
        ucnt.getOrElse((fn, fs, fb), 0L),
        (num * 1000 / den).toLong,
        if (num > 10 * den) 2L else if (num > den) 1L else 0L)
    }
    assert(out.toSeq == expect)
    // the synthetic duplicates must actually separate: all-agree links,
    // all-disagree does not
    assert(out.last._8 == 2L && out.head._8 == 0L)
  }

  test("q315: MST replays via Prim — a third independent algorithm") {
    val out = run("q315_mst_single_linkage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2))
    assert(out.nonEmpty)
    val vecs = table(spark, sf, "embeddings")
      .filter("vec_id < 200").select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def quant(x: Float): Long =
      (math.floor((x.toDouble + 1.0) * 1000) * 1000).toLong
    val pw = (for {
      (u, va) <- vecs; (v, vb) <- vecs if u < v
    } yield {
      val d2 = va.indices.map { i =>
        val d = quant(va(i)) - quant(vb(i)); d * d
      }.sum
      (u, v, (d2 / 1000000) * 40000 + u * 200 + v)
    }).toSeq
    val byNode = (pw.map(e => (e._1, e._3)) ++ pw.map(e => (e._2, e._3)))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.take(3).toSet).toMap
    val keepW = byNode.values.flatten.toSet
    val edges = pw.filter(e => keepW(e._3))
    // Prim, grown from each still-unvisited minimum vertex
    val adj = (edges.map(e => (e._1, (e._2, e._3))) ++
      edges.map(e => (e._2, (e._1, e._3))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val visited = scala.collection.mutable.Set[Long]()
    val mst = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    vecs.map(_._1).sorted.foreach { seed =>
      if (!visited(seed)) {
        visited += seed
        val pq = scala.collection.mutable.PriorityQueue
          .empty[(Long, Long, Long)](Ordering.by(t => -t._3))
        adj.getOrElse(seed, Nil).foreach { case (t, w) =>
          pq.enqueue((seed, t, w)) }
        while (pq.nonEmpty) {
          val (f, t, w) = pq.dequeue()
          if (!visited(t)) {
            visited += t
            mst += ((math.min(f, t), math.max(f, t), w))
            adj.getOrElse(t, Nil).foreach { case (t2, w2) =>
              if (!visited(t2)) pq.enqueue((t, t2, w2)) }
          }
        }
      }
    }
    val total = mst.map(_._3).sum
    val nV = vecs.length.toLong
    val nE = mst.size.toLong
    val expect = mst.toSeq.sortBy(t => (t._1, t._2))
      .map(t => (t._1, t._2, t._3, total, nE, nV, nV - nE))
    assert(out.toSeq == expect)
  }

  test("q316: truncated SPRT replays sequentially from the raw events") {
    val out = run("q316_sprt_quality_gate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    assert(out.nonEmpty)
    val evs = table(spark, sf, "events")
      .selectExpr("user_id % 16", "unix_micros(ts)", "event_id",
        "CAST(CASE WHEN event_type IN ('click', 'view', 'purchase') " +
          "THEN 1 ELSE 0 END AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byG = evs.groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2, e._3)).map(_._4).take(44)).toMap
    def replay(name: String,
               num: (Int, Int) => BigInt, den: (Int, Int) => BigInt) =
      byG.keys.toSeq.sorted.map { g =>
        val seq = byG(g)
        var k = 0
        var res: Option[(Long, Long, Long, BigInt, BigInt)] = None
        for ((sx, i) <- seq.zipWithIndex if res.isEmpty) {
          val n = i + 1
          k += sx.toInt
          val (nu, de) = (num(k, n), den(k, n))
          if (nu >= 19 * de) res = Some((n.toLong, k.toLong, 1L, nu, de))
          else if (19 * nu <= de)
            res = Some((n.toLong, k.toLong, -1L, nu, de))
          else if (n == seq.length || n == 44)
            res = Some((n.toLong, k.toLong, 0L, nu, de))
        }
        val (sn, ka, dec, nu, de) = res.get
        (name, g, sn, ka, dec, (nu * 1000 / de).toLong)
      }
    val expect = (replay("a_500_625",
        (k, n) => BigInt(5).pow(k) * BigInt(3).pow(n - k),
        (_, n) => BigInt(4).pow(n)) ++
      replay("b_625_750",
        (k, n) => BigInt(6).pow(k) * BigInt(2).pow(n - k),
        (k, n) => BigInt(5).pow(k) * BigInt(3).pow(n - k)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == expect)
    // the demonstration must demonstrate: early stops AND truncation
    // both occur (at this SF the H1 direction may not trigger; the
    // sf0.01 oracle run exhibits all three outcomes)
    assert(out.exists(t => t._5 == 1L || t._5 == -1L) &&
      out.exists(_._5 == 0L))
    // an early stop must actually be early
    assert(out.filter(t => t._5 != 0L).forall(_._3 < 44L))
  }

  test("q317: l-diversity / t-closeness replays incl. missing-source mass") {
    val out = run("q317_ldiversity_tcloseness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2))
    assert(out.nonEmpty)
    val d = docs.map { case (_, src, lang, nc, _) => (lang, nc / 100, src) }
    val n = BigInt(d.size)
    val ns = d.groupBy(_._3).view.mapValues(x => BigInt(x.size)).toMap
    val expect = d.groupBy(t => (t._1, t._2)).toSeq
      .sortBy(_._1).map { case ((lang, nb), rows) =>
        val ng = BigInt(rows.size)
        val bySrc = rows.groupBy(_._3).view
          .mapValues(x => BigInt(x.size)).toMap
        val present = bySrc.map { case (src, ngs) =>
          (ngs * n - ns(src) * ng).abs }.sum
        // keys is a SET — mapping to counts before summing would
        // collapse equal counts; iterate instead
        val missing = (n - bySrc.keys.iterator.map(ns).sum) * ng
        val tvd = ((present + missing) * 10000 / (2 * ng * n)).toLong
        val l = bySrc.size.toLong
        (lang, nb, ng.toLong, l, tvd,
          if (l >= 3) 1L else 0L, if (tvd <= 2000) 1L else 0L)
      }
    assert(out.toSeq == expect)
  }

  /** The q318 shingle family: md5-hashed distinct word 3-grams. */
  private def shingleHashes(text: String): Set[Long] = {
    val ws = toks(text)
    if (ws.length < 3) Set.empty
    else ws.sliding(3).map(g => hash32(g.mkString(" "))).toSet
  }

  test("q318: greedy set cover replays exactly") {
    val out = run("q318_greedy_set_cover").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    val en = docs.filter(_._3 == "en")
    val universe = en.filter(_._2 == "src0")
      .flatMap(d => shingleHashes(d._5)).toSet
    val cand = en.filter(_._2 != "src0")
      .map(d => d._1 -> (shingleHashes(d._5) & universe))
      .filter(_._2.nonEmpty).toMap
    val covered = scala.collection.mutable.Set[Long]()
    val expect = scala.collection.mutable
      .ArrayBuffer[(Long, Long, Long, Long, Long, Long)]()
    var r = 1
    var done = false
    while (r <= 6 && !done) {
      val gains = cand.toSeq
        .map { case (d, sh) => (d, (sh -- covered).size.toLong) }
        .filter(_._2 > 0)
      if (gains.isEmpty) done = true
      else {
        val (doc, gain) = gains.minBy { case (d, g) => (-g, d) }
        covered ++= cand(doc)
        expect += ((r.toLong, doc, gain, covered.size.toLong,
          universe.size.toLong,
          covered.size.toLong * 10000 / math.max(universe.size, 1)))
        r += 1
      }
    }
    assert(out.toSeq == expect.toSeq)
    assert(out.nonEmpty)
    // greedy gains must be non-increasing
    assert(out.map(_._3).sliding(2).forall(w =>
      w.length < 2 || w(0) >= w(1)))
  }

  test("q319: observed metrics equal the stand-alone aggregation") {
    val out = run("q319_observed_metrics").collect()
    assert(out.length == 1)
    val r = out(0)
    val ord = table(spark, sf, "orders")
      .selectExpr("o_orderstatus",
        "CAST(floor(o_totalprice) AS BIGINT)",
        "substring(o_orderpriority, 1, 1)").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getString(2)))
    val nTotal = ord.length.toLong
    val nOpen = ord.count(_._1 == "O").toLong
    val rev = ord.map(_._2).sum
    val nUrg = ord.count(_._3 == "1").toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      (nTotal, nOpen, rev, nUrg,
        nOpen * 10000 / nTotal, nUrg * 10000 / nTotal))
  }

  test("q320: McNemar discordant-pair test replays exactly") {
    val out = run("q320_mcnemar").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(out.nonEmpty)
    val expect = docs.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (src, rows) =>
        val trip = rows.map { case (_, _, _, nc, text) =>
          val tk = toks(text)
          (nc >= 250, tk.length >= 45, tk.distinct.length >= 35)
        }
        val b = trip.count { case (t, a, bb) => a == t && bb != t }.toLong
        val c = trip.count { case (t, a, bb) => a != t && bb == t }.toLong
        val chi2 = if (b + c == 0) 0L
          else (BigInt(b - c) * (b - c) * 10000 / (b + c)).toLong
        val sig = if (BigInt(b - c) * (b - c) * 100000 >
          BigInt(384146) * (b + c)) 1L else 0L
        (src, rows.size.toLong, b, c, chi2, sig)
      }
    assert(out.toSeq == expect)
    // the test has teeth: some source must actually flag
    assert(out.exists(_._6 == 1L))
  }

  test("q321: capture–recapture replays from independent detector replays") {
    val out = run("q321_capture_recapture").collect()
    assert(out.length == 1)
    val r = out(0)
    val shs = docs.map { case (id, _, _, _, text) =>
      id -> shingleHashes(text) }.filter(_._2.nonEmpty)
    import graft.functions.TextOps.{minhashA, minhashB, MinhashP}
    def bandKeys(hs: Set[Long]): Seq[(Int, String)] = {
      val sig = (0 until 8).map(i =>
        hs.iterator.map(h => (minhashA(i) * h + minhashB(i)) % MinhashP)
          .min)
      (0 until 4).map(b => b -> s"${sig(2 * b)},${sig(2 * b + 1)}")
    }
    val bk = shs.map { case (id, hs) => id -> bandKeys(hs).toSet }
    val pa = (for {
      (ia, ka) <- bk; (ib, kb) <- bk
      if ia < ib && (ka & kb).nonEmpty
    } yield (ia, ib)).toSet
    def simhash(hs: Set[Long]): Long =
      (0 until 32).foldLeft(0L) { (acc, i) =>
        val cnt = hs.iterator.map(h =>
          if (((h >> i) & 1L) == 1L) 1 else -1).sum
        if (cnt >= 0) acc | (1L << i) else acc
      }
    val sh = shs.map { case (id, hs) => id -> simhash(hs) }
    // pigeonhole candidate generation is LOSSLESS for hamming <= 4 with
    // 5 chunks, so the replay may enumerate pairs directly
    val pb = (for {
      (ia, sa) <- sh; (ib, sb) <- sh
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 4
    } yield (ia, ib)).toSet
    val (n1, n2, m) =
      (pa.size.toLong, pb.size.toLong, (pa & pb).size.toLong)
    val chapman =
      (BigInt(n1 + 1) * (n2 + 1) / (m + 1) - 1).toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      (n1, n2, m,
        (BigInt(n1) * n2 / math.max(m, 1)).toLong, chapman,
        (BigInt(n1) * 10000 / math.max(chapman, 1)).toLong,
        (BigInt(n2) * 10000 / math.max(chapman, 1)).toLong,
        math.max(chapman - (n1 + n2 - m), 0L)))
    // teeth: both detectors found pairs and they overlap
    assert(n1 > 0 && n2 > 0 && m > 0)
  }

  private lazy val probeVecs: Seq[(Long, Array[Float], Long)] =
    table(spark, sf, "embeddings").filter("vec_id < 200")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getInt(2).toLong)).toSeq

  test("q322: hubness k-occurrence stats replay exactly") {
    val out = run("q322_hubness_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
    assert(out.length == 3)
    def quant(x: Float): Long =
      (math.floor((x.toDouble + 1.0) * 1000) * 1000).toLong
    val ids = probeVecs.map(_._1)
    val nnLists = probeVecs.map { case (va, xa, _) =>
      va -> probeVecs.filter(_._1 != va).map { case (vb, xb, _) =>
        (xa.indices.map { i =>
          val d = quant(xa(i)) - quant(xb(i)); d * d
        }.sum, vb)
      }.sorted.map(_._2)
    }.toMap
    val expect = Seq(3, 5, 10).map { k =>
      val nk = ids.map(v => v -> 0L).toMap ++
        nnLists.values.flatMap(_.take(k)).groupBy(identity).view
          .mapValues(_.size.toLong).toMap
      val n = ids.size.toLong
      val m2 = nk.values.map(v => BigInt(v - k) * (v - k)).sum
      val m3 = nk.values.map(v => BigInt(v - k).pow(3)).sum
      val hub10 = nk.toSeq.sortBy { case (v, c) => (-c, v) }
        .take(10).map(_._2).sum
      (k.toLong, n, nk.values.count(_ == 0).toLong, nk.values.max,
        (BigInt(hub10) * 10000 / (k * n)).toLong,
        m3.signum.toLong,
        if (m2 == 0) 0L else (m3 * m3 * 1000000 / m2.pow(3)).toLong)
    }
    assert(out.toSeq == expect)
    // the audit must detect positive skew (hubs) at small k on this data
    assert(out.head._6 == 1L)
  }

  test("q323: mutual-kNN margin pairs replay exactly") {
    val out = run("q323_mutual_knn_margin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(out.nonEmpty)
    val k = 4
    def q(x: Float): Long = math.floor(x.toDouble * 1000).toLong
    val a = probeVecs.filter(_._3 % 2 == 0)
    val b = probeVecs.filter(_._3 % 2 == 1)
    val dots = (for {
      (xa, va, _) <- a.map(t => (t._2, t._1, t._3))
      (xb, vb, _) <- b.map(t => (t._2, t._1, t._3))
    } yield (va, vb,
      xa.indices.map(i => q(xa(i)) * q(xb(i))).sum)).toSeq
    val byA = dots.groupBy(_._1).view.mapValues(
      _.sortBy(t => (-t._3, t._2))).toMap
    val byB = dots.groupBy(_._2).view.mapValues(
      _.sortBy(t => (-t._3, t._1))).toMap
    val sx = byA.view.mapValues(_.take(k).map(_._3).sum).toMap
    val sy = byB.view.mapValues(_.take(k).map(_._3).sum).toMap
    def sdiv(x: BigInt, d: BigInt) =
      if (x.signum >= 0) x / d else -((-x) / d)
    val expect = byA.toSeq.collect {
      case (va, lst) if byB(lst.head._2).head._1 == va =>
        val (_, vb, d) = lst.head
        (va, vb, d,
          sdiv(BigInt(d) * 2 * k * 1000,
            BigInt(sx(va) + sy(vb)).max(1)).toLong,
          a.size.toLong, b.size.toLong)
    }.sortBy(_._1)
    assert(out.toSeq == expect)
    // teeth: mutuality prunes — strictly fewer matches than either side
    assert(out.length < a.size && out.length < b.size)
  }

  test("q324: Simpson/Mantel–Haenszel audit replays exactly") {
    val out = run("q324_simpson_audit").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8))).sortBy(_._1)
    assert(out.nonEmpty)
    val cells = docs.groupBy(_._3).toSeq.sortBy(_._1)
      .map { case (lang, rows) =>
        val ey = rows.map { case (_, _, _, nc, text) =>
          (nc >= 250, toks(text).distinct.length >= 24) }
        (lang, rows.size.toLong,
          ey.count(t => t._1 && t._2).toLong,
          ey.count(t => t._1 && !t._2).toLong,
          ey.count(t => !t._1 && t._2).toLong,
          ey.count(t => !t._1 && !t._2).toLong)
      }
    val mhN = cells.map { case (_, n, a, _, _, d) =>
      BigInt(a) * d * 1000 / n }.sum
    val mhD = cells.map { case (_, n, _, b, c, _) =>
      BigInt(b) * c * 1000 / n }.sum
    val orMh = (mhN * 1000 / mhD.max(1)).toLong
    val pooled = ("zz_all", cells.map(_._2).sum, cells.map(_._3).sum,
      cells.map(_._4).sum, cells.map(_._5).sum, cells.map(_._6).sum)
    val expect = (cells :+ pooled).map {
      case (st, n, a, b, c, d) =>
        val orM = (BigInt(a) * d * 1000 /
          (BigInt(b) * c).max(1)).toLong
        val conf = if (st == "zz_all" && (
            BigInt(a) * d * mhD.max(1) * 10 >
              (BigInt(b) * c).max(1) * mhN * 12 ||
            mhN * (BigInt(b) * c).max(1) * 10 >
              BigInt(a) * d * mhD.max(1) * 12)) 1L else 0L
        (st, n, a, b, c, d, orM, orMh, conf)
    }.sortBy(_._1)
    assert(out.toSeq == expect)
  }

  test("q325: discrete-grid BH replays exactly and splits the mixed family") {
    val out = run("q325_benjamini_hochberg").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).sortBy(t => (t._1, t._2))
    assert(out.length == 40)
    // replay only the BH mechanics from the emitted stats (the stats
    // themselves are oracled + the mcnemar/GOF pipelines are replayed
    // by the q320/q317-style tests): recompute k_level, ranks, k*,
    // decisions from (df, stat_e4) alone with the same ladders
    val t1 = Seq(104149, 91406, 84011, 78794, 74768, 71491, 68732,
      66349, 64254, 62385, 60700, 59165, 57756, 56455, 55247, 54119,
      53062, 52067, 51128, 50239, 49395, 48591, 47825, 47093, 46392,
      45719, 45073, 44452, 43853, 43276, 42718, 42179, 41657, 41152,
      40662, 40186, 39725, 39276, 38839, 38415)
    val t4 = Seq(179715, 164239, 155114, 148603, 143529, 139367,
      135835, 132767, 130053, 127619, 125411, 123391, 121529, 119801,
      118189, 116678, 115257, 113914, 112642, 111433, 110281, 109181,
      108128, 107119, 106149, 105217, 104318, 103450, 102612, 101801,
      101016, 100255, 99517, 98799, 98102, 97423, 96762, 96118, 95490,
      94877)
    val withK = out.map { t =>
      val thr = if (t._3 == 1L) t1 else t4
      (t, 41L - thr.count(t._4 >= _))
    }
    val ranked = withK.sortBy { case ((kind, src, _, _, _, _, _, _), k) =>
      (k, kind, src) }.zipWithIndex
      .map { case ((t, k), i) => (t, k, i + 1L) }
    val kstar = ranked.collect {
      case (_, k, r) if k <= r => r }.maxOption.getOrElse(0L)
    ranked.foreach { case (t, k, r) =>
      assert(t._5 == k, s"k_level ${t._1}/${t._2}")
      assert(t._6 == r, s"p_rank ${t._1}/${t._2}")
      assert(t._7 == (if (r <= kstar) 1L else 0L),
        s"bh ${t._1}/${t._2}")
      assert(t._8 == (if (k <= 1) 1L else 0L),
        s"bonf ${t._1}/${t._2}")
    }
    // the mixed family must SPLIT: FDR rejects the true alternatives
    // (mcnemar) and none of the true nulls (langmix)
    assert(out.filter(_._1 == "mcnemar").forall(_._7 == 1L))
    assert(out.filter(_._1 == "langmix_gof").forall(_._7 == 0L))
    // and BH must dominate Bonferroni somewhere on this fixture
    assert(out.map(_._7).sum > out.map(_._8).sum)
  }

  test("q326: stratified ATE replays exactly; naive is confounding-biased") {
    val out = run("q326_stratified_ate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1)
    assert(out.nonEmpty)
    val evs = table(spark, sf, "events")
      .selectExpr("user_id",
        "CAST(CASE WHEN event_type = 'purchase' " +
          "THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END " +
          "AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val users = evs.groupBy(_._1).toSeq.map { case (uid, rows) =>
      val nEv = rows.size.toLong
      val b = math.max(math.min((nEv - 50) / 10, 3L), 0L)
      val t = if (hash32(s"trt|$uid") % 100 < 20 + 20 * b) 1L else 0L
      (uid, b, t, rows.map(_._2).sum)
    }
    def sdiv(a: BigInt, b: BigInt) =
      if (a.signum >= 0) a / b else -((-a) / b)
    val byB = users.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (b, us) =>
        val n1 = us.count(_._3 == 1L).toLong
        val n0 = us.count(_._3 == 0L).toLong
        val s1 = us.filter(_._3 == 1L).map(_._4).sum
        val s0 = us.filter(_._3 == 0L).map(_._4).sum
        val diff = sdiv(BigInt(s1) * 1000, BigInt(n1).max(1)) -
          sdiv(BigInt(s0) * 1000, BigInt(n0).max(1))
        (b, us.size.toLong, n1, n0, diff.toLong, s1, s0)
    }
    val nn = byB.map(_._2).sum
    val naive = (sdiv(BigInt(byB.map(_._6).sum) * 1000,
      BigInt(byB.map(_._3).sum).max(1)) -
      sdiv(BigInt(byB.map(_._7).sum) * 1000,
        BigInt(byB.map(_._4).sum).max(1))).toLong
    val strat = sdiv(
      byB.map(r => BigInt(r._5) * r._2).sum, BigInt(nn)).toLong
    val expect = byB.map(r =>
      (r._1, r._2, r._3, r._4, r._5, naive, strat, naive - strat))
    assert(out.toSeq == expect)
    // negative-division clamp parity: bucket 0 exists (n_ev < 50 users)
    assert(out.head._1 == 0L)
  }
}
