package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.tableParallel
import graft.functions.TextOps.tokens

/** Independent cross-checks for the importance/design additions
  * (q198/q199/q200/q201): the DSIR model's fixed-cardinality and
  * direction, the S-curve's shape properties against the closed form,
  * the padding-waste dominance of bucketed batching, and the split
  * strategies' leakage identities. These pin what the DuckDB oracle
  * can't: the oracle proves both engines compute the same numbers; these
  * prove the numbers mean what the operators claim.
  */
class ImportanceDesignSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("q199 DSIR bucket table is dense and fixed-cardinality (64 rows " +
      "for ANY input, every bucket present exactly once)") {
    val docs = tableParallel(spark, sf, "documents")
    // full corpus AND a 10-doc sliver: the model's state must be the
    // same constant 64 rows regardless of input size — the bounded-
    // broadcast interface the 100 TB posture rests on
    Seq(docs, docs.filter(col("doc_id") < 10)).foreach { d =>
      val lr = TextQueries.dsirBucketTable(d).collect()
      assert(lr.length == 64)
      assert(lr.map(_.getLong(0)).toSet == (0L until 64L).toSet)
    }
  }

  test("q199 DSIR weights point TOWARD the target domain: mean per-token " +
      "weight of lang='en' docs exceeds the non-en mean") {
    val docs = tableParallel(spark, sf, "documents")
    val lr = TextQueries.dsirBucketTable(docs)
    val scored = TextQueries.dsirDocScores(docs, lr)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang") === "en")
      .agg((sum("w_sum") / sum("n_toks")).as("mean_w"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(scored(true) > scored(false),
      s"en mean ${scored(true)} should exceed non-en ${scored(false)}")
  }

  test("q200 S-curve: fixed-point detection probability is monotone in j, " +
      "exact at the endpoints, and within quantization error of the " +
      "closed form") {
    import spark.implicits._
    val js = (0L to 100L).map(_ * 10000L) // 0 .. 1e6 in 1%-steps
    val grid = Seq((2L, 8L), (4L, 4L), (8L, 2L), (16L, 1L))
    val frame = js.toDF("j_u")
      .crossJoin(grid.toDF("bands", "rpb"))
      .withColumn("jr", expr(
        """CASE rpb WHEN 1 THEN j_u
          | WHEN 2 THEN ((j_u * j_u) DIV 1000000)
          | WHEN 4 THEN ((((j_u * j_u) DIV 1000000) *
          |   ((j_u * j_u) DIV 1000000)) DIV 1000000)
          | WHEN 8 THEN ((((((j_u * j_u) DIV 1000000) *
          |   ((j_u * j_u) DIV 1000000)) DIV 1000000) *
          |   ((((j_u * j_u) DIV 1000000) *
          |   ((j_u * j_u) DIV 1000000)) DIV 1000000)) DIV 1000000)
          | END""".stripMargin))
      .withColumn("qq", expr("1000000 - jr"))
      .withColumn("q2", expr("(qq * qq) DIV 1000000"))
      .withColumn("q4", expr("(q2 * q2) DIV 1000000"))
      .withColumn("q8", expr("(q4 * q4) DIV 1000000"))
      .withColumn("q16", expr("(q8 * q8) DIV 1000000"))
      .withColumn("pd", expr(
        """1000000 - CASE bands WHEN 2 THEN q2 WHEN 4 THEN q4
          | WHEN 8 THEN q8 WHEN 16 THEN q16 END""".stripMargin))
      .select("bands", "rpb", "j_u", "pd")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2),
        r.getLong(3)))
    grid.foreach { case (b, r) =>
      val curve = frame.filter(_._1 == (b, r)).sortBy(_._2).toSeq
      // monotone non-decreasing in j
      curve.sliding(2).foreach { case Seq((_, j1, p1), (_, j2, p2)) =>
        assert(p2 >= p1, s"($b,$r): p($j2)=$p2 < p($j1)=$p1")
      }
      // exact endpoints: j=0 -> 0, j=1 -> 1 (no quantization slack)
      assert(curve.head._3 == 0L && curve.last._3 == 1000000L)
      // within quantization error of the closed form 1-(1-j^r)^b: each
      // DIV truncates at most 1e-6, and errors compound through r-1+b-1
      // multiplies plus the b-fold amplification of the inner truncation
      curve.foreach { case (_, j, p) =>
        val exact = 1.0 - math.pow(1.0 - math.pow(j / 1e6, r.toDouble),
          b.toDouble)
        assert(math.abs(p / 1e6 - exact) < 1e-4 * (b + r),
          s"($b,$r) at j=$j: fixed-point ${p / 1e6} vs closed $exact")
      }
    }
  }

  test("q198 bucketed batching never wastes more than arrival order " +
      "(per shard, the sorted-batching dominance), and the accounting " +
      "identity holds") {
    val rows = SparkEntry.queries("q198_padding_waste_audit")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val (padA, realA, wasteA) = rows("arrival")
    val (padB, realB, wasteB) = rows("bucketed")
    assert(realA == realB) // same docs, same real tokens
    assert(wasteA == padA - realA && wasteB == padB - realB)
    assert(wasteB <= wasteA,
      s"bucketed waste $wasteB should not exceed arrival waste $wasteA")
  }

  test("q201 split leakage: the user-hash split leaks ZERO by " +
      "construction; both strategies partition the same event set") {
    val rows = SparkEntry.queries("q201_split_leakage_audit")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))
      .toMap
    val total = tableParallel(spark, sf, "events").count()
    val (trT, teT, _, leakT, leakBpT) = rows("time")
    val (trU, teU, ovU, leakU, leakBpU) = rows("user")
    assert(trT + teT == total && trU + teU == total)
    assert(ovU == 0L && leakU == 0L && leakBpU == 0L,
      s"user-hash split must leak nothing, got overlap=$ovU leak=$leakU")
    // the contrast the operator exists to expose: the time split leaks
    assert(leakT > 0L && leakBpT > 0L)
  }

  test("q202 semi-hard mining matches a brute-force replay of the " +
      "FaceNet band rule (collected reference on the small fixture)") {
    val rows = SparkEntry.queries("q202_semihard_negatives")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7)))
    assert(rows.nonEmpty)
    // brute-force reference: exact doubles floored the same way
    val e = tableParallel(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2)))
    def d2s(a: Array[Double], b: Array[Double]): Long = {
      var aa = 0.0; var ab = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) {
        aa += a(i) * a(i); ab += a(i) * b(i); bb += b(i) * b(i); i += 1
      }
      math.floor((aa - 2.0 * ab + bb) * 1000000).toLong
    }
    e.filter(_._1 < 8).foreach { case (aid, av, albl) =>
      val others = e.filter(_._1 != aid)
      val (posId, posD2s) = others.filter(_._3 == albl)
        .map { case (bid, bv, _) => (bid, d2s(av, bv)) }
        .minBy { case (bid, d) => (d, bid) }
      val negs = others.filter(_._3 != albl)
        .map { case (bid, bv, _) => (bid, d2s(av, bv)) }
      val semi = negs.filter { case (_, d) =>
        d > posD2s && d < posD2s + 500000L }
      val expectedTop = semi.sortBy { case (bid, d) => (d, bid) }.take(3)
      val got = rows.filter(_._1 == aid)
      got.foreach { case (_, pId, pD2s, nHard, nSemi, _, _, _) =>
        assert(pId == posId && pD2s == posD2s)
        assert(nSemi == semi.length)
        assert(nHard == negs.count(_._2 <= posD2s))
      }
      assert(got.sortBy(_._8).map(r => (r._6, r._7)).toSeq ===
        expectedTop.toSeq)
    }
  }

  test("q204 KMV sketch estimates match a from-scratch replay of the " +
      "k-minimum-values algorithm on collected tokens") {
    val rows = SparkEntry.queries("q204_kmv_overlap_audit")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))))
      .toMap
    assert(rows.nonEmpty)
    // reference: the same md5-derived hash space, pure Scala
    def h32(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val bySource = tableParallel(spark, sf, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (s, ws) => s -> ws.map(p => h32("kmv_" + p._2)).toSet }
    def est(hs: Set[Long], k: Int): Long = {
      val sk = hs.toSeq.sorted.take(k)
      (sk.length - 1).toLong * 4294967296L / math.max(sk.max, 1L)
    }
    rows.foreach { case ((a, b), (estA, estB, estU, estI, exact)) =>
      assert(estA == est(bySource(a), 16), s"($a,$b) est_a")
      assert(estB == est(bySource(b), 16), s"($a,$b) est_b")
      assert(estU == est(bySource(a) ++ bySource(b), 16), s"($a,$b) union")
      assert(estI == math.max(estA + estB - estU, 0L))
      assert(exact == (bySource(a) & bySource(b)).size.toLong)
    }
  }

  test("q205 loop-artifact runs and cycles match a brute-force scan of " +
      "the token sequences") {
    val rows = SparkEntry.queries("q205_loop_artifact_audit")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(4)))
      .toMap
    val docs = tableParallel(spark, sf, "documents")
      .select(col("source"), tokens(col("text")).as("ws"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    def maxRun(ws: Seq[String], gap: Int): Long = {
      var best = 1L; var cur = 1L
      (gap until ws.length).foreach { i =>
        if (ws(i) == ws(i - gap)) cur += 1 else cur = 1
        best = math.max(best, cur)
      }
      best // = 1 + longest streak of matches at distance `gap`
    }
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val expRun = ds.map { case (_, ws) => maxRun(ws, 1) }.max
      val expCyc = ds.map { case (_, ws) => maxRun(ws, 2) + 1 }.max
      val (gotRun, gotCyc) = rows(src)
      assert(gotRun == expRun, s"$src max_run $gotRun != $expRun")
      assert(gotCyc == expCyc, s"$src max_cyc $gotCyc != $expCyc")
    }
  }

  test("q206 perplexity terciles partition each source in surprisal " +
      "order (bucket ranges non-overlapping and ordered)") {
    val rows = SparkEntry.queries("q206_perplexity_buckets")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(4),
        r.getLong(5)))
    val perSource = rows.groupBy(_._1)
    val scoredDocs = tableParallel(spark, sf, "documents")
      .filter(length(lower(trim(col("text")))) >= 2).count()
    assert(rows.map(_._3).sum == scoredDocs)
    perSource.foreach { case (src, bs) =>
      val ordered = bs.sortBy(_._2).toSeq
      assert(ordered.map(_._2).toSeq == Seq(1, 2, 3), s"$src buckets")
      ordered.sliding(2).foreach { case Seq((_, _, _, _, hi), (_, _, _, lo2, _)) =>
        assert(hi <= lo2, s"$src tercile ranges overlap: $hi > $lo2")
      }
    }
  }

  test("q203 datacard is internally consistent and agrees with the " +
      "operators it summarizes") {
    val card = SparkEntry.queries("q203_corpus_datacard")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(6), r.getString(7), r.getLong(8)))
    val docs = tableParallel(spark, sf, "documents")
    // volume identity: card rows partition the corpus
    assert(card.map(_._2).sum == docs.count())
    // acceptance agrees with the q190 scorer aggregated the same way
    val pass = TextQueries.qualityScored(docs)
      .groupBy("source")
      .agg((sum("pass") * 10000L / count(lit(1))).cast("long").as("bp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    card.foreach { case (src, _, _, passBp, nLangs, _, topBp) =>
      assert(passBp == pass(src), s"$src pass_bp mismatch")
      assert(nLangs >= 1 && topBp >= 10000 / nLangs && topBp <= 10000)
    }
  }
}
