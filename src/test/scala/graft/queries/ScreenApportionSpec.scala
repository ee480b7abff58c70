package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the screen/apportion wave (q226 Bloom
  * membership screen, q227 PPS largest-remainder sampling, q228
  * asymmetric containment): the Bloom filter words are rebuilt from
  * scratch in pure Scala (same md5 hash space) and a deliberately
  * saturated filter witnesses real false positives; the Hamilton
  * apportionment identities (Σ = budget, quota distance < 1) and the
  * drawn set are replayed; the containment top-20 is recomputed
  * brute-force from collected shingle sets, plus the structural
  * containment ≥ Jaccard dominance.
  */
class ScreenApportionSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  /** Pure-Scala Bloom: filter words from member fps, then a probe. */
  private def scalaWords(fps: Set[String]): Map[Long, Long] =
    fps.toSeq
      .flatMap(fp => (1 to 3).map(i => h32(s"bloom${i}_$fp") % 4096L))
      .groupBy(_ / 32L)
      .map { case (w, bits) =>
        w -> bits.map(b => 1L << (b % 32L).toInt).reduce(_ | _)
      }
  private def scalaProbe(words: Map[Long, Long], fp: String): Boolean =
    (1 to 3).forall { i =>
      val bit = h32(s"bloom${i}_$fp") % 4096L
      val mask = 1L << (bit % 32L).toInt
      (words.getOrElse(bit / 32L, 0L) & mask) == mask
    }

  test("q226: zero false negatives, and the filter words equal a " +
      "from-scratch pure-Scala Bloom build") {
    val rows = run("q226_bloom_decontam_screen").collect()
    assert(rows.nonEmpty)
    // a Bloom filter has NO false negatives — structural, every source
    assert(rows.forall(_.getAs[Long]("n_missed") == 0L))
    // flagged ⊇ members per source
    assert(rows.forall(r =>
      r.getAs[Long]("n_flagged") >= r.getAs[Long]("n_members")))
    // rebuild the filter words in pure Scala and compare bit-for-bit
    val d = TextQueries.bloomFp(table(spark, sf, "documents"))
    val evFps = d.filter(col("doc_id") % 17 === 3)
      .select("fp").collect().map(_.getString(0)).toSet
    val gotWords = TextQueries.bloomWords(
        d.filter(col("doc_id") % 17 === 3).select("fp").distinct())
      .collect().map(r => r.getAs[Long]("word") -> r.getAs[Long]("wd"))
      .toMap
    assert(gotWords == scalaWords(evFps))
  }

  test("q226 machinery: a saturated filter produces real false " +
      "positives and the engine agrees with the Scala replay per doc") {
    import spark.implicits._
    // 1200 synthetic members -> ~58% fill -> ~20% fp rate: false
    // positives are certain on 200 probes, and every verdict must match
    // the pure-Scala replay (this is the densified fixture the sf data's
    // near-empty filter can't exercise)
    val members = (0 until 1200).map(i => s"member_$i")
    val probes = (0 until 200).map(j => s"probe_$j")
    val words = scalaWords(members.toSet)
    val fw = TextQueries.bloomWords(members.toDF("fp"))
    assert(fw.collect().map(r =>
      r.getAs[Long]("word") -> r.getAs[Long]("wd")).toMap == words)
    val probeDf = probes.zipWithIndex
      .map { case (fp, i) => (i.toLong, fp) }.toDF("doc_id", "fp")
    val flagged = TextQueries.bloomFlags(probeDf, fw)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("flagged"))
      .toMap
    val expected = probes.zipWithIndex.map { case (fp, i) =>
      i.toLong -> (if (scalaProbe(words, fp)) 1L else 0L)
    }.toMap
    assert(flagged == expected)
    // teeth: no probe is a member, yet some ARE flagged (false
    // positives witnessed), and not all (the filter discriminates)
    val nFp = expected.values.count(_ == 1L)
    assert(nFp > 0 && nFp < probes.length)
  }

  test("q227: Hamilton apportionment identities and the drawn set " +
      "match a pure-Scala replay") {
    val rows = run("q227_pps_sample_apportion").collect()
    assert(rows.nonEmpty)
    val n = 60L
    // Σ n_alloc = budget, exactly
    assert(rows.map(_.getAs[Long]("n_alloc")).sum == n)
    // each allocation is floor or floor+1 (quota distance < 1)
    assert(rows.forall { r =>
      val d = r.getAs[Long]("n_alloc") - r.getAs[Long]("floor_h")
      d == 0L || d == 1L
    })
    // feasible on this data: the draw fills the allocation
    assert(rows.forall(r =>
      r.getAs[Long]("n_drawn") == r.getAs[Long]("n_alloc")))
    // replay the apportionment + hash draw from collected rows
    val docs = table(spark, sf, "documents")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val strata = docs.groupBy(_._2).map { case (s, ds) =>
      s -> (ds.length.toLong, ds.map(_._3).sum)
    }
    val t = strata.values.map(_._2).sum
    val floors = strata.map { case (s, (_, m)) => s -> n * m / t }
    val rems = strata.map { case (s, (_, m)) => s -> n * m % t }
    val extra = (n - floors.values.sum).toInt
    val plusOne = rems.toSeq.sortBy { case (s, r) => (-r, s) }
      .take(extra).map(_._1).toSet
    val alloc = floors.map { case (s, f) =>
      s -> (f + (if (plusOne(s)) 1L else 0L))
    }
    val drawnIdSum = docs.groupBy(_._2).map { case (s, ds) =>
      s -> ds.sortBy(d => (h32(s"pps_${d._1}"), d._1))
        .take(alloc(s).toInt).map(_._1).sum
    }
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("n_alloc") == alloc(s))
      assert(r.getAs[Long]("drawn_id_sum") == drawnIdSum(s))
    }
  }

  test("q228: containment dominates Jaccard on every row, and the " +
      "top-20 equals a brute-force replay from collected shingle sets") {
    val rows = run("q228_containment_dedup").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("cont_bp") >= r.getAs[Long]("jacc_bp")))
    // brute-force: shingle sets in pure Scala (hash32 of 3-grams,
    // distinct AFTER hashing, df cut replayed — inert at this sf), all
    // pairs, same total order, top 20
    val docs = table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sets0 = docs.map { case (id, t) =>
      val ws = t.trim.toLowerCase.split("\\s+")
      val hs =
        if (ws.length >= 3)
          (0 to ws.length - 3)
            .map(i => h32(s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")).toSet
        else Set.empty[Long]
      id -> hs
    }.toMap
    val df = sets0.values.toSeq.flatten.groupBy(identity).view
      .mapValues(_.size).toMap
    val sets = sets0.view.mapValues(_.filter(df(_) <= 1000)).toMap
    val ids = sets.keys.toSeq.sorted
    val pairs = for {
      i <- ids.indices; j <- i + 1 until ids.length
      a = ids(i); b = ids(j)
      inter = (sets(a) & sets(b)).size.toLong if inter > 0
    } yield {
      val na = sets(a).size.toLong; val nb = sets(b).size.toLong
      val cont = inter * 10000L / math.min(na, nb)
      val jacc = inter * 10000L / (na + nb - inter)
      (cont, inter, a, b, na, nb, jacc)
    }
    val expected = pairs.sortBy { case (c, i, a, b, _, _, _) =>
      (-c, -i, a, b)
    }.take(20).zipWithIndex.map { case ((c, i, a, b, na, nb, j), k) =>
      (k + 1L, a, b, na, nb, i, c, j)
    }
    val got = rows.map(r => (r.getAs[Long]("rk"), r.getAs[Long]("doc_a"),
      r.getAs[Long]("doc_b"), r.getAs[Long]("na"), r.getAs[Long]("nb"),
      r.getAs[Long]("inter"), r.getAs[Long]("cont_bp"),
      r.getAs[Long]("jacc_bp"))).toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("q228 machinery: a contained excerpt is near-10000 containment " +
      "but low Jaccard (the pair symmetric dedup misses)") {
    // doc B = doc A's text wrapped in a much longer document: A's
    // shingle set is (nearly) a subset of B's, so containment ≈ 10000
    // while Jaccard is small — built from the same hash space the
    // engine uses
    val a = "alpha beta gamma delta epsilon zeta"
    val filler = (0 until 60).map(i => s"w$i").mkString(" ")
    val b = s"$filler $a $filler"
    def hs(t: String): Set[Long] = {
      val ws = t.trim.toLowerCase.split("\\s+")
      (0 to ws.length - 3)
        .map(i => h32(s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")).toSet
    }
    val (sa, sb) = (hs(a), hs(b))
    val inter = (sa & sb).size.toLong
    val cont = inter * 10000L / math.min(sa.size, sb.size).toLong
    val jacc = inter * 10000L / (sa.size + sb.size - inter)
    assert(cont == 10000L)
    // symmetric Jaccard is diluted by the long container's ~120 extra
    // shingles (≈ 600 bp here) — far below any near-dup threshold
    assert(jacc < 1000L)
  }
}
