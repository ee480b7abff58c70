package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the feature-engineering wave: q251
  * histogram split finding, q252 out-of-fold target encoding, q253
  * feature-hashing collision audit — each replayed from the raw tables
  * in pure Scala with the same md5 hashes and truncating divisions.
  */
class FeatureEngSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def hash32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  test("q251: per-dimension best split replays from a scratch " +
      "histogram + exhaustive gain search") {
    val rows = run("q251_histogram_split_finding").collect()
    assert(rows.length === 64)
    val data: Seq[(Long, Array[Long])] = table(spark, sf, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0).toLong, r.getSeq[Float](1).toArray
        .map(x => (math.floor(x.toDouble * 1000).toLong + 1000) / 125)
        .toArray)).toSeq
    val dims = data.head._2.length
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      assert(i >= 0 && i < dims)
      val hist = data.groupBy(_._2(i)).view.mapValues { vs =>
        (vs.size.toLong, vs.map(_._1).sum)
      }.toMap
      val bins = hist.keys.toSeq.sorted
      val n = hist.values.map(_._1).sum
      val sTot = hist.values.map(_._2).sum
      var nL = 0L; var sL = 0L
      var bestEnc = Long.MinValue
      bins.foreach { b =>
        val (nb, sb) = hist(b)
        nL += nb; sL += sb
        if (nL > 0 && nL < n) {
          val gain = (sL * sL * 1000000L) / nL +
            ((sTot - sL) * (sTot - sL) * 1000000L) / (n - nL)
          val enc = gain * 16 + (15 - b)
          if (enc > bestEnc) bestEnc = enc
        }
      }
      assert(r.getLong(1) === 15 - bestEnc % 16, s"best_bin i=$i")
      assert(r.getLong(2) === bestEnc / 16, s"gain i=$i")
      assert(r.getLong(3) === (sTot * sTot * 1000000L) / n)
    }
  }

  test("q252: out-of-fold means replay, never equal the full mean when " +
      "fold sums differ, and exclude exactly the own fold") {
    val rows = run("q252_oof_target_encoding").collect()
    assert(rows.nonEmpty)
    val data: Seq[(String, Long, Long)] = table(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getString(0),
        hash32(s"fold_${r.getLong(1)}") % 5,
        math.floor(r.getDouble(2) * 100).toLong)).toSeq
    rows.foreach { r =>
      val (cat, fold) = (r.getString(0), r.getLong(1))
      val inCat = data.filter(_._1 == cat)
      val own = inCat.filter(_._2 == fold)
      val rest = inCat.filterNot(_._2 == fold)
      assert(r.getLong(2) === own.size.toLong)
      assert(r.getLong(3) === rest.map(_._3).sum / rest.size)
      assert(r.getLong(4) === inCat.map(_._3).sum / inCat.size)
    }
    // every (cat, fold) cell present exactly once
    assert(rows.map(r => (r.getString(0), r.getLong(1))).distinct.length
      === rows.length)
  }

  test("q253: collision audit replays for every bucket size and " +
      "collided mass falls as buckets grow") {
    val rows = run("q253_hashing_trick_audit").collect()
    assert(rows.length === 3)
    val cnt: Map[String, Long] = table(spark, sf, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tMass = cnt.values.sum
    rows.sortBy(_.getLong(0)).foreach { r =>
      val b = r.getLong(0)
      val byBucket = cnt.toSeq.groupBy { case (t, _) => hash32(t) % b }
      assert(r.getLong(1) === cnt.size.toLong, "vocab")
      assert(r.getLong(2) === byBucket.size.toLong, "buckets_used")
      val collided = byBucket.values.filter(_.size >= 2)
      assert(r.getLong(3) === collided.map(_.size.toLong).sum)
      assert(r.getLong(4) ===
        collided.flatMap(_.map(_._2)).sum * 10000 / tMass)
      assert(r.getLong(5) === byBucket.values.map(_.size.toLong).max)
    }
    val masses = rows.sortBy(_.getLong(0)).map(_.getLong(4))
    assert(masses(0) >= masses(1) && masses(1) >= masses(2),
      s"collided mass should fall with bucket count: ${masses.toSeq}")
  }
}
