package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-check for q308 b-bit minwise hashing: shingles,
  * the 32-component affine minhash, the b-bit collision-corrected
  * estimator, exact Jaccard, and the per-b error ledger are all rebuilt
  * in scratch Scala — plus the Li–König teeth: MAE strictly shrinks as
  * b grows.
  */
class BbitMinwiseSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  test("q308: the b-bit error ledger replays from scratch signatures") {
    val rows = SparkEntry.queries("q308_bbit_minwise")(spark, sf)
      .collect().sortBy(_.getAs[Long]("b"))
    assert(rows.map(_.getAs[Long]("b")).toSeq === Seq(1L, 2L, 8L))
    val docs = table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .filter(_.getLong(0) < 40)
      .map { r =>
        val ws = r.getString(1).trim.toLowerCase.split("\\s+")
        val shingles =
          if (ws.length >= 3)
            ws.sliding(3).map(_.mkString(" ")).toSeq.distinct
              .map(s0 => java.lang.Long.parseLong(
                md5hex(s0).substring(0, 8), 16))
          else Seq.empty[Long]
        r.getLong(0) -> shingles.toSet
      }.filter(_._2.nonEmpty).sortBy(_._1)
    val P = 2147483647L
    def sig(hs: Set[Long]): Array[Long] = Array.tabulate(32) { i =>
      hs.map(h => ((100003L + 7919L * i) * h +
        (12345L + 1000003L * i)) % P).min
    }
    val sigs = docs.map { case (id, hs) => id -> sig(hs) }.toMap
    case class Acc(var n: Long = 0, var mae: Long = 0, var bias: Long = 0)
    val accs = Map(1 -> Acc(), 2 -> Acc(), 8 -> Acc())
    for (i <- docs.indices; j <- (i + 1) until docs.length) {
      val (da, ha) = docs(i); val (db, hb) = docs(j)
      val inter = (ha & hb).size.toLong
      val jbp = inter * 10000 / (ha.size + hb.size - inter)
      for (b <- Seq(1, 2, 8)) {
        val tb = 1L << b
        val m = (0 until 32).count(k =>
          sigs(da)(k) % tb == sigs(db)(k) % tb).toLong
        val est = math.max((m * tb - 32) * 10000, 0L) / (32 * (tb - 1))
        val a = accs(b)
        a.n += 1; a.mae += math.abs(est - jbp); a.bias += est - jbp
      }
    }
    rows.foreach { r =>
      val a = accs(r.getAs[Long]("b").toInt)
      assert(r.getAs[Long]("n_pairs") === a.n)
      assert(r.getAs[Long]("mae_bp") === a.mae / a.n,
        s"mae b=${r.getAs[Long]("b")}")
      val bias = if (a.bias >= 0) a.bias / a.n else -((-a.bias) / a.n)
      assert(r.getAs[Long]("bias_bp") === bias)
    }
    // teeth: more bits, less error — strictly
    val maes = rows.map(_.getAs[Long]("mae_bp"))
    assert(maes(0) > maes(1) && maes(1) > maes(2), maes.toSeq)
  }
}
