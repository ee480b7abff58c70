package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Materialize

/** Equality gate for the round-12 staged exact-Jaccard pair mirror: for
  * every stop-shingle variant, the artifact read back through
  * [[TextQueries.shPairsMirror]] must equal the inline
  * `jaccardPairs(Materialize(shingleTable(...)), minJ)` derivation it
  * replaced — same pairs, same exact integer columns, same re-derived
  * jaccard doubles. This is the contract that lets q43/q48/q49/q73/
  * q145/q166/q228/q262 consume the mirror with unchanged hashes (the
  * DuckDB oracle re-verifies each consumer end-to-end; this spec
  * isolates the artifact itself so a mirror-build bug is caught here,
  * not as eight cryptic hash failures).
  */
class ShPairsMirrorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[(Long, Long, Long, Long, Long, Double)] =
    df.select("doc_a", "doc_b", "i", "na", "nb", "jaccard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def inline(cut: Option[Long], minJ: Double): DataFrame = {
    val sh = Materialize(TextQueries.shingleTable(spark, sf, cut))
    TextQueries.jaccardPairs(sh, minJ)
  }

  test("none variant (salted build) equals the inline uncut derivation") {
    val mirror = canon(TextQueries.shPairsMirror(spark, sf, None, 0.8))
    val direct = canon(inline(None, 0.8))
    assert(mirror == direct)
    assert(mirror.nonEmpty, "vacuous: no >=0.8 pairs at sf0.001")
    spark.sqlContext.clearCache()
  }

  test("df5 variant equals the inline stop-shingle derivation") {
    val mirror = canon(TextQueries.shPairsMirror(spark, sf, Some(5L), 0.8))
    val direct = canon(inline(Some(5L), 0.8))
    assert(mirror == direct)
    spark.sqlContext.clearCache()
  }

  test("df1000 variant stores ALL intersecting pairs; >=0.8 read matches inline") {
    val cut = Some(graft.operators.CorpusPipeline.DefaultStopShingleDf)
    val all = canon(TextQueries.shPairsMirror(spark, sf, cut, 0.0))
    val direct0 = canon(inline(cut, 0.0))
    assert(all == direct0, "full pair set differs")
    assert(all.exists(_._6 < 0.8),
      "vacuous: no sub-threshold pair to prove the 0.0 floor matters")
    val thresh = canon(TextQueries.shPairsMirror(spark, sf, cut, 0.8))
    val direct8 = canon(inline(cut, 0.8))
    assert(thresh == direct8, ">=0.8 filtered read differs")
    spark.sqlContext.clearCache()
  }

  test("a read below the variant's stored floor is refused") {
    intercept[IllegalArgumentException] {
      TextQueries.shPairsMirror(spark, sf, None, 0.5)
    }
  }
}
