package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native functions reach pure SQL with no Scala-side register()") {
    // the session was built with GraftExtensions only — nothing called
    // XxxYyy.register(spark); a SQL-only user (QueryClient) gets the
    // whole native family
    val row = spark.sql(
      """SELECT
        |  shingle_hashes(split('a b c d', ' ')) AS hs,
        |  simhash_sig(shingle_hashes(split('a b c d', ' '))) AS sig,
        |  minhash_band_keys(shingle_hashes(split('a b c d', ' '))) AS bands,
        |  float_vector_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                   CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS dot,
        |  oracle_date_parse('01-OCT-2017') AS d,
        |  oracle_date_parse('01-OCT-99') AS bad
        |""".stripMargin).head()
    assert(row.getSeq[Long](0).size === 2)       // 2 distinct 3-gram shingles
    assert(row.getSeq[String](2).size === 4)     // 4 LSH bands
    assert(row.getDouble(3) === 11.0)
    assert(row.getDate(4).toString === "2017-10-01")
    assert(row.isNullAt(5))                      // strict 4-digit year
  }
}
