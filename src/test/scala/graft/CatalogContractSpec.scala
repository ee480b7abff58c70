package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards for the catalog itself: the things the DuckDB
  * gate can't see because they'd break BEFORE it runs — duplicate query
  * names silently shadowing each other in the `queries` map, oracle
  * entries keyed to nothing, or names the driver's artifacts can't sort
  * sensibly.
  */
class CatalogContractSpec extends AnyFunSuite {

  test("catalog names are unique (no silent map shadowing)") {
    val names = SparkEntry.catalog.map(_._1)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate catalog names: $dupes")
  }

  test("every oracle key has a query and follows the naming pattern") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    val pat = "^q\\d+_[a-z0-9_]+$".r
    SparkEntry.catalog.map(_._1).foreach { n =>
      assert(pat.matches(n), s"catalog name breaks the q<N>_<slug> pattern: $n")
    }
  }

  test("every catalog entry is oracle-backed (the correctness gate covers it)") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty,
      s"entries without a DuckDB oracle (gate would only rows-check): $unoracled")
  }

  test("flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  // The Σ df² tripwire: a shingle self-join over an UNCUT, UNBOUNDED
  // corpus-wide shingle table is quadratic in the hottest shingle's
  // document frequency — the one shape that cannot survive 100 TB. Only
  // the exact-semantics demos may build it: q43 (exact Jaccard is the
  // point), q48/q166 (the CC twins must share q43's pair set verbatim),
  // q73 (keeps hot keys deliberately and bounds fan-out by salting
  // instead). Every other catalog query must either engage the
  // stop-shingle df cut or push a bounding slice predicate below the
  // join. Source-level so it catches the regression at `sbt test` time,
  // before any plan is built.
  test("no catalog query outside the whitelist builds an uncut corpus-wide shingle self-join") {
    val whitelist = Set("q43_dedup_ngram_jaccard", "q48_dedup_clusters",
      "q166_dedup_clusters_contraction", "q73_dedup_jaccard_salted")
    val queryFiles = new java.io.File("src/main/scala/graft/queries")
      .listFiles().filter(_.getName.endsWith(".scala"))
    val marker = """"(q\d+_[a-z0-9_]+)"\s*->\s*QueryDef\(""".r
    val offenders = queryFiles.flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      val text = try src.mkString finally src.close()
      val starts = marker.findAllMatchIn(text).toVector
      starts.zipWithIndex.flatMap { case (m, i) =>
        val end = if (i + 1 < starts.size) starts(i + 1).start else text.length
        val block = text.substring(m.start, end)
        val joinsShingles = block.contains("jaccardPairs(")
        val cutEngaged = block.contains("stopShingleDf = Some")
        val bounded = block.contains("""filter(col("doc_id") <""")
        if (joinsShingles && !cutEngaged && !bounded) Some(m.group(1)) else None
      }
    }.toSet
    val violations = offenders -- whitelist
    assert(violations.isEmpty,
      s"uncut corpus-wide shingle self-join outside the whitelist: $violations " +
        "— thread stopShingleDf = Some(CorpusPipeline.DefaultStopShingleDf) " +
        "or bound the slice with filter(col(\"doc_id\") < K)")
    // the whitelist itself must stay honest: every member still builds the
    // uncut join (a member that no longer does should be removed)
    assert(whitelist.subsetOf(offenders),
      s"stale whitelist entries (no longer uncut): ${whitelist -- offenders}")
  }
}
