package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

class SchemaParserSpec extends AnyFunSuite {

  test("parses README fragments into per-table field specs") {
    val specs = SchemaParser.parse(Fixtures.readme)
    assert(specs.keySet === Set("GS_CASE", "GS_COURT_HIST"))

    val gsCase = specs("GS_CASE")
    assert(gsCase.fields.map(_.name) ===
      Seq("CASEID", "DISTRICT", "FILE_DATE", "LEAD_CHARGE", "TOTAL_LOSS"))
    assert(gsCase.fields.map(f => (f.start, f.length)) ===
      Seq((1, 10), (11, 4), (15, 11), (26, 20), (46, 12)))
    assert(gsCase.fields.map(_.oracleType) === Seq(
      OracleType.Number, OracleType.Varchar, OracleType.OracleDate,
      OracleType.Varchar, OracleType.OracleFloat))
  }

  test("schema yields 2N columns: typed data then boolean flags") {
    val st = SchemaParser.parse(Fixtures.readme)("GS_COURT_HIST").structType
    assert(st.fieldNames === Array(
      "CASEID", "EVENT_DATE", "EVENT_TYPE",
      "redacted_CASEID", "redacted_EVENT_DATE", "redacted_EVENT_TYPE"))
  }

  test("unknown oracle type fails fast like the reference") {
    intercept[NotImplementedError](OracleType.parse("BLOB"))
  }

  test("empty README yields no specs") {
    assert(SchemaParser.parse("no tables here") === Map.empty)
  }
}

class RulerParserSpec extends AnyFunSuite {

  test("camelCase header normalization") {
    assert(RulerParser.normalizeFieldName("PositionCode") === "POSITION_CODE")
    assert(RulerParser.normalizeFieldName("Code") === "CODE")
    assert(RulerParser.normalizeFieldName("redacted_PositionCode") ===
      "redacted_POSITION_CODE")
  }

  test("ruler spans slice header and rows; '*' redacts to empty string") {
    val fragment =
      """Code Name
        |---- --------------------------
        |FLM  Middle District of Florida
        |*    Redacted""".stripMargin
    val t = RulerParser.parse(fragment)
    assert(t.dataColumns === Seq("CODE", "NAME"))
    assert(t.allColumns === Seq("CODE", "NAME", "redacted_CODE", "redacted_NAME"))
    assert(t.rows(0) === (Seq("FLM", "Middle District of Florida"),
      Seq(false, false)))
    assert(t.rows(1) === (Seq("", "Redacted"), Seq(true, false)))
  }

  test("short rows clamp instead of erroring") {
    val t = RulerParser.parse("A    B\n---- ----\nxy")
    assert(t.rows(0) === (Seq("xy", ""), Seq(false, false)))
  }
}

class GlobalSplitterSpec extends AnyFunSuite {

  test("splits stacked tables on bare name lines") {
    val tables = GlobalSplitter.split(Fixtures.globalLions)
    assert(tables.keySet === Set("GS_DISTRICT", "GS_OFFENSE"))
    assert(tables("GS_DISTRICT").startsWith("Code Name"))
    assert(tables("GS_DISTRICT").endsWith("District of Connecticut"))
    assert(tables("GS_OFFENSE").endsWith("Narcotics"))
  }

  test("no name lines -> empty") {
    assert(GlobalSplitter.split("nothing\nto see\n") === Map.empty)
  }

  test("executor-side splitDistributed equals the driver-side split") {
    val spark = graft.TestSpark.spark
    // the real fixture, plus a nastier synthetic one: duplicate name
    // (first occurrence wins), a bare name line NOT followed by a blank
    // (truncates the previous fragment but starts nothing), trailing
    // blank lines (trimmed)
    val nasty = Seq(
      "preamble junk", "",
      "GS_ALPHA", "",
      "Code Name", "---- ----", "A1 First", "",
      "EMBEDDED",
      "GS_BETA", "",
      "Code Desc", "---- ----", "B1 Second", "", "",
      "GS_ALPHA", "",
      "Code Name", "---- ----", "A2 Duplicate", "").mkString("\n")
    for (content <- Seq(Fixtures.globalLions, nasty)) {
      val f = java.nio.file.Files.createTempFile("global_", ".txt")
      java.nio.file.Files.write(f, content.getBytes("ISO-8859-1"))
      val driver = GlobalSplitter.split(content)
      val distributed = GlobalSplitter.splitDistributed(spark, f.toString)
      assert(distributed === driver)
      java.nio.file.Files.delete(f)
    }
  }

  test("tableLineRdds exposes the persisted pass and can release it") {
    val spark = graft.TestSpark.spark
    val f = java.nio.file.Files.createTempFile("global_unp_", ".txt")
    java.nio.file.Files.write(f, Fixtures.globalLions.getBytes("ISO-8859-1"))
    val handle = GlobalSplitter.tableLineRdds(spark, f.toString)
    assert(handle.tables.map(_._1).toSet === Set("GS_DISTRICT", "GS_OFFENSE"))
    // consuming a derived RDD materializes the persisted tagged pass
    assert(handle.tables.head._2.count() > 0)
    assert(handle.source.getStorageLevel.useMemory ||
      handle.source.getStorageLevel.useDisk)
    handle.unpersist()
    // the block-manager copy is released — the leak the handle exists
    // to make releasable
    assert(handle.source.getStorageLevel ===
      org.apache.spark.storage.StorageLevel.NONE)
    java.nio.file.Files.delete(f)
  }
}

class LookupParserSpec extends AnyFunSuite {

  test("extracts name and table body between blank regions") {
    val (name, table) = LookupParser.parseTable(Fixtures.lookupGsPosition)
    assert(name === "GS_POSITION")
    assert(table.dataColumns === Seq("POSITION_CODE", "DESCRIPTION", "ACTIVE_FLAG"))
    assert(table.rows.size === 3)
    assert(table.rows(0)._1 === Seq("AUSA", "Assistant U.S. Attorney", "Y"))
    // redacted cell: empty-string value + true flag (global-table quirk)
    assert(table.rows(2) === (Seq("", "Redacted position", "N"),
      Seq(true, false, false)))
  }
}

class ListingSpec extends AnyFunSuite {

  test("extracts .zip hrefs, resolves relative urls, forces https") {
    val html =
      """<html><body>
        |<a href="/foia/file1.zip">one</a>
        |<a href='http://example.gov/abs/file2.zip'>two</a>
        |<a href="not_a_zip.txt">nope</a>
        |<a href="file3.zip">three</a>
        |</body></html>""".stripMargin
    val urls = Listing.zipUrls(html, "http://doj.example.gov/listing/page.html")
    assert(urls === Seq(
      "https://doj.example.gov/foia/file1.zip",
      "https://example.gov/abs/file2.zip",
      "https://doj.example.gov/listing/file3.zip"))
  }

  test("survives exotic markup: attribute order, quoting, case, entities, comments") {
    val html =
      """<HTML><BODY>
        |<A CLASS="dl" HREF="/foia/file1.zip" id=x>one</A>
        |<a id="y" href=bare/file2.zip>two</a>
        |<a href='q.zip?a=1&amp;b=2'>query-suffixed: not href$=".zip"</a>
        |<!-- <a href="commented_out.zip">hidden</a> -->
        |<img src="pic.zip.png"><a name="no-href">anchor sans href</a>
        |</BODY></HTML>""".stripMargin
    val urls = Listing.zipUrls(html, "https://doj.example.gov/listing/page.html")
    // reference selector a[href$=".zip"]: suffix match on the whole href,
    // so the ?query URL is excluded there and here
    assert(urls === Seq(
      "https://doj.example.gov/foia/file1.zip",
      "https://doj.example.gov/listing/bare/file2.zip"))
  }

  test("decodes the standard minimal entity set in hrefs, not just &amp;") {
    val html =
      """<html><body>
        |<a href="a&amp;b.zip">amp</a>
        |<a href="n&#38;m.zip">numeric dec</a>
        |<a href="h&#x26;x.zip">numeric hex</a>
        |<a href="gt&gt;lt&lt;q&quot;ap&apos;.zip">others</a>
        |<a href="unknown&nope;.zip">unknown entity passes through</a>
        |<a href="big&#99999999;.zip">bad codepoint passes through</a>
        |</body></html>""".stripMargin
    val urls = Listing.zipUrls(html, "https://doj.example.gov/")
    assert(urls.contains("https://doj.example.gov/a&b.zip"))
    assert(urls.contains("https://doj.example.gov/n&m.zip"))
    assert(urls.contains("https://doj.example.gov/h&x.zip"))
    assert(urls.exists(_.endsWith("gt%3Elt%3Cq%22ap'.zip")) ||
      urls.exists(_.contains("gt>lt<q")), urls.toString)
    assert(Listing.decodeEntities("unknown&nope;.zip") === "unknown&nope;.zip")
    assert(Listing.decodeEntities("big&#99999999;.zip") === "big&#99999999;.zip")
    assert(Listing.decodeEntities("&lt;&gt;&quot;&apos;&amp;") === "<>\"'&")
    assert(Listing.decodeEntities("&#x41;&#66;") === "AB")
  }

  test("percent-encodes entity-decoded '%' and non-ASCII so resolve survives") {
    val html =
      """<html><body>
        |<a href="pct&#37;file.zip">stray percent from &#37;</a>
        |<a href="caf&#233;.zip">latin-1 from &#233;</a>
        |<a href="emoji&#128512;.zip">astral codepoint</a>
        |<a href="pre%2Fencoded.zip">existing escape untouched</a>
        |</body></html>""".stripMargin
    val urls = Listing.zipUrls(html, "https://doj.example.gov/")
    // none of these may throw in URI.resolve — that is the whole point
    assert(urls.contains("https://doj.example.gov/pct%25file.zip"))
    assert(urls.contains("https://doj.example.gov/caf%C3%A9.zip"))
    assert(urls.contains("https://doj.example.gov/emoji%F0%9F%98%80.zip"))
    assert(urls.contains("https://doj.example.gov/pre%2Fencoded.zip"))
  }

  test("escapes path brackets, keeps IPv6 authorities, drops only bad hrefs") {
    val html =
      """<html><body>
        |<a href="data[2020].zip">brackets in a filename</a>
        |<a href="http://[::1]/v6.zip">IPv6 literal authority</a>
        |<a href="good.zip">fine</a>
        |</body></html>""".stripMargin
    val urls = Listing.zipUrls(html, "https://doj.example.gov/")
    // bracket filename resolves percent-encoded instead of throwing
    assert(urls.contains("https://doj.example.gov/data%5B2020%5D.zip"),
      urls.toString)
    // a real IPv6 authority passes through verbatim (brackets are legal
    // there), scheme forced to https like every other URL
    assert(urls.contains("https://[::1]/v6.zip"), urls.toString)
    assert(urls.exists(_.endsWith("/good.zip")))
  }

  test("IPv6 zone-ID authority (RFC 6874 %25) passes through unescaped") {
    val html =
      """<a href="http://[fe80::1%25eth0]/link.zip">link-local + zone</a>"""
    val urls = Listing.zipUrls(html, "https://doj.example.gov/")
    // the encoded zone-ID's brackets and %25 must survive verbatim —
    // escaping the brackets would corrupt the authority
    assert(urls.contains("https://[fe80::1%25eth0]/link.zip"), urls.toString)
  }

  test("pipelined loadAll overlaps fetches but keeps deterministic order") {
    import java.nio.file.Files
    import scala.concurrent.ExecutionContext.Implicits.global
    val html = """<a href="a.zip">a</a> <a href="b.zip">b</a>"""
    val fetched = scala.collection.mutable.Buffer.empty[String]
    val ingest = new NcdIngest(graft.TestSpark.spark,
      Files.createTempDirectory("pipe_wh_").toString, db = "pipe")
    val loaded = Listing.loadAllPipelined(ingest, "https://x.example/ls",
      fetchPage = _ => html,
      fetchZip = { url =>
        fetched.synchronized { fetched += url }
        val dir = Files.createTempDirectory("pipe_zip_")
        Fixtures.writeZip(dir)
      })
    // both zips load all 5 fixture tables, in order, twice
    assert(loaded.size === 10)
    assert(loaded.take(5) === loaded.drop(5))
    assert(fetched.toSet === Set(
      "https://x.example/a.zip", "https://x.example/b.zip"))
  }
}
