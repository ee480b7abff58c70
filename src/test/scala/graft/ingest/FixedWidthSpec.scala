package graft.ingest

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FixedWidthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val spec = SchemaParser.parse(Fixtures.readme)("GS_CASE")

  private def projected(lines: String*) =
    FixedWidth.project(lines.toDF("value"), spec)

  test("typed conversion with redaction flags") {
    val rows = projected(Fixtures.gsCaseFlm.split("\n").toIndexedSeq: _*)
      .collect().sortBy(r => Option(r.getAs[Long]("CASEID")))

    // quirk row sorts first (null CASEID)
    val quirk = rows(0)
    assert(quirk.isNullAt(quirk.fieldIndex("CASEID")))        // "12.3" -> null
    assert(quirk.isNullAt(quirk.fieldIndex("FILE_DATE")))     // 31-FEB invalid
    assert(quirk.isNullAt(quirk.fieldIndex("TOTAL_LOSS")))    // "abc" -> null
    assert(quirk.getAs[Boolean]("redacted_CASEID") === false) // error, not '*'

    val r1 = rows(1)
    assert(r1.getAs[Long]("CASEID") === 1L)
    assert(r1.getAs[String]("DISTRICT") === "FLM")
    assert(r1.getAs[Date]("FILE_DATE") === Date.valueOf("2017-10-01"))
    assert(r1.getAs[String]("LEAD_CHARGE") === "18:USC:1341")
    assert(r1.getAs[Double]("TOTAL_LOSS") === 1234.50)

    val r2 = rows(2) // redacted date + loss
    assert(r2.isNullAt(r2.fieldIndex("FILE_DATE")))
    assert(r2.getAs[Boolean]("redacted_FILE_DATE") === true)
    assert(r2.isNullAt(r2.fieldIndex("TOTAL_LOSS")))
    assert(r2.getAs[Boolean]("redacted_TOTAL_LOSS") === true)
    assert(r2.getAs[Boolean]("redacted_CASEID") === false)
  }

  test("lowercase month parses (strptime case-insensitivity) and scientific floats") {
    val row = projected(Fixtures.gsCaseCt.split("\n").toIndexedSeq: _*)
      .collect().head
    assert(row.getAs[Date]("FILE_DATE") === Date.valueOf("2017-01-01"))
    assert(row.getAs[Double]("TOTAL_LOSS") === -150.0)
  }

  test("CR inside a record becomes a space before slicing") {
    import org.apache.spark.sql.functions._
    val raw = Seq(Fixtures.gsCaseCt.stripLineEnd).toDF("value")
      .select(regexp_replace(col("value"), "\r", " ").as("value"))
    val row = FixedWidth.project(raw, spec).collect().head
    assert(row.getAs[String]("LEAD_CHARGE") === "AB CD")
  }

  test("NUMBER never truncates decimals (int('12.3') raises -> null)") {
    val row = projected(Fixtures.f("7", 10) + Fixtures.f("X", 4) +
      Fixtures.f("", 11) + Fixtures.f("", 20) + Fixtures.f("12.9", 12))
      .collect().head
    assert(row.getAs[Long]("CASEID") === 7L)
    assert(row.getAs[Double]("TOTAL_LOSS") === 12.9)
  }

  test("two-digit year is rejected like strptime %Y (exactly 4 digits)") {
    // CPython %Y compiles to \d\d\d\d: '5-OCT-99' raises ValueError in the
    // reference's converter and lands as null (the rjust quirk zero-pads
    // strftime OUTPUT of year 99; it does not make short years parse).
    val row = projected(Fixtures.f("1", 10) + Fixtures.f("X", 4) +
      Fixtures.f("5-OCT-99", 11) + Fixtures.f("", 20) + Fixtures.f("", 12))
      .collect().head
    assert(row.getAs[Date]("FILE_DATE") === null)
    val ok = projected(Fixtures.f("1", 10) + Fixtures.f("X", 4) +
      Fixtures.f("5-OCT-0099", 11) + Fixtures.f("", 20) + Fixtures.f("", 12))
      .collect().head
    assert(ok.getAs[Date]("FILE_DATE") === Date.valueOf("0099-10-05"))
  }
}
