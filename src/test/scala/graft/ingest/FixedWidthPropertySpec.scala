package graft.ingest

import java.sql.Date

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests (SURVEY §5.4): round-trip fixed-width rendering through
  * the distributed parser, redaction ⇔ null invariant, null-on-garbage.
  */
class FixedWidthPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, s"$name: $result")
  }

  private val spec = TableSpec("T", Seq(
    FieldSpec("ID", 1, 10, OracleType.Number),
    FieldSpec("NAME", 11, 12, OracleType.Varchar),
    FieldSpec("AMT", 23, 12, OracleType.OracleFloat),
    FieldSpec("DT", 35, 11, OracleType.OracleDate)))

  private def pad(v: String, w: Int): String =
    if (v.length >= w) v.substring(0, w) else v + " " * (w - v.length)

  private def render(id: String, name: String, amt: String, dt: String) =
    pad(id, 10) + pad(name, 12) + pad(amt, 12) + pad(dt, 11)

  private def parse(lines: Seq[String]) = {
    import spark.implicits._
    FixedWidth.project(lines.toDF("value"), spec).collect()
  }

  test("round-trip: rendered integer/string/float cells parse back exactly") {
    val genRow = for {
      id <- Gen.choose(0L, 999999999L)
      name <- Gen.alphaNumStr.map(_.take(12)).suchThat(s => s.trim == s)
      amt <- Gen.choose(-99999.0, 99999.0).map(d => f"$d%.3f")
    } yield (id, name, amt)
    check("roundtrip", Prop.forAll(Gen.listOfN(5, genRow)) { rows =>
      val lines = rows.map { case (id, name, amt) =>
        render(id.toString, name, amt, "01-OCT-2017")
      }
      val parsed = parse(lines).sortBy(_.getAs[Long]("ID"))
      val expect = rows.sortBy(_._1)
      parsed.zip(expect).forall { case (row, (id, name, amt)) =>
        row.getAs[Long]("ID") == id &&
          row.getAs[String]("NAME") == name &&
          math.abs(row.getAs[Double]("AMT") - amt.toDouble) < 1e-9 &&
          row.getAs[Date]("DT") == Date.valueOf("2017-10-01")
      }
    })
  }

  test("redaction invariant: '*' cell <=> null value + flag true") {
    val genMask = Gen.listOfN(4, Gen.oneOf(true, false))
    check("redaction", Prop.forAll(genMask) { mask =>
      val cells = Seq("42", "abc", "1.5", "02-NOV-2020")
        .zip(mask).map { case (v, redact) => if (redact) "*" else v }
      val row = parse(Seq(render(cells(0), cells(1), cells(2), cells(3)))).head
      Seq("ID", "NAME", "AMT", "DT").zip(mask).forall { case (c, redact) =>
        if (redact)
          row.isNullAt(row.fieldIndex(c)) && row.getAs[Boolean](s"redacted_$c")
        else
          !row.isNullAt(row.fieldIndex(c)) && !row.getAs[Boolean](s"redacted_$c")
      }
    })
  }

  test("garbage never errors: NUMBER/FLOAT/DATE yield null, flags false") {
    val garbage = Gen.oneOf("abc", "12.3.4", "--5", "99-XXX-1", "1 2", "NaN?")
    check("garbage", Prop.forAll(garbage) { g =>
      val row = parse(Seq(render(g, g, g, g))).head
      row.isNullAt(row.fieldIndex("ID")) &&
        row.isNullAt(row.fieldIndex("AMT")) &&
        row.isNullAt(row.fieldIndex("DT")) &&
        row.getAs[String]("NAME") == g.trim &&
        !row.getAs[Boolean]("redacted_ID")
    })
  }

  test("decimal NUMBER cells null out, never truncate (quirk)") {
    val genDec = for {
      a <- Gen.choose(1L, 99999L); b <- Gen.choose(1, 9)
    } yield s"$a.$b"
    check("decimal-number", Prop.forAll(genDec) { d =>
      val row = parse(Seq(render(d, "x", "0", "01-JAN-2000"))).head
      row.isNullAt(row.fieldIndex("ID"))
    })
  }
}
