package graft.functions

import java.time.LocalDate

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class OracleDateParseSpec extends AnyFunSuite {

  private def parse(s: String): Option[LocalDate] =
    Option(DateUtil.parseOracleDate(UTF8String.fromString(s)))
      .map(d => LocalDate.ofEpochDay(d.longValue()))

  test("canonical and variant forms") {
    assert(parse("01-OCT-2017") === Some(LocalDate.of(2017, 10, 1)))
    assert(parse("1-OCT-2017") === Some(LocalDate.of(2017, 10, 1)))
    assert(parse("01-oct-2017") === Some(LocalDate.of(2017, 10, 1)))
    assert(parse("01-Oct-2017") === Some(LocalDate.of(2017, 10, 1)))
    assert(parse("29-FEB-2020") === Some(LocalDate.of(2020, 2, 29)))
    // year 0099 parses (4 digits), and formats back with strftime's rjust
    // zero-padding — the rjust quirk applies to OUTPUT, not parsing
    assert(parse("5-OCT-0099") === Some(LocalDate.of(99, 10, 5)))
  }

  test("invalid dates and garbage -> null") {
    assert(parse("31-FEB-2017") === None)  // not a real date
    assert(parse("29-FEB-2019") === None)  // non-leap year
    assert(parse("00-JAN-2017") === None)  // day 0
    assert(parse("01-XXX-2017") === None)  // unknown month
    assert(parse("001-JAN-2017") === None) // 3-digit day
    assert(parse("01-JAN-20177") === None) // 5-digit year
    // CPython strptime %Y is exactly \d\d\d\d: short years raise
    // ValueError in the reference and must become null here, not year 99
    assert(parse("5-OCT-99") === None)     // 2-digit year
    assert(parse("01-JAN-217") === None)   // 3-digit year
    assert(parse("01-JAN-0000") === None)  // year 0 < datetime.MINYEAR
    assert(parse("01-JAN-") === None)
    assert(parse("") === None)
    assert(parse("2017-10-01") === None)   // ISO form is not %d-%b-%Y
    assert(parse("1a-JAN-2017") === None)
    assert(parse("01-JAN-2x17") === None)
  }
}
