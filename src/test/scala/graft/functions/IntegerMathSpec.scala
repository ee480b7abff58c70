package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property spec for the sign-split division contract (IntegerMath):
  * the ONE division spelling both engines reproduce bit-for-bit.
  *
  * The floor-vs-truncate contract under test: Java `/` truncates toward
  * zero, DuckDB `//` floors toward −∞ — they differ by exactly 1 on
  * negative inexact quotients. sdl sidesteps the divergence by dividing
  * magnitudes (where truncate == floor) and re-applying the dividend's
  * sign, so sdl(v,d) == v `/` d (Java truncation) for ALL signs — i.e.
  * the helper is a truncating division spelled so a flooring engine
  * computes the same value.
  */
class IntegerMathSpec extends AnyFunSuite {
  import IntegerMath.{sdl, sdlSql}

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, s"$name: $result")
  }

  private val vGen = Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
  private val dGen = Gen.chooseNum(1L, Long.MaxValue)

  test("sdl(Long) equals Java truncating division for every sign") {
    check("trunc", Prop.forAll(vGen, dGen) { (v, d) =>
      sdl(v, d) == v / d
    })
  }

  test("sdl is odd in the dividend: sdl(-v, d) == -sdl(v, d)") {
    check("odd", Prop.forAll(vGen, dGen) { (v, d) =>
      sdl(-v, d) == -sdl(v, d)
    })
  }

  test("sdl(BigInt) matches sdl(Long) inside Int64; exact beyond it") {
    check("bigint", Prop.forAll(vGen, dGen) { (v, d) =>
      sdl(BigInt(v), BigInt(d)) == BigInt(sdl(v, d))
    })
    val big = BigInt("123456789012345678901234567890")
    assert(sdl(-big, BigInt(7)) === -(big / 7))
  }

  test("divergence from floorDiv is exactly +1 on negative inexact " +
      "quotients, 0 elsewhere — and sdl takes the truncating branch") {
    assert(Math.floorDiv(-7L, 2L) === -4L && (-7L / 2L) === -3L)
    assert(sdl(-7L, 2L) === -3L)
    check("floor-vs-trunc", Prop.forAll(vGen, dGen) { (v, d) =>
      sdl(v, d) - Math.floorDiv(v, d) ==
        (if (v < 0 && v % d != 0) 1L else 0L)
    })
  }

  test("sdlSql evaluates to sdl under Spark on a sign-covering grid") {
    val spark = TestSpark.spark
    import spark.implicits._
    val cases = Seq(
      (-7L, 2L), (7L, 2L), (-8L, 2L), (0L, 5L), (-1L, 3L),
      (Long.MinValue + 1, 7L), (Long.MaxValue, 7L),
      (-999999999999L, 1000L), (123L, 124L), (-123L, 124L))
    cases.toDF("v", "d")
      .selectExpr("v", "d", s"${sdlSql("v", "d")} AS q")
      .collect().foreach { r =>
        assert(r.getLong(2) === sdl(r.getLong(0), r.getLong(1)),
          s"v=${r.getLong(0)} d=${r.getLong(1)}")
      }
  }
}
