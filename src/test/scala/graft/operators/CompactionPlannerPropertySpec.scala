package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property test for the compaction planner's packing guarantees on
  * random manifests: completeness (every file in exactly one bin),
  * contiguity (bins cover consecutive file runs per partition), the
  * size bound (a bin passes target only via its straddling file), and
  * equality with a driver-side sequential reference packer.
  */
class CompactionPlannerPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val target = 100L

  private val genManifest: Gen[List[(String, Long, Long)]] =
    Gen.nonEmptyListOf(for {
      part <- Gen.oneOf("p0", "p1", "p2")
      bytes <- Gen.choose(1L, 180L) // some single files exceed target
    } yield (part, bytes)).map { rows =>
      // file ids: dense per partition, in generation order
      rows.groupBy(_._1).toList.flatMap { case (p, fs) =>
        fs.zipWithIndex.map { case ((_, b), i) => (p, i.toLong, b) }
      }
    }

  /** Reference: walk files in order, assign bin = floor(offset/target). */
  private def refPlan(files: List[(String, Long, Long)])
      : Map[(String, Long), (Long, Long, Long, Long)] =
    files.groupBy(_._1).flatMap { case (p, fs) =>
      var offset = 0L
      fs.sortBy(_._2).map { case (_, fid, bytes) =>
        val bin = offset / target
        offset += bytes
        (p, bin, fid, bytes)
      }.groupBy { case (_, bin, _, _) => bin }
        .map { case (bin, rows) =>
          (p, bin) -> (rows.size.toLong, rows.map(_._4).sum,
            rows.map(_._3).min, rows.map(_._3).max)
        }
    }

  test("plan == sequential reference packer; invariants hold") {
    val prop = Prop.forAll(genManifest) { files =>
      import spark.implicits._
      val df = files.toDF("source", "file_id", "bytes")
      val got = CompactionPlanner.plan(df, target)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      val expected = refPlan(files)
      val maxFile = files.map(_._3).max
      val complete = got.values.map(_._1).sum == files.size
      val bounded = got.values.forall(_._2 < target + maxFile)
      val contiguous = got.keys.map(_._1).forall { p =>
        val bins = got.filter(_._1._1 == p).toList.sortBy(_._1._2)
        bins.zip(bins.drop(1)).forall { case ((_, a), (_, b)) =>
          b._3 == a._4 + 1
        }
      }
      got == expected && complete && bounded && contiguous
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.toString)
  }
}
