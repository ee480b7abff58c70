package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the graph/seasonal wave (q214 rare-context
  * link prediction, q215 label propagation, q216 seasonal decomposition):
  * each distributed formulation is replayed brute-force in plain Scala from
  * collected rows — naive pair enumeration over the context incidence, the
  * literal synchronous LPA recursion, the textbook moving-average
  * decomposition — and must match bit-for-bit. The DuckDB oracle proves the
  * two ENGINES agree; these prove the map-side pair generation, the unrolled
  * rounds, and the RANGE-frame trend compute the definitions they claim to.
  */
class GraphSeasonalSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** The rare-context incidence replayed naively: (cell -> sorted users)
    * for cells with 2..8 distinct users.
    */
  private def rareCells(): Map[(String, Long, Long), Vector[Long]] = {
    val ev = table(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts) DIV 3600000000 AS hr",
        "CAST(floor(value / 50) AS BIGINT) AS vb", "user_id")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
    ev.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.toVector)
      .filter { case (_, us) => us.length >= 2 && us.length <= 8 }
      .toMap
  }

  test("q214 scores equal the naive common-neighbor definitions " +
      "(jaccard over rare-context neighborhoods, RA index)") {
    val cells = rareCells()
    assert(cells.nonEmpty)
    val deg = cells.toSeq.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    // naive pair accumulation: every i<j pair per cell
    val acc = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    cells.values.foreach { us =>
      for (i <- us.indices; j <- i + 1 until us.length) {
        val k = (us(i), us(j))
        val (c, ra) = acc.getOrElse(k, (0L, 0L))
        acc(k) = (c + 1, ra + 1000000L / us.length)
      }
    }
    val expected = acc.filter(_._2._1 >= 2).map { case ((u, v), (c, ra)) =>
      (u, v) -> (c, deg(u), deg(v), c * 10000 / (deg(u) + deg(v) - c), ra)
    }
    val got = run("q214_linkpred_common_contexts").collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))
    }.toMap
    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("q215 labels equal the sequential synchronous LPA recursion " +
      "(3 rounds, max-count min-label tie-break)") {
    val cells = rareCells()
    val acc = collection.mutable.Map.empty[(Long, Long), Long]
    cells.values.foreach { us =>
      for (i <- us.indices; j <- i + 1 until us.length) {
        val k = (us(i), us(j))
        acc(k) = acc.getOrElse(k, 0L) + 1
      }
    }
    val edges = acc.filter(_._2 >= 2).keys.toSeq
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toVector).toMap
    var labels = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = nbrs.map { case (n, ns) =>
        val counts = ns.groupBy(labels).view.mapValues(_.size).toMap
        // most frequent neighbor label, ties to the smallest label
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val sizes = labels.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val expected = labels.map { case (n, l) => n -> (l, sizes(l)) }
    val got = run("q215_label_propagation").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty)
    assert(got == expected)
    // the propagation must actually merge something: fewer final labels
    // than nodes (the fixture graph has real structure)
    assert(sizes.size < labels.size)
  }

  test("q216 decomposition: identity holds where defined, trend defined " +
      "exactly where all 7 calendar days exist, seasonal replays per dow") {
    val rows = run("q216_seasonal_decompose").collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val days = rows.map(_.getLong(0)).toSet
    val n = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    // trend: centered 7-day mean over the CALENDAR window, defined only
    // when all 7 days are present
    val trend = rows.flatMap { r =>
      val d = r.getLong(0)
      val win = (d - 3) to (d + 3)
      if (win.forall(days.contains)) Some(d -> win.map(n).sum / 7) else None
    }.toMap
    val detrend = trend.map { case (d, t) => d -> (n(d) - t) }
    val seasonal = detrend.keys.groupBy(_ % 7).view.mapValues { ds =>
      val vs = ds.toSeq.map(detrend)
      vs.sum / vs.size // truncating integer division, as both engines
    }.toMap
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == d % 7)
      trend.get(d) match {
        case Some(t) =>
          assert(!r.isNullAt(3) && r.getLong(3) == t, s"trend at $d")
          val sExp = seasonal(d % 7)
          assert(r.getLong(4) == sExp, s"seasonal at $d")
          assert(r.getLong(5) == n(d) - t - sExp, s"remainder at $d")
          assert(r.getLong(2) == r.getLong(3) + r.getLong(4) + r.getLong(5))
        case None =>
          assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
            s"edge day $d must be all-null")
      }
    }
    assert(trend.nonEmpty && trend.size < rows.length,
      "fixture must witness both defined and edge rows")
  }
}
