package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** ANSI-mode catalog sweep (round-9 verdict #2 / round-10 #5): every
  * catalog query runs under `spark.sql.ansi.enabled=true` AND `=false`
  * and must produce IDENTICAL rows at sf0.001.
  *
  * Why this exists: Spark 4 defaults ANSI on, and the DuckDB oracle
  * cannot see an ANSI divergence — if a query silently relies on
  * non-ANSI null-on-overflow/cast semantics, both engines can drift
  * together (nulls dropped identically) or the driver's ANSI session
  * can throw where the builder's local session returned null. Running
  * the catalog under BOTH modes pins the contract: every query's
  * arithmetic stays inside ranges where the modes agree (the catalog's
  * exact-integer discipline), and any future query that overflows or
  * bad-casts fails THIS spec loudly instead of shipping.
  *
  * Isolation: two `newSession()`s off the shared context — independent
  * SQLConf, same extensions/UDF registry — so the toggles can't leak
  * into concurrently-running suites.
  */
class AnsiSweepSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("all catalog queries produce identical rows under " +
      "ansi.enabled=true and =false") {
    val base = TestSpark.spark
    val on = base.newSession()
    on.conf.set("spark.sql.ansi.enabled", "true")
    val off = base.newSession()
    off.conf.set("spark.sql.ansi.enabled", "false")

    val bad = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        def rowsOf(s: org.apache.spark.sql.SparkSession): Seq[String] =
          try fn(s, sf).collect().map(_.toString).toSeq
          finally s.sqlContext.clearCache()
        val a = rowsOf(on)
        val b = rowsOf(off)
        if (a != b) {
          bad += s"$name: ansi-on/off rows differ (" +
            s"${a.size}/${b.size} rows; first divergence: " +
            a.zipAll(b, "<missing>", "<missing>")
              .find { case (x, y) => x != y }
              .map { case (x, y) => s"on=$x off=$y" }.getOrElse("?") + ")"
          info(bad.last)
        }
      } catch {
        case e: Throwable =>
          bad += s"$name: threw ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(200)}"
          info(bad.last)
      }
    }
    assert(bad.isEmpty,
      s"${bad.size} queries diverge between ANSI modes:\n" +
        bad.mkString("\n"))
  }
}
