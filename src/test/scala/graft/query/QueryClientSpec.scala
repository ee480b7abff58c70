package graft.query

import java.nio.file.Files

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QueryClientSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("executeQuery materializes CSV results at a location") {
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "a")).toDF("k", "v")
      .createOrReplaceTempView("qc_demo")
    val client = new QueryClient(spark,
      Files.createTempDirectory("qc_results_").toString)
    val location = client.executeQuery(
      "SELECT v, count(*) AS n FROM qc_demo GROUP BY v ORDER BY v")
    val csv = new java.io.File(location).listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val lines = Source.fromFile(csv).getLines().toVector
    assert(lines === Vector("v,n", "a,2", "b,1"))
  }

  test("readResults round-trips rows through the CSV location (incl. boolean)") {
    import spark.implicits._
    // the reference parses the downloaded CSV back to rows, restoring
    // redacted_* flags as booleans (ncd/athena.py:119-138,
    // ncd/global_file.py:69-72) — this is that half of the contract
    Seq((1L, "a", true), (2L, "b", false), (3L, "c", true))
      .toDF("caseid", "v", "redacted_v")
      .createOrReplaceTempView("qc_bool_demo")
    val client = new QueryClient(spark,
      Files.createTempDirectory("qc_results_").toString)
    val location = client.executeQuery(
      "SELECT caseid, v, redacted_v FROM qc_bool_demo ORDER BY caseid")
    val back = client.readResults(location)
      .as[(Long, String, Boolean)].collect().toSeq.sortBy(_._1)
    assert(back === Seq((1L, "a", true), (2L, "b", false), (3L, "c", true)))
    // explicit-schema variant: exact typing, no inference
    val typed = client.readResults(location,
      org.apache.spark.sql.types.StructType.fromDDL(
        "caseid BIGINT, v STRING, redacted_v BOOLEAN"))
    assert(typed.schema.map(_.dataType.sql) ===
      Seq("BIGINT", "STRING", "BOOLEAN"))
    assert(typed.count() === 3)
  }

  test("bad SQL raises (after cancelling the job group) instead of hanging") {
    val client = new QueryClient(spark,
      Files.createTempDirectory("qc_results_").toString)
    intercept[Exception](client.executeQuery("SELECT * FROM no_such_table"))
  }

  test("createDb is idempotent") {
    val client = new QueryClient(spark,
      Files.createTempDirectory("qc_results_").toString)
    client.createDb("qc_db")
    client.createDb("qc_db")
    assert(spark.catalog.databaseExists("qc_db"))
  }
}
