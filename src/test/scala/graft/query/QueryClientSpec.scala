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
