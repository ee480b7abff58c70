package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump formatted physical plans for every catalog query (plan review). */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.catalog
      .filter { case (n, _) => only.forall(n.contains) }
      .foreach { case (name, qd) =>
        println(s"\n========== $name ==========")
        try println(qd.fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
      }
    spark.stop()
  }
}
