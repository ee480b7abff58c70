package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the fixed per-query overhead components the whole catalog
  * pays: DataFrame construction (parquet footer + schema), plan-only
  * work, and a minimal noop-sink action. Ad hoc:
  * java -cp ... graft.tools.ProbeOverhead [sfDir]
  */
object ProbeOverhead {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, reps: Int)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => body)
      println(f"$name: ${(System.nanoTime() - t0) / 1e6 / reps}%.1f ms/op")
    }
    // bypass Tables.dfCache — the probe exists to measure the raw
    // construction cost the cache was added to avoid
    time("construct df (read.parquet)", 20) {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
    }
    time("construct df (Tables.table, cached)", 20) {
      graft.Tables.table(spark, sfDir, "lineitem")
    }
    time("analyze+optimize only", 20) {
      graft.Tables.table(spark, sfDir, "lineitem")
        .filter("l_quantity < 10").select("l_orderkey")
        .queryExecution.executedPlan
    }
    time("minimal noop action", 10) {
      graft.Tables.table(spark, sfDir, "lineitem")
        .filter("l_quantity < 10").select("l_orderkey")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
