package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual catalog queries without the full bench sweep:
  * java -cp ... graft.tools.TimeQuery q146_poisson_bootstrap [more...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_REPS (default 3).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = graft.SparkEntry.queries
    args.foreach { name =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"$name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.sqlContext.clearCache()
      }
    }
    spark.stop()
  }
}
