package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer: bench-identical session, noop sink, N passes.
  * java -cp ... graft.tools.TimeQueries q66_ivf_kmeans,q48_dedup_clusters [reps]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    for (r <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"rep$r $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
