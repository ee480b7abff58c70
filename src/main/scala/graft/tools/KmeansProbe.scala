package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints q66's Lloyd convergence iteration count per scale factor — used
  * to size `SimilarityQueries.KmeansOracleUnroll` (the oracle's static
  * unroll must cover the CORRECTNESS fixture's convergence count).
  */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.001", "sf0.01", "sf0.1")
    for (sf <- sfs) {
      val t0 = System.nanoTime()
      val (df, it) = graft.queries.SimilarityQueries.ivfKmeans(
        spark, s"/root/testdata/$sf")
      val n = df.count()
      println(f"$sf: iters=$it rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
