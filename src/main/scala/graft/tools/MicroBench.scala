package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{FloatVectorDot, VectorOps}

/** Micro-benchmark: HOF (zip_with+aggregate) vs native codegen expression
  * for the pairwise dot-product workload. Run ad hoc:
  * java -cp ... graft.tools.MicroBench [sfDir] [reps]
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    FloatVectorDot.register(spark)

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))

    def time(name: String)(body: => Unit): Unit = {
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        body
        println(f"$name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    time("hof ") {
      pairs.select(sum(VectorOps.dot(col("a.v"), col("b.v")))).collect()
    }
    time("native") {
      pairs.select(sum(FloatVectorDot.dot(col("a.v"), col("b.v")))).collect()
    }
    spark.stop()
  }
}
