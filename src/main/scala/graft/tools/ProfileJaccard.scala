package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextOps._

/** Stage-level instrumentation of the jaccard pipeline. */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val aqe = if (args.length > 1) args(1) else "true"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"AQE=$aqe")

    def time(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
    val sh = docs
      .select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("shs"))
      .select(col("doc_id"), hash32(col("shs")).as("sh"))

    time("docs count       ") { docs.count() }
    time("sh materialize   ") { sh.count() }
    time("sh run2          ") { sh.count() }
    time("sh run3          ") { sh.count() }
    val shc = sh.cache()
    time("sh cache         ") { shc.count() }
    time("inter (cached)   ") {
      shc.as("a").join(shc.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
        .count()
    }
    shc.unpersist()
    time("inter (uncached) ") {
      sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
        .count()
    }
    spark.stop()
  }
}
