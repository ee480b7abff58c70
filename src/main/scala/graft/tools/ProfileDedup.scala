package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextOps._

/** Ad hoc stage profiler for the dedup pipeline. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)")
    }

    time("tokens only      ") {
      docs.select(size(tokens(col("text"))).as("n")).agg(sum("n")).collect()(0)
    }
    time("shingles         ") {
      docs.select(size(shingles3(tokens(col("text")))).as("n"))
        .agg(sum("n")).collect()(0)
    }
    time("hashed shingles  ") {
      docs.select(transform(shingles3(tokens(col("text"))), s => hash32(s))
        .as("hs")).select(size(col("hs")).as("n")).agg(sum("n")).collect()(0)
    }
    time("8 minhashes      ") {
      val hs = docs.select(col("doc_id"),
        transform(shingles3(tokens(col("text"))), s => hash32(s)).as("hs"))
      hs.select(col("doc_id") +:
          (0 until 8).map(i => minhash(col("hs"), i).as(s"m$i")): _*)
        .agg(sum("m0")).collect()(0)
    }
    time("explode shingle  ") {
      docs.select(col("doc_id"),
        explode(shingles3(tokens(col("text")))).as("shs"))
        .select(col("doc_id"), hash32(col("shs")).as("sh"))
        .groupBy("doc_id").count().agg(sum("count")).collect()(0)
    }
    spark.stop()
  }
}
