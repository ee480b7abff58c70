package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Parquet table loader for the driver testdata layout
  * (`sfDir/NAME.parquet` under /root/testdata, see TESTDATA.md).
  *
  * At cluster scale the same call reads a partitioned directory tree; the
  * vectorized parquet reader + Catalyst column pruning / predicate pushdown
  * make `table(...).select(...).filter(...)` scan only the bytes needed.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Like [[table]], but spread across the session's full parallelism.
    *
    * Use for CPU-bound per-row pipelines (shingling, hashing, vector math):
    * a small parquet file arrives as ONE input split, which would pin the
    * whole map stage to a single core. The round-robin repartition costs
    * one small shuffle and buys full-width execution — and at real scale it
    * degrades gracefully into a near-no-op rebalance.
    */
  def tableParallel(spark: SparkSession, sfDir: String, name: String): DataFrame =
    table(spark, sfDir, name)
      .repartition(spark.sparkContext.defaultParallelism)

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read it as a long (nanos) and convert losslessly to a
      // microsecond timestamp (the data is µs-granular; DuckDB surfaces the
      // same column as µs TIMESTAMP, so both engines agree on the instant).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
