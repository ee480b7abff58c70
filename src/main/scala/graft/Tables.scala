package graft

import org.apache.hadoop.fs.Path

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

  /** Inputs below this size are repartitioned to full parallelism; anything
    * larger relies on reader splits (see [[tableParallel]]).
    */
  val SmallInputBytes: Long = 1L << 30

  /** Like [[table]], but guaranteed to occupy the session's parallelism for
    * CPU-bound per-row pipelines (shingling, hashing, vector math).
    *
    * The trap this solves is LOCAL-scale only: a tiny parquet table (one
    * file, one row group) arrives as ONE input split, pinning the whole map
    * stage to a single core, and no reader-split tuning can cut inside a
    * row group. For such inputs a round-robin repartition costs one tiny
    * shuffle and buys full-width execution.
    *
    * At cluster scale the opposite is true: `repartition(n)` is always a
    * full shuffle — an extra pass over the corpus before any real work — so
    * it must NOT run there. A 100 TB table has plenty of files/row groups
    * and the reader already targets `defaultParallelism` splits
    * (`spark.sql.files.minPartitionNum`); this helper therefore returns the
    * plain scan untouched once the input has enough files or exceeds
    * [[SmallInputBytes]]. Residual imbalance at scale is AQE's job
    * (`spark.sql.adaptive.coalescePartitions` / skew handling), not an
    * unconditional exchange.
    */
  def tableParallel(spark: SparkSession, sfDir: String, name: String): DataFrame =
    // cached like table(): the file-count/size probe re-lists the input
    // per call otherwise, and its answer cannot change for a read-only dir
    cached(parCache, spark, (sfDir, name)) {
      val df = table(spark, sfDir, name)
      val width = spark.sparkContext.defaultParallelism
      val files = df.inputFiles
      if (files.length >= width) df
      else {
        val conf = spark.sparkContext.hadoopConfiguration
        val bytes = files.map { f =>
          val p = new Path(new java.net.URI(f))
          p.getFileSystem(conf).getFileStatus(p).getLen
        }.sum
        if (bytes <= SmallInputBytes) df.repartition(width) else df
      }
    }

  // Cache lifetime: the outer map is weakly keyed by session AND the
  // cached DataFrames are held through SoftReferences — a Dataset holds
  // its SparkSession strongly, so a strong value would chain back to the
  // weak key and (per WeakHashMap's own javadoc) pin the entry forever.
  // Soft values break that chain: under memory pressure the JVM clears
  // them, after which a dead session's key is collectable; a cleared
  // entry in a LIVE session just rebuilds (~100 ms, the cost the cache
  // amortizes). Collections.synchronizedMap wraps computeIfAbsent in the
  // map's lock, so the per-session inner map is created race-free.
  private type Inner = java.util.concurrent.ConcurrentHashMap[
    (String, String), java.lang.ref.SoftReference[DataFrame]]

  private def cached(outer: java.util.Map[SparkSession, Inner],
                     spark: SparkSession, key: (String, String))
                    (build: => DataFrame): DataFrame = {
    val inner = outer.computeIfAbsent(spark, _ => new Inner)
    val ref = inner.get(key)
    val hit = if (ref != null) ref.get() else null
    if (hit != null) hit
    else {
      // benign race: concurrent builders produce equivalent immutable
      // plans; last write wins
      val df = build
      inner.put(key, new java.lang.ref.SoftReference(df))
      df
    }
  }

  private val parCache: java.util.Map[SparkSession, Inner] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Inner]())

  // Constructing a parquet DataFrame costs ~100 ms (file listing + footer
  // schema read) — paid per table() call, i.e. hundreds of times per
  // catalog pass. DataFrames are immutable logical plans, so one per
  // (session, dir, table) is safe to share across queries: this caches
  // the CONSTRUCTION only — no data is cached, `clearCache()` between
  // timed queries is unaffected, and the testdata dirs are read-only so
  // the cached file listing cannot go stale. Keyed by session so tests
  // with their own sessions don't cross-wire.
  private val dfCache: java.util.Map[SparkSession, Inner] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Inner]())

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cached(dfCache, spark, (sfDir, name)) {
      if (name == "events") {
        // events.ts has shipped in two physical forms across testdata
        // generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
        // reader rejects — read as a nanos long and convert losslessly to
        // a µs timestamp) and plain µs TIMESTAMP with isAdjustedToUTC =
        // false (which Spark 4 infers as TIMESTAMP_NTZ). Normalize BOTH
        // to a session-UTC µs TimestampType so every downstream
        // unix_micros/window sees one type; DuckDB surfaces the same
        // column as µs TIMESTAMP either way, so the engines agree on the
        // instant (session tz is pinned UTC, so the NTZ cast is a
        // relabel, not a shift).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$sfDir/$name.parquet")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case _ =>
            raw.withColumn("ts", col("ts").cast("timestamp"))
        }
      } else {
        spark.read.parquet(s"$sfDir/$name.parquet")
      }
    }
}
