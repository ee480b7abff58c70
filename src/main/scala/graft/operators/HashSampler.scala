package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SCALE.md upgrade path for `hashSample` full-scan draws, implemented.
  *
  * The ANN-family index sampler (ORDER BY md5(id) LIMIT k) pays one linear
  * corpus pass per draw because md5 is computed at scan time — no predicate
  * on it can prune the parquet scan. The documented fix is a LAYOUT change:
  * persist the draw key as a column at ingest and cluster the file layout
  * on it, after which `sample_h < bound` genuinely pushes to the reader and
  * a draw reads a tiny fraction of row groups instead of the corpus.
  *
  * Two pieces:
  *   - [[writeHashMirror]]: the ingest-side layout — input columns plus the
  *     persisted md5 hex, range-partitioned AND sorted on it, so every file
  *     (and every row group inside each file) carries a tight, DISJOINT
  *     min/max range on the hash. A pushed range predicate then skips
  *     almost everything (parquet row-group stats do the skipping; the
  *     sorted layout is what makes the stats selective).
  *   - [[hashSampleIndexed]]: the adaptive two-phase draw — scan only the
  *     `sample_h < prefixBound` slice (pushed); iff that slice held fewer
  *     than k rows, fall back to the full linear pass. Exactness is
  *     preserved by construction: the draw's k global (sample_h, id) minima
  *     all lie inside ANY prefix range that contains ≥ k rows, so whenever
  *     the bounded scan suffices it returns exactly the full pass's rows.
  *
  * The draw stays hash-deterministic (same md5 ordering, same tie-break),
  * so recall gates and DuckDB oracles built on `hashSample` are unchanged;
  * `HashSamplerSpec` pins drawn-set equality on both phases and that the
  * range predicate actually reaches PushedFilters.
  */
object HashSampler {

  /** Persisted draw-key column name in the mirror layout. */
  val HashCol = "sample_h"

  /** Write `df` in the hash-clustered mirror layout: adds the md5 hex of
    * `idCol`'s decimal string (identical bytes to the query-time formula)
    * and lays files out by contiguous hash range.
    */
  def writeHashMirror(df: DataFrame, idCol: String, path: String,
                      numFiles: Int = 8): Unit =
    df.withColumn(HashCol, md5(col(idCol).cast("string")))
      .repartitionByRange(numFiles, col(HashCol))
      .sortWithinPartitions(HashCol)
      .write.mode("overwrite").parquet(path)

  /** Exactly-k hash-deterministic draw over a [[writeHashMirror]] layout,
    * reading only the `sample_h < prefixBound` slice when it suffices.
    *
    * `prefixBound` is a lowercase hex prefix; "08" selects ~1/32 of a
    * uniform corpus, ample for k ≤ few hundred at any real scale. The
    * result drops the mirror's hash column, matching the full-pass
    * sampler's schema.
    */
  def hashSampleIndexed(spark: SparkSession, mirrorPath: String,
                        idCol: String, k: Int,
                        prefixBound: String = "08"): DataFrame = {
    val mirror = spark.read.parquet(mirrorPath)
    val pref = mirror.filter(col(HashCol) < lit(prefixBound))
    // enough rows under the bound? limit(k) caps the probe's work (the
    // count equals k iff at least k rows survive the pushed range, and
    // the scan touches only the range's row groups)
    val enough = pref.limit(k).count() >= k
    val base = if (enough) pref else mirror
    base.orderBy(col(HashCol), col(idCol)).limit(k).drop(HashCol)
  }
}
