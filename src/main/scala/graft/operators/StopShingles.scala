package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-frequency stop-shingle cut — the skew guard for shingle
  * equi-joins (n-gram Jaccard, candidate-pair generation).
  *
  * A boilerplate shingle shared by d documents contributes d² rows to a
  * shingle self-join: one license header across 100k docs is a 10¹⁰-row hot
  * key that no partitioning can spread. Dropping shingles with df above a
  * threshold bounds every join key's fan-out to ≤ threshold² pairs, and
  * costs one linear aggregation. The hot set is tiny by construction (at
  * most totalRows/threshold distinct keys can exceed the threshold), so the
  * subtraction is a broadcast anti-join — no extra shuffle of the big side.
  *
  * Semantics note: boilerplate shingles carry no near-dup signal (they
  * match everything), so removing them changes candidate quality little;
  * with threshold = ∞ (None at the call sites) results are exactly the
  * unfiltered ones.
  */
object StopShingles {

  /** Rows of `exploded` whose `keyCol` value occurs in at most `maxDf`
    * rows. Assumes one row per (document, key) — i.e. keys already
    * de-duplicated per document — so the count IS document frequency.
    */
  def filter(exploded: DataFrame, keyCol: String, maxDf: Long): DataFrame = {
    val hot = exploded.groupBy(keyCol)
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(keyCol)
    exploded.join(broadcast(hot), Seq(keyCol), "left_anti")
      // USING-join moves the key column first; restore the input order so
      // the cut is schema-transparent to callers
      .select(exploded.columns.map(col).toIndexedSeq: _*)
  }
}
