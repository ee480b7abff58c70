package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join (`l.start <= r.end AND r.start <= l.end` on a
  * shared equi-key) without a nested-loop join.
  *
  * Rewrite: pick a bin width W and an upper bound M on the RIGHT side's
  * interval length. The right row lands in the single bin of its START;
  * the left row explodes to every bin its overlap window
  * `[l.start - M, l.end]` covers. Any overlapping pair shares the bin of
  * `r.start`, and ONLY that bin — so the equi-join on `(key, bin)` finds
  * each qualifying pair exactly once (no post-join dedup), the exact
  * predicate re-check drops false candidates, and the result is identical
  * to the naive inequality join. Candidate volume per left row is
  * `(len_l + M) / W + 2` bins instead of every right row on the key — the
  * same explode-to-equi-shuffle shape BandJoin uses for scalar bands, so
  * it scales out on (key, bin) at 100 TB.
  *
  * All bounds are in the same units as the start/end columns (here:
  * epoch micros as LONG — integer bin math, no float drift).
  */
object IntervalJoin {

  /** @param left  rows with `key`, `lStart`, `lEnd` (micros longs)
    * @param right rows with `key`, `rStart`, `rEnd`; every right interval
    *              must satisfy `rEnd - rStart <= maxRightLen`
    * @return left ++ right columns for each overlapping pair
    */
  def overlap(left: DataFrame, right: DataFrame, key: String,
              lStart: String, lEnd: String, rStart: String, rEnd: String,
              binWidth: Long, maxRightLen: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = // floor-div for non-negative micros
      (c - pmod(c, lit(binWidth))) / binWidth
    val lBinned = left.withColumn("__bin",
      explode(sequence(bin(col(lStart) - lit(maxRightLen)).cast("long"),
        bin(col(lEnd)).cast("long"))))
    val rBinned = right.withColumn("__bin", bin(col(rStart)).cast("long"))
    lBinned.join(rBinned, Seq(key, "__bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__bin")
  }
}
