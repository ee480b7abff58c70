package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic mergeable quantile sketch (typed `Aggregator` with array
  * state). Values land in fixed log-spaced bins —
  * `bin(x) = floor(ln(x)*8) + 64` clamped to [0,255] — so the sketch state
  * is a pure counting vector: `reduce`/`merge` commute, partial (map-side)
  * aggregation is exact, and the estimate is REPRODUCIBLE — same data,
  * same answer, on any partition layout, any cluster size, or any other
  * engine that replays the bin math. That portability is what
  * `percentile_approx` (GK sketch, order-sensitive buffer) cannot give;
  * the price is a fixed ~13% relative error bound (one bin width,
  * e^(1/8)) instead of an adaptive one.
  *
  * The bound holds on the bin domain [e^-8, e^24) ≈ [3.4e-4, 2.6e10);
  * values outside clamp to the edge bins and their error is unbounded —
  * callers with wider dynamic range should rescale or widen `Bins`
  * (state cost is one Long per bin). Non-positive values are ignored
  * (log-spaced bins are a positive-domain structure).
  *
  * Quantile estimate = lower edge of the first bin whose cumulative count
  * reaches ceil(q*n), computed in integer arithmetic.
  */
object QuantileSketch {

  final case class Buf(var bins: Array[Long], var n: Long)
  final case class Quantiles(p50: Double, p95: Double)

  private val Bins = 256
  private val Offset = 64
  private def binOf(x: Double): Int = {
    // clamp in DOUBLE space: floor(log(+Inf)).toInt would wrap through
    // Int.MaxValue + Offset and land Infinity in the BOTTOM bin
    val b = math.floor(math.log(x) * 8) + Offset
    if (b < 0) 0 else if (b >= Bins) Bins - 1 else b.toInt
  }

  val aggregator: Aggregator[Double, Buf, Quantiles] =
    new Aggregator[Double, Buf, Quantiles] {
      def zero: Buf = Buf(new Array[Long](Bins), 0L)
      def reduce(b: Buf, x: Double): Buf = {
        if (x > 0) { b.bins(binOf(x)) += 1; b.n += 1 }
        b
      }
      def merge(a: Buf, b: Buf): Buf = {
        var i = 0
        while (i < Bins) { a.bins(i) += b.bins(i); i += 1 }
        a.n += b.n; a
      }
      def finish(b: Buf): Quantiles = {
        def est(thr: Long): Double = {
          var cum = 0L; var i = 0
          while (i < Bins && cum + b.bins(i) < thr) { cum += b.bins(i); i += 1 }
          math.exp((i - Offset) / 8.0)
        }
        if (b.n == 0) Quantiles(Double.NaN, Double.NaN)
        else Quantiles(est((b.n + 1) / 2), est((19 * b.n + 19) / 20))
      }
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Quantiles] = Encoders.product[Quantiles]
    }

  /** Column form: a struct (p50, p95), usable in any groupBy().agg(...). */
  def sketch(c: Column): Column = udaf(aggregator).apply(c)
}
