package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed UDAF (the `Aggregator[IN, BUF, OUT]` extension surface,
  * SURVEY §2-B last row): geometric mean via sum-of-logs, decomposable so
  * partial aggregation (map-side combine) works like any built-in agg.
  */
object GeoMean {

  final case class Buf(var sumLn: Double, var n: Long)

  val aggregator: Aggregator[Double, Buf, Double] =
    new Aggregator[Double, Buf, Double] {
      def zero: Buf = Buf(0.0, 0L)
      def reduce(b: Buf, x: Double): Buf = {
        b.sumLn += math.log(x); b.n += 1; b
      }
      def merge(a: Buf, b: Buf): Buf = {
        a.sumLn += b.sumLn; a.n += b.n; a
      }
      def finish(b: Buf): Double =
        if (b.n == 0) Double.NaN else math.exp(b.sumLn / b.n)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form, usable in any groupBy().agg(...). */
  def geoMean(c: Column): Column = udaf(aggregator).apply(c)
}
