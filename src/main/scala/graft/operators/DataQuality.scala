package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the expectation-checking pass a
  * pipeline runs before promoting a snapshot (the reference's analogue is
  * the row-count sanity checks around `import_zip.py`'s load; this
  * generalizes them to typed constraints).
  *
  * Each rule reduces to ONE linear aggregation (or one anti-join for
  * referential integrity) producing an exact violation count — integer
  * outputs, so the report replays identically on any engine. Rules over
  * the same frame could share a scan via a single multi-aggregate pass;
  * they are kept as separate plans so each rule's cost is independently
  * visible and any subset can run alone. At 100 TB every rule is a narrow
  * projection + map-side partial aggregate; none shuffles more than the
  * group/join key it checks.
  */
object DataQuality {

  sealed trait Rule { def name: String }

  /** `col` must never be null. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }

  /** `cols` must be unique together; violations = rows beyond the first
    * per duplicated key. */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** `col` must be inside [lo, hi]; nulls are NOT violations (compose
    * with [[NotNull]] when they are). */
  final case class Bounds(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"bounds($col,$lo,$hi)"
  }

  /** `col` must be one of `values`; nulls are NOT violations. */
  final case class InSet(col: String, values: Seq[String]) extends Rule {
    def name = s"in_set($col)"
  }

  /** Every non-null `col` must exist in `dim.dimCol` (foreign key);
    * violations = orphan rows, counted via a left-anti join — broadcast
    * when the dimension is small, shuffle otherwise (Spark decides). */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String)
      extends Rule {
    def name = s"ref_integrity($col)"
  }

  private def violations(df: DataFrame, rule: Rule): DataFrame = {
    def count0(pred: Column): DataFrame =
      df.agg(coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))
        .as("violations"))
    val counted = rule match {
      case NotNull(c) => count0(col(c).isNull)
      case Bounds(c, lo, hi) =>
        count0(col(c).isNotNull && (col(c) < lo || col(c) > hi))
      case InSet(c, vs) =>
        count0(col(c).isNotNull && !col(c).isin(vs: _*))
      case Unique(cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))
      case RefIntegrity(c, dim, dc) =>
        df.filter(col(c).isNotNull)
          .join(dim.select(col(dc).as(c)), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
    }
    counted.select(lit(rule.name).as("rule"), col("violations"))
  }

  /** Run every rule; one row per rule with its exact violation count. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame =
    rules.map(violations(df, _)).reduce(_.unionByName(_))
}
