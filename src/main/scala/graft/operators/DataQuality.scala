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
  * outputs, so the report replays identically on any engine. All
  * PREDICATE rules (not-null / bounds / in-set) over the same frame are
  * fused into a single multi-aggregate scan — at 100 TB, one corpus pass
  * however many expectations are declared — while Unique and
  * RefIntegrity keep their own plans (each needs its own shuffle or
  * join anyway, and any subset can still run alone through the same
  * API). None shuffles more than the group/join key it checks.
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

  /** The violation predicate of a scan-fusable rule (None for rules that
    * need their own shuffle/join plan). */
  private def predicate(rule: Rule): Option[Column] = rule match {
    case NotNull(c) => Some(col(c).isNull)
    case Bounds(c, lo, hi) =>
      Some(col(c).isNotNull && (col(c) < lo || col(c) > hi))
    case InSet(c, vs) =>
      Some(col(c).isNotNull && !col(c).isin(vs: _*))
    case _ => None
  }

  private def violations(df: DataFrame, rule: Rule): DataFrame = {
    val counted = rule match {
      case Unique(cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))
      case RefIntegrity(c, dim, dc) =>
        df.filter(col(c).isNotNull)
          .join(dim.select(col(dc).as(c)), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
      case p =>
        df.agg(coalesce(sum(when(predicate(p).get, 1L).otherwise(0L)),
          lit(0L)).as("violations"))
    }
    counted.select(lit(rule.name).as("rule"), col("violations"))
  }

  /** Run every rule; one row per rule with its exact violation count, in
    * DECLARATION order (each leg carries the rule's declared index and the
    * union is sorted on it — a total order over ≤ a-handful-of-rules rows,
    * so the sort is free). Predicate rules still share ONE scan (a single
    * multi-aggregate) — the output rows are identical, values AND order,
    * to running each rule alone in sequence.
    */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val indexed = rules.zipWithIndex
    val (fused, own) = indexed.partition { case (r, _) =>
      predicate(r).isDefined
    }
    val fusedFrame =
      if (fused.isEmpty) Nil
      else {
        val aggs = fused.zipWithIndex.map { case ((r, _), i) =>
          coalesce(sum(when(predicate(r).get, 1L).otherwise(0L)), lit(0L))
            .as(s"__r$i")
        }
        // one wide 1-row aggregate, unpivoted by a single explode — per-
        // rule selects from the wide frame would re-run the scan per rule
        val wide = df.agg(aggs.head, aggs.tail: _*)
        Seq(wide.select(explode(array(fused.zipWithIndex.map {
            case ((r, ord), i) =>
              struct(lit(r.name).as("rule"), col(s"__r$i").as("violations"),
                lit(ord).as("__ord"))
          }: _*)).as("kv"))
          .select(col("kv.rule").as("rule"),
            col("kv.violations").as("violations"),
            col("kv.__ord").as("__ord")))
      }
    val ownFrames = own.map { case (r, ord) =>
      violations(df, r).withColumn("__ord", lit(ord))
    }
    (fusedFrame ++ ownFrames).reduce(_.unionByName(_))
      .orderBy("__ord").drop("__ord")
  }
}
