package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps.hash32

/** The partition-integrity manifest core shared by batch q191
  * (`TrainingQueries.manifestOf`), the streaming twin
  * (`StreamSessionize.manifestStream`), and q194's pruning step — ONE
  * definition of the row hash and the aggregation, so the batch/stream
  * twins and the change detector can never drift apart. (The DuckDB
  * oracle strings in q191/q194 necessarily restate the formula in SQL;
  * the oracle gate and the stream parity gate pin all three to each
  * other.)
  */
object Manifest {

  /** Null-safe row content hash over (doc_id, lang, n_chars, md5(text)).
    * Every field is coalesced to an explicit sentinel BEFORE
    * concatenation: Spark's concat_ws silently skips null fields, which
    * would both diverge from the oracle's `||` chain (null-propagating)
    * and make a NULL field hash identically to an empty one — a content
    * difference an integrity witness must see. The sentinel contains a
    * character ('@') that cannot appear in the numeric fields and makes
    * collision with real lang values implausible.
    */
  def rowHash: Column = hash32(concat(
    coalesce(col("doc_id").cast("string"), lit("@null@")), lit("|"),
    coalesce(col("lang"), lit("@null@")), lit("|"),
    coalesce(col("n_chars").cast("string"), lit("@null@")), lit("|"),
    coalesce(md5(col("text")), lit("@null@"))))

  /** Per-partition manifest: row count, key range, byte total, Σ-hash
    * content fingerprint (commutative BIGINT hash summed in a
    * DECIMAL(38,0) accumulator — partial-aggregation-exact and wrap-free
    * to ~10²⁵ of hash mass — reduced mod 1e9+7 at output).
    *
    * @param withLangs add the distinct-lang count — batch only (a
    *                  DISTINCT aggregation is unsupported over unbounded
    *                  streaming input, and exact distinct state would
    *                  grow with the stream)
    * @param ordered   add the total ORDER BY — batch only
    */
  def manifest(docs: DataFrame, withLangs: Boolean = true,
               ordered: Boolean = true): DataFrame = {
    val grouped = docs
      .select(col("source"), col("doc_id"), col("lang"), col("n_chars"),
        rowHash.as("row_h"))
      .groupBy("source")
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      min("doc_id").as("min_doc"),
      max("doc_id").as("max_doc")) ++
      (if (withLangs) Seq(countDistinct("lang").as("n_langs")) else Nil) ++
      Seq(sum("n_chars").as("total_chars"),
        (sum(col("row_h").cast("decimal(38,0)")) % 1000000007L)
          .cast("long").as("fp"))
    val m = grouped.agg(aggs.head, aggs.tail: _*)
    if (ordered) m.orderBy("source") else m
  }
}
