package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark DataFrame program plus (when expressible) an
  * equivalent ANSI-SQL oracle the driver runs in DuckDB over the same parquet
  * tables. Column names/types and row order must match between the two — the
  * driver sorts columns by name and hash-compares values.
  *
  * Parity rules applied throughout the catalog:
  *   - every computed column is aliased identically on both sides (lowercase);
  *   - every query ends in a total ORDER BY (deterministic row order);
  *   - double aggregates are `round(...)`-ed on both sides so that
  *     summation-order float drift can't flip the hash;
  *   - integer-width quirks (DuckDB BIGINT vs Spark INT, HUGEINT sums) are
  *     normalized with explicit CASTs on both sides.
  *   - HARD RULE (the q315/q323 round-10 escape): DuckDB widens
  *     `sum(<integer>)` to HUGEINT, which pandas renders as float64 — the
  *     driver then hash-fails against Spark's int64 even when every value
  *     is equal, and a Python `==` compare can NOT see it. Every sum-derived
  *     integer column that reaches an oracle's FINAL select must be
  *     `CAST(... AS BIGINT)` there, even when an upstream CTE already "looks"
  *     integral. `scripts/oracle_check.py` lints this (DESCRIBE each oracle,
  *     fail on any HUGEINT output column) and compares dtype families.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
