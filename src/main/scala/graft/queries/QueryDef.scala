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
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
