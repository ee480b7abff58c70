package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{IngestQueries, MultimodalQueries, QueryDef, Relational, SimilarityQueries, TextQueries, TrainingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full catalog: name -> (Spark program, optional DuckDB oracle SQL). */
  def catalog: Seq[(String, QueryDef)] =
    Relational.defs ++ TextQueries.defs ++ SimilarityQueries.defs ++
      MultimodalQueries.defs ++ TrainingQueries.defs ++ IngestQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog.toMap.apply("q02_agg_pricing_summary")
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (name, qd) => name -> qd.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case (name, QueryDef(_, Some(sql))) => name -> sql }.toMap
}
