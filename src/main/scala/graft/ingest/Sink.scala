package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A10-A12 + A17-A20: gzipped JSON-lines sink with Hive-style district
  * partitions, plus catalog DDL.
  *
  * The reference uploads one `.json.gz` object per table/district to S3 and
  * points an Athena external table at it (ncd/athena.py:92-113,
  * ncd/normal_table.py:137-198). Here `DataFrameWriter` produces the same
  * layout (`<base>/<db>/<table>[/filename_district=XX]/part-*.json.gz`) —
  * on a cluster the same call writes through the S3A committer — and the
  * catalog entry is a Spark `CREATE TABLE ... USING json` (the drop-in for
  * `CREATE EXTERNAL TABLE ... JsonSerDe`), with `MSCK REPAIR TABLE` mapped
  * to `recoverPartitions`.
  *
  * Note gzip JSON is non-splittable: one task per file on read, exactly
  * mirroring the reference's one-object-per-district parallelism. The
  * idiomatic scale path is the parquet mirror (`writeParquetMirror`) — same
  * schema, splittable, columnar, an order of magnitude faster to scan.
  */
object Sink {

  /** A17. */
  def createDatabaseSql(db: String): String =
    s"CREATE DATABASE IF NOT EXISTS $db"

  /** A18: normal-table DDL (2N columns, optional district partition). */
  def normalTableDdl(db: String, spec: TableSpec, isPartitioned: Boolean,
                     location: String): String = {
    val dataCols = spec.fields.map(f => s"    ${f.name} ${f.oracleType.ddlType}")
    val flagCols = spec.fields.map(f => s"    redacted_${f.name} BOOLEAN")
    val partitionClause =
      if (isPartitioned) "\nPARTITIONED BY (filename_district)" else ""
    val partitionCol =
      if (isPartitioned) ",\n    filename_district STRING" else ""
    s"""CREATE TABLE IF NOT EXISTS $db.${spec.name} (
       |${(dataCols ++ flagCols).mkString(",\n")}$partitionCol
       |)
       |USING json
       |OPTIONS (compression 'gzip')$partitionClause
       |LOCATION '$location'""".stripMargin
  }

  /** A19: global/lookup DDL — all STRING data columns + BOOLEAN flags. */
  def stringTableDdl(db: String, name: String, columns: Seq[String],
                     location: String): String = {
    val cols = columns.map { c =>
      val tpe = if (c.startsWith("redacted_")) "BOOLEAN" else "STRING"
      s"    $c $tpe"
    }
    s"""CREATE TABLE IF NOT EXISTS $db.$name (
       |${cols.mkString(",\n")}
       |)
       |USING json
       |OPTIONS (compression 'gzip')
       |LOCATION '$location'""".stripMargin
  }

  /** A12: write the converted rows as gzipped JSON-lines in the reference's
    * partition layout. One file per district partition (`coalesce` per the
    * reference's one-object-per-district upload would bottleneck at scale,
    * so we let Spark keep its natural per-split parallelism).
    */
  def writeJson(df: DataFrame, location: String,
                partitioned: Boolean): Unit = {
    val writer = df.write.mode("overwrite").option("compression", "gzip")
    // dynamic partition overwrite = the reference's per-district object
    // key (athena.py:92-111): a later zip carrying district D replaces
    // ONLY filename_district=D, leaving every other district's data in
    // place — multi-zip loads ACCUMULATE districts. Static overwrite
    // would wipe the whole table location on each zip. Unpartitioned
    // tables upload a single `<table>.json.gz` object in the reference,
    // so whole-location overwrite is exactly right there.
    if (partitioned) writer
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("filename_district").json(location)
    else writer.json(location)
  }

  /** The 100-TB-scale mirror: identical rows, columnar + splittable.
    *
    * `zorder = Some((dimA, dimB, numFiles))` lays the mirror out along the
    * Morton curve of the two dimensions ([[graft.operators.ZOrder.layout]])
    * before writing: each file (and row group) then carries tight min/max
    * ranges on BOTH dimensions, so a 2-D range predicate prunes most of
    * the scan instead of reading every file. Row contents are unchanged —
    * only their file placement.
    */
  def writeParquetMirror(df: DataFrame, location: String,
                         partitioned: Boolean,
                         zorder: Option[(String, String, Int)] = None): Unit = {
    val laid = zorder.fold(df) { case (dimA, dimB, numFiles) =>
      graft.operators.ZOrder.layout(df, df.col(dimA), df.col(dimB), numFiles)
    }
    val writer = laid.write.mode("overwrite")
    // same per-district overwrite contract as [[writeJson]]
    if (partitioned) writer
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("filename_district").parquet(location)
    else writer.parquet(location)
  }

  /** ORC mirror — the same analytical-mirror contract as
    * [[writeParquetMirror]] for deployments standardized on ORC (both are
    * splittable columnar formats with predicate pushdown and column
    * pruning; OrcMirrorSpec proves the roundtrip and that filters reach
    * the ORC scan).
    */
  def writeOrcMirror(df: DataFrame, location: String,
                     partitioned: Boolean = false): Unit = {
    val writer = df.write.mode("overwrite")
    if (partitioned) writer.partitionBy("filename_district").orc(location)
    else writer.orc(location)
  }

  /** Bucketed catalog table for shuffle-free equi-joins: co-locates rows of
    * repeatedly-joined fact tables on the join key (e.g. CASEID between
    * GS_CASE and GS_COURT_HIST) so the sort-merge join reads pre-shuffled,
    * pre-sorted buckets. Bucketing requires `saveAsTable` (the bucket
    * metadata lives in the catalog, not the files).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** A18/A20: register in the session catalog + discover partitions. */
  def registerTable(spark: SparkSession, ddl: String, db: String,
                    table: String, isPartitioned: Boolean): Unit = {
    spark.sql(ddl)
    if (isPartitioned) spark.sql(s"MSCK REPAIR TABLE $db.$table")
  }
}
