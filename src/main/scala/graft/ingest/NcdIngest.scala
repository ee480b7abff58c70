package graft.ingest

import java.nio.file.{Files, Path}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A22: per-zip orchestration — the Spark-native analog of
  * `DataZip.load()` (ncd/data_zip.py:40-52).
  *
  * Driver parses schemas/fragments (they're tiny and must exist before a
  * plan can be declared); executors do all row work. Per-table processing
  * follows the reference's deterministic sorted order. Each normal table's
  * conversion is one narrow, shuffle-free Spark job (all district files
  * unioned, then written with `partitionBy` so the Hive layout matches the
  * reference byte-for-byte in structure).
  *
  * Every emitted DDL statement is recorded in `ddlLog` — the test seam the
  * reference provides via AthenaMock's query log (ncd/athena_mock.py:42-51).
  */
final class NcdIngest(spark: SparkSession, warehouseDir: String,
                      db: String = "ncd",
                      parquetMirror: Boolean = false) {

  val ddlLog: mutable.Buffer[String] = mutable.Buffer.empty
  /** Tables loaded, in load order. */
  val loaded: mutable.Buffer[String] = mutable.Buffer.empty

  private def runDdl(sql: String): Unit = {
    ddlLog += sql
    spark.sql(sql)
  }

  private def tableLocation(table: String): String =
    s"$warehouseDir/$db/$table"

  def createDatabase(): Unit = runDdl(Sink.createDatabaseSql(db))

  /** Load every table in the zip: normal (fixed-width) tables first, then
    * global_LIONS.txt stacked tables, then table_gs_* lookups.
    */
  def loadZip(zipPath: String): Seq[String] = {
    createDatabase()
    val alreadyLoaded = loaded.size
    val zip = new ZipSource(zipPath)
    val scratch = Files.createTempDirectory("ncd_zip_")
    try {
      val schemas =
        if (zip.hasMember("README.TXT"))
          SchemaParser.parse(zip.readMember("README.TXT", "ISO-8859-1"))
        else Map.empty[String, TableSpec]

      schemas.keys.toSeq.sorted.foreach { name =>
        loadNormalTable(zip, schemas(name), scratch)
      }
      loadGlobalTables(zip)
      loadLookupTables(zip)
      loaded.drop(alreadyLoaded).toSeq
    } finally {
      zip.close()
      // writes are eager (each table lands before the next extraction), so
      // the extracted members are dead weight the moment loadZip returns —
      // without this, a 24-zip ImportAll accumulates GBs of scratch on the
      // driver for the process lifetime.
      deleteRecursively(scratch)
    }
  }

  private def deleteRecursively(dir: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(dir)) {
      val walk = Files.walk(dir)
      // the walk stream holds open directory handles — close it before
      // deleting, or a 24-zip ImportAll leaks one fd per archive
      val paths = try walk.iterator().asScala.toSeq finally walk.close()
      paths.reverseIterator.foreach(Files.deleteIfExists(_))
    }
  }

  /** One normal table: discover district files, convert all of them in one
    * unioned distributed job, write partitioned gzip JSON, register.
    */
  def loadNormalTable(zip: ZipSource, spec: TableSpec,
                      scratch: Path): Unit = {
    val files = zip.dataFilesFor(spec.name)
    if (files.isEmpty) return
    val isPartitioned = !files.keySet.contains(None)

    val frames = files.toSeq.sortBy(_._1) .map { case (district, member) =>
      val path = zip.extractMember(member, scratch)
      val df = FixedWidth.read(spark, path.toString, spec)
      district match {
        case Some(d) if isPartitioned =>
          df.withColumn("filename_district", lit(d))
        case _ => df
      }
    }
    val all = frames.reduce(_ unionByName _)

    val location = tableLocation(spec.name)
    Sink.writeJson(all, location, isPartitioned)
    val ddl = Sink.normalTableDdl(db, spec, isPartitioned, location)
    ddlLog += ddl
    spark.sql(ddl)
    if (isPartitioned) runDdl(s"MSCK REPAIR TABLE $db.${spec.name}")
    if (parquetMirror) mirror(all, spec.name, isPartitioned)
    loaded += spec.name
  }

  /** The splittable columnar twin of a loaded table, registered as
    * `<table>_parquet` — the format analytical queries should scan at
    * scale (gzip JSON-lines exists for reference layout fidelity; it is
    * non-splittable and row-oriented).
    */
  private def mirror(df: org.apache.spark.sql.DataFrame, table: String,
                     isPartitioned: Boolean): Unit = {
    val location = s"${tableLocation(table)}__parquet"
    Sink.writeParquetMirror(df, location, isPartitioned)
    val cols = df.schema.map(f => s"    ${f.name} ${f.dataType.sql}")
      .mkString(",\n")
    val partitionClause =
      if (isPartitioned) "\nPARTITIONED BY (filename_district)" else ""
    runDdl(s"""CREATE TABLE IF NOT EXISTS $db.${table}_parquet (
              |$cols
              |)
              |USING parquet$partitionClause
              |LOCATION '$location'""".stripMargin)
    if (isPartitioned) runDdl(s"MSCK REPAIR TABLE $db.${table}_parquet")
  }

  /** A13/A14: the stacked global file, if present.
    *
    * Size-gated dispatch (round-9 verdict #7): the driver-side
    * whole-file `split` assumes the dump fits in one JVM string — true
    * of every reference dump, but an ASSUMPTION, not a property. Past
    * the gate (or when the archive doesn't record a size) the member is
    * extracted and split via the executor-side tagged pass
    * (`splitDistributed`), which holds only codebook-sized fragments on
    * the driver. Equality of the two paths is spec'd in ParserSpec /
    * NcdIngestSpec.
    */
  def loadGlobalTables(zip: ZipSource): Unit = {
    if (!zip.hasMember("global_LIONS.txt")) return
    val size = zip.memberSize("global_LIONS.txt")
    val tables =
      if (size >= 0 && size <= NcdIngest.GlobalFileDriverGateBytes)
        GlobalSplitter.split(zip.readMember("global_LIONS.txt", "UTF-8"))
      else {
        val tmp = Files.createTempDirectory("ncd_global_")
        try {
          val p = zip.extractMember("global_LIONS.txt", tmp)
          // splitDistributed collects its codebook-sized fragments before
          // returning, so the extracted copy is safe to delete right after
          GlobalSplitter.splitDistributed(spark, p.toString)
        } finally deleteRecursively(tmp)
      }
    tables.keys.toSeq.sorted.foreach { name =>
      loadStringTable(name, RulerParser.parse(tables(name)))
    }
  }

  /** A15: each table_gs_* codebook file. */
  def loadLookupTables(zip: ZipSource): Unit = {
    zip.memberNames.filter(_.startsWith("table_gs_")).sorted.foreach { m =>
      val (name, table) = LookupParser.parseTable(zip.readMember(m, "ISO-8859-1"))
      loadStringTable(name, table)
    }
  }

  /** Codebooks are tiny (hundreds of rows): build driver-side, then write
    * through the same distributed sink so layout/DDL stay uniform.
    */
  def loadStringTable(name: String, table: RulerParser.StringTable): Unit = {
    val schema = StructType(
      table.dataColumns.map(c => StructField(c, StringType)) ++
        table.dataColumns.map(c => StructField(s"redacted_$c", BooleanType)))
    val rows = table.rows.map { case (data, flags) =>
      Row.fromSeq(data ++ flags)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)

    val location = tableLocation(name)
    Sink.writeJson(df, location, partitioned = false)
    runDdl(Sink.stringTableDdl(db, name, table.allColumns, location))
    loaded += name
  }
}

object NcdIngest {
  /** Driver-side whole-string budget for global_LIONS.txt: a UTF-16
    * JVM string costs ~2 bytes/char plus the raw byte[] during decode,
    * so 256 MB uncompressed stays well inside an 8 GiB driver; anything
    * larger (or of unrecorded size) takes the distributed tagged-pass
    * split. Overridable for tests via the system property.
    */
  private[ingest] def GlobalFileDriverGateBytes: Long =
    sys.props.get("graft.globalfile.driver.gate.bytes").map(_.toLong)
      .getOrElse(256L * 1024 * 1024)
}
