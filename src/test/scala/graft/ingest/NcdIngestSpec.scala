package graft.ingest

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end: fixture zip → distributed convert → partitioned gzip JSON →
  * catalog registration → SQL over the loaded tables. The Spark analog of
  * driving the reference's DataZip.load() against AthenaMock.
  */
class NcdIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val warehouse =
    Files.createTempDirectory("ncd_out_").toString
  private lazy val ingest = {
    val ing = new NcdIngest(spark, warehouse, db = "ncd")
    ing.loadZip(Fixtures.tempZip().toString)
    ing
  }

  test("loads all tables in deterministic order") {
    assert(ingest.loaded.toSeq === Seq(
      "GS_CASE", "GS_COURT_HIST",          // normal, sorted
      "GS_DISTRICT", "GS_OFFENSE",          // global, sorted
      "GS_POSITION"))                       // lookups, sorted
  }

  test("partitioned table gets Hive district layout + MSCK") {
    val dirs = new java.io.File(s"$warehouse/ncd/GS_CASE").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === Array("filename_district=CT", "filename_district=FLM"))
    assert(ingest.ddlLog.exists(_.startsWith("MSCK REPAIR TABLE ncd.GS_CASE")))
    // gzip JSON files inside
    val files = new java.io.File(s"$warehouse/ncd/GS_CASE/filename_district=FLM")
      .listFiles().map(_.getName)
    assert(files.exists(f => f.startsWith("part-") && f.endsWith(".json.gz")))
  }

  test("unpartitioned table (no district suffix) has no partition dirs") {
    val dirs = new java.io.File(s"$warehouse/ncd/GS_COURT_HIST").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(!dirs.exists(_.startsWith("filename_district=")))
    assert(!ingest.ddlLog.exists(
      _.startsWith("MSCK REPAIR TABLE ncd.GS_COURT_HIST")))
  }

  test("normal table queryable with typed values and redaction flags") {
    val df = spark.table("ncd.GS_CASE")
    assert(df.count() === 5)
    import spark.implicits._
    val flm = df.filter($"filename_district" === "FLM")
    assert(flm.count() === 4)
    val redactedDates = df.filter($"redacted_FILE_DATE").count()
    assert(redactedDates === 1)
    val loss = df.filter($"CASEID" === 1L)
      .select($"TOTAL_LOSS").as[Double].head()
    assert(loss === 1234.50)
  }

  test("district filter prunes to one partition directory") {
    import spark.implicits._
    val plan = spark.table("ncd.GS_CASE")
      .filter($"filename_district" === "FLM")
      .queryExecution.executedPlan.toString
    // partition pruning: only the FLM directory is scanned
    assert(!plan.contains("filename_district=CT"))
  }

  test("district filter scans EXACTLY the one matching partition's files") {
    // The layout's entire query-side payoff (the reference partitions for
    // this: ncd/athena.py:101-109) asserted at plan level, not directory
    // naming: the pushed partition predicate must reach the file-source
    // scan and cut the selected partitions to exactly one, whose files
    // all live under the matching Hive directory.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val df = spark.table("ncd.GS_CASE").filter($"filename_district" === "CT")
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in the executed plan"))
    // the predicate was classified as a partition filter (the
    // PruneFileSourcePartitions path), not a post-scan data filter
    assert(scan.partitionFilters.exists(_.toString.contains("filename_district")))
    val selected = scan.selectedPartitions
    assert(selected.partitionCount === 1)
    val scannedFiles = selected.toPartitionArray.map(_.urlEncodedPath)
    assert(scannedFiles.nonEmpty)
    assert(scannedFiles.forall(_.contains("filename_district=CT")))
    // and it genuinely pruned: the table has more data files than the scan
    val allFiles = Seq("CT", "FLM").flatMap { d =>
      Option(new java.io.File(s"$warehouse/ncd/GS_CASE/filename_district=$d")
        .listFiles()).toSeq.flatten.filter(_.getName.startsWith("part-"))
    }
    assert(scannedFiles.length < allFiles.length)
    // unpruned twin reads every partition — the counter-witness
    val full = spark.table("ncd.GS_CASE")
    val fullScan = full.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    assert(fullScan.selectedPartitions.partitionCount === 2)
  }

  test("global tables load all-string with boolean flags") {
    val df = spark.table("ncd.GS_DISTRICT")
    assert(df.columns.toSeq === Seq("CODE", "NAME", "redacted_CODE",
      "redacted_NAME"))
    import spark.implicits._
    val name = df.filter($"CODE" === "FLM").select($"NAME").as[String].head()
    assert(name === "Middle District of Florida")
  }

  test("lookup table loads with camelCase-normalized headers") {
    val df = spark.table("ncd.GS_POSITION")
    assert(df.columns.take(3).toSeq ===
      Seq("POSITION_CODE", "DESCRIPTION", "ACTIVE_FLAG"))
    import spark.implicits._
    // redacted cell: empty-string value + flag true (global-table quirk)
    val red = df.filter($"redacted_POSITION_CODE")
    assert(red.count() === 1)
    assert(red.select($"POSITION_CODE").as[String].head() === "")
  }

  test("join loaded case table to loaded codebook (the Athena use case)") {
    val out = spark.sql(
      """SELECT d.NAME, count(*) AS n
        |FROM ncd.GS_CASE c JOIN ncd.GS_DISTRICT d
        |  ON c.filename_district = d.CODE
        |GROUP BY d.NAME ORDER BY d.NAME""".stripMargin).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(
      ("District of Connecticut", 1L),
      ("Middle District of Florida", 4L)))
  }

  test("parquet mirror registers a splittable columnar twin") {
    val wh = Files.createTempDirectory("ncd_mirror_").toString
    val ing = new NcdIngest(spark, wh, db = "ncdm", parquetMirror = true)
    ing.loadZip(Fixtures.tempZip().toString)
    import spark.implicits._
    val mirror = spark.table("ncdm.GS_CASE_parquet")
    assert(mirror.count() === 5)
    // partition column survives the mirror and prunes
    assert(mirror.filter($"filename_district" === "FLM").count() === 4)
    // values identical to the JSON-backed table
    val a = spark.table("ncdm.GS_CASE").select("CASEID", "TOTAL_LOSS")
      .collect().map(_.toString).sorted
    val b = mirror.select("CASEID", "TOTAL_LOSS")
      .collect().map(_.toString).sorted
    assert(a === b)
  }

  test("warehouse accepts an explicit Hadoop FS URI (the s3a:// code path)") {
    // same code path a real bucket takes: the warehouse is an arbitrary
    // Hadoop FS URI string (here file://, on a cluster s3a://) — writes,
    // DDL LOCATION, and MSCK all go through the Hadoop FileSystem API
    val dir = Files.createTempDirectory("ncd_uri_")
    val wh = s"file://$dir"
    val ing = new NcdIngest(spark, wh, db = "ncduri")
    ing.loadZip(Fixtures.tempZip().toString)
    assert(spark.table("ncduri.GS_CASE").count() === 5)
    import spark.implicits._
    assert(spark.table("ncduri.GS_CASE")
      .filter($"filename_district" === "FLM").count() === 4)
    // the registered location carries the scheme
    val loc = spark.sql("DESCRIBE TABLE EXTENDED ncduri.GS_CASE")
      .filter($"col_name" === "Location").select("data_type").as[String].head()
    assert(loc.startsWith("file:/"))
  }

  test("second zip accumulates districts per-partition (reference " +
      "athena.py:92-111 key layout)") {
    // zip B revises FLM (one row, caseid 6) and adds NY; it carries no
    // CT file and no court-hist member. After loading it on top of zip
    // A: CT must SURVIVE (static whole-table overwrite would wipe it),
    // FLM must be exactly zip B's revision, NY must appear, and
    // GS_COURT_HIST must be untouched.
    import spark.implicits._
    val wh = Files.createTempDirectory("ncd_multi_").toString
    val ing = new NcdIngest(spark, wh, db = "ncdmulti")
    ing.loadZip(Fixtures.tempZip().toString)
    ing.loadZip(Fixtures.tempZipB().toString)
    val byDistrict = spark.table("ncdmulti.GS_CASE")
      .groupBy("filename_district")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max("CASEID").as("mx"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(byDistrict.map(t => (t._1, t._2)).toSeq ===
      Seq(("CT", 1L), ("FLM", 1L), ("NY", 1L)))
    assert(byDistrict.collect { case ("FLM", _, mx) => mx }.head === 6L)
    assert(spark.table("ncdmulti.GS_COURT_HIST").count() === 3)
  }

  test("DDL log captures CREATE DATABASE / CREATE TABLE golden shapes") {
    assert(ingest.ddlLog.head === "CREATE DATABASE IF NOT EXISTS ncd")
    val caseDdl = ingest.ddlLog.find(_.contains("ncd.GS_CASE (")).get
    assert(caseDdl.contains("CASEID BIGINT"))
    assert(caseDdl.contains("FILE_DATE DATE"))
    assert(caseDdl.contains("TOTAL_LOSS DOUBLE"))
    assert(caseDdl.contains("redacted_TOTAL_LOSS BOOLEAN"))
    assert(caseDdl.contains("PARTITIONED BY (filename_district)"))
    val lookupDdl = ingest.ddlLog.find(_.contains("ncd.GS_POSITION (")).get
    assert(lookupDdl.contains("POSITION_CODE STRING"))
    assert(lookupDdl.contains("redacted_POSITION_CODE BOOLEAN"))
  }

  test("global-file size gate: a sub-gate member takes the distributed " +
      "split path and loads tables equal to the driver path") {
    // force the gate to 1 byte so global_LIONS.txt exceeds it — the load
    // must dispatch to GlobalSplitter.splitDistributed and produce the
    // SAME registered tables as the whole-string driver path above
    System.setProperty("graft.globalfile.driver.gate.bytes", "1")
    try {
      val wh = Files.createTempDirectory("ncd_gate_").toString
      val ing = new NcdIngest(spark, wh, db = "ncd_gate")
      ing.loadZip(Fixtures.tempZip().toString)
      assert(ing.loaded.toSeq === ingest.loaded.toSeq)
      val a = spark.table("ncd_gate.GS_DISTRICT").orderBy("CODE").collect()
      val b = spark.table("ncd.GS_DISTRICT").orderBy("CODE").collect()
      assert(a.toSeq === b.toSeq)
    } finally System.clearProperty("graft.globalfile.driver.gate.bytes")
  }
}
