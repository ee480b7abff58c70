package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import org.apache.hadoop.fs.Path

import graft.TestSpark
import graft.sources.MockObjectStore

/** §2-A12's object-store proof: the full ingest (fixed-width parse →
  * gzipped JSON-lines sink → DDL LOCATION → MSCK) against a
  * `mocks3://bucket/...` warehouse — a registered Hadoop FileSystem with
  * a bucket authority, the same consumption shape as s3a:// on a real
  * cluster. file:// URIs cannot exercise the authority component or
  * prove the code never shortcuts to java.io.File; this does.
  */
class ObjectStoreSinkSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.sparkContext.hadoopConfiguration
      .set("fs.mocks3.impl", classOf[MockObjectStore].getName)
    s
  }

  test("full ingest into a mocks3:// bucket, readable through the catalog") {
    val wh = "mocks3://warehouse-bucket/ncd"
    val ing = new NcdIngest(spark, wh, db = "ncds3")
    ing.loadZip(Fixtures.tempZip().toString)

    // rows round-trip through the bucket-backed table
    assert(spark.table("ncds3.GS_CASE").count() === 5)
    import spark.implicits._
    assert(spark.table("ncds3.GS_CASE")
      .filter($"filename_district" === "FLM").count() === 4)

    // the registered location carries the bucket scheme + authority
    val loc = spark.sql("DESCRIBE TABLE EXTENDED ncds3.GS_CASE")
      .filter($"col_name" === "Location").select("data_type").as[String].head()
    assert(loc.startsWith("mocks3://warehouse-bucket/"), loc)

    // the physical layout in the bucket is the reference's: Hive-style
    // district partition dirs of gzipped JSON-lines objects
    val conf = spark.sessionState.newHadoopConf()
    val tableDir = new Path(s"$wh/ncds3/GS_CASE") // warehouse/db/table
    val fs = tableDir.getFileSystem(conf)
    assert(fs.isInstanceOf[MockObjectStore])
    val partDirs = fs.listStatus(tableDir).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("filename_district="))
    assert(partDirs.toSet === Set(
      "filename_district=CT", "filename_district=FLM"))
    val objects = fs.listStatus(
        new Path(tableDir, "filename_district=FLM"))
      .filter(_.isFile).map(_.getPath)
    assert(objects.nonEmpty)
    assert(objects.forall(_.getName.endsWith(".json.gz")), objects.mkString)
    // listed object paths stay bucket-qualified (no file:// leakage)
    assert(objects.forall(_.toString.startsWith("mocks3://warehouse-bucket/")))
  }

  test("join across bucket-backed tables (the Athena use case)") {
    val out = spark.sql(
      """SELECT d.NAME, count(*) AS n
        |FROM ncds3.GS_CASE c JOIN ncds3.GS_DISTRICT d
        |  ON c.filename_district = d.CODE
        |GROUP BY d.NAME ORDER BY d.NAME""".stripMargin).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(
      ("District of Connecticut", 1L),
      ("Middle District of Florida", 4L)))
  }
}
