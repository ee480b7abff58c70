package graft.ingest

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-side zip decompression: the scale path for multi-zip dumps.
  *
  * The reference loads 24 zips sequentially in one Python process
  * (import_all.py:107-108); driver-side extraction ([[ZipSource]]) mirrors
  * that faithfully for one zip. For a whole dump the idiomatic Spark shape
  * is this one: `binaryFile` scan over all archives → one task per zip
  * decompresses its members in place on the executor → every zip of the
  * dump converts in parallel and no bytes ever pass through the driver.
  *
  * Zip members are decompressed from the in-memory archive bytes (a zip
  * needs random access, so each task holds one archive in memory — DOJ
  * dumps are well under executor memory; for larger archives fall back to
  * driver extraction or pre-split storage).
  */
object DistributedZip {

  /** Read one fixed-width member (by regex) from EVERY zip matching the
    * glob, returning (zip_name, member_name, line) rows decoded with the
    * given charset — CR-scrubbed like the single-zip path (A7).
    */
  def memberLines(spark: SparkSession, zipGlob: String,
                  memberPattern: String,
                  charset: String = "ISO-8859-1"): DataFrame = {
    import spark.implicits._
    val pattern = memberPattern // serialize the string, not a Regex
    spark.read.format("binaryFile").load(zipGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val re = pattern.r
        val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
        val out = ArrayBuffer.empty[(String, String, String)]
        var entry = zin.getNextEntry
        while (entry != null) {
          if (!entry.isDirectory && re.findFirstIn(entry.getName).isDefined) {
            val text = new String(zin.readAllBytes(), charset)
              .replace('\r', ' ')
            // emit every line INCLUDING blank ones (a blank line converts
            // to an all-null row, same as the driver-side spark.read.text
            // path and the reference's csvkit pipeline — the two ingest
            // paths must agree on row counts). Only the phantom empty
            // element after a trailing newline is dropped, because
            // spark.read.text does not emit a row for it either.
            val lines = text.split("\n", -1)
            val last = lines.length -
              (if (lines.nonEmpty && lines.last.isEmpty) 1 else 0)
            var i = 0
            while (i < last) {
              out += ((path, entry.getName, lines(i)))
              i += 1
            }
          }
          entry = zin.getNextEntry
        }
        zin.close()
        out
      }
      .toDF("zip_path", "member_name", "value")
  }

  /** Parse one table across every zip of a dump: fixed-width conversion of
    * the matching member in each archive, tagged with its source zip —
    * the cumulative-snapshot comparison query ("how did this table change
    * across monthly dumps") becomes a plain groupBy(zip_name).
    */
  def readTableAcrossZips(spark: SparkSession, zipGlob: String,
                          spec: TableSpec): DataFrame = {
    val memberRe =
      "(?i)^" + spec.name.toLowerCase + "(?:_[A-Z]+)?\\.txt$"
    val lines = memberLines(spark, zipGlob, memberRe)
      .withColumn("source_zip",
        regexp_extract(col("zip_path"), "([^/]+)$", 1))
    FixedWidth.project(lines, spec, keep = Seq("source_zip"))
  }
}
