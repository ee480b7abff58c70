package graft.ingest

import java.io.File
import java.nio.charset.Charset
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** A3-A4: zip member enumeration, member extraction, and per-table data-file
  * discovery (district suffix → partition value).
  *
  * Driver-side, like the reference (zip is a random-access format; the
  * archive must land whole before members can be read —
  * ncd/data_zip.py:42-50). Members are extracted to a scratch dir so the
  * *executors* can then read them in parallel via `spark.read.text`; for
  * dumps too big for driver disk the alternative is
  * `spark.read.format("binaryFile")` + a `ZipInputStream` flatMap, which
  * trades faithful ordering for executor-side decompression.
  */
final class ZipSource(zipPath: String) extends AutoCloseable {

  private val zip = new ZipFile(new File(zipPath))

  def memberNames: Seq[String] =
    zip.entries().asScala.map(_.getName).toVector

  /** Read a member fully as a string in the given charset. */
  def readMember(name: String, charset: String): String = {
    val entry = zip.getEntry(name)
    require(entry != null, s"no member $name in $zipPath")
    val in = zip.getInputStream(entry)
    try new String(in.readAllBytes(), Charset.forName(charset))
    finally in.close()
  }

  def hasMember(name: String): Boolean = zip.getEntry(name) != null

  /** Uncompressed member size in bytes, or -1 when the archive does not
    * record it — callers gating driver-side whole-member loads must
    * treat -1 as "assume large".
    */
  def memberSize(name: String): Long = {
    val entry = zip.getEntry(name)
    require(entry != null, s"no member $name in $zipPath")
    entry.getSize
  }

  /** Extract a member to `destDir/name` and return the path.
    *
    * Entry names come from an untrusted archive (downloaded off a scraped
    * listing page), so the resolved destination is confined to `destDir`:
    * a zip-slip name like `../../etc/x` or an absolute entry name is
    * rejected instead of writing outside the scratch dir.
    */
  def extractMember(name: String, destDir: Path): Path = {
    val entry = zip.getEntry(name)
    require(entry != null, s"no member $name in $zipPath")
    val base = destDir.toAbsolutePath.normalize()
    val dest = base.resolve(name).normalize()
    require(dest.startsWith(base) && dest != base,
      s"zip entry '$name' escapes the extraction directory")
    Files.createDirectories(dest.getParent)
    val in = zip.getInputStream(entry)
    try Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    dest
  }

  /** A4: `{table}(_DISTRICT)?.txt` member discovery for one normal table
    * (ncd/normal_table.py:224-245). Key None = single file covering all
    * districts; the table is partitioned iff every file has a district.
    */
  def dataFilesFor(tableName: String): Map[Option[String], String] = {
    val pattern: Regex =
      ("^" + Regex.quote(tableName.toLowerCase) + "(?:_([A-Z]+))?\\.txt$").r
    memberNames.flatMap { member =>
      pattern.findFirstMatchIn(member).map(m => Option(m.group(1)) -> member)
    }.toMap
  }

  override def close(): Unit = zip.close()
}
