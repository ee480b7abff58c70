package graft.ingest

import scala.util.matching.Regex

/** A5: extract normal-table schemas from a zip's `README.TXT`.
  *
  * Pure driver-side string parsing (no Spark API) — schemas must be known
  * before a distributed plan can be declared, exactly as the reference parses
  * the README before touching data (ncd/data_zip.py:58-134).
  *
  * Table sections are introduced by `^NAME - ` lines; field rows look like
  * `CASEID   NOT NULL   NUMBER   (1:10)` with 1-based inclusive `(start:end)`
  * column ranges.
  */
object SchemaParser {

  private val TableHeader: Regex = "(?m)^([A-Z][^ ]+) - ".r

  // field, optional NOT NULL, type, (start:end) — ncd/data_zip.py:68-73
  private val FieldRow: Regex =
    """(?m)^([A-Z]\S+)\s+(?:NOT NULL)?\s+([A-Z]\S+)\s+\((\d+):(\d+)\)""".r

  /** Parse the full README into per-table specs, keyed by table name. */
  def parse(readme: String): Map[String, TableSpec] = {
    val headers = TableHeader.findAllMatchIn(readme).toVector
    if (headers.isEmpty) return Map.empty

    val fragments = headers.zipWithIndex.map { case (m, i) =>
      val start = m.start
      val end = if (i + 1 < headers.size) headers(i + 1).start else readme.length
      m.group(1) -> readme.substring(start, end)
    }

    fragments.map { case (name, fragment) =>
      name -> TableSpec(name, parseFields(fragment))
    }.toMap
  }

  /** Parse one README fragment's field rows. */
  def parseFields(fragment: String): Seq[FieldSpec] =
    FieldRow.findAllMatchIn(fragment).map { m =>
      val start = m.group(3).toInt
      val end = m.group(4).toInt
      FieldSpec(m.group(1), start, end - start + 1, OracleType.parse(m.group(2)))
    }.toVector
}
