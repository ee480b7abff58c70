package graft.ingest

import scala.util.matching.Regex

/** A15: extract the single codebook table from a `table_gs_*.txt` file.
  *
  * Layout: metadata line(s), blank line, header + hyphen ruler + data rows,
  * blank line, trailer (ncd/lookup_table.py:45-64). The table name is the
  * first `GS_*` token preceded by whitespace anywhere in the file.
  */
object LookupParser {

  private val BlankRegion: Regex = "(?m)^[\\s]*$".r
  private val TableName: Regex = "(?<=\\s)GS_\\S+".r

  /** Extract (name, fragment) where fragment is `header\nruler\nrows`. */
  def parse(raw: String): (String, String) = {
    val name = TableName.findFirstIn(raw).getOrElse(
      throw new IllegalArgumentException("no GS_* table name found"))

    // the table body sits between the 1st and 2nd blank-line regions
    val blanks = BlankRegion.findAllMatchIn(raw)
      .filter(m => m.start == 0 || raw.charAt(m.start - 1) == '\n')
      .toVector
    require(blanks.size >= 2, "lookup file needs two blank-line regions")
    val fragment = raw.substring(blanks(0).end, blanks(1).start).trim
    (name, fragment)
  }

  /** Full parse to a string table. */
  def parseTable(raw: String): (String, RulerParser.StringTable) = {
    val (name, fragment) = parse(raw)
    (name, RulerParser.parse(fragment))
  }
}
