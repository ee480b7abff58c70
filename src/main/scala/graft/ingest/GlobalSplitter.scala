package graft.ingest

import scala.util.matching.Regex

/** A13: split `global_LIONS.txt` into its stacked per-table fragments.
  *
  * Each table is introduced by a bare `^[A-Z]\S+$` name line followed by a
  * blank line; the fragment runs until the next such name line
  * (ncd/global_file.py:125-167). Driver-side pure string work — fragments
  * are codebook-sized.
  */
object GlobalSplitter {

  private val NameLine: Regex = "(?m)^([A-Z]\\S+)$".r
  private val NextName: Regex = "(?m)\\n*^[A-Z]\\S+$\\s*".r

  /** Returns (tableName -> `header\nruler\nrows` fragment), insertion order
    * = first occurrence; duplicate names keep the first occurrence's start
    * (matching the reference's first-match `re.search` semantics).
    */
  def split(content: String): Map[String, String] = {
    val names = NameLine.findAllMatchIn(content).map(_.group(1)).toVector
    if (names.isEmpty) return Map.empty

    val starts = names.distinct.map { name =>
      val headerRe = ("(?m)^" + Regex.quote(name) + "\\n\\n").r
      headerRe.findFirstMatchIn(content) match {
        case Some(m) => Some(name -> m.end)
        case None    => None // name line not followed by blank line: skip
      }
    }.flatten

    val sortedByPos = starts.sortBy(_._2)
    sortedByPos.zipWithIndex.map { case ((name, start), i) =>
      val hardEnd =
        if (i + 1 < sortedByPos.size) {
          // end at the *name line* of the next table, not its content start
          val nextName = sortedByPos(i + 1)._1
          val nameRe = ("(?m)^" + Regex.quote(nextName) + "$").r
          nameRe.findAllMatchIn(content)
            .find(m => m.start > start).map(_.start).getOrElse(content.length)
        } else content.length
      var fragment = content.substring(start, hardEnd)
      // defensively truncate at any embedded bare name line (reference does
      // the same second-pass trim, ncd/global_file.py:159-162)
      NextName.findFirstMatchIn(fragment).foreach { m =>
        fragment = fragment.substring(0, m.start)
      }
      name -> fragment.trim
    }.toMap
  }
}
