package graft.extract

/** PDF-text-side cleanup functions (reference: /root/reference/nougat/
  * dataset/utils/pdf_text_extract.py:18-86 and nougat/metrics.py:22-24,
  * 63-83) — ligature replacement, end-of-line de-hyphenation, and the
  * modality splitter used by per-modality evaluation. Pure functions.
  */
object TextCleanup {

  /** X13: typographic-ligature expansion (replace_ligatures). */
  private val ligatures: Array[(Char, String)] = Array(
    'ﬀ' -> "ff", 'ﬁ' -> "fi", 'ﬂ' -> "fl", 'ﬃ' -> "ffi", 'ﬄ' -> "ffl",
    'ﬅ' -> "ft", 'ﬆ' -> "st", 'Æ' -> "AE", 'æ' -> "ae", 'Œ' -> "OE",
    'œ' -> "oe", 'ĳ' -> "ij", 'Ĳ' -> "IJ")
  private val ligMap: Map[Char, String] = ligatures.toMap

  def replaceLigatures(s: String): String = {
    var i = 0
    var any = false
    while (i < s.length && !any) { if (ligMap.contains(s.charAt(i))) any = true; i += 1 }
    if (!any) return s
    val sb = new java.lang.StringBuilder(s.length + 8)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      ligMap.get(c) match {
        case Some(rep) => sb.append(rep)
        case None => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** X13: merge hyphenated line breaks — a line ending in '-' glues its
    * last word to the next line's first word (remove_hyphens,
    * pdf_text_extract.py:24-65).
    */
  def removeHyphens(s: String): String = {
    if (s.indexOf("-\n") < 0) return s
    val lines = scala.collection.mutable.ArrayBuffer.from(s.split("\n", -1))
    var i = 0
    while (i < lines.length - 1) {
      val line = lines(i)
      if (line.endsWith("-") && lines(i + 1).nonEmpty) {
        val next = lines(i + 1)
        val sp = next.indexOf(' ')
        val (w, rest) = if (sp < 0) (next, "") else (next.substring(0, sp), next.substring(sp + 1))
        lines(i) = line.dropRight(1) + w
        lines(i + 1) = rest
        // stay on this line: the glued word may itself end with '-'
        if (!lines(i).endsWith("-")) i += 1
      } else i += 1
    }
    lines.mkString("\n")
  }

  /** X16: split a document into (prose, math, table) modality segments —
    * `split_text` (metrics.py:22-24,63-83): display/inline math and
    * tabular environments are carved out; what remains is prose.
    */
  final case class Modalities(text: String, math: String, tables: String)

  private val mathRe = java.util.regex.Pattern.compile(
    "\\\\\\[.*?\\\\\\]|\\\\\\(.*?\\\\\\)", java.util.regex.Pattern.DOTALL)
  private val tableRe = java.util.regex.Pattern.compile(
    "\\\\begin\\{tabular\\}.*?\\\\end\\{tabular\\}", java.util.regex.Pattern.DOTALL)

  def splitModalities(s: String): Modalities = {
    val tables = new StringBuilder
    val tm = tableRe.matcher(s)
    val afterTables = new java.lang.StringBuilder(s.length)
    var last = 0
    while (tm.find()) {
      afterTables.append(s, last, tm.start)
      tables.append(tm.group()).append('\n')
      last = tm.end
    }
    afterTables.append(s, last, s.length)
    val s2 = afterTables.toString
    val math = new StringBuilder
    val mm = mathRe.matcher(s2)
    val prose = new java.lang.StringBuilder(s2.length)
    last = 0
    while (mm.find()) {
      prose.append(s2, last, mm.start)
      math.append(mm.group()).append('\n')
      last = mm.end
    }
    prose.append(s2, last, s2.length)
    Modalities(prose.toString, math.toString, tables.toString)
  }
}
