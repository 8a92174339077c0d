package graft.align

import graft.post.FuzzySearch

/** Fuzzy as-of refinement of page-split predictions (J8) — re-derivation
  * of the reference's Splitter (splitter.py:84-348): given a coarse
  * paragraph index from the staircase fit and the first/last words of
  * the neighboring physical pages, locate the exact (paragraph, char)
  * split by bounded fuzzy search over a ±delta paragraph window, in a
  * whitespace/markup-insensitive projection of the text.
  *
  * The projection (`removeSpecialChars`) strips spaces and markdown/TeX
  * decorations so OCR-ish text and serialized markdown compare equal;
  * `countSpecialChars` maps a char offset in the projection back to the
  * original string (fixpoint loop, splitter.py:128-211). Approximate
  * matching uses the repo's Sellers/Ukkonen FuzzySearch (X12) with the
  * reference's edit budget min(len−1, len·0.025 + 5) — the stand-in for
  * fuzzysearch.find_near_matches (splitter.py:324-335).
  *
  * Row-local by design: one Splitter per document inside a map; no
  * Spark state.
  */
final class Splitter(val paragraphs: IndexedSeq[String]) {
  import Splitter._

  private val noSpace: IndexedSeq[String] = paragraphs.map(removeSpecialChars)
  private val paragraphsRev: IndexedSeq[String] = paragraphs.reverse.map(_.reverse)
  private val noSpaceRev: IndexedSeq[String] = noSpace.reverse.map(_.reverse)

  /** Refine a split candidate with both the first words of the new page
    * and the last words of the previous page (splitter.py:213-278).
    * Returns (paragraph index, char offset, confidence).
    */
  def splitFirstLast(index: Int, first: String, last: String,
                     delta: Int = 5): (Int, Int, Double) = {
    val firstSplit = if (first.nonEmpty) Some(split(index, first, delta)) else None
    val lastSplit = if (last.nonEmpty) Some(split(index, last, delta, reverse = true)) else None
    (firstSplit, lastSplit) match {
      case (Some(f), None) => f
      case (None, Some(l)) => l
      case (None, None)    => (index, 0, 0.0)
      case (Some(f @ (gf, cf, sf)), Some(l @ (gl, cl, sl))) =>
        if (cf == cl && gf == gl && (sf > 0.5 || sl > 0.5)) (gl, cl, 1.0)
        else {
          val fKey = removeSpecialChars(first)
          val lKey = removeSpecialChars(last)
          // score both candidate splits against both keys; take the
          // better key column, then the better-scoring side
          val rows = Seq(f, l).map { case (g, c, _) =>
            val fSrc = forwardSource(g, c, fKey.length)
            val lSrc = backwardSource(g, c, lKey.length)
            (indelRatio(fKey, fSrc) * indelRatio(fKey.take(10), fSrc.take(10)),
             indelRatio(lKey, lSrc) * indelRatio(lKey.takeRight(10), lSrc.takeRight(10)))
          }
          val scoreF = math.max(rows(0)._1, rows(1)._1)
          val scoreL = math.max(rows(0)._2, rows(1)._2)
          if (scoreL > scoreF) (gl, cl, scoreL) else (gf, cf, scoreF)
        }
    }
  }

  /** Projected text running forward from split point, length `need`.
    * Only the cut paragraph needs a fresh projection; the rest reuse the
    * constructor's noSpace cache. */
  private def forwardSource(g: Int, c: Int, need: Int): String = {
    val sb = new StringBuilder
    var i = g
    while (i < paragraphs.length && sb.length < need) {
      sb.append(if (i == g) removeSpecialChars(paragraphs(i).drop(c)) else noSpace(i))
      i += 1
    }
    sb.toString.take(need)
  }

  /** Projected text running backward from split point, length `need`. */
  private def backwardSource(g: Int, c: Int, need: Int): String = {
    if (g >= paragraphs.length) return ""
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = g
    var total = 0
    while (i >= 0 && total < need) {
      val cleaned = if (i == g) removeSpecialChars(paragraphs(i).take(c)) else noSpace(i)
      parts.prepend(cleaned)
      total += cleaned.length
      i -= 1
    }
    val joined = parts.mkString
    joined.substring(math.max(0, joined.length - need))
  }

  /** Locate `string` (first words of a page) near paragraph `index`
    * (splitter.py:280-313). `reverse` searches for last-words from the
    * end. Returns (paragraph index, char offset in original paragraph,
    * score).
    */
  def split(index0: Int, string0: String, delta: Int = 5,
            reverse: Boolean = false): (Int, Int, Double) = {
    val (index, string, paras, noSp) =
      if (reverse)
        (paragraphs.length - 1 - index0, string0.reverse, paragraphsRev, noSpaceRev)
      else (index0, string0, paragraphs, noSpace)

    val key = removeSpecialChars(string)
    val startInd = math.max(0, index - delta)
    val corpusSlice = noSp.slice(startInd, index + delta + 1)
    val corp = corpusSlice.mkString
    if (corp.isEmpty) return (index0, 0, 1.0)

    val (ind, score) = findMatch(corp, key)
    // paragraph containing projected offset `ind` (largest breakpoint <= ind)
    var acc = 0
    var local = 0
    var off = ind
    var j = 0
    while (j < corpusSlice.length && acc + corpusSlice(j).length <= ind) {
      acc += corpusSlice(j).length
      local = j + 1
      j += 1
    }
    // clamp to last paragraph if ind lands past the end
    if (local >= corpusSlice.length) { local = corpusSlice.length - 1; acc -= corpusSlice(local).length }
    off = ind - acc

    var globalInd = startInd + local
    var charInd = off
    if (reverse) {
      charInd = noSp(globalInd).length - charInd
      globalInd = paragraphs.length - globalInd - 1
    }
    val add = countSpecialChars(paragraphs(globalInd), charInd)
    (globalInd, charInd + add, score)
  }

  private def findMatch(corp: String, key: String): (Int, Double) = {
    val maxDist = FuzzySearch.defaultMaxDist(key.length)
    if (maxDist <= 0) return (0, 0.0) // reference bails when the budget is 0
    FuzzySearch.find(key, corp, maxDist) match {
      case Some(m) => (math.max(0, m.start), 1.0 - m.dist.toDouble / maxDist)
      case None    => (0, 0.0)
    }
  }
}

object Splitter {

  /** Whitespace/markup-insensitive projection (splitter.py:94-126). */
  def removeSpecialChars(s: String): String =
    s.replace("\\ ", "")
      .replace(" ", "")
      .replace("\n", "")
      .replace("*", "")
      .replace("_", "")
      .replace("^", "")
      .replace("\\[", "")
      .replace("\\]", "")
      .replace("\\(", "")
      .replace("\\)", "")
      .replace("\\right", "")
      .replace("\\left", "")
      .replace("\\sum", "X")
      .replace("{", "")
      .replace("}", "")
      .replace("#", "")
      .replace("[REF]", "")
      .replace("[ENDREF]", "")
      .replace("\\varphi", "\\phi")
      .replace("\\quad", "")
      .replace("\\qquad", "")
      .replace("\\hskip", "")
      .replace("\\vskip", "")
      .replace("\\frac", "")
      .replace("\\rm", "")
      .replace("\\,", "")
      .replace("-", "")
      .toLowerCase

  /** The reference's weighted substring counts (splitter.py:136-164).
    * NOTE: deliberately NOT "chars actually removed" — the reference
    * counts overlapping patterns independently (e.g. "\\ " contributes
    * 1 via " " plus 2 via "\\ " = 3 though only 2 chars vanish), and the
    * fixpoint must reproduce that arithmetic to land on the same offsets.
    */
  private val weightedPatterns: Array[(String, Int)] = Array(
    " " -> 1, "\\ " -> 2, "\n" -> 1, "*" -> 1, "_" -> 1, "^" -> 1,
    "\\[" -> 2, "\\]" -> 2, "\\(" -> 2, "\\)" -> 2,
    "\\right" -> 6, "\\left" -> 5, "\\sum" -> 3, // \sum→X: 4 chars net 3
    "{" -> 1, "}" -> 1, "#" -> 1, "[REF]" -> 5, "[ENDREF]" -> 8,
    "\\varphi" -> 3, "\\quad" -> 5, "\\qquad" -> 6,
    "\\hskip" -> 6, "\\vskip" -> 6, "\\frac" -> 5, "\\rm" -> 3,
    "\\," -> 2, "-" -> 1)

  private def countRemoved(s: String): Int = {
    var total = 0
    var k = 0
    while (k < weightedPatterns.length) {
      val (pat, w) = weightedPatterns(k)
      var i = s.indexOf(pat)
      while (i >= 0) { total += w; i = s.indexOf(pat, i + pat.length) }
      k += 1
    }
    total
  }

  private val decoStart1 = "^[^\\w\\s]*_\\s".r
  private val decoStart2 = "^[^\\w\\s]*\\*\\*?\\s".r
  private val anyNl = "^.\\n".r // '.' must NOT match \n (re.match semantics)
  private val titleSkeleton = java.util.regex.Pattern.compile("#+\\s?\\d*\\s*")
  private val mathStart = "(?<!\\\\)\\\\[\\[\\(]".r
  private val mathEnd = "(?<!\\\\)\\\\[\\])]".r

  /** Map a char offset in the projection back to the original string:
    * grow the prefix until the number of removed chars inside it equals
    * the growth (fixpoint, splitter.py:128-170), then nudge across
    * closing math/markup constructs (splitter.py:171-211).
    */
  def countSpecialChars(s: String, charInd: Int): Int = {
    if (s.isEmpty) return 0
    var add = 0
    var spin = true
    while (spin) {
      val prefix = s.substring(0, math.min(s.length, charInd + add))
      val removed = countRemoved(prefix)
      if (removed == add) spin = false else add = removed
    }
    if (s.length <= charInd + add) add = math.max(0, s.length - 1 - charInd)

    var adjusting = true
    var guard = 4 * s.length + 16 // safety cap; the reference loop can in
                                  // principle ping-pong, we refuse to hang
    while (adjusting && guard > 0) {
      guard -= 1
      val cut = math.max(0, math.min(s.length, charInd + add))
      val rest = s.substring(cut)
      val prefix = s.substring(0, cut)
      // python re.match(r"#+\s?\d*\s*$") — the WHOLE prefix is a bare
      // section-heading skeleton → retreat before it
      val titleLen =
        if (prefix.nonEmpty && titleSkeleton.matcher(prefix).matches()) prefix.length else 0
      if (rest.startsWith("\\]") || rest.startsWith("\\)")) add += 2
      else if ((rest.startsWith(")") || rest.startsWith("]")) && prefix.endsWith("\\")) add += 1
      else if ((rest.startsWith("(") || rest.startsWith("[")) && prefix.endsWith("\\")) add -= 1
      else if (rest.startsWith(" ")) add += 1
      else if (titleLen > 0) add -= titleLen
      else if (decoStart1.findFirstIn(rest).isDefined ||
               decoStart2.findFirstIn(rest).isDefined ||
               anyNl.findFirstIn(rest).isDefined) add += 1
      else adjusting = false
    }

    // if the cut lands inside a math environment, retreat to its start
    val cut = math.max(0, math.min(s.length, charInd + add))
    val rest = s.substring(cut)
    val prefix = s.substring(0, cut)
    mathEnd.findFirstMatchIn(rest).foreach { end =>
      val startM = mathStart.findFirstMatchIn(rest)
      if (startM.isEmpty || startM.get.start > end.start) {
        val inds = mathStart.findAllMatchIn(prefix).map(_.start).toSeq
        if (inds.nonEmpty) add = inds.last - charInd
      }
    }
    add
  }

  /** rapidfuzz.fuzz.ratio / 100 (splitter.py:18-19): normalized indel
    * similarity 2·LCS/(|a|+|b|); 1.0 when both empty.
    */
  def indelRatio(a: String, b: String): Double = {
    val n = a.length; val m = b.length
    if (n + m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    // LCS length, two rows
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        cur(j) = if (a.charAt(i - 1) == b.charAt(j - 1)) prev(j - 1) + 1
                 else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    2.0 * prev(m) / (n + m)
  }
}
