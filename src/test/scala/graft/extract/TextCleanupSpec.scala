package graft.extract

import org.scalatest.funsuite.AnyFunSuite

class TextCleanupSpec extends AnyFunSuite {
  import TextCleanup._

  test("ligatures expanded") {
    assert(replaceLigatures("eﬃcient ﬁne ﬂow") == "efficient fine flow")
    assert(replaceLigatures("plain text") == "plain text")
  }

  test("hyphenated line breaks merged") {
    assert(removeHyphens("exam-\nple text") == "example\ntext")
    // chained hyphen: the glue stops when the donor line empties
    assert(removeHyphens("multi-\nline-\nword here") == "multiline-\n\nword here")
    assert(removeHyphens("no hyphens\nat all") == "no hyphens\nat all")
  }

  test("modality splitter separates prose, math, tables") {
    val doc = "Intro text. \\(x+1\\) more. \\[\\sum i\\] End.\n" +
      "\\begin{tabular}{ll}\na & b \\\\\n\\end{tabular}\nTail."
    val m = splitModalities(doc)
    assert(m.math == "\\(x+1\\)\n\\[\\sum i\\]\n")
    assert(m.tables.startsWith("\\begin{tabular}"))
    assert(m.text.contains("Intro text.") && m.text.contains("Tail."))
    assert(!m.text.contains("tabular") && !m.text.contains("\\("))
  }
}
