package graft.align

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.MarkdownSerializer.SpanBody
import graft.align.PageAssembler.{PageCaption, assemble}

/** X11 completion: per-page span reintroduction
  * (split_md_to_pages.py:409-445 semantics).
  */
class PageAssemblerSpec extends AnyFunSuite {

  private def marker(i: Int) = "\uE000" + i + "\uE001"

  private val bodies = Vector(
    SpanBody("figure", "fig-1", "Figure: A detailed diagram of the system architecture"),
    SpanBody("table", "tab-1",
      "\\begin{table}\n\\begin{tabular}{ll}\na & b \\\\\n\\end{tabular}\n\\end{table}\nTable 1: measured results summary"),
    SpanBody("footnote", "fn-1", "[^fn-1]: a clarifying footnote body"),
    SpanBody("math_display", "eq-1", "\\[x^2 + y^2 = z^2\\]")
  )

  private val pages = IndexedSeq(
    s"Intro paragraph with a footnote${marker(2)} mark.\nSecond line ${marker(0)} here.",
    s"Math paragraph ${marker(3)} continues.\nAnd the table ${marker(1)} anchor.",
    "" // score-gated page stays empty
  )

  test("inline kinds splice with valid offsets; figure/table markers strip") {
    val out = assemble(pages, bodies)
    assert(out.length == 3)
    // footnote + math spliced in place
    assert(out(0).text.contains("[^fn-1]: a clarifying footnote body"))
    assert(out(1).text.contains("\\[x^2 + y^2 = z^2\\]"))
    // figure/table markers gone, bodies NOT inline
    assert(!out(0).text.contains("\uE000"))
    assert(!out(0).text.contains("system architecture"))
    assert(!out(1).text.contains("\\begin{tabular}"))
    // span offsets index the final page text
    out.foreach(_.spans.foreach { s =>
      assert(out.exists(p => p.spans.contains(s) &&
        p.text.substring(s.start, s.end) == s.body))
    })
  }

  test("captions reattach figure/table bodies to their pages (ratio >= 0.8)") {
    val caps = Seq(
      PageCaption(0, "Figure", "Figure: A detailed diagram of the system architecture"),
      PageCaption(1, "Table", "Table 1: measured results summary"))
    val out = assemble(pages, bodies, caps)
    assert(out(0).text.endsWith("Figure: A detailed diagram of the system architecture"))
    assert(out(0).spans.exists(s => s.kind == "figure" &&
      out(0).text.substring(s.start, s.end) == s.body))
    // table matched via its caption tail AFTER \end{table} (reference quirk)
    assert(out(1).text.contains("\\begin{tabular}"))
    assert(out(1).spans.exists(_.kind == "table"))
  }

  test("weak captions do not attach; empty pages never receive bodies") {
    val caps = Seq(
      PageCaption(0, "Figure", "totally unrelated caption text zzz"),
      PageCaption(2, "Figure", "Figure: A detailed diagram of the system architecture"))
    val out = assemble(pages, bodies, caps)
    assert(!out(0).text.contains("system architecture"))
    assert(out(2).text.isEmpty)
  }

  test("alignAndAssemble recovers page content end-to-end") {
    // build a 2-page doc whose serialized form is the page text verbatim
    val paras = IndexedSeq(
      "First page paragraph one about methods and data here now",
      "First page paragraph two with more detailed prose lines",
      "Second page paragraph one concluding the short document text",
      "Second page paragraph two with final remarks and words")
    val pageParas = IndexedSeq(paras.take(2), paras.drop(2))
    val ser = graft.extract.MarkdownSerializer.Serialized(
      paras.mkString("\n\n"), Vector.empty)
    val out = PageAssembler.alignAndAssemble(pageParas, ser)
    assert(out.length == 2)
    assert(out(0).text.contains("paragraph one about methods"))
    assert(out(1).text.contains("concluding the short document"))
    assert(!out(0).text.contains("concluding"))
  }
}
