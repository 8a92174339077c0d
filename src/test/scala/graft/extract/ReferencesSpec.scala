package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** X2: bibliography + inline-citation extraction.
  *
  * Reference semantics: `parse_latexml_references`
  * (latexml_parser.py:420-426) collects li.ltx_bibitem entries;
  * `InlineRef` handling (latexml_parser.py:253-273) resolves `a[href^=#bib]`
  * to a citation number — numeric text wins, broken text falls back to the
  * digits of the anchor target.
  */
class ReferencesSpec extends AnyFunSuite {

  private def extract(html: String) = Extractor.extractHtml("u", html)

  private val page =
    """<html><body><article>
      |<p>Prior work <cite><a class="ltx_ref" href="#bib.bib2">2</a></cite> shows this.
      |Also see <a href="#bib.bib3">Smith99: 3</a> and <a href="#bib.bib1">[1]</a>.</p>
      |<h2>References</h2>
      |<ul class="ltx_biblist">
      |<li class="ltx_bibitem" id="bib.bib1">[1] A. Smith. Deep methods. Journal 12.</li>
      |<li class="ltx_bibitem" id="bib.bib2">[2] B. Jones. Fast parsing. Conf 3.</li>
      |<li class="ltx_bibitem" id="bib.bib3">[3] C. Lee. Web tables. Arch 7.</li>
      |</ul>
      |</article></body></html>""".stripMargin

  test("bibliography entries land in the references column") {
    val d = extract(page)
    assert(d.ok)
    assert(d.references.length == 3)
    assert(d.references.map(_.label) == Seq("1", "2", "3"))
    assert(d.references.map(_.id) == Seq("bib.bib1", "bib.bib2", "bib.bib3"))
    assert(d.references.head.title == "A. Smith. Deep methods. Journal 12.")
    assert(d.references.head.raw == "[1] A. Smith. Deep methods. Journal 12.")
  }

  test("reference lines serialize nougat-style with ref spans") {
    val d = extract(page)
    assert(d.markdown.contains("* [1] A. Smith. Deep methods. Journal 12."))
    assert(d.markdown.contains("* [2] B. Jones. Fast parsing. Conf 3."))
    val refSpans = d.spans.filter(_.kind == "ref")
    assert(refSpans.length == 3)
    refSpans.foreach { s =>
      assert(d.markdown.substring(s.start, s.end) == s.body)
      assert(s.body.startsWith("* ["))
    }
  }

  test("inline citations resolve per the reference's InlineRef rules") {
    val d = extract(page)
    // numeric text → the text; broken "Smith99: 3" → digits of #bib.bib3;
    // "[1]" (neither) → kept as plain text
    assert(d.markdown.contains("Prior work [2] shows this."))
    assert(d.markdown.contains("Also see [3] and [1]."))
    // citation markers must not be italicized by the <cite> wrapper
    assert(!d.markdown.contains("_[2]_"))
  }

  test("a references heading alone (no bib classes) still triggers parsing") {
    val d = extract(
      """<html><body><article><h2>Bibliography</h2>
        |<ol><li>First entry text here.</li><li>Second entry text here.</li></ol>
        |</article></body></html>""".stripMargin)
    assert(d.references.map(_.label) == Seq("1", "2"))
    assert(d.references.head.id == "bib-1") // counter id when no id attr
    assert(d.markdown.contains("* [1] First entry text here."))
  }

  test("a nav list AFTER the bibliography is not mistaken for references") {
    val d = extract(
      """<html><body><article><h2>References</h2>
        |<ol><li>Real entry one text.</li><li>Real entry two text.</li></ol>
        |<ul><li><a href="/home">Home</a></li><li><a href="/about">About</a></li></ul>
        |</article></body></html>""".stripMargin)
    assert(d.references.length == 2)
    assert(!d.markdown.contains("Home"))
  }

  test("an ordinary list after a non-references heading is untouched") {
    val d = extract(
      """<html><body><article><h2>Methods</h2>
        |<ul><li>Alpha point one.</li><li>Beta point two.</li></ul>
        |</article></body></html>""".stripMargin)
    assert(d.references.isEmpty)
    assert(d.markdown.contains("* Alpha point one."))
  }

  test("link-dense bibliographies survive the boilerplate filter") {
    val items = (1 to 6).map(k =>
      s"""<li class="ltx_bibitem"><a href="https://doi.org/10.$k">D. Author$k, Paper $k</a></li>""").mkString
    val d = extract(s"""<html><body><article><p>Body text stays.</p>
      |<h2>References</h2><ul>$items</ul></article></body></html>""".stripMargin)
    assert(d.references.length == 6)
    assert(d.markdown.contains("* [4]"))
  }

  test("synthetic refs family produces ref spans and citations end-to-end") {
    // find a refs-family row in the frozen corpus
    val i = (0L to 400L).find(k => graft.gen.SyntheticCorpus.familyOf(42L, k) == "refs").get
    val p = graft.gen.SyntheticCorpus.pageFor(42L, i)
    val d = Extractor.extract(p.url, p.html)
    assert(d.ok)
    assert(d.references.nonEmpty)
    assert(d.spans.exists(_.kind == "ref"))
    assert(d.references.head.label == "1")
  }
}
