package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.post.Postprocess

class ExtractorSpec extends AnyFunSuite {

  private def md(html: String): String = Extractor.extractHtml("u", html).markdown
  private def doc(html: String) = Extractor.extractHtml("u", html)

  test("plain family: headers, paragraphs, bold/italic, nbsp") {
    val h =
      """<html><body>
        |<h1>The Title</h1>
        |<p>First paragraph with <b>bold</b> and <i>italic&nbsp;words</i>.</p>
        |<h2>Section A</h2>
        |<p>Second paragraph, long enough to keep. It has sentences.</p>
        |</body></html>""".stripMargin
    assert(md(h) ==
      """# The Title
        |
        |First paragraph with **bold** and _italic words_.
        |
        |## Section A
        |
        |Second paragraph, long enough to keep. It has sentences.""".stripMargin)
  }

  test("bold whitespace hoisting") {
    assert(md("<p>a <b> x y </b> b etc.</p>") == "a **x y** b etc.")
  }

  test("boiler family: nav/footer/cookie banners stripped, article kept") {
    val h =
      """<body>
        |<nav><a href="/">Home</a> <a href="/x">X</a></nav>
        |<div class="cookie-banner">We use cookies. Accept?</div>
        |<header><h1>Real Title</h1><div><a href="/l">login</a></div></header>
        |<article><p>The actual article content, which is long enough to keep easily.</p></article>
        |<div id="sidebar"><ul><li><a href="/a">A</a></li><li><a href="/b">B</a></li></ul></div>
        |<footer>Copyright 2026. All rights reserved.</footer>
        |</body>""".stripMargin
    val d = doc(h)
    assert(d.markdown ==
      """# Real Title
        |
        |The actual article content, which is long enough to keep easily.""".stripMargin)
    assert(d.blocks_dropped >= 3)
    assert(d.blocks_kept == 2)
  }

  test("link-density paragraph dropped") {
    val h = "<body><p><a href='/1'>one</a> <a href='/2'>two</a> <a href='/3'>three</a></p>" +
      "<p>Normal content sentence here, with enough words.</p></body>"
    assert(md(h) == "Normal content sentence here, with enough words.")
  }

  test("math family: inline and display spans with deterministic ids") {
    val h = "<body><p>Euler: <math alttext=\"e^{i\\pi}+1=0\"></math> holds.</p>" +
      "<p>Then:</p><math display=\"block\" alttext=\"\\int_0^1 x dx = 1/2\"></math></body>"
    val d = doc(h)
    assert(d.markdown ==
      "Euler: \\(e^{i\\pi}+1=0\\) holds.\n\nThen:\n\n\\[\\int_0^1 x dx = 1/2\\]")
    assert(d.spans.map(s => (s.kind, s.id)) ==
      Vector(("math_inline", "eq-1"), ("math_display", "eq-2")))
    val s0 = d.spans(0)
    assert(d.markdown.substring(s0.start, s0.end) == s0.body)
    assert(s0.body == "\\(e^{i\\pi}+1=0\\)")
  }

  test("tex normalization: synonyms and style commands") {
    assert(TexNormalizer.normalize("\\( a \\le b \\displaystyle c \\)", inline = true) ==
      "\\(a \\leq b c\\)")
    assert(TexNormalizer.normalize("x \\leq y % comment", inline = false) == "\\[x \\leq y\\]")
  }

  test("tex normalization: unicode→TeX table and dot runs (X6)") {
    assert(TexNormalizer.normalize("α ≤ ∑ x · y", inline = true) ==
      "\\(\\alpha \\leq \\sum x \\cdot y\\)")
    assert(TexNormalizer.normalize("a ····· b", inline = true) == "\\(a \\cdots b\\)")
    assert(TexNormalizer.unicodeToLatex("Δx ≈ 90°") == "\\Delta x \\approx 90^{\\circ}")
  }

  test("table family: tabular serialization with colspan and header row") {
    val h =
      """<body><table id="t1"><caption>Results</caption>
        |<tr><th>Name</th><th align="right">Score</th></tr>
        |<tr><td>alpha</td><td align="right">1</td></tr>
        |<tr><td colspan="2">total row</td></tr>
        |</table></body>""".stripMargin
    val d = doc(h)
    assert(d.spans.length == 1)
    val sp = d.spans(0)
    assert(sp.kind == "table" && sp.id == "t1")
    assert(d.markdown.substring(sp.start, sp.end) == sp.body)
    assert(sp.body ==
      """\begin{table}
        |\begin{tabular}{lr}
        |\bf Name & \bf Score \\
        |\hline
        |alpha & 1 \\
        |\multicolumn{2}{l}{total row} \\
        |\end{tabular}
        |\end{table}
        |Results""".stripMargin)
  }

  test("table family: rowspan squares the grid with placeholder cells") {
    val h =
      """<body><table id="r1">
        |<tr><td rowspan="2">span</td><td>a1</td></tr>
        |<tr><td>a2</td></tr>
        |<tr><td>b1</td><td>b2</td></tr>
        |</table></body>""".stripMargin
    val d = doc(h)
    assert(d.spans(0).body ==
      """\begin{table}
        |\begin{tabular}{ll}
        |\multirow{2}{*}{span} & a1 \\
        | & a2 \\
        |b1 & b2 \\
        |\end{tabular}
        |\end{table}""".stripMargin)
  }

  test("lists family: nesting, ordering, definition lists") {
    val h =
      """<body><ul><li>one</li><li>two<ol><li>sub a</li><li>sub b</li></ol></li></ul>
        |<dl><dt>Term</dt><dd>its definition</dd></dl></body>""".stripMargin
    assert(md(h) ==
      """* one
        |* two
        |  1. sub a
        |  2. sub b
        |
        |**Term**: its definition""".stripMargin)
  }

  test("footnote family: hoisted with marker and span") {
    val h = "<body><p>Claim<span class=\"footnote\" id=\"fnA\">the proof</span> stands here.</p></body>"
    val d = doc(h)
    assert(d.markdown == "Claim[^fnA] stands here.\n\n[^fnA]: the proof")
    assert(d.spans.map(_.kind) == Vector("footnote"))
    val sp = d.spans(0)
    assert(d.markdown.substring(sp.start, sp.end) == "[^fnA]: the proof")
  }

  test("empty family: garbage input never fails the row") {
    val d1 = Extractor.extract("u", Array[Byte]())
    assert(!d1.ok && d1.error == "empty-input")
    val d2 = Extractor.extract("u", Array[Byte](0x00, 0x01, -5, -120))
    assert(d2.ok && d2.markdown == "")
    val d3 = doc("   \n\t  ")
    assert(d3.ok && d3.markdown == "")
  }

  test("empty-section pruning: header with no content dropped") {
    val h = "<body><h2>Empty section</h2><h2>Full section</h2><p>Content paragraph, present.</p></body>"
    assert(md(h) == "## Full section\n\nContent paragraph, present.")
  }

  test("repeat family: tail repetition truncated") {
    val base = "A normal opening paragraph that stays. "
    val rep = "This sentence repeats itself endlessly in the tail. "
    val s = base + rep * 8
    val out = Postprocess.truncateRepetitions(s.trim)
    assert(out == (base + rep).trim)
  }

  test("truncateRepetitions: no repetition → unchanged") {
    val s = "Completely ordinary text with no repeating tail whatsoever, just prose."
    assert(Postprocess.truncateRepetitions(s) == s)
  }

  test("hallucinated reference slice removed with MISSING_PAGE_POST splice") {
    val heads = Vector(
      "An ordinary opening paragraph about methodology and data collection.",
      "Results indicate a strong correlation between the variables studied.",
      "The experimental setup used a different apparatus than prior work.",
      "Limitations include sample size and the observational design chosen.",
      "Real paragraph number 5 concludes with directions for future work.")
    val head = heads.mkString("\n")
    val refs = (1 to 25).map(i => s"* [$i] Author $i, Some Repeated Paper Title, 20$i.").mkString("\n")
    val out = Postprocess.removeHallucinatedReferences(head + "\n## References\n" + refs)
    assert(out.slicesRemoved == 1)
    assert(out.text.contains("[MISSING_PAGE_POST]"))
    assert(!out.text.contains("Repeated Paper Title"))
    assert(out.text.contains("Real paragraph number 5"))
  }

  test("closeEnvs balances environments") {
    val s = "\\begin{tabular}{ll}\na & b \\\\"
    assert(Postprocess.closeEnvs(s).endsWith("\\end{tabular}"))
    val ok = "\\begin{tabular}{ll}\n\\end{tabular}"
    assert(Postprocess.closeEnvs(ok) == ok)
  }

  test("markdownCompatible: eq tags, bm, bare urls") {
    assert(Postprocess.markdownCompatible("\\[E=mc^2\\] (3.1)") == "\\[E=mc^2 \\tag{3.1}\\]")
    assert(Postprocess.markdownCompatible("(2) \\[x\\]") == "\\[x \\tag{2}\\]")
    assert(Postprocess.markdownCompatible("\\bm{v}") == "\\mathbf{v}")
    assert(Postprocess.markdownCompatible("see https://a.io/x now") ==
      "see [https://a.io/x](https://a.io/x) now")
    assert(Postprocess.markdownCompatible("[t](https://a.io/x)") == "[t](https://a.io/x)")
  }

  test("artifact fixes: empty citation brackets, PMC math") {
    assert(Postprocess.fixArtifacts("see [], ok") == "see, ok")
    assert(Postprocess.fixArtifacts("* []\nreal line") == "real line")
    assert(Postprocess.fixArtifacts("then _a__bc_ holds") == "then \\(a_{bc}\\) holds")
    assert(Postprocess.fixArtifacts("snake__case stays") == "snake__case stays")
  }

  test("pathological table line killed") {
    val bad = "x " + "& " * 500 + "\n"
    val good = "normal line\n"
    assert(Postprocess.killPathologicalTables(bad + good) == good)
  }

  test("review regressions: marker forging, block-in-inline, after-body, cp1252, amp cells") {
    // 1. span markers cannot be forged via attribute entities
    val forge = doc("<body><p>Click <a href=\"https://e.com/&#xE000;99999999999&#xE001;x\">here</a> for the thing.</p></body>")
    assert(forge.ok && !forge.markdown.exists(c => c == '' || c == ''))
    // 2. block elements inside a list item keep word boundaries
    assert(md("<body><ul><li><p>one</p><p>two</p></li></ul></body>") == "* one\ntwo")
    // 3. <li> implies </p>
    val li = md("<body><ul><li><p>One item here<li>Two item here</ul></body>")
    assert(li.contains("* One item here") && li.contains("* Two item here"))
    // 4. content after a stray </body> survives
    assert(md("<body><p>Before text stays.</p></body></html><div><p>After text stays too.</p></div>")
      .contains("After text stays too."))
    // 5. windows-1252 numeric refs
    assert(md("<body><p>it&#146;s here, fine.</p></body>") == "it’s here, fine.")
    // 6. '&' in table cells escaped (column count preserved)
    val t = doc("<body><table><tr><td>AT&amp;T</td><td>x</td></tr></table></body>")
    assert(t.spans.head.body.contains("AT\\&T & x"))
    // 7. attribute legacy entities not decoded before '='
    val url = doc("<body><p>See <a href=\"https://e.com/?a=1&gte=5\">link text</a> for details about the query thing please.</p></body>")
    assert(url.markdown.contains("https://e.com/?a=1&gte=5"))
    // 8. <pre> interior protected from whitespace normalization
    val pre = doc("<body><pre>x  = 1\ny  = 2</pre><p>Paragraph after, kept.</p></body>")
    assert(pre.markdown.contains("x  = 1\ny  = 2"))
    assert(pre.spans.exists(_.kind == "code"))
    // 9. boilerplate drop is a block boundary
    assert(md("<body><div>Hello before, kept.<aside>ad copy</aside>World after, kept.</div></body>")
      == "Hello before, kept.\n\nWorld after, kept.")
    // 10. <script/> self-closing still consumes raw content
    assert(!md("<body><script/>var tracker = 1;</script><p>Real content here.</p></body>")
      .contains("tracker"))
  }

  test("determinism: same input → byte-identical output, 3 runs") {
    val h = "<body><h1>T</h1><p>Para with <b>bold</b>, x<sup>2</sup> and a <a href='https://e.io'>link</a>.</p>" +
      "<math alttext='a \\le b'></math></body>"
    val outs = (1 to 3).map(_ => doc(h))
    assert(outs.map(_.markdown).distinct.length == 1)
    assert(outs.map(_.spans).distinct.length == 1)
  }

  test("W7 sentinels: EMPTY vs FAIL vs clean (predict.py:178-191 analog)") {
    val cfg = Extractor.default.copy(emitSentinels = true)
    // clean page: no sentinel
    val clean = Extractor.extractHtml("u",
      "<body><p>A perfectly ordinary paragraph that extracts fine.</p></body>", cfg)
    assert(!clean.markdown.contains("MISSING_PAGE"))
    // non-empty input, empty extraction → EMPTY
    val empty = Extractor.extractHtml("u",
      "<body><nav><a href='/a'>only</a> <a href='/b'>links</a></nav></body>", cfg)
    assert(empty.markdown == "[MISSING_PAGE_EMPTY]")
    // page dominated by a degenerate repeating tail → FAIL
    val rep = "This exact sentence repeats forever and ever in the output stream. "
    val failHtml = s"<body><p>${rep * 40}</p></body>"
    val failed = Extractor.extractHtml("u", failHtml, cfg)
    assert(failed.markdown == "[MISSING_PAGE_FAIL]")
    // same page without sentinels keeps the truncated prefix
    val noSent = Extractor.extractHtml("u", failHtml)
    assert(noSent.markdown.startsWith("This exact sentence repeats"))
    // truncation that removes only a small tail is NOT a failure
    val mostlyGood = "A long and substantive opening paragraph about the method. " * 20
    val okDoc = Extractor.extractHtml("u",
      s"<body><p>$mostlyGood</p><p>${"tail repeat phrase here now. " * 4}</p></body>", cfg)
    assert(!okDoc.markdown.contains("MISSING_PAGE"))
  }

  test("exhausted wall-clock budget fails the ROW with error=timeout, not the job") {
    // a page big enough to pass many tick checkpoints; negative budget =
    // already-expired deadline (deterministic regardless of host speed)
    val bigHtml = "<body>" + (1 to 5000).map(i => s"<p>paragraph $i body text</p>").mkString + "</body>"
    val cfg = Extractor.default.copy(timeoutMillis = -1L)
    val d = Extractor.extractHtml("u", bigHtml, cfg)
    assert(!d.ok && d.error == "timeout", s"expected timeout row, got ok=${d.ok} error=${d.error}")
    // the expired deadline must not leak into the next document on the
    // same thread (finally-clear), nor fire with the default 120 s budget
    val healthy = Extractor.extractHtml("u2", "<body><p>A fine page with enough text to keep.</p></body>")
    assert(healthy.ok && healthy.markdown.nonEmpty)
    val bigOk = Extractor.extractHtml("u3", bigHtml)
    assert(bigOk.ok, s"default budget must not misfire: ${bigOk.error}")
  }

  test("timeout rows flow through the mapPartitions entry point without killing it") {
    val cfg = Extractor.default.copy(timeoutMillis = -1L)
    val bigHtml = "<body>" + (1 to 5000).map(i => s"<p>paragraph $i body text</p>").mkString + "</body>"
    val bytes = bigHtml.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val ts = new java.sql.Timestamp(0L)
    val rows = Iterator(
      graft.core.PageRow("a", ts, bytes, "", "en"),
      graft.core.PageRow("b", ts, bytes, "", "en"))
    val out = Extractor.run(rows, cfg).toVector
    assert(out.length == 2 && out.forall(d => !d.ok && d.error == "timeout"))
  }

  test("byte-cap cut inside a multibyte codepoint trims the partial sequence, no cp1252 flip") {
    // html whose cap boundary lands BETWEEN the two bytes of 'é': before
    // the trim the strict utf-8 confirmation failed and the WHOLE page
    // fell back to windows-1252 ('Ã' mojibake on every multibyte char)
    val body = "<html><body><p>héllo wörld begins hére and keeps going." // multibyte early
    val bytes = (body + "é").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val cap = bytes.length - 1 // cuts between 0xC3 and 0xA9 of the final é
    assert((bytes(cap - 1) & 0xFF) == 0xC3 && (bytes(cap) & 0xFF) == 0xA9)
    val cfg = Extractor.default.copy(maxHtmlBytes = cap)
    val d = Extractor.extract("u", bytes, cfg)
    assert(d.markdown.contains("héllo wörld begins hére"), d.markdown)
    assert(!d.markdown.contains("Ã"), s"cp1252 mojibake leaked: ${d.markdown}")
    // a complete trailing sequence at the cap is NOT trimmed
    val whole = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(Extractor.trimIncompleteUtf8(whole).length == whole.length)
    // stray continuation tail (not the cap's doing) is left untouched
    val stray = "ok".getBytes(java.nio.charset.StandardCharsets.UTF_8) :+ 0x97.toByte
    assert(Extractor.trimIncompleteUtf8(stray).length == stray.length)
  }

  test("span offsets always index into final markdown (invariant)") {
    val h =
      """<body><p>P1 <math alttext="x+1"></math> mid.</p><table id="z"><tr><td>c</td></tr></table>
        |<p>tail paragraph, long enough to keep around.</p></body>""".stripMargin
    val d = doc(h)
    assert(d.spans.nonEmpty)
    d.spans.foreach { s =>
      assert(s.start >= 0 && s.end <= d.markdown.length && s.start < s.end)
      assert(d.markdown.substring(s.start, s.end) == s.body)
    }
  }
}
