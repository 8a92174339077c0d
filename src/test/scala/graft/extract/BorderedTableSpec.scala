package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact goldens for the bordered-table serialization, produced by
  * RUNNING the reference's `document.py` (Spec/TableCell/TableRow/
  * Tabular — document.py:376-693) plus a verbatim replay of
  * markdown.py:134-163's TableRow/Tabular assembly on the same cell
  * structures (harness: tools/gen_table_goldens.py). Each case pins one
  * semantic: full \hline grids, header rules, partial \cline runs,
  * double rules (border_tt), bordered multicolumn spans, multirow t/b
  * disabling with placeholder insertion, \multicolumn{1} conversion of
  * spec-disagreeing cells, and the align-less default-'c' column spec.
  */
class BorderedTableSpec extends AnyFunSuite {

  private def body(tableInner: String): String = {
    val d = Extractor.extractHtml("u", s"<body><table id=\"t\">$tableInner</table></body>")
    assert(d.spans.length == 1 && d.spans(0).kind == "table", d.markdown)
    d.spans(0).body
  }

  private def expected(tabular: String): String =
    "\\begin{table}\n" + tabular + "\n\\end{table}"

  private def td(content: String, classes: String, span: String = ""): String =
    s"""<td class="$classes"$span>$content</td>"""

  test("full grid: every cell bordered -> |c| spec and \\hline above/below each row") {
    val cAll = "ltx_align_center ltx_border_t ltx_border_b ltx_border_l ltx_border_r"
    val cRow2 = "ltx_align_center ltx_border_b ltx_border_l ltx_border_r"
    val html =
      s"<tr>${td("a1", cAll)}${td("a2", cAll)}${td("a3", cAll)}</tr>" +
        s"<tr>${td("b1", cRow2)}${td("b2", cRow2)}${td("b3", cRow2)}</tr>"
    assert(body(html) == expected(
      "\\begin{tabular}{|c| |c| |c|}\n\\hline\na1 & a2 & a3 \\\\ \\hline\nb1 & b2 & b3 \\\\ \\hline\n\\end{tabular}"))
  }

  test("header rule: border_b on row 1 only -> \\hline after the header line") {
    val html =
      s"<tr>${td("h1", "ltx_align_left ltx_border_b")}${td("h2", "ltx_align_left ltx_border_b")}</tr>" +
        s"<tr>${td("d1", "ltx_align_left")}${td("d2", "ltx_align_left")}</tr>"
    assert(body(html) == expected(
      "\\begin{tabular}{l l}\nh1 & h2 \\\\ \\hline\nd1 & d2 \\\\\n\\end{tabular}"))
  }

  test("partial cline: one bordered cell -> \\cline{2-2} above its row") {
    val html =
      s"<tr>${td("a", "ltx_align_right")}${td("b", "ltx_align_right")}${td("c", "ltx_align_right")}</tr>" +
        s"<tr>${td("d", "ltx_align_right")}${td("e", "ltx_align_right ltx_border_t")}${td("f", "ltx_align_right")}</tr>"
    assert(body(html) == expected(
      "\\begin{tabular}{r r r}\na & b & c \\\\\n\\cline{2-2}\nd & e & f \\\\\n\\end{tabular}"))
  }

  test("double rule: ltx_border_tt -> \\hline \\hline") {
    val html =
      s"<tr>${td("x", "ltx_align_center ltx_border_tt")}${td("y", "ltx_align_center ltx_border_tt")}</tr>" +
        s"<tr>${td("u", "ltx_align_center")}${td("v", "ltx_align_center")}</tr>"
    assert(body(html) == expected(
      "\\begin{tabular}{c c}\n\\hline \\hline\nx & y \\\\\nu & v \\\\\n\\end{tabular}"))
  }

  test("bordered multicolumn span keeps its own |c| spec and clines only its columns") {
    val html =
      s"<tr>${td("wide", "ltx_align_center ltx_border_b ltx_border_l ltx_border_r", " colspan=\"2\"")}${td("nar", "ltx_align_left")}</tr>" +
        s"<tr>${td("p", "ltx_align_left")}${td("q", "ltx_align_left")}${td("r", "ltx_align_left")}</tr>"
    assert(body(html) == expected(
      "\\begin{tabular}{l l l}\n\\multicolumn{2}{|c|}{wide} & nar \\\\ \\cline{1-2}\np & q & r \\\\\n\\end{tabular}"))
  }

  test("multirow: master loses its bottom rule, placeholder carries it to the last spanned row") {
    val html =
      s"<tr>${td("span", "ltx_align_left ltx_border_t ltx_border_b", " rowspan=\"2\"")}${td("r1", "ltx_align_left ltx_border_t")}</tr>" +
        s"<tr>${td("r2", "ltx_align_left ltx_border_b")}</tr>"
    assert(body(html) == expected(
      "\\begin{tabular}{l l}\n\\hline\n\\multirow{2}{*}{span} & r1 \\\\\n & r2 \\\\ \\hline\n\\end{tabular}"))
  }

  test("spec-disagreeing cell becomes \\multicolumn{1}{...}") {
    val html =
      s"<tr>${td("n1", "ltx_align_left ltx_border_l")}${td("n2", "ltx_align_left")}</tr>" +
        s"<tr>${td("n3", "ltx_align_left ltx_border_l")}${td("odd", "ltx_align_right")}</tr>" +
        s"<tr>${td("n5", "ltx_align_left ltx_border_l")}${td("n6", "ltx_align_left")}</tr>"
    assert(body(html) == expected(
      "\\begin{tabular}{|l l}\nn1 & n2 \\\\\nn3 & \\multicolumn{1}{r}{odd} \\\\\nn5 & n6 \\\\\n\\end{tabular}"))
  }

  test("borders without aligns: column spec defaults to the reference's centered Spec") {
    val html =
      s"<tr>${td("m1", "ltx_border_t")}${td("m2", "ltx_border_t")}</tr>" +
        s"<tr>${td("m3", "")}${td("m4", "")}</tr>"
    assert(body(html) == expected(
      "\\begin{tabular}{c c}\n\\hline\nm1 & m2 \\\\\nm3 & m4 \\\\\n\\end{tabular}"))
  }

  test("ragged rowspan: placeholder index past the short row clamps to append (list.insert parity)") {
    // r5 review regression: Python's list.insert clamps an out-of-range
    // index, ArrayBuffer.insert threw — a whole-page extraction failure
    // on ragged bordered tables. Golden from the reference model:
    // row 2 has ONE cell while the rowspan master sits at index 2.
    val html =
      s"<tr>${td("a", "ltx_align_left ltx_border_t")}${td("b", "ltx_align_left")}${td("c", "ltx_align_left", " rowspan=\"2\"")}</tr>" +
        s"<tr>${td("d", "ltx_align_left")}</tr>"
    assert(body(html) == expected(
      "\\begin{tabular}{l l c}\n\\cline{1-1}\na & b & \\multicolumn{1}{l}{\\multirow{2}{*}{c}} \\\\\nd &  \\\\\n\\end{tabular}"))
  }
}
