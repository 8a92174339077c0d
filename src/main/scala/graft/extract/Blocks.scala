package graft.extract

/** Intermediate document AST between DOM and markdown — our analog of the
  * reference's dataclass tree (/root/reference/nougat/dataset/parser/
  * document.py:34-373), reduced to what web extraction emits. Pure data;
  * built per-row inside mapPartitions, never a Spark type.
  */
sealed trait Inline
final case class ITxt(s: String) extends Inline
final case class IBold(children: Vector[Inline]) extends Inline
final case class IItal(children: Vector[Inline]) extends Inline
final case class ISup(children: Vector[Inline]) extends Inline
final case class ISub(children: Vector[Inline]) extends Inline
final case class ICode(s: String) extends Inline
final case class ILink(target: String, children: Vector[Inline]) extends Inline
/** TeX math; `display` per latexml_parser.py:147-167 semantics. */
final case class IMath(tex: String, display: Boolean, id: String) extends Inline
/** Footnote hoisted out of the paragraph (latexml_parser.py:126-140). */
final case class IFootnote(id: String, body: Vector[Inline]) extends Inline
/** Inline citation to a bibliography entry — `a[href^=#bib]`
  * (`InlineRef`, latexml_parser.py:253-273). `label` is the resolved
  * citation number; `target` the original anchor. */
final case class IRef(target: String, label: String) extends Inline

sealed trait Block
final case class BPara(inlines: Vector[Inline]) extends Block
final case class BHeader(level: Int, inlines: Vector[Inline]) extends Block
final case class BQuote(blocks: Vector[Block]) extends Block
final case class BCode(text: String, id: String) extends Block
final case class BRule() extends Block
final case class BList(ordered: Boolean, items: Vector[Vector[Block]]) extends Block
final case class BFigure(id: String, caption: Vector[Inline]) extends Block
final case class BTable(id: String, caption: Vector[Inline], rows: Vector[Vector[BCell]]) extends Block
final case class BMathBlock(tex: String, id: String) extends Block
/** (term, definition) pairs from dl/dt/dd (document.py:264-306 analog). */
final case class BDefList(items: Vector[(Vector[Inline], Vector[Inline])]) extends Block
/** Bibliography list (X2): `li.ltx_bibitem` family / list after a
  * References heading (parse_latexml_references, latexml_parser.py:420-426). */
final case class BRefList(items: Vector[BRefItem]) extends Block
/** `label` = citation number ("1"); parsed from the item's leading
  * "[n]"/"n." marker, else the 1-based position. */
final case class BRefItem(id: String, label: String, inlines: Vector[Inline])

/** align: 'l' | 'c' | 'r'; colspan/rowspan ≥ 1. `alignSet` records
  * whether the alignment was explicit in the HTML (attr/style/class) —
  * the reference's Spec treats unset align as "" for column-spec voting
  * and prints it as 'c' (document.py:404,458). bt/bb/bl/br are border
  * "sizes" per the reference's Spec.set_border (document.py:439-444):
  * the length of the `ltx_border_` class suffix whose first char names
  * the side — 0 means no rule, 2 (`ltx_border_tt`) a double rule. */
final case class BCell(inlines: Vector[Inline], colspan: Int, rowspan: Int,
                       align: Char, header: Boolean,
                       bt: Int = 0, bb: Int = 0, bl: Int = 0, br: Int = 0,
                       alignSet: Boolean = false)

/** Per-document segmentation counters (north_star metrics). */
final case class SegStats(blocksKept: Int, blocksDropped: Int)

final case class SegResult(blocks: Vector[Block], stats: SegStats)
