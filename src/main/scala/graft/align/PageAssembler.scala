package graft.align

import graft.core.Span
import graft.extract.{MarkdownSerializer, SpanReinserter}
import graft.extract.MarkdownSerializer.SpanBody
import graft.post.Postprocess

/** Per-page reconstruction after alignment — the reference's
  * "Reintroduce figures, tables and footnotes" step
  * (split_md_to_pages.py:409-445) completing X11: the serialized
  * document is a SKELETON (span bodies ride opaque markers; the doc_fig
  * analog is the bodies vector), the aligner splits the skeleton into
  * pages, and this assembler rebuilds each page:
  *
  *  - footnote/math/code/ref markers landing inside a page splice their
  *    bodies in place (with final [start,end) offsets per the north rule);
  *  - figure/table bodies do NOT splice — each page-anchored caption
  *    (the pdffigures metadata analog) fuzzy-matches against the
  *    document's figure/table bodies (rapidfuzz-ratio ≥ 0.8, with the
  *    reference's Table quirk: the body is compared AFTER \end{table},
  *    i.e. its caption tail) and the winning body is appended to that
  *    page (split_md_to_pages.py:414-433);
  *  - leftover figure/table markers are stripped
  *    (split_md_to_pages.py:444);
  *  - empty (score-gated) pages stay empty — bodies never attach to them.
  */
object PageAssembler {

  /** One caption record from page-anchored metadata: which page, whether
    * the reference's Table partition rule applies, the caption text. */
  final case class PageCaption(page: Int, figType: String, caption: String)

  final case class AssembledPage(text: String, spans: Vector[Span])

  private def isInline(b: SpanBody): Boolean =
    b.kind != "figure" && b.kind != "table"

  /** The reference's match text: tables compare only the part after
    * \end{table} (the caption the serializer appends) —
    * split_md_to_pages.py:424-426. */
  private def matchText(b: SpanBody, figType: String): String =
    if (figType == "Table") {
      val i = b.body.indexOf("\\end{table}")
      if (i < 0) b.body else b.body.substring(i + "\\end{table}".length)
    } else b.body

  /** Rebuild pages from skeleton page texts + the document's span bodies.
    *
    * @param pageTexts skeleton page slices (Alignment.pages output; ""
    *                  for score-gated pages)
    * @param bodies    the document's span bodies (Serialized.bodies)
    * @param captions  page-anchored figure/table captions (pdffigures
    *                  metadata analog); empty → figure/table markers are
    *                  simply stripped
    */
  def assemble(pageTexts: IndexedSeq[String], bodies: Vector[SpanBody],
               captions: Seq[PageCaption] = Nil,
               minRatio: Double = 0.8): Vector[AssembledPage] = {
    // 1) splice inline kinds; strip figure/table markers
    val base = pageTexts.map { t =>
      val (text, spans, _) = SpanReinserter.reinsertWhere(t, bodies, isInline)
      AssembledPage(text, spans)
    }.toArray

    // 2) caption-matched reattachment of figure/table bodies.
    // Deliberately NO used-body exclusion: the reference runs an
    // independent argmax per caption (split_md_to_pages.py:421-433), so
    // one body CAN attach to several pages when captions are near-equal
    // — reproduced faithfully rather than "fixed"
    val attachable = bodies.zipWithIndex.filter { case (b, _) => !isInline(b) }
    if (attachable.nonEmpty) {
      captions.foreach { cap =>
        if (cap.page >= 0 && cap.page < base.length && base(cap.page).text.nonEmpty) {
          var bestIdx = -1
          var bestRatio = -1.0
          attachable.foreach { case (b, i) =>
            val r = Splitter.indelRatio(matchText(b, cap.figType), cap.caption)
            if (r > bestRatio) { bestRatio = r; bestIdx = i }
          }
          if (bestIdx >= 0 && bestRatio >= minRatio) {
            val b = bodies(bestIdx)
            val page = base(cap.page)
            val cleaned = Postprocess.removePrettyLinebreaks(b.body.strip())
            val start = page.text.length + 2
            base(cap.page) = AssembledPage(
              page.text + "\n\n" + cleaned,
              page.spans :+ Span(b.kind, b.id, start, start + cleaned.length, cleaned))
          }
        }
      }
    }
    base.toVector
  }

  /** Convenience: align + assemble in one call (the split_markdown
    * end-to-end shape). NB the skeleton's marker chars ride through the
    * aligner as ordinary (private-use) characters — like the reference,
    * whose skeleton markdown carries its own placeholders during the
    * split; they are rare enough not to perturb the fuzzy projection. */
  def alignAndAssemble(pageParagraphs: IndexedSeq[IndexedSeq[String]],
                       serialized: MarkdownSerializer.Serialized,
                       captions: Seq[PageCaption] = Nil,
                       minScore: Double = 0.75): Vector[AssembledPage] = {
    val docParagraphs = serialized.markdown.split("\n\n", -1).toIndexedSeq
    val a = PageAligner.align(pageParagraphs, docParagraphs)
    assemble(a.pages(docParagraphs, minScore), serialized.bodies, captions)
  }

  /** Defensive: a page must never leak marker bytes. */
  def clean(p: AssembledPage): AssembledPage =
    p.copy(text = SpanReinserter.stripMarkers(p.text))
}
