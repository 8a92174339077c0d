package graft.align

/** End-to-end page alignment of a serialized document against its
  * per-page source text — the reference's split_markdown core
  * (split_md_to_pages.py:239-407) re-rooted: label each document
  * paragraph with a page via the BoW classifier (W2), fit the monotone
  * staircase over the noisy labels (W1), then refine each boundary with
  * the first/last words of the adjacent pages via bounded fuzzy search
  * (J8). Returns per-page (paragraph index, char offset, score) splits.
  *
  * Deterministic and row-local: one aligner run per document inside a
  * map partition; the only inputs are the page paragraphs and the
  * document paragraphs.
  */
object PageAligner {

  final case class PageSplit(paragraph: Int, charOffset: Int, score: Double)

  final case class Alignment(
      splits: Vector[PageSplit],      // one per page, first is (0,0,1.0)
      labels: Array[Int],             // BoW page label per doc paragraph
      boundaries: Array[Double]) {    // staircase boundaries

    /** Materialize per-page substrings of the document paragraphs. */
    def pages(docParagraphs: IndexedSeq[String], minScore: Double = 0.75): Vector[String] = {
      val ext = splits :+ PageSplit(docParagraphs.length, -1, 1.0)
      (0 until splits.length).map { i =>
        val score = (ext(i).score + ext(i + 1).score) * 0.5
        if (score < minScore) ""
        else {
          val from = ext(i).paragraph
          val until = math.min(docParagraphs.length, ext(i + 1).paragraph + 1)
          if (from >= until) ""
          else {
            val slice = docParagraphs.slice(from, until).toArray
            slice(0) = slice(0).drop(ext(i).charOffset)
            if (ext(i + 1).paragraph < docParagraphs.length) {
              val lastIdx = slice.length - 1
              slice(lastIdx) = slice(lastIdx).take(math.max(0, ext(i + 1).charOffset))
            }
            slice.mkString("\n")
          }
        }
      }.toVector
    }
  }

  /** min_num_words = 22, minlen = 3 per the reference defaults
    * (split_md_to_pages.py:244-245).
    */
  def align(pageParagraphs: IndexedSeq[IndexedSeq[String]],
            docParagraphs: IndexedSeq[String],
            minNumWords: Int = 22,
            minLen: Int = 3): Alignment = {
    require(pageParagraphs.nonEmpty)
    if (pageParagraphs.length == 1 || docParagraphs.isEmpty)
      return Alignment(Vector(PageSplit(0, 0, 1.0)),
        Array.fill(docParagraphs.length)(0), Array.empty)

    // 1) BoW page labels for every document paragraph
    // (training target: page index of each source paragraph)
    val sentences = pageParagraphs.flatten
    val targets = pageParagraphs.zipWithIndex.flatMap { case (ps, i) => ps.map(_ => i) }
    val labels =
      if (sentences.isEmpty) Array.fill(docParagraphs.length)(0)
      else new BagOfWords(sentences.toIndexedSeq, targets.toIndexedSeq).predict(docParagraphs)

    // 2) monotone staircase over the noisy labels
    val nClasses = if (labels.isEmpty) 1 else labels.max + 1
    val fit =
      if (labels.isEmpty) StaircaseFit(Array.empty, Array.empty, Array.empty)
      else Staircase.fit(labels, nClasses)
    // boundaries as paragraph indices; leading 0 like the reference
    val boundaries = 0.0 +: fit.boundaries.map(b => b.toInt.toDouble)

    // 3) fuzzy refinement of each boundary with first/last words
    val splitter = new Splitter(docParagraphs)
    val splits = scala.collection.mutable.ArrayBuffer(PageSplit(0, 0, 1.0))
    var i = 1
    while (i < boundaries.length && i < pageParagraphs.length) {
      val delta = 5 // ceil(uncertainty) + 5; staircase uncertainty is 0 after fit
      val firstWords = headWords(pageParagraphs(i), minNumWords)
      val lastWords = tailWords(pageParagraphs(i - 1), minNumWords)
      if (firstWords.split(" ").count(_.nonEmpty) < 2 ||
          (firstWords.length < minLen && lastWords.length < minLen)) {
        splits += splits.last
      } else {
        val (g, c, s) = splitter.splitFirstLast(boundaries(i).toInt, firstWords, lastWords, delta)
        splits += PageSplit(g, c, s)
      }
      i += 1
    }
    // pages beyond the fitted boundaries repeat the last split
    while (splits.length < pageParagraphs.length) splits += splits.last
    Alignment(splits.toVector, labels, fit.boundaries)
  }

  /** First `n` words of a page (split_md_to_pages.py:351-356). */
  private def headWords(page: IndexedSeq[String], n: Int): String = {
    val words = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = page.iterator
    while (it.hasNext && words.length < n) words ++= it.next().split(" ")
    words.take(n).mkString(" ").trim
  }

  /** Last `n` words of a page (split_md_to_pages.py:357-361). */
  private def tailWords(page: IndexedSeq[String], n: Int): String = {
    val words = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = page.reverseIterator
    while (it.hasNext && words.length < n) {
      words.prependAll(it.next().split(" "))
    }
    words.takeRight(n).mkString(" ").trim
  }
}
