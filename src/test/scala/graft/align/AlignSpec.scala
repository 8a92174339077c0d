package graft.align

import org.scalatest.funsuite.AnyFunSuite

class AlignSpec extends AnyFunSuite {

  // --- Splitter projection -------------------------------------------------

  test("removeSpecialChars strips spacing and markup, lowercases") {
    assert(Splitter.removeSpecialChars("Hello  World\n**bold** a_b x^2") == "helloworldboldabx2")
    // NB reference lowercases AFTER the \sum→X substitution, so X → x
    assert(Splitter.removeSpecialChars("\\[x\\] \\(y\\) \\sum_{i} \\frac{a}{b}") == "xyxiab")
    assert(Splitter.removeSpecialChars("[REF]cite[ENDREF] multi-word") == "citemultiword")
  }

  test("indelRatio matches rapidfuzz semantics") {
    assert(Splitter.indelRatio("abc", "abc") == 1.0)
    assert(Splitter.indelRatio("", "") == 1.0)
    assert(Splitter.indelRatio("abc", "") == 0.0)
    // rapidfuzz ratio("abcd","bcde") = 2*3/8 = 0.75
    assert(math.abs(Splitter.indelRatio("abcd", "bcde") - 0.75) < 1e-12)
  }

  test("countSpecialChars maps projected offsets back to the original") {
    // "ab cd" projected = "abcd"; offset 2 (start of 'c') → original 3
    assert(Splitter.countSpecialChars("ab cd", 2) == 1)
    // no specials → identity
    assert(Splitter.countSpecialChars("abcd", 2) == 0)
    // markup before the cut counted by the fixpoint (2), then the
    // decoration rule steps over "**" and " " (→ 5): cut lands on 'c'
    assert(Splitter.countSpecialChars("**ab** cd", 2) == 5)
  }

  test("countSpecialChars matches the reference's overlap-counting arithmetic") {
    // vectors computed by running the reference's literal logic
    // (splitter.py:128-211): "\\ " counts 3 (once via ' ', twice via
    // "\\ ") though only 2 chars vanish; '.' never matches '\n' in the
    // trailing-decoration rule; the end-clamp caps overshoot
    assert(Splitter.countSpecialChars("\\ abc", 2) == 2)
    assert(Splitter.countSpecialChars("a \\ b cdef", 3) == 5)
    assert(Splitter.countSpecialChars("word\n\nmore", 4) == 0)
    assert(Splitter.countSpecialChars("x\n\ny z", 1) == 0)
    assert(Splitter.countSpecialChars("ab \\, cd ef", 4) == 5)
  }

  // --- Splitter search -----------------------------------------------------

  private val paras = IndexedSeq(
    "The quick brown fox jumps over the lazy dog near the riverbank today",
    "A second paragraph about completely different matters entirely unrelated",
    "Machine learning systems require large curated datasets for training",
    "The final section concludes with remarks about future work directions")

  test("split finds the paragraph containing the first words of a page") {
    val sp = new Splitter(paras)
    val (g, c, score) = sp.split(1, "Machine learning systems require large", delta = 3)
    assert(g == 2, s"got paragraph $g")
    assert(c == 0, s"got char $c")
    assert(score > 0.8)
  }

  test("split in reverse locates last words of the previous page") {
    val sp = new Splitter(paras)
    val (g, c, score) = sp.split(2, "different matters entirely unrelated", delta = 3, reverse = true)
    assert(g == 1)
    // boundary after the last words; the reference clamps inside the
    // string (char_ind + add ≤ len − 1), hence length − 1
    assert(c == paras(1).length - 1, s"got char $c")
    assert(score > 0.8)
  }

  test("splitFirstLast agrees on both sides → confidence 1.0") {
    val sp = new Splitter(paras)
    val (g, c, s) = sp.splitFirstLast(2,
      first = "Machine learning systems require large",
      last = "about completely different matters entirely unrelated", delta = 3)
    assert(g == 2 && c == 0)
    assert(s == 1.0)
  }

  test("splitFirstLast falls back to the better-scoring side on conflict") {
    val sp = new Splitter(paras)
    val (g, _, s) = sp.splitFirstLast(2,
      first = "Machine learning systems require large",
      last = "zz qq xx vv kk totally absent words here nowhere", delta = 3)
    assert(g == 2)
    assert(s > 0.5)
  }

  // --- BoW -----------------------------------------------------------------

  test("BagOfWords assigns paragraphs to the page with shared vocabulary") {
    val sentences = IndexedSeq(
      "astronomy telescope galaxy stellar observation",
      "astronomy quasar galaxy redshift measurement",
      "cooking recipe flavor ingredient kitchen",
      "cooking bake oven ingredient dessert")
    val target = IndexedSeq(0, 0, 1, 1)
    val bow = new BagOfWords(sentences, target)
    assert(bow.predict("the telescope observed a distant galaxy") == 0)
    assert(bow.predict("a recipe with a secret ingredient baked in the oven") == 1)
  }

  // --- end-to-end aligner --------------------------------------------------

  private def page(words: String*): IndexedSeq[String] = words.toIndexedSeq

  test("PageAligner recovers page boundaries of a concatenated document") {
    val pages = IndexedSeq(
      page("astronomy telescope galaxy stellar observation light years away",
           "the quasar redshift measurement confirms expansion of the cosmos"),
      page("cooking recipe flavor ingredient kitchen preparation notes here",
           "bake the dessert in the oven until golden brown and serve warm"),
      page("software testing requires careful fixtures and deterministic seeds",
           "continuous integration pipelines run the suite on every commit"))
    val doc = pages.flatten
    val a = PageAligner.align(pages, doc)
    assert(a.splits.length == 3)
    assert(a.splits(0) == PageAligner.PageSplit(0, 0, 1.0))
    assert(a.splits(1).paragraph == 2, a.splits.toString)
    assert(a.splits(2).paragraph == 4, a.splits.toString)
    assert(a.splits(1).charOffset == 0 && a.splits(2).charOffset == 0)

    val rendered = a.pages(doc)
    assert(rendered(0).contains("astronomy telescope") && !rendered(0).contains("cooking"))
    assert(rendered(1).contains("cooking recipe") && !rendered(1).contains("software"))
    assert(rendered(2).contains("software testing"))
  }

  test("PageAligner is deterministic") {
    val pages = IndexedSeq(
      page("alpha beta gamma delta epsilon zeta eta theta"),
      page("one two three four five six seven eight nine ten"))
    val doc = pages.flatten
    val a1 = PageAligner.align(pages, doc)
    val a2 = PageAligner.align(pages, doc)
    assert(a1.splits == a2.splits)
    assert(a1.labels.toSeq == a2.labels.toSeq)
  }

  test("single page document short-circuits") {
    val a = PageAligner.align(IndexedSeq(page("only one page")), IndexedSeq("only one page"))
    assert(a.splits == Vector(PageAligner.PageSplit(0, 0, 1.0)))
  }
}
