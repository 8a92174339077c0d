package graft.align

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r5 W2 upgrade: the prediction path is a TRAINED linear
  * hinge classifier (the reference's SGDClassifier objective,
  * split_md_to_pages.py:66-74) rather than the r1-r4 tf-idf
  * nearest-centroid. The "margin fixture" is the r4-verdict failure
  * mode made concrete: a document whose pages are separable only by
  * reweighting a discriminative term that class imbalance dilutes —
  * the centroid form misassigns it, the trained form does not.
  */
class BagOfWordsSpec extends AnyFunSuite {

  test("margin fixture: trained hinge recovers a training label the centroid loses") {
    // Page 0 holds three paragraphs with scattered vocabulary; page 1 is a
    // single sharp paragraph overlapping one of them ('figure echo' vs
    // 'echo echo figure'). Class 0's centroid is DILUTED across its three
    // disparate paragraphs, so querying one of its own training paragraphs
    // cosine-snaps to the sharp single-paragraph class-1 centroid. The
    // trained hinge, optimizing separation rather than similarity to a
    // mean, recovers the paragraph's own label. (Fixture found by
    // exhaustive search over small vocabularies against a Python port of
    // both paths — the first, imbalance-style fixtures did NOT split the
    // classifiers; this one provably does.)
    val sentences = IndexedSeq(
      "beta figure echo", "alpha figure", "echo echo figure", "carbon beta gamma helix delta")
    val targets = IndexedSeq(1, 0, 0, 0)
    val bow = new BagOfWords(sentences, targets)
    val query = "echo echo figure" // == sentences(2), true label 0
    assert(bow.predictCentroid(query) == 1,
      "fixture must actually defeat the centroid form (else it pins nothing)")
    assert(bow.predict(query) == 0,
      "trained hinge must recover the training paragraph's own page")
  }

  test("multiclass: distinct page vocabularies classify to their own page") {
    val sentences = IndexedSeq(
      "alpha first page words here", "alpha continues the first page",
      "beta middle page content words", "beta more middle text",
      "gamma final page words appear", "gamma closing paragraph text")
    val targets = IndexedSeq(0, 0, 1, 1, 2, 2)
    val bow = new BagOfWords(sentences, targets)
    assert(bow.predict("alpha words") == 0)
    assert(bow.predict("beta content") == 1)
    assert(bow.predict("gamma closing") == 2)
  }

  test("deterministic: independent instances agree on every training sentence") {
    val sentences = IndexedSeq(
      "data spark query table", "column filter join merge",
      "sort window batch stream", "value key part row")
    val targets = IndexedSeq(0, 0, 1, 1)
    val a = new BagOfWords(sentences, targets)
    val b = new BagOfWords(sentences, targets)
    sentences.foreach(s => assert(a.predict(s) == b.predict(s)))
  }

  test("degenerate shapes: single class, empty-vocabulary query") {
    val one = new BagOfWords(IndexedSeq("only page text"), IndexedSeq(0))
    assert(one.predict("anything") == 0)
    val two = new BagOfWords(IndexedSeq("left words", "right words"), IndexedSeq(0, 1))
    // a query with no known tokens scores only the intercepts; must
    // still return a valid class deterministically
    assert(Set(0, 1).contains(two.predict("zzz")))
  }
}
