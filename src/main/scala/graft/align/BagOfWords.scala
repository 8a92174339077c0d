package graft.align

/** Bag-of-words page classifier (W2) — re-expression of the reference's
  * BagOfWords (split_md_to_pages.py:41-87: CountVectorizer → tf-idf →
  * SGDClassifier) as a DETERMINISTIC tf-idf nearest-centroid (Rocchio)
  * classifier. The reference's SGD with hinge loss is seed-dependent and
  * adds nothing at this corpus size; nearest-centroid over the same
  * tf-idf features is the deterministic twin (documented divergence —
  * same feature space, stable argmax).
  *
  * Feature semantics follow sklearn's defaults: tokens are lowercase
  * runs of ≥2 word chars (token_pattern r"(?u)\b\w\w+\b"), idf is
  * ln((1+n)/(1+df)) + 1 (smooth_idf), vectors are L2-normalized.
  * Row-local: one model per document, trained on its page paragraphs.
  */
final class BagOfWords(sentences: IndexedSeq[String], target: IndexedSeq[Int]) {
  require(sentences.length == target.length && sentences.nonEmpty)

  private val tokenRe = "(?U)\\b\\w\\w+\\b".r

  private def tokensOf(s: String): Seq[String] =
    tokenRe.findAllIn(s.toLowerCase).toSeq

  // vocabulary + document frequencies over the training sentences
  private val (vocab, idf): (Map[String, Int], Array[Double]) = {
    val df = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    sentences.foreach { s =>
      tokensOf(s).distinct.foreach(t => df.update(t, df.getOrElse(t, 0) + 1))
    }
    val terms = df.keys.toArray.sorted // sklearn sorts the vocabulary
    val v = terms.zipWithIndex.toMap
    val n = sentences.length
    val idf = terms.map(t => math.log((1.0 + n) / (1.0 + df(t))) + 1.0)
    (v, idf)
  }

  private def tfidf(s: String): Array[Double] = {
    val vec = new Array[Double](idf.length)
    tokensOf(s).foreach { t =>
      vocab.get(t).foreach(i => vec(i) += 1.0)
    }
    var i = 0
    var norm = 0.0
    while (i < vec.length) { vec(i) *= idf(i); norm += vec(i) * vec(i); i += 1 }
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      i = 0
      while (i < vec.length) { vec(i) *= inv; i += 1 }
    }
    vec
  }

  private val classes: Array[Int] = target.distinct.sorted.toArray

  // L2-normalized class centroids of the training tf-idf vectors
  private val centroids: Map[Int, Array[Double]] = classes.map { c =>
    val members = sentences.indices.filter(target(_) == c)
    val acc = new Array[Double](idf.length)
    members.foreach { m =>
      val v = tfidf(sentences(m))
      var i = 0
      while (i < acc.length) { acc(i) += v(i); i += 1 }
    }
    var norm = 0.0
    var i = 0
    while (i < acc.length) { norm += acc(i) * acc(i); i += 1 }
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      i = 0
      while (i < acc.length) { acc(i) *= inv; i += 1 }
    }
    c -> acc
  }.toMap

  /** Most-similar class by cosine; ties break to the LOWEST class id
    * (deterministic).
    */
  def predict(text: String): Int = {
    val v = tfidf(text)
    var best = classes(0)
    var bestSim = Double.NegativeInfinity
    classes.foreach { c =>
      val cen = centroids(c)
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * cen(i); i += 1 }
      if (s > bestSim) { bestSim = s; best = c }
    }
    best
  }

  def predict(texts: Seq[String]): Array[Int] = texts.map(predict).toArray
}
