package graft.eval

import graft.post.Distance

/** Evaluation metrics — re-expression of `compute_metrics`
  * (/root/reference/nougat/metrics.py:27-44): normalized edit distance,
  * token precision/recall/F1 (multiset, like the reference's Counter
  * intersection), and BLEU with brevity penalty. Pure functions plus a
  * Spark Aggregator for corpus-level BLEU.
  */
object TextMetrics {

  /** levenshtein / max(len) — 0 is identical, 1 is disjoint. */
  def normEditDistance(a: String, b: String): Double = {
    val m = math.max(a.length, b.length)
    if (m == 0) 0.0 else Distance.levenshtein(a, b).toDouble / m
  }

  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  def tokenize(s: String): Array[String] =
    wsPattern.split(s.trim).filter(_.nonEmpty)

  /** Multiset token precision/recall/F1. NOTE: this intentionally
    * diverges from the reference, which converts token lists to set()
    * before nltk's set-based precision/recall (metrics.py:34-43) — the
    * multiset form is strictly more informative on documents with
    * repeated tokens; the reference's set-based scores live in
    * EvalQueries.q28TokenPRF. The <4-char all-zero gate matches the
    * reference's min-length guard.
    */
  def tokenPRF(pred: String, gt: String): (Double, Double, Double) = {
    if (pred.length < 4 || gt.length < 4) return (0.0, 0.0, 0.0)
    val p = tokenize(pred)
    val g = tokenize(gt)
    if (p.isEmpty || g.isEmpty) return (0.0, 0.0, 0.0)
    val gc = scala.collection.mutable.Map.empty[String, Int]
    g.foreach(w => gc(w) = gc.getOrElse(w, 0) + 1)
    var overlap = 0
    p.foreach { w =>
      val c = gc.getOrElse(w, 0)
      if (c > 0) { overlap += 1; gc(w) = c - 1 }
    }
    val prec = overlap.toDouble / p.length
    val rec = overlap.toDouble / g.length
    val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
    (prec, rec, f1)
  }

  // ---- METEOR (metrics.py:36, nltk.translate.meteor) ----------------------

  /** Greedy word alignment, nltk semantics: hypothesis scanned last→first,
    * each occurrence pairing with the LAST unmatched reference occurrence
    * of the same key; the exact stage runs first, then (optionally) the
    * Porter-stem stage over the leftovers. Returns (matches, chunks) where
    * chunks counts maximal runs of adjacent-in-both matches — the METEOR
    * fragmentation unit.
    *
    * nltk's third stage (WordNet synonyms) is omitted: no corpus exists
    * offline (documented divergence, SURVEY §7.4 #1).
    */
  def meteorAlignment(hyp: Array[String], ref: Array[String],
                      stem: Boolean): (Int, Int) = {
    val hFree = Array.fill(hyp.length)(true)
    val rFree = Array.fill(ref.length)(true)
    val matches = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def stage(hKey: Int => String, rKey: Int => String): Unit = {
      var i = hyp.length - 1
      while (i >= 0) {
        if (hFree(i)) {
          var j = ref.length - 1
          var found = false
          while (j >= 0 && !found) {
            if (rFree(j) && hKey(i) == rKey(j)) {
              matches += ((i, j)); hFree(i) = false; rFree(j) = false; found = true
            }
            j -= 1
          }
        }
        i -= 1
      }
    }
    stage(hyp(_), ref(_))
    if (stem) {
      val hs = hyp.map(PorterStemmer.stem)
      val rs = ref.map(PorterStemmer.stem)
      stage(hs(_), rs(_))
    }
    val sorted = matches.sortBy(_._1)
    var chunks = 0
    var k = 0
    while (k < sorted.length) {
      if (k == 0 || sorted(k)._1 != sorted(k - 1)._1 + 1 ||
          sorted(k)._2 != sorted(k - 1)._2 + 1) chunks += 1
      k += 1
    }
    (matches.length, chunks)
  }

  /** METEOR (exact + Porter-stem stages; lowercase preprocess like nltk's
    * default): fmean = PR/(0.9P+0.1R), penalty = 0.5·(chunks/matches)³,
    * score = fmean·(1−penalty). The cube is expanded as repeated
    * multiplication so the DuckDB oracle reproduces it bit-exactly
    * (libm pow may differ in the last ulp).
    */
  def meteor(pred: String, gt: String, stem: Boolean = true): Double = {
    val h = tokenize(pred).map(_.toLowerCase(java.util.Locale.ROOT))
    val r = tokenize(gt).map(_.toLowerCase(java.util.Locale.ROOT))
    if (h.isEmpty || r.isEmpty) return 0.0
    val (m, chunks) = meteorAlignment(h, r, stem)
    if (m == 0) return 0.0
    val p = m.toDouble / h.length
    val rec = m.toDouble / r.length
    val fmean = (p * rec) / (0.9 * p + 0.1 * rec)
    val frag = chunks.toDouble / m
    val penalty = 0.5 * (frag * frag * frag)
    fmean * (1.0 - penalty)
  }

  private def ngrams(ws: Array[String], n: Int): Map[Seq[String], Int] = {
    if (ws.length < n) return Map.empty
    val m = scala.collection.mutable.Map.empty[Seq[String], Int]
    var i = 0
    while (i + n <= ws.length) {
      val g = ws.slice(i, i + n).toSeq
      m(g) = m.getOrElse(g, 0) + 1
      i += 1
    }
    m.toMap
  }

  /** Sentence BLEU-4 with uniform weights and brevity penalty (the
    * standard formulation the reference gets from nltk).
    */
  def bleu(pred: String, gt: String, maxN: Int = 4): Double = {
    val p = tokenize(pred); val g = tokenize(gt)
    if (p.isEmpty || g.isEmpty) return 0.0
    val logs = (1 to maxN).map { n =>
      val pn = ngrams(p, n); val gn = ngrams(g, n)
      val total = pn.values.sum
      if (total == 0) return 0.0
      val clipped = pn.map { case (k, c) => math.min(c, gn.getOrElse(k, 0)) }.sum
      if (clipped == 0) return 0.0
      math.log(clipped.toDouble / total)
    }
    val bp = if (p.length >= g.length) 1.0 else math.exp(1.0 - g.length.toDouble / p.length)
    bp * math.exp(logs.sum / maxN)
  }

  /** Corpus-BLEU accumulator: sums clipped/total n-gram counts and
    * lengths across all pairs (the standard corpus formulation), exposed
    * as a typed Spark Aggregator.
    */
  final case class BleuBuf(clipped: Array[Long], total: Array[Long],
                           predLen: Long, gtLen: Long)

  class CorpusBleu(maxN: Int = 4)
      extends org.apache.spark.sql.expressions.Aggregator[(String, String), BleuBuf, Double] {
    def zero: BleuBuf = BleuBuf(new Array[Long](maxN), new Array[Long](maxN), 0L, 0L)
    def reduce(b: BleuBuf, pair: (String, String)): BleuBuf = {
      val p = tokenize(pair._1); val g = tokenize(pair._2)
      var n = 1
      while (n <= maxN) {
        val pn = ngrams(p, n); val gn = ngrams(g, n)
        b.total(n - 1) += pn.values.sum
        b.clipped(n - 1) += pn.map { case (k, c) => math.min(c, gn.getOrElse(k, 0)) }.sum
        n += 1
      }
      BleuBuf(b.clipped, b.total, b.predLen + p.length, b.gtLen + g.length)
    }
    def merge(a: BleuBuf, b: BleuBuf): BleuBuf =
      BleuBuf(a.clipped.zip(b.clipped).map(t => t._1 + t._2),
        a.total.zip(b.total).map(t => t._1 + t._2),
        a.predLen + b.predLen, a.gtLen + b.gtLen)
    def finish(b: BleuBuf): Double = {
      if (b.total.exists(_ == 0) || b.clipped.exists(_ == 0)) return 0.0
      val logs = (0 until maxN).map(i => math.log(b.clipped(i).toDouble / b.total(i)))
      val bp = if (b.predLen >= b.gtLen) 1.0
        else math.exp(1.0 - b.gtLen.toDouble / math.max(b.predLen, 1L))
      bp * math.exp(logs.sum / maxN)
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[BleuBuf] =
      org.apache.spark.sql.Encoders.product[BleuBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }
}
