package graft.align

/** Monotone staircase segmentation of an ordered token/paragraph stream
  * against noisy class labels — the reference's most distinctive
  * alignment algorithm (staircase.py:161-314): given per-position page
  * predictions, fit the monotone page-boundary thresholds that minimize
  * the pairwise Gini step impurity, via a median/MAD statistical
  * initialization (staircase.py:180-214) and a greedy forward pass with
  * early stopping (staircase.py:216-296).
  *
  * This is a faithful re-derivation including the reference's integer
  * semantics: thresholds live in int arrays, so every float assigned to
  * them truncates toward zero (numpy C-cast), the pads -0.5/domain+0.5
  * become 0/domain, and `int(last)` truncates — all of which shift
  * boundaries by one position versus a naive float implementation. The
  * golden suite pins byte-equal behavior to a reference run over 23
  * synthetic label streams (clean, noisy, missing classes, random).
  *
  * Complexity: O(domain) per candidate via prefix sums (the reference
  * recomputes masks per candidate, O(domain) each → O(domain²) per
  * boundary; same results, we just fold the counting). Row-local: meant
  * to run per document inside a map, never a shuffle.
  */
final case class StaircaseFit(
    thresholds: Array[Double],
    uncertainty: Array[Double],
    boundaries: Array[Double]) {

  /** stair_func (staircase.py:17-18): page of position x = number of
    * boundaries strictly below it (heaviside(x - floor(b), 0)).
    */
  def predict(x: Int): Int = {
    var c = 0
    var i = 0
    while (i < boundaries.length) {
      if (x > math.floor(boundaries(i))) c += 1
      i += 1
    }
    c
  }
}

object Staircase {

  private val EarlyStopAfter = 10

  /** Fit thresholds for `labels(j)` = noisy class of position j over
    * domain = labels.length positions and `classes` classes.
    */
  def fit(labels: Array[Int], classes: Int): StaircaseFit = {
    val domain = labels.length
    require(domain > 0 && classes > 0)
    if (classes == 1) {
      // the classes==1 branch sets a scalar threshold but the epilogue
      // overwrites it with the (empty) interior → no boundaries
      // (staircase.py:239-241,291-296)
      return StaircaseFit(Array.empty, Array.empty, Array.empty)
    }

    // padded int threshold array: pads -0.5/domain+0.5 truncate to
    // 0/domain; interior starts at the latest possible positions
    // (staircase.py:244-250)
    val t = new Array[Int](classes + 1)
    t(0) = 0
    var j = 1
    while (j < classes) { t(j) = domain - classes + j - 1; j += 1 }
    t(classes) = domain

    val forwardT = t.clone()
    val backT = t.clone()
    statisticFit(labels, classes, domain, forwardT, backT)

    // prefix counts per class for O(1) windowed binary gini
    // cnt(c)(i) = #{ k < i : labels(k) == c }
    val cnt = Array.ofDim[Int](classes, domain + 1)
    var p = 0
    while (p < domain) {
      var c = 0
      while (c < classes) { cnt(c)(p + 1) = cnt(c)(p) + (if (labels(p) == c) 1 else 0); c += 1 }
      p += 1
    }
    // binary gini of (labels==c) within positions (a, b] ∩ [0, domain-1]
    // (staircase.py:29-34,70-75)
    def gini(c: Int, a: Int, b: Int): Double = {
      val lo = math.max(0, a + 1)
      val hi = math.min(domain - 1, b)
      val m = hi - lo + 1
      if (m <= 0) 0.0
      else {
        val s = (cnt(c)(hi + 1) - cnt(c)(lo)).toLong
        m.toDouble - (s * s).toDouble / m.toDouble
      }
    }

    var last = -0.5
    var n = 0
    while (n < classes) {
      if (n < classes - 1) {
        var newForward = forwardT(n + 1)
        val lo = if (n - 1 >= 0) math.max(0, backT(n)) else last.toInt
        val hi = if (n + 2 < classes) math.min(domain, forwardT(n + 2)) else domain - 1
        var g = Double.PositiveInfinity
        val gis = new java.util.ArrayDeque[Double](EarlyStopAfter)
        var i = lo
        var break = false
        while (i < hi && !break) {
          t(n + 1) = i // int truncation of i + 0.5
          val gi = gini(n, t(n), t(n + 1)) + gini(n + 1, t(n + 1), t(n + 2))
          if (gis.size == EarlyStopAfter) gis.pollFirst()
          gis.addLast(gi)
          if (gi <= g) {
            last = i + 0.5
            newForward = i // int truncation of last
            g = gi
          } else if (i - last > domain.toDouble / classes &&
                     gis.size == EarlyStopAfter && nonIncreasing(gis)) {
            break = true
          }
          i += 1
        }
        t(n + 1) = newForward
        forwardT(n + 1) = newForward
        backT(n + 1) = newForward
      }
      n += 1
    }

    val interior = (1 until classes).map { i =>
      math.min(domain - 1, math.max(0, forwardT(i)))
    }.toArray
    // forward and back coincide after the pass → uncertainty 0, kept for
    // shape parity with the reference API (staircase.py:291-296)
    val thresholds = interior.map(_.toDouble)
    val uncertainty = interior.map(_ => 0.0)
    val boundaries = thresholds.map(v =>
      math.min(domain - 1, math.max(0, v.toInt)).toDouble + 0.5)
    StaircaseFit(thresholds, uncertainty, boundaries)
  }

  private def nonIncreasing(q: java.util.ArrayDeque[Double]): Boolean = {
    val it = q.iterator()
    var prev = Double.PositiveInfinity
    var first = true
    while (it.hasNext) {
      val v = it.next()
      if (!first && !(prev >= v)) return false
      prev = v
      first = false
    }
    true
  }

  /** Median/MAD statistical threshold bounds (staircase.py:180-214).
    * Positions for class c are { j : labels(j)==c, j >= 1 } — position 0
    * is lost to the reference's `k[k == 0] = nan` sentinel, reproduced
    * here deliberately.
    */
  private def statisticFit(labels: Array[Int], classes: Int, domain: Int,
                           forwardT: Array[Int], backT: Array[Int]): Unit = {
    val perClass = Array.fill(classes)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var jj = 1
    while (jj < domain) { perClass(labels(jj)) += jj; jj += 1 }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

    val medRaw = new Array[Double](classes) // NaN where class empty
    var c = 0
    while (c < classes) {
      medRaw(c) = if (perClass(c).isEmpty) Double.NaN
                  else median(perClass(c).map(_.toDouble).toSeq)
      c += 1
    }
    val med = medRaw.clone()
    var i = 0
    while (i < classes) {
      if (med(i).isNaN) med(i) = if (i == 0) 0.0 else med(i - 1)
      i += 1
    }
    val mad = new Array[Double](classes)
    c = 0
    while (c < classes) {
      mad(c) = 5.0 * (if (perClass(c).isEmpty) domain.toDouble / classes / 2.0
                      else median(perClass(c).map(v => math.abs(v - medRaw(c))).toSeq))
      c += 1
    }
    // interior bound i: max/min of (med(i)-mad(i), med(i+1)+mad(i+1)),
    // truncated toward zero into the int arrays (staircase.py:209-211)
    i = 0
    while (i < classes - 1) {
      val lo = med(i) - mad(i)
      val hi = med(i + 1) + mad(i + 1)
      forwardT(i + 1) = math.max(lo, hi).toInt
      backT(i + 1) = math.min(lo, hi).toInt
      i += 1
    }
  }
}
