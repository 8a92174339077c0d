package graft.post

/** X12: bounded approximate substring search — re-expression of the
  * reference's `_fuzzy`/`fuzzysearch` (splitter.py:324-348): locate the
  * needle inside the haystack within `maxDist` edits, score
  * 1 − dist/maxDist. Sellers' algorithm (substring Levenshtein: the top
  * DP row is all zeros so matches can start anywhere) with Ukkonen's
  * cutoff, O(|haystack|·maxDist) expected.
  */
object FuzzySearch {

  final case class Match(start: Int, end: Int, dist: Int) {
    def score(maxDist: Int): Double =
      if (maxDist <= 0) 1.0 else 1.0 - dist.toDouble / maxDist
  }

  /** Default edit budget per the reference: min(len−1, len·0.025 + 5). */
  def defaultMaxDist(needleLen: Int): Int =
    math.min(needleLen - 1, (needleLen * 0.025 + 5).toInt).max(0)

  /** Best (lowest-distance, leftmost) approximate occurrence, or None if
    * nothing is within `maxDist`.
    */
  def find(needle: String, haystack: String, maxDist0: Int = -1): Option[Match] = {
    val m = needle.length
    if (m == 0) return Some(Match(0, 0, 0))
    val maxDist = if (maxDist0 >= 0) maxDist0 else defaultMaxDist(m)
    val n = haystack.length
    if (n == 0) return if (m <= maxDist) Some(Match(0, 0, m)) else None

    // DP over needle rows; col j = haystack prefix j; row 0 = 0 (free start)
    var prev = new Array[Int](n + 1) // row i-1
    var cur = new Array[Int](n + 1)
    // row 1..m; prev starts as row 0 = zeros
    var bestDist = maxDist + 1
    var bestEnd = -1
    var i = 1
    while (i <= m && bestDist > 0) {
      graft.extract.DocBudget.tick() // per-row checkpoint (O(m·n) DP)
      cur(0) = i
      var rowMin = cur(0)
      var j = 1
      while (j <= n) {
        val cost = if (needle.charAt(i - 1) == haystack.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > maxDist) return None // Ukkonen cutoff: band exceeded
      if (i == m) {
        j = 1
        while (j <= n) {
          if (cur(j) < bestDist) { bestDist = cur(j); bestEnd = j }
          j += 1
        }
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (bestEnd < 0 || bestDist > maxDist) None
    else {
      // recover a start: walk back greedily by re-running a bounded
      // reverse match (start ≥ end − m − dist)
      val start = math.max(0, bestEnd - m - bestDist)
      // trim leading haystack chars that only add distance
      var s = start
      var best = Distance.levenshtein(needle, haystack.substring(s, bestEnd), maxDist + 1)
      var k = start + 1
      val limit = math.min(bestEnd, start + 2 * bestDist + 1)
      while (k <= limit) {
        val d = Distance.levenshtein(needle, haystack.substring(k, bestEnd), maxDist + 1)
        if (d < best) { best = d; s = k }
        k += 1
      }
      Some(Match(s, bestEnd, bestDist))
    }
  }
}
