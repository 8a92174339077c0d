package graft.eval

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980) — the ORIGINAL published rule set.
  *
  * Used by the METEOR stem-matching stage (TextMetrics.meteor). The
  * reference reaches METEOR through nltk (metrics.py:30), whose stemmer
  * runs in an extended mode with extra special cases; this container has
  * no nltk, so the engine pins the well-specified original algorithm
  * instead (documented divergence, SURVEY §7.4 #1).
  *
  * Pure function, no allocation beyond the result; longest-match rule
  * per step, as the paper specifies (within each step only the rule with
  * the longest matching suffix is attempted).
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var s = word
    s = step1a(s)
    s = step1b(s)
    s = step1c(s)
    s = step2(s)
    s = step3(s)
    s = step4(s)
    s = step5a(s)
    s = step5b(s)
    s
  }

  /** Is s(i) a consonant? 'y' is a consonant at 0 or after a vowel. */
  private def cons(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !cons(s, i - 1)
    case _ => true
  }

  /** Measure m of s[0, end): number of VC sequences in [C](VC)^m[V]. */
  private def measure(s: String, end: Int): Int = {
    var n = 0
    var i = 0
    while (i < end && cons(s, i)) i += 1
    while (i < end) {
      while (i < end && !cons(s, i)) i += 1
      if (i >= end) return n
      n += 1
      while (i < end && cons(s, i)) i += 1
    }
    n
  }

  private def hasVowel(s: String, end: Int): Boolean = {
    var i = 0
    while (i < end) { if (!cons(s, i)) return true; i += 1 }
    false
  }

  /** Ends with a double consonant (e.g. -tt, -ss). */
  private def doubleC(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      cons(s, s.length - 1)

  /** s[0, end) ends consonant-vowel-consonant where the final consonant
    * is not w, x or y (the *o condition). */
  private def cvc(s: String, end: Int): Boolean = {
    if (end < 3) return false
    if (!cons(s, end - 1) || cons(s, end - 2) || !cons(s, end - 3)) return false
    val c = s.charAt(end - 1)
    c != 'w' && c != 'x' && c != 'y'
  }

  private def step1a(s: String): String =
    if (s.endsWith("sses")) s.dropRight(2)
    else if (s.endsWith("ies")) s.dropRight(2)
    else if (s.endsWith("ss")) s
    else if (s.endsWith("s")) s.dropRight(1)
    else s

  private def step1b(s0: String): String = {
    if (s0.endsWith("eed")) {
      return if (measure(s0, s0.length - 3) > 0) s0.dropRight(1) else s0
    }
    var s = s0
    var stripped = false
    if (s.endsWith("ed") && hasVowel(s, s.length - 2)) { s = s.dropRight(2); stripped = true }
    else if (s.endsWith("ing") && hasVowel(s, s.length - 3)) { s = s.dropRight(3); stripped = true }
    if (stripped) {
      if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s = s + "e"
      else if (doubleC(s) && !"lsz".contains(s.charAt(s.length - 1))) s = s.dropRight(1)
      else if (measure(s, s.length) == 1 && cvc(s, s.length)) s = s + "e"
    }
    s
  }

  private def step1c(s: String): String =
    if (s.endsWith("y") && hasVowel(s, s.length - 1)) s.dropRight(1) + "i" else s

  // (suffix, replacement) — longest matching suffix wins, then its m
  // condition is checked; if it fails, the step makes no change.
  private val rules2: Seq[(String, String)] = Seq(
    "ational" -> "ate", "ization" -> "ize", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "tional" -> "tion",
    "biliti" -> "ble", "alism" -> "al", "ation" -> "ate", "aliti" -> "al",
    "iviti" -> "ive", "ousli" -> "ous", "entli" -> "ent", "anci" -> "ance",
    "enci" -> "ence", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "ator" -> "ate", "eli" -> "e")

  private val rules3: Seq[(String, String)] = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val rules4: Seq[String] = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ion", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic", "ou")

  private def longest(s: String, rules: Seq[(String, String)]): Option[(String, String)] = {
    var best: (String, String) = null
    rules.foreach { r =>
      if (s.endsWith(r._1) && (best == null || r._1.length > best._1.length)) best = r
    }
    Option(best)
  }

  private def step2(s: String): String = longest(s, rules2) match {
    case Some((suf, rep)) if measure(s, s.length - suf.length) > 0 =>
      s.dropRight(suf.length) + rep
    case _ => s
  }

  private def step3(s: String): String = longest(s, rules3) match {
    case Some((suf, rep)) if measure(s, s.length - suf.length) > 0 =>
      s.dropRight(suf.length) + rep
    case _ => s
  }

  private def step4(s: String): String = {
    var best: String = null
    rules4.foreach { suf =>
      if (s.endsWith(suf) && (best == null || suf.length > best.length)) best = suf
    }
    if (best == null) return s
    val end = s.length - best.length
    if (measure(s, end) <= 1) return s
    if (best == "ion" && end >= 1 && { val c = s.charAt(end - 1); c != 's' && c != 't' }) return s
    s.substring(0, end)
  }

  private def step5a(s: String): String = {
    if (!s.endsWith("e")) return s
    val end = s.length - 1
    val m = measure(s, end)
    if (m > 1 || (m == 1 && !cvc(s, end))) s.dropRight(1) else s
  }

  private def step5b(s: String): String =
    if (s.endsWith("ll") && measure(s, s.length) > 1) s.dropRight(1) else s
}
