package graft.eval

import org.scalatest.funsuite.AnyFunSuite

class TextMetricsSpec extends AnyFunSuite {
  import TextMetrics._

  test("normalized edit distance") {
    assert(normEditDistance("abc", "abc") == 0.0)
    assert(normEditDistance("", "") == 0.0)
    assert(normEditDistance("abcd", "abcx") == 0.25)
    assert(normEditDistance("a", "bcde") == 1.0)
  }

  test("token PRF: multiset semantics") {
    val (p, r, f) = tokenPRF("a b b c", "a b c d")
    assert(p == 0.75) // a, b, c matched out of 4 pred tokens (one b unmatched)
    assert(r == 0.75)
    assert(f == 0.75)
  }

  test("token PRF: min-length gate") {
    assert(tokenPRF("ab", "ab") == ((0.0, 0.0, 0.0)))
  }

  test("BLEU: identical is 1, disjoint is 0") {
    val s = "the quick brown fox jumps over the lazy dog"
    assert(math.abs(bleu(s, s) - 1.0) < 1e-12)
    assert(bleu("aa bb cc dd ee", "vv ww xx yy zz") == 0.0)
  }

  test("BLEU: brevity penalty applies") {
    val gt = "one two three four five six seven eight"
    val pred = "one two three four five"
    val b = bleu(pred, gt)
    assert(b > 0 && b < 1.0)
  }

  test("corpus BLEU aggregator matches single-pair sentence BLEU") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val s = "the quick brown fox jumps over the lazy dog"
    val agg = new CorpusBleu().toColumn
    val one = Seq((s, s)).toDS().select(agg).head()
    assert(math.abs(one - 1.0) < 1e-12)
  }
}
