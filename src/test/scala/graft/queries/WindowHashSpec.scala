package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The O(n) rolling window-hash recurrence must produce EXACTLY the
  * windowwise O(n·K) reference values on every input — the Rabin–Karp
  * identity made a tested invariant, so the q52 production path and the
  * DuckDB oracle's windowwise replay can never drift.
  */
class WindowHashSpec extends AnyFunSuite {

  private def agree(text: String): Unit = {
    val roll = Dedup.windowHashesScala(text)
    val ref = Dedup.windowHashesWindowwise(text)
    assert(roll.toSeq == ref.toSeq,
      s"rolling vs windowwise diverge (${roll.length}/${ref.length} windows) on: " +
        String.valueOf(text).take(120))
  }

  test("adversarial fixed cases agree") {
    val k = Dedup.SubK
    agree(null)
    agree("")
    agree("   ")
    agree((1 until k).map(i => s"w$i").mkString(" "))       // k-1 tokens: no window
    agree((1 to k).map(i => s"w$i").mkString(" "))          // exactly one window
    agree(Seq.fill(k * 4)("same").mkString(" "))            // all-identical tokens
    agree((1 to 300).map(i => s"tok$i").mkString(" "))      // long stream
    agree("\tlead tab " + (1 to k).map(i => s"a$i").mkString(" ") + "  double  spaces ")
    agree((1 to 5000).map(i => s"x${i % 37}").mkString(" ")) // long with aliasing features
  }

  test("random token streams: rolling == windowwise (scalacheck)") {
    val tokGen = Gen.oneOf(
      Gen.alphaStr.map(_.take(12)),                  // may be empty → empty token
      Gen.chooseNum(1, 30).map(n => "z" * n),
      Gen.const(""),                                 // forces multi-space runs
      Gen.oneOf("a", "bb", "ccc", "Ωmega", "naïve")) // non-ASCII first chars too
    val textGen = for {
      n <- Gen.chooseNum(0, 200)
      toks <- Gen.listOfN(n, tokGen)
      pad <- Gen.oneOf("", " ", "\t", "\n  ")
    } yield pad + toks.mkString(" ") + pad
    val prop = Prop.forAll(textGen) { t =>
      Dedup.windowHashesScala(t).toSeq == Dedup.windowHashesWindowwise(t).toSeq
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(500)
      .withInitialSeed(org.scalacheck.rng.Seed(13L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
