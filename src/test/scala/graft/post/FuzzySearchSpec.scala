package graft.post

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class FuzzySearchSpec extends AnyFunSuite {
  import FuzzySearch._

  test("exact occurrence found with dist 0 and right offsets") {
    val m = find("needle", "in a haystack a needle sits", 2).get
    assert(m.dist == 0)
    assert("in a haystack a needle sits".substring(m.start, m.end) == "needle")
  }

  test("single-typo occurrence found within budget") {
    val m = find("kitten", "there is a sitten here", 2).get
    assert(m.dist == 1)
    assert(m.score(2) == 0.5)
  }

  test("nothing within budget → None") {
    assert(find("completely", "unrelated text entirely", 2).isEmpty)
  }

  test("reference budget formula") {
    assert(defaultMaxDist(22) == 5)   // 22*0.025+5 = 5.55 → 5
    assert(defaultMaxDist(400) == 15) // 400*0.025+5 = 15
    assert(defaultMaxDist(3) == 2)    // len-1 caps
  }

  test("property: planted needle with k mutations is found when k ≤ budget") {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(11L))
    val g = for {
      pre <- Gen.listOfN(20, Gen.alphaLowerChar).map(_.mkString)
      post <- Gen.listOfN(20, Gen.alphaLowerChar).map(_.mkString)
      needle <- Gen.listOfN(30, Gen.oneOf('x', 'y', 'z')).map(_.mkString)
      mutPos <- Gen.choose(0, 29)
    } yield (pre, post, needle, mutPos)
    val prop = Prop.forAll(g) { case (pre, post, needle, mutPos) =>
      val mutated = needle.updated(mutPos, 'q')
      val hay = pre + mutated + post
      find(needle, hay, 3).exists(_.dist <= 1)
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
