package graft.post

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class PostprocessPropSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.oneOf("alpha", "beta", "gamma", "data", "spark", "the", "x", "42.", "#", "\\[", "\\]", "**")
  private val textGen: Gen[String] = for {
    words <- Gen.listOf(word)
    seps <- Gen.listOfN(words.length, Gen.oneOf(" ", " ", " ", "\n", "\n\n", ". "))
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  test("property: truncateRepetitions never lengthens, never throws") {
    check(Prop.forAll(textGen) { s =>
      val out = Postprocess.truncateRepetitions(s)
      out.length <= s.length
    })
  }

  test("property: repeated tails always collapse to one copy") {
    val chunk = Gen.listOfN(8, word).map(_.mkString(" ") + ". ")
    val g = for { base <- textGen; c <- chunk; k <- Gen.choose(2, 9) } yield (base, c, k)
    check(Prop.forAll(g) { case (base, c, k) =>
      val s = base + (c * k) // chunk ends with ". " so the tail is exactly periodic
      val out = Postprocess.truncateRepetitions(s)
      // truncated output never retains 2 full copies of a >=30-char chunk
      c.length < 30 || out.length < s.length
    })
  }

  test("candidate-dense self-periodic suffix still truncates (Z-array fallback)") {
    // a repeating unit containing a long dash run: the 30-char suffix
    // recurs at >64 offsets with failing verifies; the exact fallback
    // must still find the true unit period
    val unit = "data | " + ("-" * 200) + " x " + ("-" * 45)
    val s = "Intro paragraph stays here. " + (unit + " ") * 3
    val out = Postprocess.truncateRepetitions(s.stripTrailing())
    assert(out.length < s.stripTrailing().length)
    assert(out.startsWith("Intro paragraph stays here."))
    // exactly one copy of the unit survives
    assert(out.sliding(unit.length).count(_ == unit) == 1)
  }

  test("property: closeEnvs balances every tracked environment") {
    val env = Gen.oneOf("tabular", "table", "matrix", "bmatrix", "pmatrix")
    val frag = Gen.oneOf(
      env.map(e => s"\\begin{$e}"), env.map(e => s"\\end{$e}"), Gen.const("text "))
    val g = Gen.listOf(frag).map(_.mkString)
    check(Prop.forAll(g) { s =>
      val out = Postprocess.closeEnvs(s)
      Seq("tabular", "table", "matrix", "bmatrix", "pmatrix").forall { e =>
        val b = out.sliding(s"\\begin{$e}".length).count(_ == s"\\begin{$e}")
        val c = out.sliding(s"\\end{$e}".length).count(_ == s"\\end{$e}")
        b <= c
      }
    }, 120)
  }

  test("property: markdownCompatible and epilogue are idempotent") {
    check(Prop.forAll(textGen) { s =>
      val m1 = Postprocess.markdownCompatible(s)
      val e1 = graft.extract.MarkdownSerializer.epilogue(s)
      Postprocess.markdownCompatible(m1) == m1 &&
        graft.extract.MarkdownSerializer.epilogue(e1) == e1
    })
  }

  test("property: postprocessSingle never throws and strips trailing ws") {
    check(Prop.forAll(textGen) { s =>
      val r = Postprocess.postprocessSingle(s)
      r.text == r.text.trim
    })
  }

  test("property: '#'-regex gates are sound (a match implies its flag)") {
    // the Feat candidate flags must never skip a regex that would match:
    // pattern.find(s) ⇒ flag(s). Over-triggering is harmless (the regex
    // just runs and finds nothing); under-triggering silently changes
    // semantics, which is what this property guards.
    val pLong = java.util.regex.Pattern.compile("(?m)^#{1,6} {0,3}(.{100,})$")
    val pNum = java.util.regex.Pattern.compile("(?m)^#{1,6} {0,3}[\\d.]+ *$\n?")
    val pHashL = java.util.regex.Pattern.compile("(?m)^[#\\s]*#+ *$\n?")
    val lineGen = Gen.oneOf(
      Gen.const("## 1.2 "), Gen.const("##"), Gen.const("  ## "),
      Gen.const("#\t#"), Gen.const("# " + "t" * 120),
      Gen.const("####### " + "x" * 105), Gen.const("body text here."),
      Gen.const("item #4 mid-line"), Gen.const("# 2024 results"),
      Gen.const("# .5"), Gen.const("#. "), Gen.const(" \t## "),
      Gen.const("### 1."), Gen.const(""),
      // adversarial: >6-'#' runs count extra hashes toward the title
      // group; \r / \f / vertical-tab around '#' ride pHashLine's \s
      Gen.const("#" * 50 + "x" * 60), Gen.const("##\r"),
      Gen.const("\f## "), Gen.const("#"), Gen.const("#" * 8))
    val docGen = Gen.listOf(lineGen).map(_.mkString("\n"))
    check(Prop.forAll(docGen) { s =>
      val (longT, numH, hashL, spaceH) = Postprocess.headingGates(s)
      (!pLong.matcher(s).find() || longT) &&
      (!pNum.matcher(s).find() || numH) &&
      (!pHashL.matcher(s).find() || hashL || spaceH)
    })
  }

  test("property: boundedSim agrees with exact lineSimilarity at the 0.9 gate") {
    val lineGen = Gen.listOfN(12, Gen.alphaChar).map(_.mkString)
    val g = for { a <- lineGen; b <- lineGen } yield (a, b)
    check(Prop.forAll(g) { case (a, b) =>
      val exact = Postprocess.lineSimilarity(a, b)
      val bounded = Postprocess.boundedSim(a, b, 0.9)
      (exact > 0.9) == (bounded > 0.9) && (exact >= 0.9) == (bounded >= 0.9)
    })
  }

  test("property: extractor never throws on mutilated corpus pages") {
    val g = for {
      i <- Gen.choose(0L, 2000L)
      cut <- Gen.choose(0.0, 1.0)
    } yield (i, cut)
    check(Prop.forAll(g) { case (i, cut) =>
      val page = graft.gen.SyntheticCorpus.pageFor(42L, i)
      val bytes = java.util.Arrays.copyOf(page.html, (page.html.length * cut).toInt.max(0))
      val d = graft.extract.Extractor.extract(page.url, bytes)
      // spans must always index into the final markdown
      d.spans.forall(sp => sp.start >= 0 && sp.end <= d.markdown.length &&
        d.markdown.substring(sp.start, sp.end) == sp.body)
    }, 150)
  }
}
