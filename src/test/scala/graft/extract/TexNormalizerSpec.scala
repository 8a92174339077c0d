package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** X5/X6: TeX synonym canonicalization (the reference's full `syn` table,
  * latex_conversion.py:12-42) and the unicode→LaTeX character table.
  */
class TexNormalizerSpec extends AnyFunSuite {

  private def n(tex: String): String = TexNormalizer.normalize(tex, inline = true)

  test("synonyms canonicalize in the reference's directions") {
    assert(n("a \\le b") == "\\(a \\leq b\\)")
    assert(n("a \\ne b") == "\\(a \\neq b\\)")
    assert(n("a \\rightarrow b") == "\\(a \\to b\\)")
    assert(n("a \\leftarrow b") == "\\(a \\gets b\\)")
    assert(n("a \\vee b") == "\\(a \\lor b\\)")
    assert(n("a \\land b") == "\\(a \\wedge b\\)")
    assert(n("x \\owns y") == "\\(x \\ni y\\)")
    assert(n("\\textellipsis") == "\\(\\ldots\\)")
    assert(n("a \\textemdash b") == "\\(a --- b\\)")
    assert(n("a\\thinspace b") == "\\(a\\, b\\)")
    assert(n("a \\> b") == "\\(a \\: b\\)")
    // boundary safety: \le must not clobber \left or \leq
    assert(n("\\left( x \\right)") == "\\(\\left( x \\right)\\)")
    assert(n("a \\leq b") == "\\(a \\leq b\\)")
    // \longrightarrow is not \rightarrow
    assert(n("a \\longrightarrow b") == "\\(a \\longrightarrow b\\)")
  }

  test("lbrace/rbrace map to the CORRECT braces (reference swaps them)") {
    assert(n("\\lbrace x \\rbrace") == "\\(\\{ x \\}\\)")
  }

  test("unicode math → latex commands") {
    assert(n("θ ∈ ℝ") == "\\(\\theta \\in \\mathbb{R}\\)")
    assert(n("∀x ∃y") == "\\(\\forall x \\exists y\\)")
    assert(n("a ⇒ b ↔ c") == "\\(a \\Rightarrow b \\leftrightarrow c\\)")
    assert(n("x′ ∂f ∇g") == "\\(x' \\partial f \\nabla g\\)")
    assert(n("A ⊆ B ∪ C") == "\\(A \\subseteq B \\cup C\\)")
  }

  test("accented latin and smart quotes") {
    assert(TexNormalizer.unicodeToLatex("Göttingen") == "G\\\"ottingen")
    assert(TexNormalizer.unicodeToLatex("née") == "n\\'ee")
    assert(TexNormalizer.unicodeToLatex("“x”") == "\"x\"")
  }

  test("extended symbol table: delimiters, relations, script letters") {
    assert(n("⟨x, y⟩") == "\\(\\langle x, y\\rangle\\)")
    assert(n("⌊x⌋ ≪ ⌈y⌉") == "\\(\\lfloor x\\rfloor \\ll \\lceil y\\rceil\\)")
    assert(n("ℜ(z) ⊢ ℑ(z)") == "\\(\\Re (z) \\vdash \\Im (z)\\)")
    assert(n("A ∖ B ⊊ C") == "\\(A \\setminus B \\subsetneq C\\)")
    assert(n("x ≺ y ⪯ z") == "\\(x \\prec y \\preceq z\\)")
    assert(n("∴ P ∵ Q") == "\\(\\therefore P \\because Q\\)")
    // ϵ routes through the \epsilon→\varepsilon synonym canonicalization
    assert(n("ϑ ϵ ς") == "\\(\\vartheta \\varepsilon \\varsigma\\)")
  }

  test("umlaut regex collapses spelled accent commands (latex_conversion.py:46-53)") {
    assert(n("\\ddot a + b") == "\\(\\\"a + b\\)")
    assert(n("\\textasciidieresis o") == "\\(\\\"o\\)")
    assert(n("\\textasciicaron c") == "\\(\\v c\\)")
    assert(n("\\textasciicircum e") == "\\(\\^e\\)")
    // no bare letter after the command → untouched
    assert(n("\\ddot{x}") == "\\(\\ddot{x}\\)")
  }

  test("ascii fold: the unidecode tail (latex_conversion.py:101)") {
    assert(n("a – b — c") == "\\(a - b -- c\\)")
    assert(n("ﬁeld ﬂow") == "\\(field flow\\)")
    assert(n("½ + ¼") == "\\(1/2 + 1/4\\)")
    assert(n("x² y₃") == "\\(x2 y3\\)")
    assert(n("Ångström ø") == "\\(Angstr\\\"om o\\)")
    // unknown non-ASCII is dropped, like the reference's ignore policy
    assert(n("a中b") == "\\(ab\\)")
  }

  test("pt2px geometry (X20, create_index.py:30-37)") {
    import graft.queries.MultiModal.convertPt2Px
    assert(convertPt2Px(Seq(72.0, 36.0, 54.75)) == Seq(96, 48, 73))
    // banker's rounding like Python round()
    assert(convertPt2Px(Seq(1.875)) == Seq(2))   // 2.5 → 2
    assert(convertPt2Px(Seq(2.625)) == Seq(4))   // 3.5 → 4
    assert(convertPt2Px(Seq.empty) == Seq.empty)
  }
}
