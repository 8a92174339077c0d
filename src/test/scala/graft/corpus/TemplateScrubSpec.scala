package graft.corpus

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Golden behavior of the corpus-level template scrub: a site-wide
  * footer disappears from every page of its host while unique prose and
  * sub-threshold lines survive, and other hosts are untouched.
  */
class TemplateScrubSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus() = {
    import spark.implicits._
    // host A: 5 pages, all with the same footer + nav; one line on 2/5
    // pages (0.4 — inclusive threshold) and one on 1/5 (kept)
    val a = (0 until 5).map { i =>
      val extra = if (i < 2) "\nSubscribe to our newsletter" else ""
      val rare = if (i == 0) "\nOne-off notice" else ""
      ("a.example", i.toLong,
        s"Unique prose of page $i.$extra$rare\nHome | About | Contact\n(c) 2024 a.example")
    }
    // host B: 2 pages sharing no lines — nothing may be scrubbed
    val b = Seq(
      ("b.example", 10L, "B first page body\nB first extra"),
      ("b.example", 11L, "B second page body"))
    (a ++ b).toDF("host", "doc_id", "text")
  }

  test("site-wide footer and nav scrubbed; unique prose survives") {
    val out = TemplateScrub.scrub(corpus(), "host", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(3)).toMap
    (0 until 5).foreach { i =>
      val cleaned = out(("a.example", i.toLong))
      assert(cleaned.contains(s"Unique prose of page $i."), cleaned)
      assert(!cleaned.contains("Home | About | Contact"), cleaned)
      assert(!cleaned.contains("(c) 2024 a.example"), cleaned)
    }
  }

  test("threshold is inclusive at exactly 40% and spares rarer lines") {
    val out = TemplateScrub.scrub(corpus(), "host", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(3)).toMap
    // 2/5 pages = 0.4 → scrubbed (reference: "appears on AT LEAST 40%")
    assert(!out(("a.example", 0L)).contains("Subscribe to our newsletter"))
    // 1/5 pages = 0.2 → kept
    assert(out(("a.example", 0L)).contains("One-off notice"))
  }

  test("hosts are independent: no cross-host scrub, sparse host untouched") {
    val out = TemplateScrub.scrub(corpus(), "host", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(out(("b.example", 10L)) == "B first page body\nB first extra")
    assert(out(("b.example", 11L)) == "B second page body")
  }

  test("boilerplateLines reports frequency evidence") {
    val b = TemplateScrub.boilerplateLines(corpus(), "host", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(b(("a.example", "Home | About | Contact")) == (5L, 5L))
    assert(b(("a.example", "Subscribe to our newsletter")) == (2L, 5L))
    assert(!b.contains(("a.example", "One-off notice")))
    assert(!b.exists(_._1._1 == "b.example"))
  }

  test("line order preserved after scrub") {
    import spark.implicits._
    val df = Seq(("h", 1L, "z last alpha\nshared\na first alpha"),
                 ("h", 2L, "shared\nmiddle\nshared")).toDF("host", "doc_id", "text")
    val out = TemplateScrub.scrub(df, "host", "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getString(3)).toMap
    assert(out(1L) == "z last alpha\na first alpha") // original order, not sorted
    assert(out(2L) == "middle")
  }

  test("fully-templated page survives as an empty doc") {
    import spark.implicits._
    val df = Seq(("h", 1L, "same\nlines"), ("h", 2L, "same\nlines"),
                 ("h", 3L, "same\nlines\nplus prose")).toDF("host", "doc_id", "text")
    val out = TemplateScrub.scrub(df, "host", "doc_id", "text")
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == (0L, ""))
    assert(out(2L) == (0L, ""))
    assert(out(3L) == (1L, "plus prose"))
  }
}
