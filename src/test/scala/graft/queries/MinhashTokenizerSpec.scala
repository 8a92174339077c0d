package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the r4-verdict tokenizer-unification fix: `minhashSigScala` must
  * agree with the SQL arithmetic (trim = SPACES ONLY, leading/internal
  * empties kept, `\t\n\r` are delimiters not trimmed padding) and return
  * None for NULL text instead of NPEing — mirroring the r3 simhash fix.
  *
  * The Column twin below is built from Spark SQL primitives with the
  * exact semantics the DuckDB oracle uses (split(trim(text)) + shingle
  * polynomial + per-hash affine min), so agreement here plus q19's green
  * DuckDB row gives Scala = Spark-SQL = DuckDB on the awkward inputs the
  * shared corpus never exercises.
  */
class MinhashTokenizerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def columnTwin(text: String): Option[Array[Long]] = {
    import spark.implicits._
    def fw(w: String) = s"(length($w) * 31L + ascii(substring($w, 1, 1)))"
    val sh = s"transform(sequence(0, size(tk) - 3), i -> " +
      s"((${fw("tk[i]")} * 1009L + ${fw("tk[i+1]")}) * 1009L + ${fw("tk[i+2]")}) % ${Dedup.P}L)"
    val mhCols = Dedup.A.zip(Dedup.B).zipWithIndex.map { case ((a, b), k) =>
      s"array_min(transform(sh, h -> (${a}L * h + ${b}L) % ${Dedup.P}L)) AS mh$k"
    }
    val rows = Seq(Tuple1(text)).toDF("text")
      .selectExpr("split(trim(text), '\\\\s+', -1) AS tk")
      .where("size(tk) >= 3")
      .selectExpr(s"$sh AS sh")
      .selectExpr(mhCols: _*)
      .collect()
    rows.headOption.map(r => (0 until 8).map(r.getLong).toArray)
  }

  test("NULL text yields None (no NPE), matching SQL NULL propagation") {
    assert(Dedup.minhashSigScala(null).isEmpty)
  }

  test("tab/newline-padded text shingles identically to the SQL tokenizer") {
    for (t <- Seq("\tfoo bar baz qux", "foo bar baz qux\n", "\r\nfoo  bar\tbaz qux ",
                  "  plain spaced words here  ")) {
      val scalaSig = Dedup.minhashSigScala(t)
      val columnSig = columnTwin(t)
      assert(scalaSig.isDefined && columnSig.isDefined, s"both forms must produce a signature for '$t'")
      assert(scalaSig.map(_.toSeq) == columnSig.map(_.toSeq),
        "Scala vs Column minhash diverge on " +
          t.replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r"))
    }
  }

  test("whitespace-only and too-short text yield no signature on both forms") {
    for (t <- Seq("", "   ", "\t\t", "one two")) {
      assert(Dedup.minhashSigScala(t).isEmpty, s"scala on '$t'")
      assert(columnTwin(t).isEmpty, s"column on '$t'")
    }
  }
}
