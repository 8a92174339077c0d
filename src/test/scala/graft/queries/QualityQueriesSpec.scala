package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Hand-computed semantics for the corpus-quality pack (q44-q46) on a
  * tiny fixture corpus, plus plan-shape audits on the real test table.
  */
class QualityQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Fixture documents.parquet in a temp dir (queries read `$dir/documents.parquet`). */
  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_quality_fix").toString
    import spark.implicits._
    Seq(
      (1L, "the cat sat of the mat and ran far away now"),
      (2L, "zz zz zz zz"),
      (3L, "a b a b a b a b a b a b"),
      (4L, "solo"),
      // edge whitespace pins the SQL tokenizer twin: trim strips SPACES
      // only, and split keeps leading/trailing empty tokens
      (5L, "one two three four\n"),
      (6L, "\tx y z"),
      // NULL text must flow through as NULL stats, not NPE
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q44: rule flags and keep decision match hand computation") {
    val all = QualityQueries.q44GopherRules.fn(spark, fixtureDir).collect()
    // doc 7 (NULL text): every derived column NULL, like the SQL oracle
    val nullRow = all.find(_.getLong(0) == 7L).get
    assert((1 to 7).forall(nullRow.isNullAt), s"NULL text must give NULL flags: $nullRow")
    val rows = all.filter(_.getLong(0) != 7L).map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5), r.getDouble(6), r.getInt(7))).toMap
    // doc 1: 11 tokens, all alphabetic, 4 stopwords, mean word len 3.0 → keep
    assert(rows(1L) == ((11, 11, 4, 4, 3.0, 1.0, 1)))
    // doc 2: 4 tokens (<10), no stopword → reject
    assert(rows(2L)._1 == 4 && rows(2L)._3 == 0 && rows(2L)._7 == 0)
    // doc 3: mean word length 1.0 (<3) → reject despite stopword 'a'
    assert(rows(3L)._5 == 1.0 && rows(3L)._3 == 6 && rows(3L)._7 == 0)
    // doc 4: single token → reject
    assert(rows(4L)._7 == 0)
    // doc 5 ends in \n: SQL trim keeps it, split keeps the trailing
    // empty token → 5 tokens, 4 alphabetic, frac 0.8 (not > 0.8)
    assert(rows(5L) == ((5, 4, 0, 5, 3.0, 0.8, 0)))
    // doc 6 starts with \t: leading empty token kept → 4 tokens
    assert(rows(6L) == ((4, 3, 0, 1, 0.75, 0.75, 0)))
  }

  test("q45: repeated-trigram fraction matches hand computation") {
    val all = QualityQueries.q45NgramRepetition.fn(spark, fixtureDir).collect()
    val nullRow = all.find(_.getLong(0) == 7L).get
    assert((1 to 3).forall(nullRow.isNullAt), s"NULL text must give NULL stats: $nullRow")
    val rows = all.filter(_.getLong(0) != 7L)
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    // doc 1: 9 unique trigrams
    assert(rows(1L) == ((9, 9, 0.0)))
    // doc 2: trigrams [zz zz zz, zz zz zz] → 2 total, 1 distinct, rep 0.5
    assert(rows(2L) == ((2, 1, 0.5)))
    // doc 3: 10 trigrams alternating "a b a"/"b a b" → 2 distinct, rep 0.8
    assert(rows(3L) == ((10, 2, 0.8)))
    // doc 4: fewer than 3 tokens → zero grams, fraction defined as 0
    assert(rows(4L) == ((0, 0, 0.0)))
    // doc 5: trailing empty token participates in the last trigram
    assert(rows(5L) == ((3, 3, 0.0)))
    // doc 6: leading empty token participates in the first trigram
    assert(rows(6L) == ((2, 2, 0.0)))
  }

  test("q46: corpus bigram counts and deterministic ordering") {
    val rows = QualityQueries.q46TopBigrams.fn(spark, fixtureDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "a b" x6 (doc 3), "b a" x5 (doc 3), "zz zz" x3 (doc 2), then doc 1's
    // unique bigrams (count 1) in lexicographic order; doc 4 contributes none
    assert(rows.take(3).toSeq == Seq(("a b", 6L), ("b a", 5L), ("zz zz", 3L)))
    assert(rows.drop(3).forall(_._2 == 1L))
    assert(rows.drop(3).map(_._1).toSeq == rows.drop(3).map(_._1).sorted.toSeq)
  }

  test("q44 plan: column-pruned scan, no shuffle aggregate") {
    val p = QualityQueries.q44GopherRules.fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema") && !p.contains("n_chars"),
      s"scan should prune to doc_id/text:\n$p")
    assert(!p.contains("HashAggregate"), s"q44 is one row-local pass:\n$p")
  }

  test("q46 plan: partial+final aggregate and top-k without global sort") {
    val p = QualityQueries.q46TopBigrams.fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val first = p.indexOf("HashAggregate")
    assert(first >= 0 && p.indexOf("HashAggregate", first + 1) > 0,
      s"expected map-side partial + final aggregate:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected top-k via TakeOrderedAndProject, not a global sort:\n$p")
  }

  test("positionalFpScala equals the q16 Column fingerprint on random corpora") {
    // the ONE combiner every content-keyed decision shares (q16 column
    // form, q59/q64 typed maps, CorpusJob assembly) — pinned here so a
    // divergent edit to either side fails by name. Random ASCII plus
    // the adversarial shapes: empty, single char, runs of spaces, long.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def randText(): String = {
      val n = rnd.nextInt(40)
      (0 until n).map { _ =>
        if (rnd.nextInt(5) == 0) ' ' else (33 + rnd.nextInt(94)).toChar
      }.mkString
    }
    val texts = Seq("", " ", "a", "  double  spaced  ", "x" * 500) ++
      (1 to 200).map(_ => randText())
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val t = TextOps.tokens(col("text"))
    val terms = transform(t, (w, i) => (i.cast("long") + 1L) * TextOps.wordFeature(w))
    val colFp = pmod(aggregate(terms, lit(0L), (acc, x) => acc + x), lit(1000000007L))
    val fromColumn = df.select(col("doc_id"), colFp.as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (txt, i) =>
      assert(TextOps.positionalFpScala(txt) == fromColumn(i.toLong),
        s"Scala/Column fingerprint diverged on ${txt.take(40).mkString}")
    }
  }
}
