package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.io.TableIO
import java.nio.file.Files

/** End-to-end corpus assembly: extract → scrub → dedup → quality gate
  * → content-keyed split, with the invariants a training-corpus build
  * must hold — no duplicate texts anywhere, splits partition the
  * corpus, assignments reproducible from content alone.
  */
class CorpusJobSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(): String = Files.createTempDirectory("graft_corpus").toString

  test("assembles a deduped, quality-gated, split corpus with consistent counts") {
    val work = tmp()
    val s = CorpusJob.run(spark, "synthetic:200", work)
    assert(s.extract.extracted == 200 && s.extract.skippedDone == 0)
    val corpus = TableIO.readData(spark, s"$work/corpus").get
    assert(corpus.count() == s.docs)
    assert(s.docs + s.dupDropped + s.qualityDropped ==
      TableIO.readData(spark, s"$work/scrub").get.count(),
      "every scrubbed doc must be accounted for: kept, dup, or low-quality")
    // no byte-identical markdown survives twice — anywhere, not just per split
    assert(corpus.select("markdown").distinct().count() == s.docs)
    // splits partition the corpus
    assert(s.train + s.valN + s.test == s.docs)
    assert(corpus.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))
    // quality gate actually holds on the output
    assert(corpus.filter(col("n_tokens") < 10).count() == 0)
  }

  test("reproducible: a second build from scratch assigns identical splits") {
    val w1 = tmp(); val w2 = tmp()
    CorpusJob.run(spark, "synthetic:150", w1)
    CorpusJob.run(spark, "synthetic:150", w2)
    def snap(w: String) = TableIO.readData(spark, s"$w/corpus").get
      .select("url", "split", "fp").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(snap(w1) == snap(w2),
      "content-keyed assembly must be bit-reproducible across builds")
  }

  test("rerun over the same workdir: extraction resumes, assembly replaces") {
    val work = tmp()
    val s1 = CorpusJob.run(spark, "synthetic:120", work)
    val s2 = CorpusJob.run(spark, "synthetic:120", work)
    assert(s2.extract.skippedDone == 120 && s2.extract.extracted == 0,
      "second extract pass must anti-join resume everything")
    assert(s2.docs == s1.docs && s2.train == s1.train && s2.test == s1.test,
      "replace-mode assembly must converge to the same corpus")
    // exactly one committed corpus batch visible (replace, not append)
    assert(TableIO.readData(spark, s"$work/corpus").get.count() == s2.docs)
  }
}
