package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Semantic invariants for the web-corpus operators (q67/q68/q69).
  * Exact values are gated cross-engine by the DuckDB oracle; these pin
  * the SEMANTICS the oracle arithmetic encodes, so a same-on-both-sides
  * fixture drift cannot silently change what the operator means.
  */
class WebCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q67: keep-first paragraph dedup — survivors partition the distinct paragraph set") {
    val out = graft.SparkEntry.queries("q67_para_dedup")(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nDocs = docs.count()
    assert(out.count() == nDocs, "every document keeps a row even when fully deduped")
    // p(d,j) is bijective per j, so every document's text occurs as a
    // paragraph: total survivors == distinct paragraph texts corpus-wide
    val distinctTexts = docs.select("text").distinct().count()
    val totalKept = out.agg(sum("n_kept")).head.getLong(0)
    assert(totalKept == distinctTexts,
      s"keep-first must retain exactly one copy per distinct paragraph: $totalKept vs $distinctTexts")
    // the universal boilerplate (p(d,0)=0) survives only in doc 0
    val d0 = out.filter(col("doc_id") === 0).head
    assert(d0.getAs[Long]("n_kept") >= 1)
    assert(out.filter(col("doc_id") > 0 && col("n_kept") > 3).count() == 0,
      "for d>0 the j=0 boilerplate is never first — at most 3 survivors")
    // fully-deduped docs hash the empty reconstruction
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert(out.filter(col("n_kept") === 0 && col("clean_hash") =!= emptyMd5).count() == 0)
    out.unpersist()
  }

  test("q68: blocklisted hosts are absent and the rollup accounts for every surviving doc") {
    val out = graft.SparkEntry.queries("q68_host_stats")(spark, sf).cache()
    val hosts = out.select("host").collect().map(_.getString(0))
    assert(hosts.nonEmpty)
    hosts.foreach { h =>
      val num = h.stripPrefix("h").takeWhile(_.isDigit).toLong
      assert(num % 5 != 0, s"blocklisted host $h leaked through the anti-join")
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val surviving = docs.filter(pmod(col("doc_id") * col("doc_id"), lit(37L)) % 5 =!= 0).count()
    val rolled = out.agg(sum("n_docs")).head.getLong(0)
    assert(rolled == surviving, s"per-host n_docs must partition the kept corpus: $rolled vs $surviving")
    out.unpersist()
  }

  test("q69: head-fraction score is a true fraction and the head is the global top-8") {
    val out = graft.SparkEntry.queries("q69_common_tokens")(spark, sf).cache()
    assert(out.filter(col("n_common") > col("n_tokens")).count() == 0)
    assert(out.filter(col("common_ppm") < 0 || col("common_ppm") > 1000000).count() == 0)
    // independently recompute the top-8 occurrence mass: per-doc
    // n_common must sum to it (the broadcast join dropped nothing)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
    val headMass = toks.groupBy("w").count()
      .orderBy(col("count").desc, col("w").asc).limit(8)
      .agg(sum("count")).head.getLong(0)
    val scored = out.agg(sum("n_common")).head.getLong(0)
    assert(scored == headMass, s"head mass mismatch: $scored vs $headMass")
    out.unpersist()
  }

  test("q70: every document is scored, bigram mass is conserved, and scores are probabilities") {
    val out = graft.SparkEntry.queries("q70_lm_score")(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(out.count() == docs.count(), "LM filter must score every document, not drop low-fluency rows")
    // fluency is a mean of conditional probabilities: always within [0, 1e6] ppm
    assert(out.filter(col("fluency_ppm") < 0 || col("fluency_ppm") > 1000000).count() == 0)
    // map-only bigram derivation drops nothing: sum(n_bigrams) == sum(tokens - 1)
    val expected = docs
      .select((size(split(trim(col("text")), "\\s+")) - 1).cast("long").as("nb"))
      .agg(sum(when(col("nb") > 0, col("nb")).otherwise(0L))).head.getLong(0)
    val got = out.agg(sum("n_bigrams")).head.getLong(0)
    assert(got == expected, s"bigram mass mismatch: $got vs $expected")
    // a corpus-trained bigram table always explains its own corpus
    // better than the uniform floor somewhere
    assert(out.filter(col("fluency_ppm") > 0).count() > 0)
    out.unpersist()
  }

  test("q71: canonical forms are clean, groups are consistent, and keep-first partitions the corpus") {
    val out = graft.SparkEntry.queries("q71_url_canon")(spark, sf).cache()
    val n = out.count()
    // every canonical url is https, lowercase host, no www/port/fragment/utm residue
    val canonPat = "^https://example-cdn\\.com/articles/[0-9]+(\\?ref=[0-9]+)?$"
    assert(out.filter(!col("canon").rlike(canonPat)).count() == 0,
      "canonicalization left scheme/host/port/utm/fragment residue")
    // messy inputs really are messy: some urls differ from their canon
    assert(out.filter(col("url") =!= col("canon")).count() > 0)
    // exactly one representative per canonical group, and group sizes partition the corpus
    val groups = out.groupBy("canon")
      .agg(sum("keep").as("reps"), count(lit(1)).as("sz"),
        countDistinct("n_dups").as("szs"), max("n_dups").as("claimed"))
    assert(groups.filter(col("reps") =!= 1).count() == 0, "each group keeps exactly one representative")
    assert(groups.filter(col("szs") =!= 1 || col("claimed") =!= col("sz")).count() == 0,
      "n_dups must equal the true group size for every member")
    assert(out.filter(col("keep") === 1).agg(sum("n_dups")).head.getLong(0) == n,
      "representatives' group sizes must sum to the corpus")
    out.unpersist()
  }
}
