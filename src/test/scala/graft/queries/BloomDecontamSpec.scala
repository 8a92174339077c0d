package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkTestSession

/** The Bloom-filter twin of q57's decontamination broadcast — the
  * 100 TB scale path when even the distinct benchmark-hash relation is
  * too large to ship row-wise: `DataFrameStatFunctions.bloomFilter`
  * folds the benchmark side into ONE broadcastable sketch (bits ≈
  * 1.44·n·log2(1/fpp); 10^9 hashes at 1% ≈ 1.2 GB — a per-executor
  * memory budget, not a join), and `mightContainLong` sieves the
  * corpus inside a map-side filter. The Bloom guarantee is one-sided:
  * ZERO false negatives (no contaminated document slips through) and a
  * bounded false-positive rate — the standard two-tier decontam is
  * this cheap sieve followed by q57's exact pass over the survivors
  * only (q57's doc comment states the tiering). Sketch bytes are
  * engine-private, so the gate is the guarantee + envelope + plan
  * shape, the q58/SketchAccuracySpec split.
  */
class BloomDecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .filter(col("text").isNotNull)

  test("zero false negatives, bounded false positives, broadcast-sized sketch") {
    import spark.implicits._
    val bench = docs.filter(col("doc_id") % 17 === 0)
      .select(xxhash64(col("text")).as("h"))
    val bf = bench.stat.bloomFilter("h", 10000L, 0.01)
    assert(bf.bitSize() < 200000L, s"sketch unexpectedly large: ${bf.bitSize()} bits")
    val bcast = spark.sparkContext.broadcast(bf)

    // ground truth: a doc is truly contaminated iff its text equals a
    // benchmark doc's text (the benchmark slice itself + exact dups)
    val benchTexts = docs.filter(col("doc_id") % 17 === 0)
      .select(col("text").as("btext")).distinct()
    val truth = docs.select(col("doc_id"), col("text"),
        xxhash64(col("text")).as("h"))
      .join(benchTexts, col("text") === col("btext"), "left")
      .select(col("doc_id"), col("h"), col("btext").isNotNull.as("truly"))
      .as[(Long, Long, Boolean)].collect()

    val falseNeg = truth.count { case (_, h, truly) =>
      truly && !bcast.value.mightContainLong(h) }
    assert(falseNeg == 0, s"Bloom sieve dropped $falseNeg truly-contaminated docs")
    val clean = truth.filter(!_._3)
    val fpr = clean.count { case (_, h, _) => bcast.value.mightContainLong(h) }
      .toDouble / math.max(1, clean.length)
    assert(fpr <= 0.03, f"false-positive rate $fpr%.4f exceeds 3x the configured 0.01")
  }

  test("the sieve is a map-side filter: zero shuffles on the corpus side") {
    import spark.implicits._
    val bf = docs.filter(col("doc_id") % 17 === 0)
      .select(xxhash64(col("text")).as("h"))
      .stat.bloomFilter("h", 10000L, 0.01)
    val bcast = spark.sparkContext.broadcast(bf)
    val sieved = docs.select(col("doc_id"), xxhash64(col("text")).as("h"))
      .as[(Long, Long)]
      .filter { case (_, h) => bcast.value.mightContainLong(h) }
    sieved.count() // finalize AQE
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case s: ShuffleExchangeExec => 1 + s.children.map(shuffles).sum
      case o => o.children.map(shuffles).sum + o.subqueries.map(shuffles).sum
    }
    assert(shuffles(sieved.queryExecution.executedPlan) == 0,
      "bloom sieve must not shuffle the corpus")
  }
}
