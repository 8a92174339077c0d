package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The approximate-sketch scale path behind q58: approx_percentile
  * (bounded-memory, mergeable — the only form that fits a 10^12-row
  * single pass) and approx_count_distinct (HLL++) pinned against their
  * exact twins. Sketch bytes are engine-private, so the right gate is
  * an accuracy envelope vs the exact oracle-gated values, not
  * cross-engine bit-equality (q58's doc comment states the split).
  */
class SketchAccuracySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("approx_percentile lands within the accuracy budget of the exact quantiles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rows = docs.groupBy("lang")
      .agg(
        percentile(col("n_chars"), lit(0.5)).as("exact_p50"),
        percentile(col("n_chars"), lit(0.9)).as("exact_p90"),
        // accuracy 10000 → rank error ≤ n/10000; generous envelope below
        approx_percentile(col("n_chars"), lit(0.5), lit(10000)).as("apx_p50"),
        approx_percentile(col("n_chars"), lit(0.9), lit(10000)).as("apx_p90"),
        min("n_chars").as("lo"), max("n_chars").as("hi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val span = math.max(1.0, r.getAs[Long]("hi").toDouble - r.getAs[Long]("lo").toDouble)
      def ok(e: Double, a: Long) = math.abs(e - a) / span <= 0.05
      assert(ok(r.getAs[Double]("exact_p50"), r.getAs[Long]("apx_p50")),
        s"p50 sketch out of envelope for ${r.getAs[String]("lang")}: $r")
      assert(ok(r.getAs[Double]("exact_p90"), r.getAs[Long]("apx_p90")),
        s"p90 sketch out of envelope for ${r.getAs[String]("lang")}: $r")
    }
  }

  test("approx_count_distinct within 5% of exact on document contents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val r = docs.agg(
      countDistinct(col("text")).as("exact"),
      approx_count_distinct(col("text"), 0.02).as("apx")).collect()(0)
    val exact = r.getAs[Long]("exact").toDouble
    val apx = r.getAs[Long]("apx").toDouble
    assert(math.abs(apx - exact) / exact <= 0.05,
      s"HLL estimate $apx vs exact $exact drifted past 5%")
  }

  test("the sketch is mergeable: partial sketches union to the global estimate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // two disjoint halves sketched independently, then merged by a
    // second aggregation over the union — the map-side-combine shape a
    // 1000-executor rollup uses
    val halves = docs.withColumn("half", (col("doc_id") % 2).cast("int"))
      .groupBy("half").agg(approx_count_distinct(col("text"), 0.02).as("c"))
    val partsSum = halves.agg(sum("c")).collect()(0).getLong(0).toDouble
    val global = docs.agg(approx_count_distinct(col("text"), 0.02)).collect()(0).getLong(0).toDouble
    // dup texts shared across halves make the naive sum an OVERestimate
    // of the true union; the global single sketch must stay below it
    // and within the envelope of exact
    val exact = docs.agg(countDistinct(col("text"))).collect()(0).getLong(0).toDouble
    assert(global <= partsSum * 1.05 && math.abs(global - exact) / exact <= 0.05,
      s"merge sanity failed: global=$global partsSum=$partsSum exact=$exact")
  }
}
