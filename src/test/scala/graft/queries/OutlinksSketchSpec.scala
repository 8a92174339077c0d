package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkTestSession

/** The 100 TB twin of qx_outlinks' per-href `count(distinct url)`:
  * the exact form needs a second Exchange keyed on (href, url), while
  * `approx_count_distinct` (HLL++) merges partials map-side and keeps
  * the whole rollup at ONE shuffle. Sketch bytes are engine-private,
  * so the gate is an accuracy envelope against the exact oracle-gated
  * values plus a plan-shape assertion — the q58/SketchAccuracySpec
  * split, applied to the link channel.
  */
class OutlinksSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def linkStream() = {
    import spark.implicits._
    graft.gen.SyntheticCorpus.generate(spark, 300L)
      .mapPartitions(_.flatMap { r =>
        graft.extract.Outlinks.extract(r.html).map(l => (r.url, l.href))
      })
      .toDF("url", "href")
  }

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // materialize so AQE finalizes the plan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: ShuffleExchangeExec => 1 + s.children.map(walk).sum
      case other =>
        other.children.map(walk).sum +
          other.subqueries.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("HLL distinct-page estimate lands within the envelope per href and in total") {
    val links = linkStream()
    val rows = links.groupBy("href")
      .agg(countDistinct(col("url")).as("exact"),
        approx_count_distinct(col("url"), 0.02).as("apx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val apx = r.getAs[Long]("apx").toDouble
      assert(math.abs(apx - exact) / exact <= 0.05,
        s"href ${r.getAs[String]("href")}: HLL $apx vs exact $exact past 5%")
    }
    val (te, ta) = rows.foldLeft((0L, 0L)) { case ((e, a), r) =>
      (e + r.getAs[Long]("exact"), a + r.getAs[Long]("apx")) }
    assert(math.abs(ta.toDouble - te.toDouble) / te <= 0.02,
      s"aggregate drift: $ta vs $te")
  }

  test("the sketch form shuffles once; the exact form pays the (href, url) Exchange") {
    val links = linkStream().localCheckpoint() // isolate the rollup plans
    val approxShuffles = countShuffles(
      links.groupBy("href").agg(approx_count_distinct(col("url"), 0.02).as("n")))
    val exactShuffles = countShuffles(
      links.groupBy("href").agg(countDistinct(col("url")).as("n")))
    assert(approxShuffles == 1, s"approx rollup should be one Exchange, saw $approxShuffles")
    assert(exactShuffles > approxShuffles,
      s"exact distinct should cost an extra Exchange (saw exact=$exactShuffles approx=$approxShuffles)")
  }
}
