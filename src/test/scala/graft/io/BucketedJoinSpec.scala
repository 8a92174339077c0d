package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The load-bearing property of TableIO.writeBucketed: once a table is
  * bucketed on its join key, downstream joins and aggregations on that
  * key plan WITHOUT an Exchange — the shuffle was paid once at write
  * time. Broadcast and AQE are disabled here to force the general
  * (sort-merge) plan a 100 TB join would take.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed join and bucket-key aggregation plan without Exchange") {
    import spark.implicits._
    TableIO.ensureBucketDb(spark, "graft_bkt",
      java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_bkt_db").toString)
    TableIO.writeBucketed(
      (0L until 1000L).map(i => (i, s"a$i")).toDF("k", "va"), "graft_bkt.spec_a", 4, "k")
    TableIO.writeBucketed(
      (0L until 1000L).map(i => (i, i * 2)).toDF("k2", "vb"), "graft_bkt.spec_b", 4, "k2")

    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {

      val j = spark.table("graft_bkt.spec_a")
        .join(spark.table("graft_bkt.spec_b"), col("k") === col("k2"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected the general join plan:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(j.count() == 1000)

      val g = spark.table("graft_bkt.spec_a").groupBy("k").count()
      val pg = g.queryExecution.executedPlan.toString
      assert(!pg.contains("Exchange"), s"bucket-key aggregation must not shuffle:\n$pg")
      assert(g.count() == 1000)
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    import spark.implicits._
    // self-contained: create the db and both sides here, so this test
    // holds in isolation and after a first-test failure
    TableIO.ensureBucketDb(spark, "graft_bkt",
      java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_bkt_db").toString)
    TableIO.writeBucketed(
      (0L until 1000L).map(i => (i, s"a$i")).toDF("k", "va"), "graft_bkt.spec_a2", 4, "k")
    TableIO.writeBucketed(
      (0L until 100L).map(i => (i, i)).toDF("k2", "vb"), "graft_bkt.spec_c", 3, "k2")
    val j = spark.table("graft_bkt.spec_a2")
      .join(spark.table("graft_bkt.spec_c"), col("k") === col("k2"))
    assert(j.count() == 100)
  }
}
