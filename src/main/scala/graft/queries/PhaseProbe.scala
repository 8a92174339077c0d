package graft.queries

import org.apache.spark.sql.SparkSession

/** Ad-hoc phase timer for optimization work: times the internal stages
  * of the q38 chain (sig → bands → cand → jaccard pairs → verified →
  * connected components → full query) in one warm session so a
  * regression can be attributed to a phase instead of guessed at.
  * Not part of the driver contract; bench-side tooling only.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-phase-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    import spark.implicits._
    def q72Links() = graft.gen.SyntheticCorpus
      .generate(spark, ExtractQueries.corpusSize(sfDir))
      .mapPartitions(_.flatMap { r =>
        graft.extract.Outlinks.extract(r.html).map(l => (r.url, l.href))
      })
      .toDF("url", "href")
    def q72Edges() = q72Links()
      .select(col("url").as("src"),
        when(col("href").startsWith("/"),
          concat(regexp_extract(col("url"), "^(https?://[^/]+)", 1), col("href")))
          .otherwise(col("href")).as("dst"))
      .distinct()
    // warmup
    Dedup.q38DedupClusters.fn(spark, sfDir).count()
    GraphQueries.q72LinkRank.fn(spark, sfDir).count()
    for (_ <- 1 to rounds) {
      time("full q38")(Dedup.q38DedupClusters.fn(spark, sfDir).count())
      time("pairsJaccard.count")(Dedup.probePairsWithJaccard(spark, sfDir).count())
      time("verified+cc")(Dedup.probeCc(spark, sfDir).count())
      time("q72 links only")(q72Links().count())
      time("q72 edges distinct")(q72Edges().count())
      time("full q72")(GraphQueries.q72LinkRank.fn(spark, sfDir).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
