package graft

import org.apache.spark.sql.SparkSession

/** Round benchmark: times every registered query on SPARK_GRAFT_SF_DIR
  * and the headline extraction throughput, printing ONE JSON line.
  *
  * `value` = total seconds across all queries (the driver's headline);
  * extra keys report the north metric (extraction docs/sec) and corpus
  * size so rounds are comparable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm the JVM/codegen once on the smallest sf (excluded from timing)
    try SparkEntry.queries("q01_pricing_agg")(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, sec, n)
    }

    // headline: extraction throughput over the synthetic pages corpus
    val nPages = graft.queries.ExtractQueries.corpusSize(sfDir)
    val t0 = System.nanoTime()
    import spark.implicits._
    val nOk = graft.gen.SyntheticCorpus.generate(spark, nPages)
      .mapPartitions(graft.extract.Extractor.run(_))
      .filter(_.ok).count()
    val extractSec = (System.nanoTime() - t0) / 1e9
    val docsPerSec = nPages / extractSec

    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    spark.stop()

    // north-rule scaling evidence inline (N vs 4N parallelism on the same
    // input; best of 2 interleaved rounds; JIT already warm from above)
    import graft.bench.ScalingBench
    // fixed size regardless of sf: each runAt builds a fresh session
    // whose codegen re-JITs, so short runs measure compilation, not the
    // engine — size for ≥4 s of work at the fast level
    val scalePages = 400000L
    val runs = (1 to 2).flatMap(_ => Seq(ScalingBench.runAt(8, scalePages), ScalingBench.runAt(32, scalePages)))
    val lo = runs.filter(_.cores == 8).map(_.docsPerSec).max
    val hi = runs.filter(_.cores == 32).map(_.docsPerSec).max
    val eff = (hi / lo) / 4.0
    val ceiling = ScalingBench.cpuCeiling(8, 32)
    val identical = runs.map(_.outputMd5).distinct.length == 1

    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      f""""extract_docs_per_sec":$docsPerSec%.1f,"extract_pages":$nPages,"extract_ok":$nOk,"cores":$cpus,""" +
      f""""scaling":{"lo_cores":8,"hi_cores":32,"lo_docs_per_sec":$lo%.1f,"hi_docs_per_sec":$hi%.1f,""" +
      f""""efficiency":$eff%.3f,"cpu_smt_ceiling":$ceiling%.3f,"efficiency_vs_ceiling":${eff / ceiling}%.3f,""" +
      f""""output_byte_identical":$identical}}""")
  }
}
