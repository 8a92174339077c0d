package graft.bench

import org.apache.spark.sql.SparkSession

/** Matched-window re-measurement for individual queries (r4 verdict:
  * q40 drifted +21% in a single-sample Bench window; separate drift
  * from host noise before calling it a regression). Times the named
  * queries INTERLEAVED over N rounds — every query samples once per
  * round, so all queries share each round's noise window — and reports
  * per-query best/median across rounds.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.bench.QueryProbe
  *          [rounds] [queryName ...]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    // rounds is OPTIONAL: only consume args(0) as rounds when it parses
    // as an int, so `QueryProbe q52 q57` probes both queries instead of
    // silently dropping the first name
    val roundsOpt = args.headOption.flatMap(_.toIntOption)
    val rounds = roundsOpt.getOrElse(3)
    val nameArgs = if (roundsOpt.isDefined) args.drop(1).toSeq else args.toSeq
    val names =
      if (nameArgs.nonEmpty) nameArgs
      else Seq("q40_trained_recall", "q49_probe_sweep")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-query-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = names.map(n => n -> graft.SparkEntry.queries(n))
    // untimed warmup: codegen + C2 for each query's exact plan
    fns.foreach { case (_, fn) => fn(spark, sfDir).count(); spark.catalog.clearCache() }
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    for (_ <- 1 to rounds; (name, fn) <- fns) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      samples(name) = samples(name) :+ sec
    }
    fns.foreach { case (name, _) =>
      val xs = samples(name).sorted
      val med = if (xs.length % 2 == 1) xs(xs.length / 2) else (xs(xs.length / 2 - 1) + xs(xs.length / 2)) / 2
      println(f"[probe] $name best=${xs.min}%.3f median=$med%.3f samples=${samples(name).map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
