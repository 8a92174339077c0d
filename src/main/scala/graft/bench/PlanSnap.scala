package graft.bench

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Writes the `.explain("formatted")` output of named queries to
  * plans/<round>/<query>_<tag>.txt — the before/after plan evidence an
  * optimization round commits next to its bench numbers (the judge
  * checks plan claims against these files; it cannot run Spark).
  *
  * Usage: runMain graft.bench.PlanSnap <round> <tag> [queryName ...]
  *   e.g. runMain graft.bench.PlanSnap r07 before q42_band_claims q72_link_rank
  *
  * Runs at the Bench session shape (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus, AQE on) over $SPARK_GRAFT_SF_DIR so the dumped
  * plan is the one the bench actually executes. Queries whose builder
  * runs eager actions (localCheckpoint rounds, materialize caches)
  * execute those while building; the dump then shows the final plan
  * over the checkpointed intermediates, which is what executes too.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <round> <tag> <query> [query ...]")
    val round = args(0)
    val tag = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plansnap")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("plans", round)
    Files.createDirectories(outDir)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${n}_$tag.txt"), txt)
      println(s"[plansnap] wrote ${outDir.resolve(s"${n}_$tag.txt")} (${txt.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
