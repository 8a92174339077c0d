package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.TemplateScrub
import graft.io.TableIO

/** Corpus-level template scrub as a production stage: reads an
  * ExtractJob output table, removes site-wide template lines (a
  * normalized line on ≥`minPageRatio` of a host's pages — the A1
  * corpus semantics, split_md_to_pages.py:176-236 re-rooted at hosts),
  * and publishes a scrubbed table with the same bucketing and atomic
  * staging-rename commit.
  *
  * Scale shape: one wide shuffle keyed on (host, line) with map-side
  * partial aggregation; the per-host template set is tiny and AQE
  * broadcasts it back for the LEFT ANTI scrub; reassembly groups by
  * (host, url) — the same key space as the extract output, no hot keys
  * beyond a single host's pages. At 100 TB each stage keys on
  * high-cardinality composites; nothing collects to the driver except
  * the summary counts.
  *
  * Usage: ScrubJob --in <extractOut> --out <dir> [--ratio 0.4]
  *        [--buckets B] [--cores N]
  */
object ScrubJob {

  final case class Summary(batchId: String, docs: Long, hosts: Long,
                           templateLines: Long, wallSec: Double)

  private val hostRe = "^[a-z]+://([^/]+)"

  def run(spark: SparkSession, inDir: String, outDir: String,
          minPageRatio: Double = 0.4, nBuckets: Int = 8): Summary = {
    val t0 = System.nanoTime()
    TableIO.clearStaging(outDir)
    val batchId = TableIO.nextBatchId(outDir)

    val docs = TableIO.readData(spark, inDir)
      .getOrElse(throw new IllegalArgumentException(s"no extract output at $inDir"))
      .filter(col("ok"))
      .select(col("url"), col("markdown"))
      .withColumn("host", regexp_extract(col("url"), hostRe, 1))

    // the template set is computed once and reused by the report —
    // small (per-host boilerplate), safe to cache
    val boiler = TemplateScrub.boilerplateLines(docs, "host", "url", "markdown",
      minPageRatio).cache()
    val nTemplates = boiler.count()
    val nHosts = docs.select("host").distinct().count()

    val scrubbed = TemplateScrub.scrub(docs, "host", "url", "markdown", minPageRatio)
      .select(col("id").as("url"), col("h").as("host"),
        col("n_kept"), col("cleaned").as("markdown"))
      .withColumn("bucket", pmod(xxhash64(col("url")), lit(nBuckets)))

    val staging = TableIO.stagingDir(outDir, batchId)
    scrubbed.write.mode("overwrite").partitionBy("bucket").parquet(staging)
    val nDocs = spark.read.schema(scrubbed.schema).parquet(staging).count()
    boiler.unpersist()
    TableIO.commitBatch(outDir, batchId)
    Summary(batchId, nDocs, nHosts, nTemplates, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => (k, v) }.toMap
    val inDir = opts.getOrElse("--in", "/tmp/graft_out")
    val outDir = opts.getOrElse("--out", "/tmp/graft_scrubbed")
    val ratio = opts.getOrElse("--ratio", "0.4").toDouble
    val nBuckets = opts.getOrElse("--buckets", "8").toInt
    val cores = opts.getOrElse("--cores", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-scrub")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val s = run(spark, inDir, outDir, ratio, nBuckets)
    println(
      s"""{"batch":"${s.batchId}","docs":${s.docs},"hosts":${s.hosts},""" +
      s""""template_lines":${s.templateLines},"wall_sec":${s.wallSec}}""")
    spark.stop()
  }
}
