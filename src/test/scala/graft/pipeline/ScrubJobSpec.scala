package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.io.TableIO
import java.nio.file.Files

class ScrubJobSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(): String = Files.createTempDirectory("graft_scrub").toString

  /** Build a fake extract-output table: two hosts, one with a site-wide
    * footer on every page, unique prose per page. */
  private def writeExtractOut(): String = {
    import spark.implicits._
    val rows = (0 until 12).map { i =>
      val host = if (i < 8) "a.org" else "b.net"
      val footer = if (i < 8) "\nCopyright a.org footer line" else ""
      (s"https://$host/page/$i", s"Unique prose line number $i.$footer", true)
    }
    val out = tmp()
    val batch = "b00001"
    rows.toDF("url", "markdown", "ok")
      .write.parquet(TableIO.stagingDir(out, batch))
    TableIO.commitBatch(out, batch)
    out
  }

  test("scrub job removes site-wide template lines, keeps prose, commits atomically") {
    val in = writeExtractOut()
    val out = tmp()
    val s = ScrubJob.run(spark, in, out)
    assert(s.docs == 12)
    assert(s.hosts == 2)
    assert(s.templateLines == 1) // the a.org footer
    val data = TableIO.readData(spark, out).get
    assert(data.count() == 12)
    // footer gone from every a.org page; prose intact
    assert(data.filter(col("markdown").contains("Copyright a.org")).count() == 0)
    assert(data.filter(col("markdown").contains("Unique prose line")).count() == 12)
    // bucketed layout for downstream bucket-pruned joins
    assert(data.columns.contains("bucket"))
    // host isolation: b.net pages untouched
    val b = data.filter(col("host") === "b.net")
    assert(b.count() == 4)
  }

  test("rerun REPLACES the output (full recompute, never duplicate batches)") {
    val in = writeExtractOut()
    val out = tmp()
    ScrubJob.run(spark, in, out)
    val s2 = ScrubJob.run(spark, in, out)
    val data = TableIO.readData(spark, out).get
    assert(data.count() == 12, "rerun must not append a duplicate corpus")
    assert(data.select("url").distinct().count() == 12)
    assert(s2.docs == 12)
  }

  test("unparsable urls become their own pseudo-host (no '' pooling)") {
    import spark.implicits._
    val rows = Seq(
      ("HTTP://UPPER.org/x", "Shared line\nprose one", true),
      ("//proto-relative.example/y", "Shared line\nprose two", true),
      ("garbage-url", "Shared line\nprose three", true))
    val in = tmp()
    val b = "b00001"
    rows.toDF("url", "markdown", "ok").write.parquet(TableIO.stagingDir(in, b))
    TableIO.commitBatch(in, b)
    val out = tmp()
    val s = ScrubJob.run(spark, in, out)
    // uppercase scheme parses (case-folded host); the other two become
    // their own pseudo-hosts — "Shared line" must survive everywhere
    // (no host has 2+ pages)
    assert(s.templateLines == 0)
    val data = TableIO.readData(spark, out).get
    assert(data.filter(col("markdown").contains("Shared line")).count() == 3)
    assert(data.filter(col("host") === "upper.org").count() == 1)
  }

  test("scrub job fails cleanly on a missing input table") {
    intercept[IllegalArgumentException] {
      ScrubJob.run(spark, tmp(), tmp())
    }
  }
}
