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

  test("scrub job fails cleanly on a missing input table") {
    intercept[IllegalArgumentException] {
      ScrubJob.run(spark, tmp(), tmp())
    }
  }
}
