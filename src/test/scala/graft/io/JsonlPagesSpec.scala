package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** JSONL+seek source (SURVEY S5/K3 — gen_seek.py analog): lossless
  * round-trip including BINARY columns, and a real random-access seek
  * contract over the shard bytes.
  */
class JsonlPagesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("pages round-trip losslessly through JSONL shards, html binary included") {
    // perturb timestamps to sub-millisecond precision: the round-trip
    // must carry microseconds, not silently truncate to millis
    val pages = graft.gen.SyntheticCorpus.generate(spark, 200).toDF()
      .withColumn("warc_ts", expr("timestampadd(MICROSECOND, 123456, warc_ts)"))
    val dir = java.nio.file.Files.createTempDirectory("jsonl_pages").toString
    JsonlPages.write(pages, dir, shards = 4)
    val back = JsonlPages.read(spark, dir, pages.schema)
    // compare as (url → md5(html), text, lang, full-precision ts) maps
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("url"), md5(col("html")).as("h"), col("text"), col("lang"),
          col("warc_ts").cast("string").as("ts"))
        .collect().map(r => r.getString(0) ->
          (r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    val a = snap(pages)
    val b = snap(back)
    assert(b.size == 200 && a == b, "JSONL round-trip must be lossless")
    assert(a.values.forall(_._4.endsWith(".123456")), "fixture must carry microseconds")
  }

  test("seek index: every (path, offset, len) fetches exactly its record") {
    val pages = graft.gen.SyntheticCorpus.generate(spark, 50)
    val dir = java.nio.file.Files.createTempDirectory("jsonl_seek").toString
    JsonlPages.write(pages.toDF(), dir, shards = 3)
    val idx = JsonlPages.seekIndex(spark, dir, "url").collect()
    assert(idx.length == 50, s"one seek row per record, got ${idx.length}")
    // random-access every record and confirm the key matches the index
    idx.foreach { r =>
      val rec = JsonlPages.fetch(r.getString(0), r.getLong(2), r.getLong(3))
      assert(rec.contains("\"" + r.getString(4) + "\""),
        s"seek fetch at ${r.getLong(2)} did not contain url ${r.getString(4)}")
      assert(!rec.contains("\n"), "a fetched record is exactly one line")
    }
    // keys are unique and complete
    assert(idx.map(_.getString(4)).distinct.length == 50)
  }

  test("topLevelScalar: depth-1 only, unescapes, rejects non-scalars") {
    import JsonlPages.topLevelScalar
    // a same-named field nested earlier must NOT shadow the top-level one
    assert(topLevelScalar("""{"meta":{"url":"inner"},"url":"outer"}""", "url")
      == Some("outer"))
    // escapes in both key and value
    assert(topLevelScalar("""{"a\nb":"x\tyA"}""", "a\nb") == Some("x\tyA"))
    // numbers and booleans come back literally
    assert(topLevelScalar("""{"n":-1.5e3,"b":true}""", "n") == Some("-1.5e3"))
    assert(topLevelScalar("""{"n":-1.5e3,"b":true}""", "b") == Some("true"))
    // absent / null / non-scalar → None (seekIndex then fails loudly)
    assert(topLevelScalar("""{"a":1}""", "zz").isEmpty)
    assert(topLevelScalar("""{"a":null}""", "a").isEmpty)
    assert(topLevelScalar("""{"a":[1,2]}""", "a").isEmpty)
    assert(topLevelScalar("""{"a":{"b":1}}""", "a").isEmpty)
    // a string VALUE equal to the key name must not be mistaken for a key
    assert(topLevelScalar("""{"x":"url","url":7}""", "url") == Some("7"))
    // truncated records refuse rather than silently indexing a prefix
    assert(topLevelScalar("""{"url":"abc""", "url").isEmpty)
    assert(topLevelScalar("""{"url""", "url").isEmpty)
    // a bare unquoted token is corruption, not a key
    assert(topLevelScalar("""{"url":abc}""", "url").isEmpty)
  }

  test("seekIndex fails loudly when the key field is absent") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_badkey").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-0.txt"), "{\"a\":1}\n{\"a\":2}\n")
    val ex = intercept[org.apache.spark.SparkException] {
      JsonlPages.seekIndex(spark, dir, "missing").collect()
    }
    assert(ex.getMessage.contains("missing") ||
      Option(ex.getCause).exists(_.getMessage.contains("missing")))
  }
}
