package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestSession

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("windowed streaming counts equal the batch computation") {
    import spark.implicits._
    // the file stream source requires a directory: stage the events file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val evStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = EventStreams.windowedCounts(evStream)
      .writeStream.outputMode("append")
      .format("memory").queryName("win_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.awaitTermination(60000); q.stop()
    val streamed = spark.table("win_counts")
    val batch = EventStreams.windowedCounts(spark.read.parquet(s"$sf/events.parquet"))
    // append mode emits only watermark-closed windows: all but the last
    val streamedN = streamed.count()
    val batchN = batch.count()
    assert(streamedN > 0 && streamedN <= batchN)
    // every emitted row matches the batch result exactly
    assert(streamed.except(batch).count() == 0)
  }

  test("stream-static enrichment matches the batch join and keeps no state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events_enrich")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val evStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val dim = Seq(("click", 1.0), ("view", 0.1), ("purchase", 10.0))
      .toDF("event_type", "weight")
    val q = EventStreams.enrichStream(evStream, dim, "event_type")
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    // stateless: a stream-static join must not allocate a state store
    assert(q.recentProgress.flatMap(_.stateOperators).isEmpty,
      "stream-static join must be stateless")
    q.awaitTermination(60000); q.stop()
    val streamed = spark.table("enriched")
    val batch = EventStreams.enrichStream(
      spark.read.parquet(s"$sf/events.parquet"), dim, "event_type")
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)
  }

  test("sessionization state machine closes sessions on gaps") {
    import spark.implicits._
    def ev(id: Long, user: Long, minute: Long) =
      EventStreams.Event(id, new java.sql.Timestamp(minute * 60000L), user, "click", 1.0, "{}")
    // two sessions for user 1 (gap 120 min), one open session for user 2
    val events = Seq(
      ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 20),
      ev(4, 1, 140), ev(5, 1, 150),
      ev(6, 2, 5)
    ).toDS()
    val closed = EventStreams.sessionize(events, gapMs = 30 * 60000L).collect()
    assert(closed.length == 1) // only user 1's first session closed
    val s = closed.head
    assert(s.user_id == 1 && s.n_events == 3 && s.total_value == 3.0)
    assert(s.started_ms == 0 && s.last_ms == 20 * 60000L)
  }

  test("streaming near-dup band filter: a one-word edit loses its bands across batches") {
    import spark.implicits._
    // fixture pinned against the mixed simhash: B is A with one word
    // changed (Hamming distance 1 → shares 3 of 4 bands with A); C and D
    // are unrelated with fully distinct band values
    val a = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    val b = "the quick brown fox jumps over the lazy dog and sprints far away tonight"
    val c = "completely unrelated subject matter discussing numerical weather prediction models yesterday"
    val d = "another entirely distinct document about medieval castle architecture and fortification design"
    def rows(ids: Seq[(Long, String, Long)]) = ids.toDF("doc_id", "text", "minute")
      .select(col("doc_id"), col("text"),
        (col("minute") * 60L).cast("timestamp").as("ts")) // long→ts = SECONDS
    val dir = java.nio.file.Files.createTempDirectory("neardup_stream")
    // minute 10, not 0: an event time equal to the INITIAL watermark
    // (epoch) is already "late" (the predicate is ts > watermark) and
    // would be silently dropped
    rows(Seq((1L, a, 10L))).coalesce(1).write.parquet(dir.toString + "/f1")
    // doc 5 is an EXACT copy of doc 1: loses all 4 bands, so it emits no
    // claim rows at all — classifyClaims must still return it (novel=false)
    rows(Seq((2L, b, 12L), (3L, c, 13L), (4L, d, 14L), (5L, a, 15L)))
      .coalesce(1).write.parquet(dir.toString + "/f2")
    val flat = java.nio.file.Files.createTempDirectory("neardup_flat")
    Seq("f1", "f2").zipWithIndex.foreach { case (f, i) =>
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$f"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(s"part$i.parquet")
      java.nio.file.Files.copy(src, dst)
      // the file source orders triggers by modification time; equal
      // mtimes make the trigger order a coin flip, and a later-file-first
      // order advances the watermark past doc 1 (late rows are DROPPED
      // by dropDuplicatesWithinWatermark) — pin the order explicitly
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
    }
    val schema = spark.read.parquet(flat.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val q = EventStreams.bandClaimsStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("band_claims")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.awaitTermination(60000); q.stop()
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val verdicts = EventStreams.classifyClaims(spark.table("band_claims"), docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(verdicts.toSeq == Seq(
      (1L, 4L, true),   // first arrival claims everything
      (2L, 1L, false),  // near-dup of 1: only its single differing band
      (3L, 4L, true), (4L, 4L, true),
      (5L, 0L, false))) // exact dup: zero claims, still classified
  }

  test("streaming band verdicts equal the batch q42 twin on a shared corpus") {
    import spark.implicits._
    // 20 real docs streamed one per trigger in doc_id order, so the
    // stream's first-arrival winner is the batch twin's min-doc_id winner
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(20).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val corpusDir = java.nio.file.Files.createTempDirectory("twin_corpus")
    docs.toSeq.toDF("doc_id", "text")
      .write.parquet(corpusDir.toString + "/documents.parquet")
    val flat = java.nio.file.Files.createTempDirectory("twin_stream")
    docs.zipWithIndex.foreach { case ((id, text), i) =>
      val f = java.nio.file.Files.createTempDirectory("twin_one")
      Seq((id, text, (10L + i) * 60L))
        .toDF("doc_id", "text", "sec")
        .select(col("doc_id"), col("text"), col("sec").cast("timestamp").as("ts"))
        .coalesce(1).write.parquet(f.toString + "/p")
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(s"$f/p"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"part$i%03d.parquet")
      java.nio.file.Files.copy(src, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
    }
    val schema = spark.read.parquet(flat.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val q = EventStreams.bandClaimsStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("twin_claims")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.awaitTermination(120000); q.stop()
    val streamed = EventStreams.classifyClaims(
      spark.table("twin_claims"), docs.toSeq.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    val batch = graft.queries.Dedup.q42BandClaims.fn(spark, corpusDir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(streamed == batch,
      s"streaming and batch twins diverged:\nstream=$streamed\nbatch =$batch")
    assert(batch.exists(!_._3), "fixture should contain at least one band collision")
  }

  test("streaming exact dedup: first content-hash arrival wins across batches") {
    import spark.implicits._
    // two parquet files → two triggers; duplicates appear both inside a
    // batch and ACROSS batches (the state-store path)
    val dir = java.nio.file.Files.createTempDirectory("dedup_stream")
    def rows(ids: Seq[(Long, String, Long)]) = ids.toDF("doc_id", "text", "minute")
      .select(col("doc_id"), col("text"),
        (col("minute") * 60000L).cast("timestamp").as("ts"))
    rows(Seq((1L, "alpha", 0L), (2L, "beta", 1L), (3L, "alpha", 2L)))
      .coalesce(1).write.parquet(dir.toString + "/f1")
    rows(Seq((4L, "beta", 3L), (5L, "gamma", 4L)))
      .coalesce(1).write.parquet(dir.toString + "/f2")
    // stage as a flat dir of files for the stream source
    val flat = java.nio.file.Files.createTempDirectory("dedup_flat")
    Seq("f1", "f2").zipWithIndex.foreach { case (f, i) =>
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$f"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(src, flat.resolve(s"part$i.parquet"))
    }
    val schema = spark.read.parquet(flat.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val q = EventStreams.dedupStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.awaitTermination(60000); q.stop()
    val out = spark.table("dedup_out").select("text").as[String].collect().sorted
    // one row per distinct content: alpha, beta, gamma
    assert(out.toSeq == Seq("alpha", "beta", "gamma"))
  }
}
