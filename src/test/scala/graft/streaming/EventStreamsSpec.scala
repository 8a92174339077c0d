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
    val closed = EventStreams.sessionize(events, gapUs = 30L * 60L * 1000000L).collect()
    assert(closed.length == 1) // only user 1's first session closed
    val s = closed.head
    assert(s.user_id == 1 && s.n_events == 3 && s.total_value == 3.0)
    assert(s.started_us == 0 && s.last_us == 20L * 60L * 1000000L)
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

  test("NULL text: stream emits the batch twin's null-band rows and verdicts agree") {
    import spark.implicits._
    // docs 2 and 3 have NULL text: the batch twin's Column null
    // propagation gives them NULL simhash → 4 NULL-band rows each, so
    // they compete in the same four NULL buckets (2 claims them all,
    // 3 loses all). The stream must produce those same verdicts — and
    // must not NPE in the typed map (the r3 ADVICE finding).
    val a = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    val d = "another entirely distinct document about medieval castle architecture and fortification design"
    val corpus = Seq((1L, Option(a)), (2L, Option.empty[String]),
                     (3L, Option.empty[String]), (4L, Option(d)))
    val corpusDir = java.nio.file.Files.createTempDirectory("null_corpus")
    corpus.toDF("doc_id", "text").write.parquet(corpusDir.toString + "/documents.parquet")
    val flat = java.nio.file.Files.createTempDirectory("null_stream")
    corpus.zipWithIndex.foreach { case ((id, text), i) =>
      val f = java.nio.file.Files.createTempDirectory("null_one")
      Seq((id, text, (10L + i) * 60L)).toDF("doc_id", "text", "sec")
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
      .format("memory").queryName("null_claims")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.awaitTermination(60000); q.stop()
    val docsDf = corpus.map(_._1).toDF("doc_id")
    val streamed = EventStreams.classifyClaims(spark.table("null_claims"), docsDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    val batch = graft.queries.Dedup.q42BandClaims.fn(spark, corpusDir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(streamed == batch,
      s"NULL-text verdicts diverged:\nstream=$streamed\nbatch =$batch")
    assert(streamed.find(_._1 == 2L).exists(v => v._2 == 4L && v._3),
      "first NULL-text doc should claim all four NULL bands")
    assert(streamed.find(_._1 == 3L).exists(v => v._2 == 0L && !v._3),
      "second NULL-text doc should lose every NULL band to the first")
  }

  test("late arrival past the watermark is dropped, and reconcileLate recovers it") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    val c = "completely unrelated subject matter discussing numerical weather prediction models yesterday"
    def writeFile(flat: java.nio.file.Path, i: Int, rows: Seq[(Long, String, Long)]): Unit = {
      val f = java.nio.file.Files.createTempDirectory("late_one")
      rows.toDF("doc_id", "text", "minute")
        .select(col("doc_id"), col("text"), (col("minute") * 60L).cast("timestamp").as("ts"))
        .coalesce(1).write.parquet(f.toString + "/p")
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(s"$f/p"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"part$i%03d.parquet")
      java.nio.file.Files.copy(src, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
    }
    val flat = java.nio.file.Files.createTempDirectory("late_stream")
    // batch 0: doc 1 at minute 10 claims its bands. batch 1: doc 2 at
    // minute 60 (watermark computation lags one batch: runs at wm=0).
    // batch 2: doc 5 at minute 61 runs at eviction-wm=50. batch 3:
    // doc 3 (late UNIQUE) and doc 4 (late exact dup of doc 1) at
    // minute 12 — the late-events filter (itself one batch behind
    // eviction, hence the doc-5 spacer batch) now sits at wm=50, so
    // BOTH late rows are dropped before the dedup state: zero claim
    // rows, and the sink alone misclassifies the late unique doc 3 as
    // novel=false.
    writeFile(flat, 0, Seq((1L, a, 10L)))
    writeFile(flat, 1, Seq((2L, "fresh on-time document about deep sea exploration and hydrothermal vents", 60L)))
    writeFile(flat, 2, Seq((5L, "a fifth entirely separate page describing alpine railway tunnel construction techniques", 61L)))
    writeFile(flat, 3, Seq((3L, c, 12L), (4L, a, 12L)))
    val schema = spark.read.parquet(flat.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val q = EventStreams.bandClaimsStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("late_claims")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.awaitTermination(60000); q.stop()
    val claims = spark.table("late_claims")
    // the hazard the caveat documents: both late docs dropped before
    // the state, so the late UNIQUE doc 3 reads as a dup in the sink
    assert(claims.where(col("doc_id").isin(3L, 4L)).count() == 0,
      s"late rows not dropped; sink=${claims.collect().toSeq.sortBy(_.getLong(0))}")
    val naive = EventStreams.classifyClaims(claims, Seq(3L, 4L).toDF("doc_id"))
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(naive == Map(3L -> false, 4L -> false))
    // the documented routing: docs flagged late at ingest (event time ≤
    // watermark on arrival) are re-judged against the full claims
    // history, overriding their streamed verdicts
    val lateDocs = Seq((3L, c), (4L, a)).toDF("doc_id", "text")
    val lateClaims = EventStreams.reconcileLate(claims, lateDocs)
    val recovered = EventStreams.classifyClaims(lateClaims, lateDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    // doc 3 is genuinely novel (its bands appear nowhere else in the
    // history); doc 4 duplicates on-time doc 1, whose sink rows still
    // hold those bands → novel=false, the verdict the stream got wrong
    assert(recovered == Seq((3L, 4L, true), (4L, 0L, false)),
      s"reconciliation verdicts wrong: $recovered")
  }

  test("reconcileLate multi-pass contract: folded-back outputs block cross-pass duplicates") {
    import spark.implicits._
    val dupText = "identical late straggler text repeated by two documents arriving in different passes"
    // empty sink: no on-time doc holds these bands
    val sink0 = Seq.empty[(Long, Int, Option[Long])].toDF("doc_id", "band_idx", "band_val")
    val late1 = Seq((10L, dupText)).toDF("doc_id", "text")
    val r1 = EventStreams.reconcileLate(sink0, late1)
    assert(EventStreams.classifyClaims(r1, late1).collect().head.getBoolean(2),
      "first-pass late unique must recover novel=true")
    val late2 = Seq((20L, dupText)).toDF("doc_id", "text")
    // sound pattern (2): pass-1 outputs appended to the sink count as
    // settled non-late claims — the cross-pass duplicate is blocked
    val r2 = EventStreams.reconcileLate(sink0.unionByName(r1), late2)
    val v2 = EventStreams.classifyClaims(r2, late2).collect().head
    assert(!v2.getBoolean(2) && v2.getLong(1) == 0L,
      s"cross-pass duplicate must lose all bands under fold-back, got $v2")
    // the contract violation the doc comment warns about: without
    // fold-back, the second pass re-awards the same bands
    val r2bad = EventStreams.reconcileLate(sink0, late2)
    assert(EventStreams.classifyClaims(r2bad, late2).collect().head.getBoolean(2),
      "without fold-back the duplicate is (wrongly) re-awarded — the documented hazard")
  }

  test("streaming window claims: copied text loses its windows, fresh text claims") {
    import spark.implicits._
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val a = words("alpha", 32)                       // 32 tokens → 17 windows (NOT all
    // distinct hashes: the engine-agnostic word feature is (len, first
    // char) only, so alpha10..alpha32 alias and same-feature-sequence
    // windows share a hash — 10 distinct of 17; the simulation below
    // accounts for it)
    val half = words("alpha", 16) + " " + words("beta", 16) // first 16 tokens shared with a
    val fresh = words("gamma", 32)
    val flat = java.nio.file.Files.createTempDirectory("winclaim_stream")
    def writeFile(i: Int, rows: Seq[(Long, String, Long)]): Unit = {
      val f = java.nio.file.Files.createTempDirectory("winclaim_one")
      rows.toDF("doc_id", "text", "minute")
        .select(col("doc_id"), col("text"), (col("minute") * 60L).cast("timestamp").as("ts"))
        .coalesce(1).write.parquet(f.toString + "/p")
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(s"$f/p"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"part$i%03d.parquet")
      java.nio.file.Files.copy(src, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
    }
    writeFile(0, Seq((1L, a, 10L)))
    // doc 2: exact copy of doc 1 (claims nothing); doc 3: first half
    // copied (only its beta-containing windows are fresh); doc 4: fresh
    writeFile(1, Seq((2L, a, 12L), (3L, half, 13L), (4L, fresh, 14L)))
    val schema = spark.read.parquet(flat.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val q = EventStreams.windowClaimsStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("win_claims")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.awaitTermination(60000); q.stop()
    val arrival = Seq((1L, a), (2L, a), (3L, half), (4L, fresh))
    val docs = arrival.toDF("doc_id", "text")
    val out = EventStreams.classifyWindowClaims(spark.table("win_claims"), docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1).toSeq
    // expected claims from a Scala simulation of first-claim semantics
    // over the SAME hash core, in arrival order — exact regardless of
    // word-feature collisions (the engine-agnostic feature is weak by
    // design: equal-length same-initial tokens alias, so hand-derived
    // counts would be fixture-fragile). No intra-batch contention in
    // this fixture (docs 2-4 only ever contend with doc 1's claims),
    // so arrival order fully determines the outcome.
    val seen = scala.collection.mutable.Set.empty[Long]
    val expected = arrival.map { case (id, t) =>
      val hs = graft.queries.Dedup.windowHashesScala(t)
      (id, hs.length.toLong, hs.distinct.count(seen.add).toLong)
    }
    assert(out == expected, s"window claim classification wrong: $out vs $expected")
    // and the semantics the fixture was built to show: the exact copy
    // claims nothing, the half-copy claims only its fresh windows
    val m = out.map(t => t._1 -> t._3).toMap
    assert(m(2L) == 0L, "exact copy must claim no windows")
    assert(m(3L) > 0L && m(3L) < out.find(_._1 == 3L).get._2,
      "half-copy must claim some but not all windows")
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

  test("streaming decontamination equals the batch q57 twin and catches an injected leak") {
    import spark.implicits._
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (benchId, benchText) = base.find(_._1 % 17 == 0).get
    assert(graft.queries.Dedup.windowHashesScala(benchText).nonEmpty,
      "fixture benchmark doc must be long enough to carry windows")
    // inject a verbatim benchmark leak into a TRAINING doc
    val docs = base.map { case (id, t) =>
      if (id == benchId + 1) (id, benchText) else (id, t)
    }
    val corpusDir = java.nio.file.Files.createTempDirectory("decon_corpus")
    docs.toSeq.toDF("doc_id", "text")
      .write.parquet(corpusDir.toString + "/documents.parquet")
    val batch = graft.queries.Dedup.q57Decontam.fn(spark, corpusDir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3) == 1))
      .sortBy(_._1).toSeq
    // static side: benchmark slice hashes; stream side: the training docs
    val bench = EventStreams.benchmarkHashes(
      docs.filter(_._1 % 17 == 0).toSeq.toDF("doc_id", "text"))
    val trainDir = java.nio.file.Files.createTempDirectory("decon_train").toString + "/t"
    docs.filter(_._1 % 17 != 0).toSeq.toDF("doc_id", "text")
      .write.parquet(trainDir)
    val schema = spark.read.parquet(trainDir).schema
    val stream = spark.readStream.schema(schema).parquet(trainDir)
    val q = EventStreams.decontamStream(stream, bench)
      .writeStream.outputMode("append")
      .format("memory").queryName("decon_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.awaitTermination(60000); q.stop()
    val streamed = spark.table("decon_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(streamed == batch,
      s"stream and batch decontamination diverged:\nstream=$streamed\nbatch =$batch")
    assert(streamed.exists(_._4), "the injected leak must be flagged")
    assert(streamed.count(_._4) >= 1 &&
      streamed.find(_._1 == benchId + 1).exists(_._4),
      "the verbatim-copy training doc must be contaminated")
  }
}
