package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import ExternalProcess.PipedDoc

/** External-process connector (SURVEY S7): the reference's
  * subprocess-with-timeout pattern (pdffigures.py:19-71) as a
  * partition-scoped piped worker. Pins the full fault matrix: identity
  * round-trip, per-doc timeout with worker restart, crash isolation,
  * restart-budget exhaustion, unlaunchable command, raw-mode framing
  * refusal, NULL text.
  */
class ExternalProcessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(texts: (Long, String)*): Iterator[(Long, Option[String])] =
    texts.iterator.map { case (id, t) => (id, Option(t)) }

  private def sh(script: String): Seq[String] = Seq("/bin/sh", "-c", script)

  /** Line filter that echoes each line with a prefix, sleeping or dying
    * on trigger substrings (raw mode: workers see the raw text).
    */
  private val filterScript =
    """while IFS= read -r line; do
      |  case "$line" in
      |    *SLEEPY*) sleep 30 ;;
      |    *BOOM*) exit 3 ;;
      |  esac
      |  printf 'out:%s\n' "$line"
      |done""".stripMargin

  test("cat round-trip: multi-line unicode docs survive base64 framing byte-exactly") {
    val in = Seq(
      1L -> "plain ascii",
      2L -> "two\nlines with \t tab",
      3L -> "unicode: é中文 😀",
      4L -> "")
    val rs = ExternalProcess.pipePartition(
      docs(in: _*), Seq("/bin/cat"), timeoutMs = 10000, maxRestarts = 3,
      base64 = true).toList
    assert(rs.map(_.doc_id) == in.map(_._1), "order must be preserved")
    assert(rs.forall(r => r.ok && !r.timed_out && r.attempts == 1))
    assert(rs.map(_.out.get) == in.map(_._2), "identity worker must round-trip bytes")
  }

  test("per-doc timeout kills the worker, faults the doc, and later docs still run") {
    val rs = ExternalProcess.pipePartition(
      docs(1L -> "first", 2L -> "a SLEEPY one", 3L -> "after the storm"),
      sh(filterScript), timeoutMs = 700, maxRestarts = 3, base64 = false).toList
    assert(rs(0) == PipedDoc(1L, Some("out:first"), ok = true, timed_out = false, None, 1))
    assert(!rs(1).ok && rs(1).timed_out, "overrun doc must fault as timed_out")
    assert(rs(2).ok && rs(2).out.contains("out:after the storm") && rs(2).attempts == 2,
      "a fresh worker must serve the docs after the kill")
  }

  test("worker crash faults only the poisoned doc and carries the exit code") {
    val rs = ExternalProcess.pipePartition(
      docs(1L -> "fine", 2L -> "BOOM now", 3L -> "recovered"),
      sh(filterScript), timeoutMs = 10000, maxRestarts = 3, base64 = false).toList
    assert(rs(0).ok)
    assert(!rs(1).ok && !rs(1).timed_out, "crash is a fault, not a timeout")
    assert(rs(1).exit.contains(3), s"exit code should be reaped, got ${rs(1).exit}")
    assert(rs(2).ok && rs(2).out.contains("out:recovered"))
  }

  test("restart budget: past maxRestarts the partition drains as fault rows") {
    val rs = ExternalProcess.pipePartition(
      docs(1L -> "BOOM", 2L -> "BOOM", 3L -> "never served", 4L -> "nor this"),
      sh(filterScript), timeoutMs = 10000, maxRestarts = 1, base64 = false).toList
    assert(rs.forall(r => !r.ok), "every doc after a poisoned stream must fault")
    assert(rs(2).attempts == 2 && rs(3).attempts == 2,
      "no third worker may be spawned past the budget")
  }

  test("unlaunchable command: fault rows, never a thrown task failure") {
    val rs = ExternalProcess.pipePartition(
      docs(1L -> "a", 2L -> "b"),
      Seq("/no/such/binary_graft"), timeoutMs = 1000, maxRestarts = 2,
      base64 = true).toList
    assert(rs.length == 2 && rs.forall(r => !r.ok && !r.timed_out))
  }

  test("raw mode refuses multi-line docs locally; NULL text faults without a send") {
    val rs = ExternalProcess.pipePartition(
      Iterator((1L, Some("has\nnewline")), (2L, None), (3L, Some("clean"))),
      sh(filterScript), timeoutMs = 10000, maxRestarts = 3, base64 = false).toList
    assert(!rs(0).ok && !rs(1).ok)
    assert(rs(2).ok && rs(2).out.contains("out:clean"))
  }

  test("oversized doc: a payload far beyond the pipe buffer round-trips (no write/read deadlock)") {
    // 2 MB >> the 64 KB OS pipe buffer: without the reader thread
    // draining stdout concurrently, cat blocks writing its echo while
    // we block writing input — the classic subprocess deadlock. Random
    // content defeats any compression-like shortcuts; seed fixed.
    val rnd = new scala.util.Random(42)
    val big = new String(Array.fill(2 * 1024 * 1024)((32 + rnd.nextInt(95)).toChar))
    val rs = ExternalProcess.pipePartition(
      docs(1L -> big, 2L -> "small after big"),
      Seq("/bin/cat"), timeoutMs = 60000, maxRestarts = 1, base64 = true).toList
    assert(rs(0).ok && rs(0).out.get == big, "2 MB doc must round-trip byte-exactly")
    assert(rs(1).ok && rs(1).out.contains("small after big"))
  }

  test("Dataset path: documents pipe through cat with no shuffle, one row per doc") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 64).select(col("id").as("doc_id"),
      concat(lit("doc body "), col("id")).as("text")).repartition(4)
    val piped = ExternalProcess.pipe(df, "doc_id", "text", Seq("/bin/cat"))
    val plan = piped.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("RoundRobin"),
      s"pipe must not introduce a shuffle beyond the test repartition:\n$plan")
    val rows = piped.collect()
    assert(rows.length == 64 && rows.forall(_.ok))
    assert(rows.map(r => r.doc_id -> r.out.get).toMap ==
      (0L until 64L).map(i => i -> s"doc body $i").toMap)
  }
}
