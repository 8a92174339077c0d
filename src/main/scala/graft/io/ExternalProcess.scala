package graft.io

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}

/** External-process connector (SURVEY S7) — the reference shells out to
  * a figure-extraction tool per document with a wall-clock timeout,
  * terminates the process on overrun and records a failure instead of
  * raising (nougat/dataset/pdffigures.py:19-71: Popen → wait(timeout)
  * → terminate → return False). This is the Spark-first re-expression:
  *
  *   - ONE long-lived worker process per PARTITION, not per document —
  *     at 10^9 documents a fork per doc is pure spawn overhead; a
  *     partition-scoped worker amortizes it to one fork per task while
  *     keeping the same per-document protocol.
  *   - Line protocol: one encoded request line in → one reply line out.
  *     Payloads are base64-encoded by default so embedded newlines /
  *     arbitrary UTF-8 never break framing (raw mode is available for
  *     line-filter tools; a raw doc containing a newline is refused as
  *     a per-doc fault, never sent).
  *   - A dedicated reader thread drains stdout into a queue
  *     continuously, so the writer can never deadlock against a full
  *     pipe, and the task thread's queue-poll gives the per-doc
  *     TIMEOUT: on overrun the process is destroyed (the reference's
  *     terminate()), the doc is emitted as a fault row, and a fresh
  *     worker is started for the remaining docs.
  *   - Writes go through a single-thread executor with the same
  *     deadline, so a worker that stops READING its stdin is also
  *     killed rather than hanging the task.
  *   - FAULT ISOLATION: a crashing / timing-out / unlaunchable command
  *     yields `ok = false` rows, never a task failure — one poisoned
  *     document cannot kill a 100 TB job. Worker restarts per
  *     partition are bounded by `maxRestarts`; past the budget the
  *     partition's remaining docs drain as fault rows (a systematically
  *     broken command degrades to a visible column, not a fork storm).
  *   - Cleanup is registered on the TaskContext, so a partially
  *     consumed iterator (limit, take) still reaps the worker.
  *
  * At cluster scale the worker binary ships via --files / a container
  * image; the connector only assumes argv + stdin/stdout.
  */
object ExternalProcess {

  /** One result row per input document. `out` is Some only when `ok`;
    * `exit` is the worker's exit code when it died on this doc and was
    * reaped in time; `attempts` counts workers used up to and including
    * this doc's worker (1 = first worker, no restart yet).
    */
  final case class PipedDoc(
      doc_id: Long,
      out: Option[String],
      ok: Boolean,
      timed_out: Boolean,
      exit: Option[Int],
      attempts: Int)

  /** Pipe `(idCol, textCol)` of `df` through `cmd`, one result row per
    * input row. Row order is preserved within partitions; no shuffle is
    * introduced (the plan is scan → mapPartitions).
    */
  def pipe(
      df: DataFrame,
      idCol: String,
      textCol: String,
      cmd: Seq[String],
      timeoutMs: Long = 30000L, // reference default: 30 s per document
      maxRestarts: Int = 3,
      base64: Boolean = true): Dataset[PipedDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, Option[String])]
      .mapPartitions(it => pipePartition(it, cmd, timeoutMs, maxRestarts, base64))
  }

  /** Partition-local core; public for direct mapPartitions use and for
    * the spec to drive without a SparkSession.
    */
  def pipePartition(
      docs: Iterator[(Long, Option[String])],
      cmd: Seq[String],
      timeoutMs: Long,
      maxRestarts: Int,
      base64: Boolean): Iterator[PipedDoc] = {
    val worker = new Worker(cmd, timeoutMs, maxRestarts, base64)
    Option(TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => worker.close()))
    val out = docs.map(worker.run)
    // exhaust-then-close when running outside a task (tests): wrap so
    // close fires after the last element is produced
    new Iterator[PipedDoc] {
      def hasNext: Boolean = {
        val h = out.hasNext
        if (!h) worker.close()
        h
      }
      def next(): PipedDoc = out.next()
    }
  }

  /** End-of-stream marker on the reader queue; carries the exit code
    * once the dead worker is reaped (None while unreaped).
    */
  private final case class Eof(exit: Option[Int])

  /** Live workers, reaped at JVM shutdown: outside a Spark task (no
    * TaskContext listener) a partially consumed iterator would
    * otherwise leak its child process past the JVM's lifetime.
    */
  private val liveWorkers =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Worker]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      liveWorkers.forEach(w => w.close())
    }, "extproc-reaper"))
  }

  private final class Worker(
      cmd: Seq[String], timeoutMs: Long, maxRestarts: Int, base64: Boolean) {
    liveWorkers.add(this)
    private var proc: Process = _
    private var stdin: java.io.BufferedWriter = _
    private var queue: java.util.concurrent.LinkedBlockingQueue[AnyRef] = _
    private var readerThread: Thread = _
    private var started = 0
    private var dead = true
    @volatile private var closed = false
    private val enc = java.util.Base64.getEncoder
    private val dec = java.util.Base64.getDecoder
    private val writeExec = java.util.concurrent.Executors.newSingleThreadExecutor(
      (r: Runnable) => { val t = new Thread(r, "extproc-writer"); t.setDaemon(true); t })

    private def start(): Boolean = {
      if (started > maxRestarts) return false
      started += 1
      try {
        val pb = new ProcessBuilder(cmd: _*)
        pb.redirectErrorStream(false)
        pb.redirectError(ProcessBuilder.Redirect.DISCARD)
        proc = pb.start()
        stdin = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          proc.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
        queue = new java.util.concurrent.LinkedBlockingQueue[AnyRef]()
        val p = proc; val q = queue
        readerThread = new Thread(() => {
          try {
            val r = new java.io.BufferedReader(new java.io.InputStreamReader(
              p.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
            var line = r.readLine()
            while (line != null) { q.put(line); line = r.readLine() }
          } catch { case _: Throwable => () }
          val exit =
            if (p.waitFor(1, java.util.concurrent.TimeUnit.SECONDS))
              Some(p.exitValue())
            else None
          q.put(Eof(exit))
        }, "extproc-reader")
        readerThread.setDaemon(true)
        readerThread.start()
        dead = false
        true
      } catch {
        case _: java.io.IOException => dead = true; false // unlaunchable cmd
      }
    }

    private def kill(): Unit = {
      if (proc != null) proc.destroyForcibly()
      if (stdin != null) { try stdin.close() catch { case _: Throwable => () } }
      dead = true
    }

    def close(): Unit = {
      closed = true; kill(); writeExec.shutdownNow()
      liveWorkers.remove(this); ()
    }

    def run(doc: (Long, Option[String])): PipedDoc = {
      val (id, textOpt) = doc
      def fault(timedOut: Boolean, exit: Option[Int]) =
        PipedDoc(id, None, ok = false, timed_out = timedOut, exit = exit,
          attempts = started)
      // a closed worker (task ended / caller closed early) faults the
      // doc instead of throwing RejectedExecutionException from the
      // shut-down write executor
      if (closed) return fault(timedOut = false, exit = None)
      textOpt match {
        case None => fault(timedOut = false, exit = None)
        case Some(text) if !base64 && (text.indexOf('\n') >= 0 || text.indexOf('\r') >= 0) =>
          // raw mode cannot frame a multi-line doc; refuse it locally
          fault(timedOut = false, exit = None)
        case Some(text) =>
          if (dead && !start()) return fault(timedOut = false, exit = None)
          val deadline = System.nanoTime() + timeoutMs * 1000000L
          val line =
            if (base64)
              enc.encodeToString(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            else text
          // deadline-bounded write: a worker that stops reading stdin
          // blocks the pipe; the timeout must cover that too
          val wf = writeExec.submit(new Runnable {
            def run(): Unit = { stdin.write(line); stdin.newLine(); stdin.flush() }
          })
          try wf.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
          catch {
            case _: java.util.concurrent.TimeoutException =>
              kill(); wf.cancel(true)
              return fault(timedOut = true, exit = None)
            case _: java.util.concurrent.ExecutionException =>
              kill() // broken pipe: worker already died; reap exit below
              return fault(timedOut = false, exit = drainExit())
          }
          val remainingMs = math.max(1L, (deadline - System.nanoTime()) / 1000000L)
          queue.poll(remainingMs, java.util.concurrent.TimeUnit.MILLISECONDS) match {
            case null =>
              kill()
              fault(timedOut = true, exit = None)
            case Eof(exit) =>
              kill()
              fault(timedOut = false, exit = exit)
            case reply: String =>
              val outText =
                if (base64)
                  try Some(new String(dec.decode(reply),
                    java.nio.charset.StandardCharsets.UTF_8))
                  catch { case _: IllegalArgumentException => None } // garbage reply
                else Some(reply)
              outText match {
                case Some(o) =>
                  PipedDoc(id, Some(o), ok = true, timed_out = false,
                    exit = None, attempts = started)
                case None =>
                  kill() // desynced protocol: don't trust the stream further
                  fault(timedOut = false, exit = None)
              }
          }
      }
    }

    /** After a broken-pipe write the reader thread posts Eof with the
      * exit code; fetch it briefly so the fault row can carry it.
      */
    private def drainExit(): Option[Int] =
      queue.poll(1000, java.util.concurrent.TimeUnit.MILLISECONDS) match {
        case Eof(exit) => exit
        case _ => None
      }
  }
}
