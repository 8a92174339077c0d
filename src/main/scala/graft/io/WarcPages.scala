package graft.io

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.ArrayBuffer

/** WARC record source — the Common Crawl interchange format the north
  * rule's input table is materialized FROM (an Iceberg table of
  * "Common-Crawl-style pages" is loaded by parsing exactly these
  * records out of crawl segment files). The reference consumes
  * ready-made page rows; a production ingest needs the step before
  * that, so this is the S-family source closing that seam.
  *
  * Format (ISO 28500): a WARC file is a concatenation of records, each
  *
  * {{{
  * WARC/1.0\r\n
  * <Name>: <value>\r\n ...          (headers; Content-Length required)
  * \r\n
  * <Content-Length bytes of block>
  * \r\n\r\n                          (record boundary)
  * }}}
  *
  * optionally with the WHOLE stream gzip-compressed as concatenated
  * members (one record per member — Common Crawl's .warc.gz layout;
  * java's GZIPInputStream consumes concatenated members natively).
  *
  * Parser contract (the ExternalProcess/S7 discipline): NEVER throws —
  * malformed input produces fault records and the scan resyncs at the
  * next `WARC/` magic, so one corrupt record cannot poison a 1 GB
  * segment. Pure function of the input bytes → deterministic across
  * parallelism (the north rule's invariant extends to ingest).
  *
  * Scale shape: segments map 1:1 to tasks (binaryFile source, same as
  * JsonlPages.seekIndex); parsing is a per-partition flatMap with no
  * state. Random access into uncompressed WARC uses (offset, length)
  * from [[WarcRecord.offset]] — the q43 seek-map pattern; .warc.gz
  * random access needs the member index Common Crawl ships (cdx),
  * which maps onto the same fetch contract.
  */
object WarcPages {

  final case class WarcRecord(
      headers: Map[String, String],
      body: Array[Byte],
      offset: Long,          // byte offset of the record in the (decompressed) stream
      fault: Option[String]) {
    def warcType: String = headers.getOrElse("WARC-Type", "")
    def targetUri: String = headers.getOrElse("WARC-Target-URI", "")
    def ok: Boolean = fault.isEmpty
  }

  private val Magic = "WARC/".getBytes(UTF_8)

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Decompress a whole gzip stream (concatenated members included).
    * The initial buffer size is a HINT, clamped to 64 MB: `length * 4`
    * overflows Int for inputs past 512 MB, which turned a valid large
    * segment into a negative-size IllegalArgumentException silently
    * mislabelled as gzip corruption (r6 advice item 1). The stream
    * still grows to any decompressed size the heap allows.
    */
  private def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(b.length.toLong, 64L) * 4L, 1L << 26).toInt)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Parse every record out of a WARC blob (plain or .gz). Total:
    * malformed regions become fault records, never exceptions.
    */
  def parse(blob: Array[Byte]): Seq[WarcRecord] = {
    if (blob == null || blob.isEmpty) return Seq.empty
    val bytes =
      if (isGzip(blob))
        try gunzipAll(blob)
        catch {
          // OOM caught deliberately: a >2 GB decompressed segment must
          // honor the never-throws contract as its own fault row, not
          // kill the task (and not masquerade as gzip corruption)
          case _: OutOfMemoryError =>
            return Seq(WarcRecord(Map.empty, Array.emptyByteArray, 0L,
              Some("gzip-too-large")))
          case _: Exception =>
            return Seq(WarcRecord(Map.empty, Array.emptyByteArray, 0L,
              Some("gzip-corrupt")))
        }
      else blob
    val out = new ArrayBuffer[WarcRecord]()
    var pos = 0
    while (pos < bytes.length) {
      val at = indexOf(bytes, Magic, pos)
      if (at < 0) {
        // trailing bytes with no record start: fault only if non-blank
        if (bytes.drop(pos).exists(b => b != '\r' && b != '\n' && b != ' '))
          out += WarcRecord(Map.empty, Array.emptyByteArray, pos.toLong,
            Some("garbage-tail"))
        pos = bytes.length
      } else {
        if (at > pos && bytes.slice(pos, at).exists(b => b != '\r' && b != '\n'))
          out += WarcRecord(Map.empty, Array.emptyByteArray, pos.toLong,
            Some("garbage-skipped"))
        val (rec, next) = parseOne(bytes, at)
        out += rec
        pos = next
      }
    }
    out.toSeq
  }

  /** One record starting at a `WARC/` magic; returns (record, nextPos).
    * nextPos always advances past the magic so a fault can never loop.
    */
  private def parseOne(bytes: Array[Byte], start: Int): (WarcRecord, Int) = {
    // header block ends at the first blank line
    var lineStart = start
    val headers = Map.newBuilder[String, String]
    var version = ""
    var bodyStart = -1
    var malformed: Option[String] = None
    while (bodyStart < 0 && malformed.isEmpty) {
      val nl = indexOf(bytes, Array[Byte]('\r', '\n'), lineStart)
      if (nl < 0) malformed = Some("truncated-headers")
      else {
        val line = new String(bytes, lineStart, nl - lineStart, UTF_8)
        if (lineStart == start) version = line // the WARC/1.x line itself
        else if (line.isEmpty) bodyStart = nl + 2
        else {
          val c = line.indexOf(':')
          if (c > 0) headers += line.substring(0, c).trim -> line.substring(c + 1).trim
          // a colon-less header line is tolerated (ignored), like real crawlers do
        }
        lineStart = nl + 2
      }
    }
    val hdrs = headers.result()
    malformed match {
      case Some(f) =>
        (WarcRecord(hdrs, Array.emptyByteArray, start.toLong, Some(f)), bytes.length)
      case None =>
        hdrs.get("Content-Length").flatMap(_.toLongOption) match {
          case None =>
            // unusable length: fault and resync at the NEXT magic
            (WarcRecord(hdrs, Array.emptyByteArray, start.toLong,
              Some("bad-content-length")), bodyStart)
          case Some(n) if n < 0 || bodyStart + n > bytes.length =>
            (WarcRecord(hdrs, Array.emptyByteArray, start.toLong,
              Some("truncated-body")), bytes.length)
          case Some(n) =>
            val body = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + n.toInt)
            var next = bodyStart + n.toInt
            // consume the \r\n\r\n record boundary when present
            var crlf = 0
            while (crlf < 2 && next + 1 < bytes.length &&
                   bytes(next) == '\r' && bytes(next + 1) == '\n') {
              next += 2; crlf += 1
            }
            (WarcRecord(hdrs, body, start.toLong, None), next)
        }
    }
  }

  /** Strip the HTTP response envelope from a `response` record block
    * (WARC stores the full HTTP message; the page html starts after the
    * header/body separator). A block with no HTTP preamble is returned
    * whole.
    */
  def httpBody(block: Array[Byte]): Array[Byte] = {
    if (block.length < 5 || new String(block, 0, 5, UTF_8) != "HTTP/") return block
    val sep = indexOf(block, "\r\n\r\n".getBytes(UTF_8), 0)
    if (sep < 0) block
    else java.util.Arrays.copyOfRange(block, sep + 4, block.length)
  }

  /** Deterministic record builder (the test/oracle fixture side and the
    * K-family sink shape): a `response` record whose block is a minimal
    * HTTP envelope plus the page bytes.
    */
  val HttpEnvelope = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
  def buildResponse(uri: String, date: String, page: Array[Byte]): Array[Byte] = {
    val block = HttpEnvelope.getBytes(UTF_8) ++ page
    (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\n" +
      s"Content-Length: ${block.length}\r\n" +
      "\r\n").getBytes(UTF_8) ++ block ++ "\r\n\r\n".getBytes(UTF_8)
  }

  def buildMetadata(uri: String, note: String): Array[Byte] = {
    val block = note.getBytes(UTF_8)
    (s"WARC/1.0\r\n" +
      s"WARC-Type: metadata\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${block.length}\r\n" +
      "\r\n").getBytes(UTF_8) ++ block ++ "\r\n\r\n".getBytes(UTF_8)
  }

  def gzip(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(b); gz.close()
    out.toByteArray
  }
}
