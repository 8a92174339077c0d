package graft.io

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import WarcPages._

/** WARC source contract: lossless record recovery on well-formed input,
  * fault ROWS (never exceptions) on every malformed shape, gzip
  * transparency including concatenated members (the .warc.gz layout),
  * and determinism across calls.
  */
class WarcReaderSpec extends AnyFunSuite {

  private val page = "<html><body><p>hello warc</p></body></html>"
  private def resp(uri: String = "https://x.example/a") =
    buildResponse(uri, "2024-01-01T00:00:00Z", page.getBytes(UTF_8))
  private def meta(uri: String = "https://x.example/a") =
    buildMetadata(uri, "note-1")

  test("roundtrip: two records parse back with headers, bodies, increasing offsets") {
    val rs = parse(resp() ++ meta())
    assert(rs.length == 2)
    assert(rs.forall(_.ok))
    assert(rs.map(_.warcType) == Seq("response", "metadata"))
    assert(rs.head.targetUri == "https://x.example/a")
    assert(new String(httpBody(rs.head.body), UTF_8) == page)
    assert(new String(rs(1).body, UTF_8) == "note-1")
    assert(rs.head.offset == 0 && rs(1).offset > rs.head.offset)
    assert(rs.head.headers("Content-Length").toInt == HttpEnvelope.length + page.length)
  }

  test("gzip transparency: one member and CONCATENATED members (warc.gz layout)") {
    val plain = parse(resp() ++ meta()).map(r => (r.warcType, r.body.toSeq, r.ok))
    val oneMember = parse(gzip(resp() ++ meta())).map(r => (r.warcType, r.body.toSeq, r.ok))
    val twoMembers = parse(gzip(resp()) ++ gzip(meta())).map(r => (r.warcType, r.body.toSeq, r.ok))
    assert(oneMember == plain)
    assert(twoMembers == plain)
  }

  test("corrupt gzip yields one fault record, not an exception") {
    val bad = gzip(resp()).updated(20, 0x7f.toByte).take(30)
    val rs = parse(bad)
    assert(rs.length == 1 && rs.head.fault.contains("gzip-corrupt"))
  }

  test("truncated body is a fault record") {
    val whole = resp()
    val rs = parse(whole.dropRight(20))
    assert(rs.length == 1 && rs.head.fault.contains("truncated-body"))
    assert(rs.head.headers.contains("WARC-Target-URI")) // headers still recovered
  }

  test("missing blank line after headers is a truncated-headers fault") {
    val rs = parse("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 5".getBytes(UTF_8))
    assert(rs.length == 1 && rs.head.fault.contains("truncated-headers"))
  }

  test("bad Content-Length faults and the scan resyncs at the next record") {
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: abc\r\n\r\n" +
      "orphan body bytes\r\n\r\n").getBytes(UTF_8)
    val rs = parse(bad ++ resp())
    assert(rs.exists(_.fault.contains("bad-content-length")))
    // the orphaned body surfaces as skipped garbage, then the good record parses
    assert(rs.exists(_.fault.contains("garbage-skipped")))
    assert(rs.count(_.ok) == 1 && rs.last.ok)
  }

  test("garbage tail after the last record is a fault; blank tail is not") {
    val tail = parse(resp() ++ "stray".getBytes(UTF_8))
    assert(tail.count(_.ok) == 1 && tail.exists(_.fault.contains("garbage-tail")))
    val blank = parse(resp() ++ "\r\n".getBytes(UTF_8))
    assert(blank.length == 1 && blank.head.ok)
  }

  test("httpBody strips only a real HTTP envelope") {
    assert(new String(httpBody("no envelope here".getBytes(UTF_8)), UTF_8) == "no envelope here")
    assert(new String(httpBody(("HTTP/1.1 200 OK\r\nX: y\r\n\r\nBODY").getBytes(UTF_8)), UTF_8) == "BODY")
    // unterminated envelope: returned whole rather than losing bytes
    assert(new String(httpBody("HTTP/1.1 200 OK\r\nX: y".getBytes(UTF_8)), UTF_8)
      .startsWith("HTTP/1.1"))
  }

  test("empty and null input parse to no records; parsing is deterministic") {
    assert(parse(null).isEmpty)
    assert(parse(Array.emptyByteArray).isEmpty)
    val blob = gzip(resp() ++ meta())
    val a = parse(blob).map(r => (r.headers, r.body.toSeq, r.offset, r.fault))
    val b = parse(blob).map(r => (r.headers, r.body.toSeq, r.offset, r.fault))
    assert(a == b)
  }
}
