package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.{UTF_8, UTF_16BE, UTF_16LE}
import CharsetSniff.decode

/** WHATWG-core sniffing contract: BOM beats meta beats content sniff
  * beats the cp1252 fallback; iso-8859-1 declarations alias to
  * windows-1252 (the WHATWG rule that makes 0x80-0x9F decode to smart
  * punctuation instead of C1 controls).
  */
class CharsetSniffSpec extends AnyFunSuite {

  test("plain ascii and valid utf-8 decode as utf-8") {
    assert(decode("hello".getBytes(UTF_8)) == CharsetSniff.Decoded("hello", "utf-8"))
    assert(decode("héllo €".getBytes(UTF_8)) == CharsetSniff.Decoded("héllo €", "utf-8"))
  }

  test("utf-8 BOM is consumed and labeled") {
    val b = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ "x".getBytes(UTF_8)
    assert(decode(b) == CharsetSniff.Decoded("x", "utf-8-bom"))
  }

  test("utf-16 BOMs decode both endiannesses") {
    val be = Array(0xFE, 0xFF).map(_.toByte) ++ "hi".getBytes(UTF_16BE)
    val le = Array(0xFF, 0xFE).map(_.toByte) ++ "hi".getBytes(UTF_16LE)
    assert(decode(be) == CharsetSniff.Decoded("hi", "utf-16be"))
    assert(decode(le) == CharsetSniff.Decoded("hi", "utf-16le"))
  }

  test("invalid utf-8 falls back to windows-1252, including the 0x80-0x9F range") {
    // NOTE the byte order: 0xE9 0x97 0x93 would be a VALID utf-8 3-byte
    // sequence (a CJK char) — a standalone continuation byte and a
    // trailing lead byte make the input genuinely malformed
    val b = "price ".getBytes(UTF_8) ++ Array(0x97.toByte, 0x93.toByte, 0xE9.toByte)
    val d = decode(b)
    assert(d.charset == "windows-1252")
    assert(d.text == "price —“é") // em dash, left smart quote, é
  }

  test("meta charset declaration wins over content for the latin-1 family") {
    val b = "<meta charset=\"iso-8859-1\"><p>caf".getBytes(UTF_8) :+ 0xE9.toByte
    val d = decode(b)
    assert(d.charset == "windows-1252")
    assert(d.text.endsWith("café"))
    // http-equiv form, single quotes, mixed case
    val h = ("<META http-equiv='Content-Type' content='text/html; CHARSET=latin1'>x"
      .getBytes(UTF_8) :+ 0x97.toByte)
    assert(decode(h).charset == "windows-1252")
    assert(decode(h).text.endsWith("x—"))
  }

  test("a meta utf-8 declaration keeps the utf-8 path; unknown labels fall to sniff") {
    val u = decode("<meta charset=utf-8>héllo".getBytes(UTF_8))
    assert(u.charset == "utf-8" && u.text.endsWith("héllo"))
    val k = decode("<meta charset=\"koi8-r\">plain".getBytes(UTF_8))
    assert(k.charset == "utf-8") // unknown label, bytes are valid utf-8
  }

  test("utf-16 family labels read via the byte prescan remap to utf-8 (WHATWG)") {
    // the ASCII meta tag being readable proves the content is not
    // utf-16 — decoding as utf-16 would mojibake the whole page
    val b = "<meta charset=\"utf-16\">héllo page".getBytes(UTF_8)
    assert(decode(b) == CharsetSniff.Decoded("<meta charset=\"utf-16\">héllo page", "utf-8"))
    val le = "<meta charset='utf-16le'>x".getBytes(UTF_8)
    assert(decode(le).charset == "utf-8" && decode(le).text.endsWith("x"))
  }

  test("an explicit utf-8 declaration decodes leniently, not via the cp1252 fallback") {
    // one stray continuation byte in a declared-utf-8 page: per-byte
    // U+FFFD, NOT a whole-document windows-1252 reinterpretation
    val b = "<meta charset=\"utf-8\">ok héllo ".getBytes(UTF_8) :+ 0x97.toByte
    val d = decode(b)
    assert(d.charset == "utf-8")
    assert(d.text.contains("héllo") && d.text.endsWith("�"))
  }

  test("a LITERAL U+FFFD in valid utf-8 is not mistaken for a decode failure") {
    val b = "a�b".getBytes(UTF_8)
    assert(decode(b) == CharsetSniff.Decoded("a�b", "utf-8"))
  }

  test("declaration outside the 1024-byte prescan window is ignored") {
    val pad = ("x" * 1030).getBytes(UTF_8)
    val b = pad ++ "<meta charset=\"iso-8859-1\">".getBytes(UTF_8)
    assert(decode(b).charset == "utf-8")
  }

  test("empty and null inputs are total") {
    assert(decode(null) == CharsetSniff.Decoded("", "utf-8"))
    assert(decode(Array.emptyByteArray) == CharsetSniff.Decoded("", "utf-8"))
  }

  test("decoding is deterministic and the extractor path is unchanged for ascii") {
    val html = "<html><body><p>Same text.</p></body></html>"
    val a = Extractor.extract("u", html.getBytes(UTF_8))
    val b = Extractor.extract("u", html.getBytes(UTF_8))
    assert(a.markdown == b.markdown && a.markdown.contains("Same text."))
  }

  test("a cp1252 page survives extraction with its characters intact") {
    // body long/punctuated enough that the block classifier keeps it
    val bytes = "<html><body><p>The caf".getBytes(UTF_8) ++
      Array(0xE9.toByte) ++
      " on the corner serves very good coffee.</p></body></html>".getBytes(UTF_8)
    val d = Extractor.extract("u", bytes)
    assert(d.ok && d.markdown.contains("café on the corner"))
  }
}
