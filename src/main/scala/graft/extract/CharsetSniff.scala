package graft.extract

import java.nio.charset.{Charset, StandardCharsets}

/** Charset sniffing + decoding for raw crawl bytes — the ingest step
  * between a WARC block and the tokenizer. Real web pages are NOT all
  * UTF-8 (historical crawls are ~half legacy encodings); decoding them
  * as UTF-8 mangles every non-ASCII byte into U+FFFD. The reference
  * never faces this (its HTML fixtures are UTF-8 files), so the
  * precedence here follows the HTML5/WHATWG sniffing algorithm's
  * deterministic core:
  *
  *   1. byte-order mark (UTF-8 / UTF-16BE / UTF-16LE),
  *   2. `<meta charset=…>` / `http-equiv` declaration in the first
  *      1024 bytes (WHATWG prescan window),
  *   3. content sniff: valid UTF-8 stays UTF-8,
  *   4. fallback windows-1252 — the WHATWG default, a superset of
  *      iso-8859-1 (which WHATWG itself aliases to windows-1252).
  *
  * Hot-path discipline (the r1 "gate your scans" lesson): the common
  * case — valid UTF-8, no declaration — pays ONE intrinsic UTF-8
  * decode plus one U+FFFD indexOf; the meta regex only runs when the
  * prescan window literally contains "harset". Decoding is a pure
  * function of the bytes → deterministic across parallelism, like
  * every ingest stage.
  */
object CharsetSniff {

  final case class Decoded(text: String, charset: String)

  private val Cp1252: Charset = Charset.forName("windows-1252")

  /** WHATWG-style label resolution for the declarations worth
    * supporting offline; unknown labels fall through to content sniff.
    */
  private def resolve(label: String): Option[(Charset, String)] =
    label.toLowerCase match {
      case "utf-8" | "utf8" => Some((StandardCharsets.UTF_8, "utf-8"))
      case "iso-8859-1" | "iso8859-1" | "latin-1" | "latin1" |
           "us-ascii" | "ascii" | "windows-1252" | "cp1252" =>
        // WHATWG aliases the whole latin-1/ascii family to windows-1252
        Some((Cp1252, "windows-1252"))
      // WHATWG: a utf-16 family label read via the BYTE prescan proves
      // the content is NOT utf-16 (the ASCII meta tag was readable), so
      // the spec maps these labels to utf-8 — decoding the page as
      // UTF-16 would mojibake every real mislabeled page (r6 advice)
      case "utf-16" | "utf-16le" | "utf-16be" => Some((StandardCharsets.UTF_8, "utf-8"))
      case _ => None
    }

  private val metaRe =
    java.util.regex.Pattern.compile(
      "(?i)<meta[^>]*charset\\s*=\\s*[\"']?\\s*([a-z0-9_.:-]+)")

  private def declared(bytes: Array[Byte]): Option[(Charset, String)] = {
    val n = math.min(bytes.length, 1024)
    // latin-1 view preserves the raw bytes of the prescan window
    val head = new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
    if (!head.contains("harset")) return None // gate the regex (r1 lesson)
    val m = metaRe.matcher(head)
    if (m.find()) resolve(m.group(1)) else None
  }

  def decode(bytes: Array[Byte]): Decoded = {
    if (bytes == null || bytes.isEmpty) return Decoded("", "utf-8")
    // 1. BOM
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return Decoded(new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8),
        "utf-8-bom")
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return Decoded(new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16BE),
        "utf-16be")
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return Decoded(new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16LE),
        "utf-16le")
    // 2. declaration in the prescan window. An explicit utf-8 label
    // short-circuits to the LENIENT decode: a page that says utf-8 with
    // a few invalid bytes gets per-byte U+FFFD, not a whole-document
    // cp1252 fallback (r6 advice; the strict-confirm path below remains
    // for UNDECLARED content where the fallback is the right guess).
    declared(bytes) match {
      case Some((cs, label)) if cs eq StandardCharsets.UTF_8 =>
        return Decoded(new String(bytes, StandardCharsets.UTF_8), label)
      case Some((cs, label)) =>
        return Decoded(new String(bytes, cs), label)
      case _ => ()
    }
    // 3. content sniff: the intrinsic lenient decode, then one scan —
    // no U+FFFD means the bytes were valid UTF-8 (or pure ASCII)
    val utf8 = new String(bytes, StandardCharsets.UTF_8)
    if (utf8.indexOf('\uFFFD') < 0) return Decoded(utf8, "utf-8")
    // a literal U+FFFD in valid UTF-8 input is indistinguishable from a
    // replacement by indexOf alone — confirm with a strict decode
    try {
      val strict = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(bytes)).toString
      Decoded(strict, "utf-8")
    } catch {
      case _: java.nio.charset.CharacterCodingException =>
        // 4. WHATWG fallback
        Decoded(new String(bytes, Cp1252), "windows-1252")
    }
  }
}
