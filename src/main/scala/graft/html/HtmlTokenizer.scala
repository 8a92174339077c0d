package graft.html

import scala.collection.mutable.ArrayBuffer

/** HTML token stream. Text content arrives entity-decoded and
  * control-char-sanitized; tag/attr names are lowercased.
  */
sealed trait HToken
final case class StartTag(name: String, attrs: List[(String, String)], selfClosing: Boolean) extends HToken
final case class EndTag(name: String) extends HToken
final case class TextTok(content: String) extends HToken

/** Hand-rolled, never-throwing HTML tokenizer — a bounded subset of the
  * WHATWG tokenizer sufficient for Common-Crawl reality (SURVEY §7.4 #2).
  * The container has no HTML library (no jsoup, offline coursier), and the
  * north_star explicitly calls for "batched DOM/byte-stream tokenization
  * of raw html:binary", so this is first-class engine code, not a shim.
  *
  * Guarantees:
  *  - never throws on any input (malformed tags, truncation, garbage);
  *  - O(n) single pass; bounded output via `maxTokens`;
  *  - raw-text elements (script/style) skipped entirely, RCDATA
  *    (textarea/title) captured as text;
  *  - comments, doctypes, CDATA, processing instructions dropped;
  *  - '\r\n'/'\r' → '\n'; C0 controls (except \n\t) stripped from text.
  */
object HtmlTokenizer {

  /** Content is raw text; never emitted (invisible to extraction). */
  private val rawSkip = Set("script", "style")
  /** Content is raw text; emitted as a single text token. */
  private val rawKeep = Set("textarea", "title")

  val defaultMaxTokens = 1 << 20

  def tokenize(html: String, maxTokens: Int = defaultMaxTokens): IndexedSeq[HToken] = {
    val out = new ArrayBuffer[HToken](256)
    val n = html.length
    var i = 0
    var textStart = 0

    def flushText(until: Int): Unit =
      if (until > textStart) {
        val t = cleanText(Entities.decode(html.substring(textStart, until)))
        if (t.nonEmpty) out += TextTok(t)
      }

    while (i < n && out.length < maxTokens) {
      graft.extract.DocBudget.tick() // per-token wall-clock checkpoint
      val lt = html.indexOf('<', i)
      if (lt < 0) { flushText(n); i = n; textStart = n }
      else {
        // classify what follows '<'
        val next = if (lt + 1 < n) html.charAt(lt + 1) else ' '
        if (next == '!') {
          flushText(lt)
          if (html.startsWith("<!--", lt)) {
            val end = html.indexOf("-->", lt + 4)
            i = if (end < 0) n else end + 3
          } else if (html.regionMatches(true, lt, "<![CDATA[", 0, 9)) {
            val end = html.indexOf("]]>", lt + 9)
            i = if (end < 0) n else end + 3
          } else { // doctype / bogus markup declaration
            val end = html.indexOf('>', lt + 2)
            i = if (end < 0) n else end + 1
          }
          textStart = i
        } else if (next == '?') { // processing instruction → bogus comment
          flushText(lt)
          val end = html.indexOf('>', lt + 2)
          i = if (end < 0) n else end + 1
          textStart = i
        } else if (next == '/') {
          if (lt + 2 < n && isNameStart(html.charAt(lt + 2))) {
            flushText(lt)
            val (name, after) = readName(html, lt + 2)
            val end = html.indexOf('>', after)
            i = if (end < 0) n else end + 1
            out += EndTag(name)
            textStart = i
          } else { // "</3" etc: bogus comment per spec
            flushText(lt)
            val end = html.indexOf('>', lt + 2)
            i = if (end < 0) n else end + 1
            textStart = i
          }
        } else if (isNameStart(next)) {
          flushText(lt)
          val (tag, after) = parseStartTag(html, lt + 1)
          i = after
          textStart = i
          tag match {
            case Some(st) =>
              out += st
              // NB: the self-closing flag is IGNORED for raw-text
              // elements per the HTML spec — <script/> still consumes
              // everything up to </script>
              if (rawSkip.contains(st.name)) {
                i = skipRawText(html, i, st.name)
                out += EndTag(st.name)
                textStart = i
              } else if (rawKeep.contains(st.name)) {
                val end = findRawEnd(html, i, st.name)
                val t = cleanText(Entities.decode(html.substring(i, end._1)))
                if (t.nonEmpty) out += TextTok(t)
                out += EndTag(st.name)
                i = end._2
                textStart = i
              }
            case None => // truncated tag at EOF: drop silently
          }
        } else {
          // lone '<' is literal text; continue scanning after it
          i = lt + 1
        }
      }
    }
    if (out.length < maxTokens) flushText(n.min(html.length))
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out.toArray)
  }

  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'

  private def readName(s: String, start: Int): (String, Int) = {
    var i = start
    while (i < s.length && isNameChar(s.charAt(i))) i += 1
    (s.substring(start, i).toLowerCase, i)
  }

  /** Parse a start tag beginning after '<'. Returns (tag, index-after-'>').
    * On EOF before '>', returns (None, length).
    */
  private def parseStartTag(s: String, start: Int): (Option[StartTag], Int) = {
    val n = s.length
    val (name, afterName) = readName(s, start)
    var i = afterName
    val attrs = new ArrayBuffer[(String, String)](4)
    var selfClosing = false
    var done = false
    while (!done && i < n && attrs.length < 64) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i >= n) return (None, n)
      s.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && s.charAt(i + 1) == '>') { selfClosing = true; i += 2; done = true }
          else i += 1
        case _ =>
          // attribute name: everything until ws, '=', '>', '/'
          val aStart = i
          while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '=' && s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
          val aName = s.substring(aStart, i).toLowerCase
          while (i < n && isWs(s.charAt(i))) i += 1
          var aVal = ""
          if (i < n && s.charAt(i) == '=') {
            i += 1
            while (i < n && isWs(s.charAt(i))) i += 1
            if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
              val q = s.charAt(i); i += 1
              val vStart = i
              while (i < n && s.charAt(i) != q) i += 1
              aVal = s.substring(vStart, i.min(n))
              if (i < n) i += 1
            } else {
              val vStart = i
              while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '>') i += 1
              aVal = s.substring(vStart, i)
            }
          }
          if (aName.nonEmpty && !attrs.exists(_._1 == aName)) // first occurrence wins
            attrs += ((aName, sanitizeAttr(Entities.decode(aVal, inAttr = true))))
      }
    }
    if (!done && i >= n) (None, n)
    else if (!done) { // attr cap hit: skip to '>'
      val end = s.indexOf('>', i)
      val after = if (end < 0) n else end + 1
      (Some(StartTag(name, attrs.toList, selfClosing)), after)
    } else (Some(StartTag(name, attrs.toList, selfClosing)), i)
  }

  private def isWs(c: Char): Boolean = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Attribute values can reach the markdown verbatim (hrefs), so the
    * reserved span-marker chars must be stripped here too — otherwise
    * page content could forge a marker (see MarkdownSerializer).
    */
  private def sanitizeAttr(v: String): String =
    if (v.indexOf('\uE000') < 0 && v.indexOf('\uE001') < 0) v
    else v.filterNot(c => c == '\uE000' || c == '\uE001')

  /** Find the matching `</name` for a raw-text element; returns index of
    * the '<' (content end). Tolerates EOF.
    */
  private def findRawEnd(s: String, from: Int, name: String): (Int, Int) = {
    val needle = "</" + name
    var i = from
    while (i < s.length) {
      val cand = indexOfIgnoreCase(s, needle, i)
      if (cand < 0) return (s.length, s.length)
      val after = cand + needle.length
      if (after >= s.length || s.charAt(after) == '>' || isWs(s.charAt(after)) || s.charAt(after) == '/') {
        val gt = s.indexOf('>', after)
        return (cand, if (gt < 0) s.length else gt + 1)
      }
      i = cand + 1
    }
    (s.length, s.length)
  }

  private def skipRawText(s: String, from: Int, name: String): Int = findRawEnd(s, from, name)._2

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length; val m = needle.length
    var i = from
    while (i + m <= n) {
      if (s.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }

  /** Normalize newlines; strip C0 controls except \n\t; strip the two
    * private-use chars reserved as span markers by MarkdownSerializer
    * (\uE000/\uE001) so page content can never forge a marker.
    */
  private def cleanText(s: String): String = {
    var needs = false
    var k = 0
    while (k < s.length && !needs) {
      val c = s.charAt(k)
      if (c == '\r' || (c < ' ' && c != '\n' && c != '\t') || c == '\uE000' || c == '\uE001') needs = true
      k += 1
    }
    if (!needs) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\r') {
        sb.append('\n')
        if (i + 1 < s.length && s.charAt(i + 1) == '\n') i += 1
      } else if ((c >= ' ' || c == '\n' || c == '\t') && c != '\uE000' && c != '\uE001') sb.append(c)
      i += 1
    }
    sb.toString
  }
}
