package graft.html

/** HTML character-reference decoding (named + numeric).
  *
  * Bounded, fixed table — the subset that occurs in web text at meaningful
  * frequency. Unknown references are left verbatim (never dropped), which
  * is both WHATWG-ish and loss-free for the byte-identity invariant.
  *
  * NBSP decodes directly to a plain space: the reference normalizes
  * `\xa0` to space at every ingest point (/root/reference/nougat/dataset/
  * parser/html2md.py:52, markdown.py:386), so we fold that normalization
  * into decoding to keep it in exactly one place.
  */
object Entities {

  val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "shy" -> "", "ensp" -> " ", "emsp" -> " ", "thinsp" -> " ",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "plusmn" -> "±", "micro" -> "µ",
    "sup1" -> "¹", "sup2" -> "²", "sup3" -> "³",
    "frac12" -> "½", "frac14" -> "¼", "frac34" -> "¾",
    "middot" -> "·", "bull" -> "•", "hellip" -> "…",
    "prime" -> "′", "Prime" -> "″",
    "ndash" -> "–", "mdash" -> "—",
    "lsquo" -> "‘", "rsquo" -> "’", "sbquo" -> "‚",
    "ldquo" -> "“", "rdquo" -> "”", "bdquo" -> "„",
    "dagger" -> "†", "Dagger" -> "‡", "permil" -> "‰",
    "lsaquo" -> "‹", "rsaquo" -> "›",
    "laquo" -> "«", "raquo" -> "»",
    "times" -> "×", "divide" -> "÷", "minus" -> "−",
    "sect" -> "§", "para" -> "¶",
    "cent" -> "¢", "pound" -> "£", "yen" -> "¥",
    "euro" -> "€", "curren" -> "¤",
    "szlig" -> "ß", "ccedil" -> "ç", "ntilde" -> "ñ",
    "auml" -> "ä", "ouml" -> "ö", "uuml" -> "ü",
    "Auml" -> "Ä", "Ouml" -> "Ö", "Uuml" -> "Ü",
    "eacute" -> "é", "egrave" -> "è", "ecirc" -> "ê",
    "agrave" -> "à", "acirc" -> "â", "aacute" -> "á",
    "iacute" -> "í", "oacute" -> "ó", "uacute" -> "ú",
    "alpha" -> "α", "beta" -> "β", "gamma" -> "γ",
    "delta" -> "δ", "epsilon" -> "ε", "lambda" -> "λ",
    "mu" -> "μ", "pi" -> "π", "sigma" -> "σ",
    "omega" -> "ω", "Delta" -> "Δ", "Omega" -> "Ω",
    "infin" -> "∞", "sum" -> "∑", "prod" -> "∏",
    "int" -> "∫", "radic" -> "√", "asymp" -> "≈",
    "ne" -> "≠", "le" -> "≤", "ge" -> "≥",
    "larr" -> "←", "uarr" -> "↑", "rarr" -> "→",
    "darr" -> "↓", "harr" -> "↔"
  )

  /** Legacy entities valid without a trailing semicolon, longest first. */
  private val legacy: List[String] = List("quot", "nbsp", "amp", "lt", "gt")

  /** Decode all character references in `s`. Never throws.
    * `inAttr` enables WHATWG attribute-mode rules: legacy no-semicolon
    * entities are NOT decoded when followed by [A-Za-z0-9=] (otherwise
    * URLs like "?x=1&gte=5" would be corrupted).
    */
  def decode(s: String, inAttr: Boolean = false): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (i >= 0 && i < s.length) {
      sb.append(s, last, i)
      val (rep, next) = decodeAt(s, i, inAttr)
      sb.append(rep)
      last = next
      i = s.indexOf('&', next)
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  /** windows-1252 mapping for numeric refs in 0x80–0x9F (WHATWG treats
    * these as cp1252 bytes, not C1 controls — '&#146;' means '’').
    */
  private val cp1252: Map[Int, String] = Map(
    0x80 -> "€", 0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„", 0x85 -> "…",
    0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ", 0x89 -> "‰", 0x8A -> "Š",
    0x8B -> "‹", 0x8C -> "Œ", 0x8E -> "Ž", 0x91 -> "‘", 0x92 -> "’",
    0x93 -> "“", 0x94 -> "”", 0x95 -> "•", 0x96 -> "–", 0x97 -> "—",
    0x98 -> "˜", 0x99 -> "™", 0x9A -> "š", 0x9B -> "›", 0x9C -> "œ",
    0x9E -> "ž", 0x9F -> "Ÿ")

  /** Decode one reference starting at s(pos)=='&'. Returns (replacement,
    * index after the consumed chars); on no match returns ("&", pos+1).
    */
  private def decodeAt(s: String, pos: Int, inAttr: Boolean): (String, Int) = {
    val n = s.length
    if (pos + 1 >= n) return ("&", pos + 1)
    if (s.charAt(pos + 1) == '#') {
      var i = pos + 2
      var hex = false
      if (i < n && (s.charAt(i) == 'x' || s.charAt(i) == 'X')) { hex = true; i += 1 }
      val start = i
      var code = 0L
      while (i < n && i - start < 8 && isDigitIn(s.charAt(i), hex)) {
        code = code * (if (hex) 16 else 10) + Character.digit(s.charAt(i), if (hex) 16 else 10)
        i += 1
      }
      if (i == start) return ("&", pos + 1)
      val end = if (i < n && s.charAt(i) == ';') i + 1 else i
      if (code <= 0 || code > 0x10ffff || (code >= 0xd800 && code <= 0xdfff)) ("�", end)
      else if (code == 0xa0) (" ", end) // NBSP → space (see header)
      else if (code >= 0x80 && code <= 0x9f) (cp1252.getOrElse(code.toInt, ""), end)
      else if (code == 0xE000 || code == 0xE001) ("", end) // reserved span markers
      else (new String(Character.toChars(code.toInt)), end)
    } else {
      var i = pos + 1
      val start = i
      while (i < n && i - start < 10 && (Character.isLetterOrDigit(s.charAt(i)))) i += 1
      if (i == start) return ("&", pos + 1)
      val name = s.substring(start, i)
      named.get(name) match {
        case Some(rep) if i < n && s.charAt(i) == ';' => (rep, i + 1)
        case _ =>
          // WHATWG legacy: a known no-semicolon entity matches as the
          // longest prefix ("&ltd" → "<d") — but NOT in attributes when
          // followed by [A-Za-z0-9=] (would corrupt URL query params).
          legacy.collectFirst {
            case l if name.startsWith(l) &&
              !(inAttr && {
                val after = start + l.length
                after < n && (Character.isLetterOrDigit(s.charAt(after)) || s.charAt(after) == '=')
              }) => (named(l), start + l.length)
          }.getOrElse(("&", pos + 1))
      }
    }
  }

  private def isDigitIn(c: Char, hex: Boolean): Boolean =
    if (hex) Character.digit(c, 16) >= 0 else c >= '0' && c <= '9'
}
