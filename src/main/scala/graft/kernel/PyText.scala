package graft.kernel

/** Python-string-semantics helpers.
  *
  * The reference pipeline (jaganraajan/rag-document-parser) is Python; its
  * behavioral contract (SURVEY.md §5) is exact span-sequence equality, so the
  * kernel must reproduce Python `str` semantics on the JVM:
  *
  *  - Python slices/indexes by *code point*; Java `String` by UTF-16 unit.
  *  - Python `str.strip()` strips the Unicode-isspace set (which includes
  *    NBSP U+00A0 and NEL U+0085); Java `trim()` is ASCII<=0x20 and
  *    `Character.isWhitespace` excludes non-breaking spaces.
  *  - Python `\w`/`\s` are Unicode-aware by default; Java needs `(?U)`.
  */
object PyText {

  /** Python `str.isspace()` for a single code point: true for Unicode
    * whitespace (category Zs/Zl/Zp or bidi WS/B/S). Covers NBSP + NEL which
    * `Character.isWhitespace` misses.
    */
  def isPySpace(cp: Int): Boolean =
    Character.isWhitespace(cp) ||
      cp == 0x00A0 || cp == 0x0085 || {
        val t = Character.getType(cp)
        t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
        t == Character.PARAGRAPH_SEPARATOR
      }

  /** Python `str.strip()` (no-arg): strip leading/trailing Unicode space. */
  def strip(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n && isPySpace(s.codePointAt(i))) i += Character.charCount(s.codePointAt(i))
    var j = n
    while (j > i) {
      val cp = s.codePointBefore(j)
      if (!isPySpace(cp)) return s.substring(i, j)
      j -= Character.charCount(cp)
    }
    s.substring(i, j)
  }

  /** Python `text[a:b]` — code-point slicing (clamped like Python). */
  def slice(s: String, from: Int, until: Int): String = {
    // Fast path: no astral chars => code points == chars.
    val n = s.length
    if (s.codePointCount(0, n) == n) {
      val a = math.max(0, math.min(from, n))
      val b = math.max(a, math.min(until, n))
      s.substring(a, b)
    } else {
      val total = s.codePointCount(0, n)
      val a = math.max(0, math.min(from, total))
      val b = math.max(a, math.min(until, total))
      val ai = s.offsetByCodePoints(0, a)
      val bi = s.offsetByCodePoints(ai, b - a)
      s.substring(ai, bi)
    }
  }

  /** Python `len(s)` — code points, not UTF-16 units. */
  def len(s: String): Int = s.codePointCount(0, s.length)

  /** Python `str.lower()` (locale-independent). */
  def lower(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  /** Python `re.split(pattern, s)` keeps trailing empties (Java drops them
    * unless limit is negative).
    */
  def reSplit(p: java.util.regex.Pattern, s: String): Array[String] = p.split(s, -1)
}
