package graft.kernel

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** C4–C8: blank-line paragraph split, sentence split + re-grouping, and
  * short-fragment merge — the reference's latent paragraph-mode segmentation.
  *
  * Reference: `/root/reference/src/ingestion/extract_paragraphs.py` (C4–C7)
  * and `src/ingestion/paragraph_utils.py:6-27` (C8). These carry sequential
  * state (greedy packing, merge-into-previous), so they run in the typed
  * kernel stage, not as Catalyst expressions.
  */
object Paragraphs {
  val ParaMinChars        = 80  // extract_paragraphs.py:4
  val FallbackTargetChars = 600 // extract_paragraphs.py:5

  // extract_paragraphs.py:7 — Python \s is Unicode; [.!?] / [A-Z] literal.
  private val sentenceEnd = Pattern.compile("(?<=[.!?])(?U)\\s+(?=[A-Z])")
  private val blankLine   = Pattern.compile("(?U)\\n\\s*\\n")
  private val blankLines  = Pattern.compile("(?U)\\n\\s*\\n+")

  /** `_split_on_blank_lines` (extract_paragraphs.py:23-25). */
  def splitOnBlankLines(txt: String): Vector[String] =
    PyText.reSplit(blankLine, txt).iterator
      .map(PyText.strip).filter(_.nonEmpty).toVector

  /** C5 sentence split (`_sentence_end_re.split`). */
  def splitSentences(txt: String): Vector[String] =
    PyText.reSplit(sentenceEnd, txt).toVector

  /** C6 `_fallback_sentence_grouping` (extract_paragraphs.py:27-48): greedy
    * pack stripped sentences until >= 600 chars; emit groups >= 80 chars;
    * flush the residual buffer with the same min-length filter.
    */
  def fallbackSentenceGrouping(txt: String): Vector[String] = {
    val grouped = Vector.newBuilder[String]
    val buf = ArrayBuffer.empty[String]
    var charCount = 0
    def flush(): Unit = {
      val paragraph = PyText.strip(buf.mkString(" "))
      if (PyText.len(paragraph) >= ParaMinChars) grouped += paragraph
      buf.clear()
      charCount = 0
    }
    for (raw <- splitSentences(txt)) {
      val s = PyText.strip(raw)
      if (s.nonEmpty) {
        buf += s
        charCount += PyText.len(s) + 1
        if (charCount >= FallbackTargetChars) flush()
      }
    }
    if (buf.nonEmpty) flush()
    grouped.result()
  }

  /** C7 `extract_paragraphs` (extract_paragraphs.py:50-64). NOTE: the
    * blank-line branch tests the *raw* pre-clean text (`:55`) — cleaning can
    * both create (`\r\n\r\n` → `\n\n`) and destroy (`\n{3,}` stays `\n\n`...)
    * blank lines, so the branch condition must not move post-clean.
    */
  def extractParagraphs(pageText: String): Vector[String] = {
    if (pageText == null || PyText.strip(pageText).isEmpty) return Vector.empty
    val cleaned = TextClean.cleanPageText(pageText)
    val paras =
      if (pageText.contains("\n\n")) splitOnBlankLines(cleaned)
      else fallbackSentenceGrouping(cleaned)
    paras.filter(p => PyText.len(p) >= ParaMinChars)
  }

  /** C8 `paragraphize` (paragraph_utils.py:6-27): split on blank-line runs,
    * whitespace-normalize lines, drop empties, merge fragments < minLen into
    * the previous paragraph.
    */
  def paragraphize(pageText: String, minLen: Int = 20): Vector[String] = {
    val cleaned = pageText.replace("\r", "")
    val rawParas = PyText.reSplit(blankLines, cleaned)
    val paragraphs = ArrayBuffer.empty[String]
    for (para <- rawParas) {
      val lines = para.split("\n", -1).map(TextClean.normalizeWhitespace)
      val candidate = TextClean.normalizeWhitespace(lines.filter(_.nonEmpty).mkString(" "))
      if (candidate.nonEmpty) {
        if (PyText.len(candidate) < minLen && paragraphs.nonEmpty)
          paragraphs(paragraphs.length - 1) = paragraphs.last + " " + candidate
        else paragraphs += candidate
      }
    }
    paragraphs.toVector
  }
}
