package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** From-scratch HTML main-content extraction: tag tokenizer + block
  * segmentation + text-density / link-ratio boilerplate scoring
  * (Readability/Boilerpipe-style, per the north_star). No jsoup, no DOM
  * library — a single linear scan, so it is cheap enough to run per-row
  * inside the mapPartitions kernel at 10^12-document scale.
  *
  * The classifier is a simplified Kohlschütter et al. (WSDM 2010,
  * "Boilerplate Detection using Shallow Text Features") decision rule:
  * blocks are content iff their link density is low and either the block or
  * one of its neighbours carries enough words. Headings (h1–h6) and media
  * refs (img/figure src) are preserved structurally.
  */
object HtmlExtract {

  sealed trait Block
  final case class Heading(text: String)  extends Block
  final case class Body(text: String)     extends Block
  final case class MediaRef(ref: String)  extends Block

  private val blockTags = Set(
    "p", "div", "section", "article", "main", "header", "footer", "aside",
    "nav", "ul", "ol", "li", "table", "tr", "td", "th", "blockquote", "pre",
    "h1", "h2", "h3", "h4", "h5", "h6", "br", "hr", "figure", "figcaption",
    "title", "body", "html")
  private val skipContent = Set("script", "style", "noscript", "svg", "template")
  private val boilerTags  = Set("nav", "header", "footer", "aside")

  private final case class RawBlock(
      tag: String, text: String, anchorChars: Int, inBoiler: Boolean)

  /** Minimal entity decoding for the common five + numeric refs. */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: String = ent match {
            case "amp" => "&"; case "lt" => "<"; case "gt" => ">"
            case "quot" => "\""; case "apos" => "'"; case "nbsp" => " "
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try new String(Character.toChars(Integer.parseInt(e.drop(2), 16))) catch { case _: Exception => null }
            case e if e.startsWith("#") =>
              try new String(Character.toChars(e.drop(1).toInt)) catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 } else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Whitespace-run word count, allocation-free (hot path: per block). */
  private def wordCount(s: String): Int = {
    var count = 0
    var inWord = false
    var i = 0
    while (i < s.length) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inWord) count += 1
      inWord = !ws
      i += 1
    }
    count
  }

  /** Tokenize + segment into raw blocks with anchor-char accounting. */
  private def segment(html: String): Vector[RawBlock] = {
    val blocks = ArrayBuffer.empty[RawBlock]
    val text = new java.lang.StringBuilder
    var anchorChars = 0
    var anchorDepth = 0
    var boilerDepth = 0
    var curTag = "body"
    var skipUntil: String = null
    var headingTag: String = null

    def flush(): Unit = {
      val t = TextClean.normalizeWhitespace(decodeEntities(text.toString))
      if (t.nonEmpty) blocks += RawBlock(curTag, t, math.min(anchorChars, t.length), boilerDepth > 0)
      text.setLength(0)
      anchorChars = 0
    }

    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        // comment?
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val gt = html.indexOf('>', i + 1)
          if (gt < 0) { i = n } // truncated tag: drop remainder
          else {
            val inner = html.substring(i + 1, gt)
            val closing = inner.startsWith("/")
            val body = if (closing) inner.substring(1) else inner
            val name = body.takeWhile(ch => ch.isLetterOrDigit).toLowerCase(java.util.Locale.ROOT)
            if (skipUntil != null) {
              if (closing && name == skipUntil) skipUntil = null
            } else if (name.nonEmpty) {
              if (!closing && skipContent.contains(name)) {
                // self-closing script-ish tags don't open a skip region
                if (!inner.endsWith("/")) skipUntil = name
              } else if (name == "a") {
                if (closing) anchorDepth = math.max(0, anchorDepth - 1) else anchorDepth += 1
              } else if (name == "img") {
                flush()
                attr(inner, "src").foreach(src => blocks += RawBlock("img", src, 0, boilerDepth > 0))
              } else if (blockTags.contains(name)) {
                flush()
                if (boilerTags.contains(name)) boilerDepth = math.max(0, boilerDepth + (if (closing) -1 else 1))
                if (name.length == 2 && name.charAt(0) == 'h' && name.charAt(1).isDigit) {
                  headingTag = if (closing) null else name
                  curTag = if (closing) "body" else name
                } else if (!closing) curTag = name
                else curTag = "body"
              }
              // inline tags (b, i, span, em, …): ignored, text flows through
            }
            i = gt + 1
          }
        }
      } else {
        if (skipUntil == null) {
          text.append(c)
          if (anchorDepth > 0) anchorChars += 1
        }
        i += 1
      }
    }
    flush()
    // tag headings explicitly
    blocks.toVector
  }

  private def isHeadingTag(t: String): Boolean =
    t.length == 2 && t.charAt(0) == 'h' && t.charAt(1).isDigit

  /** Main entry: HTML string → ordered content blocks. */
  def extractBlocks(html: String): Vector[Block] = {
    val raws = segment(html)
    val words = raws.map(b => if (b.tag == "img") 0 else wordCount(b.text))
    val out = Vector.newBuilder[Block]
    for (i <- raws.indices) {
      val b = raws(i)
      if (b.tag == "img") {
        out += MediaRef(b.text)
      } else if (isHeadingTag(b.tag) || b.tag == "title") {
        if (b.text.nonEmpty && !b.inBoiler) out += Heading(b.text)
      } else {
        val linkDensity = if (b.text.isEmpty) 0.0 else b.anchorChars.toDouble / b.text.length
        val prevW = if (i > 0) words(i - 1) else 0
        val nextW = if (i < raws.length - 1) words(i + 1) else 0
        // simplified Kohlschütter rule: low link density AND local word mass
        val content = !b.inBoiler && linkDensity < 0.333 &&
          (words(i) >= 10 || (words(i) >= 4 && (prevW >= 10 || nextW >= 10)))
        if (content) out += Body(b.text)
      }
    }
    out.result()
  }

  /** Pull a (quoted or bare) attribute value out of raw tag innards.
    *
    * Proper left-to-right attribute tokenizer (round-1 fix): only an
    * attribute whose FULL name token equals `name` matches, so
    * `<img data-src='x'>` does not satisfy attr(_, "src"), and a `src=`
    * occurring inside another attribute's quoted value is skipped because
    * quoted values are consumed as units while scanning.
    */
  private def attr(tagInner: String, name: String): Option[String] = {
    val n = tagInner.length
    var i = 0
    var first = true // first token is the tag name, never an attribute
    while (i < n) {
      while (i < n && tagInner.charAt(i).isWhitespace) i += 1
      if (i >= n) return None
      // attribute-name token: up to whitespace or '='
      val start = i
      while (i < n && !tagInner.charAt(i).isWhitespace && tagInner.charAt(i) != '=') i += 1
      val tok = tagInner.substring(start, i).toLowerCase(java.util.Locale.ROOT)
      while (i < n && tagInner.charAt(i).isWhitespace) i += 1
      var value: Option[String] = None
      if (i < n && tagInner.charAt(i) == '=') {
        i += 1
        while (i < n && tagInner.charAt(i).isWhitespace) i += 1
        if (i < n) {
          val q = tagInner.charAt(i)
          if (q == '"' || q == '\'') {
            val end = tagInner.indexOf(q, i + 1)
            if (end < 0) { value = Some(tagInner.substring(i + 1)); i = n }
            else { value = Some(tagInner.substring(i + 1, end)); i = end + 1 }
          } else {
            val s2 = i
            while (i < n && !tagInner.charAt(i).isWhitespace) i += 1
            value = Some(tagInner.substring(s2, i).stripSuffix("/"))
          }
        } else value = Some("")
      }
      if (!first && tok == name && value.exists(_.nonEmpty)) return value
      first = false
    }
    None
  }
}
