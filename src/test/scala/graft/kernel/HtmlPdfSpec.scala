package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Hand-written contracts for the novel (north_star) kernels — no reference
  * implementation exists for these, so the committed cases below ARE the
  * behavioral spec (SURVEY.md §7.4: keep them behind `kind` dispatch so
  * chunk-mode reference parity is never contaminated).
  */
class HtmlPdfSpec extends AnyFunSuite {
  import HtmlExtract._

  test("html: boilerplate nav/footer stripped, content kept, heading emitted") {
    val html =
      """<html><body>
        |<nav><a href="/">home</a> <a href="/about">about</a></nav>
        |<h1>The Article Title</h1>
        |<p>This is the real body content of the article with enough words to count as content.</p>
        |<footer><a href="/tos">terms</a> copyright 2024</footer>
        |</body></html>""".stripMargin
    val blocks = extractBlocks(html)
    assert(blocks.contains(Heading("The Article Title")))
    assert(blocks.exists { case Body(t) => t.startsWith("This is the real body"); case _ => false })
    assert(!blocks.exists { case Body(t) => t.contains("home") || t.contains("terms"); case _ => false })
  }

  test("html: link-dense block rejected, neighbor-supported short block kept") {
    val linky = "<div>" + (1 to 8).map(i => s"<a href='/$i'>link number $i here</a>").mkString(" ") + "</div>"
    val para = "<p>" + "solid content words fill this paragraph nicely today " * 3 + "</p>"
    val short = "<p>short but supported block</p>"
    val blocks = extractBlocks(linky + para + short)
    assert(!blocks.exists { case Body(t) => t.contains("link number"); case _ => false })
    assert(blocks.count { case Body(_) => true; case _ => false } == 2) // para + supported short
  }

  test("html: script/style content skipped, entities decoded, img src captured") {
    val html = "<p>caf&eacute;? a &amp; b &lt;ok&gt; &#x41;&#66;" + (" word" * 12) + "</p>" +
      "<script>var x = '<p>not content</p>';</script>" +
      "<img src=\"pic.png\" alt=\"x\"/><style>.a{color:red}</style>"
    val blocks = extractBlocks(html)
    val body = blocks.collectFirst { case Body(t) => t }.get
    assert(body.contains("a & b <ok> AB"))
    assert(body.contains("caf&eacute;?")) // unknown named entities pass through untouched
    assert(!blocks.exists { case Body(t) => t.contains("not content"); case _ => false })
    assert(blocks.contains(MediaRef("pic.png")))
  }

  test("html: attr matches only a whole attribute token, skipping quoted values") {
    // data-src must NOT satisfy src; the real src wins
    assert(extractBlocks("<img data-src='lazy.png' src='real.png'>").contains(MediaRef("real.png")))
    // no real src attribute at all -> no media ref
    assert(!extractBlocks("<img data-src='lazy.png'>").exists { case MediaRef(_) => true; case _ => false })
    // 'src=' inside ANOTHER attribute's quoted value is not an attribute
    assert(extractBlocks("<img alt='use src=fake.png here' src=\"true.png\">").contains(MediaRef("true.png")))
    assert(!extractBlocks("<img alt='src=fake.png'>").exists { case MediaRef(_) => true; case _ => false })
    // bare (unquoted) value and self-closing slash still parse
    assert(extractBlocks("<img src=bare.png/>").contains(MediaRef("bare.png")))
  }

  test("html: malformed input never throws (truncated tags, stray <, bad nesting)") {
    for (bad <- Seq("<p>unclosed", "a < b text", "<div><p>x</div></p>", "<", "<!woo>", "<!-- open comment",
        "<a href=>empty</a>", "<img src=>", "<p attr='unterminated>text")) {
      extractBlocks(bad) // must not throw
    }
  }

  test("pdf layout: two-column page recovered left column first, rows in y order") {
    val enc = Seq(
      "320\t10\tright top", "50\t10\tleft top", "50\t22\tleft bottom", "320\t22\tright bottom"
    ).mkString("\n")
    assert(PdfLayout.readingOrderText(enc) ==
      "left top\nleft bottom\n\nright top\nright bottom")
  }

  test("pdf layout: same-line runs joined by space; x-jitter within a column tolerated") {
    val enc = Seq("50\t10\tHello", "120\t10.5\tworld", "52\t30\tnext line").mkString("\n")
    assert(PdfLayout.readingOrderText(enc) == "Hello world\nnext line")
  }

  test("pdf layout: malformed run lines ignored, empty page -> empty string") {
    assert(PdfLayout.readingOrderText("") == "")
    assert(PdfLayout.readingOrderText("garbage\n1\t2\nx\ty\ttext\n50\t10\tok") == "ok")
  }

  test("pdf layout: column detection splits only on gaps > ColumnGap") {
    val runs = PdfLayout.parseRuns("10\t5\ta\n40\t5\tb\n200\t5\tc")
    assert(PdfLayout.assignColumns(runs) == Vector(0, 0, 1))
  }

  test("fuzz: random tag soup never throws; body text never leaks markup") {
    val rnd = new scala.util.Random(42)
    val atoms = Vector("<", ">", "</", "<p>", "</p>", "<a href='", "'>", "<div", " class=x>",
      "<!--", "-->", "<script>", "</script>", "&amp;", "&#", "&bogus;", "text ", "words here ",
      "<img src=", "\"u.png\"", "/>", "<h2>", "</h2>", "\n", "\t", "é中😀", "<br>", "=", "'")
    for (_ <- 1 to 500) {
      val soup = Vector.fill(rnd.nextInt(60))(atoms(rnd.nextInt(atoms.length))).mkString
      val blocks = HtmlExtract.extractBlocks(soup) // must not throw
      for (b <- blocks) b match {
        case HtmlExtract.Body(t)    => assert(!t.contains("<script>"), s"script leaked from: $soup")
        case HtmlExtract.Heading(t) => assert(t.nonEmpty)
        case HtmlExtract.MediaRef(_) => ()
      }
    }
  }

  test("fuzz: random layout runs — never throws, every run text preserved exactly once") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(30)
      val runs = (0 until n).map { i =>
        val x = rnd.nextInt(500); val y = rnd.nextInt(800)
        s"$x\t$y\tt$i"
      }
      val garbage = if (rnd.nextBoolean()) "\nnot-a-run\n1\t2" else ""
      val text = PdfLayout.readingOrderText(runs.mkString("\n") + garbage)
      for (i <- 0 until n)
        assert(("(^|[ \n])t" + i + "($|[ \n])").r.findAllIn(text).size == 1,
          s"run t$i not exactly once in: $text")
    }
  }
}
