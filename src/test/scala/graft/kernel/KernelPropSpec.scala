package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5.2.3). The scalatest<->scalacheck bridge isn't
  * in the offline cache, so generators are driven directly with fixed seeds —
  * deterministic across runs by construction.
  */
class KernelPropSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var i = 0L
    var produced = 0
    while (produced < n) {
      gen.apply(Gen.Parameters.default.withSize(1 + (i % 50).toInt), Seed(i)) match {
        case Some(a) => f(a); produced += 1
        case None    =>
      }
      i += 1
    }
  }

  private val textGen: Gen[String] = Gen.frequency(
    5 -> Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumStr.map(_.take(8)),
      2 -> Gen.oneOf(" ", "\n", "\n\n", "\t", "\r\n", "-\n", ". A"))).map(_.mkString),
    1 -> Gen.const(""),
    1 -> Gen.listOf(Gen.oneOf("中", "😀", "é", "ß", " ")).map(_.mkString))

  test("chunk reassembly: dropping each chunk's first `overlap` cps reconstructs input") {
    forAll(textGen) { (t: String) =>
      val chunks = Chunker.chunkText(t, 500, 80)
      val rebuilt = chunks.zipWithIndex.map {
        case (c, 0) => c
        case (c, _) => PyText.slice(c, 80, PyText.len(c))
      }.mkString
      assert(rebuilt == t)
    }
  }

  test("chunk invariants: length <= size; count == ceil(len/step); non-empty") {
    forAll(textGen) { (t: String) =>
      val chunks = Chunker.chunkText(t, 500, 80)
      assert(chunks.forall(c => PyText.len(c) <= 500 && c.nonEmpty))
      assert(chunks.size == Chunker.chunkCount(PyText.len(t)))
    }
  }

  test("extract_paragraphs outputs all >= 80 cps and deterministic") {
    forAll(textGen) { (t: String) =>
      val p1 = Paragraphs.extractParagraphs(t)
      assert(p1.forall(PyText.len(_) >= 80))
      assert(p1 == Paragraphs.extractParagraphs(t))
    }
  }

  test("cleanPageText idempotent-ish: no \\r, no lone spaces runs, stripped") {
    forAll(textGen) { (t: String) =>
      val c = TextClean.cleanPageText(t)
      assert(!c.contains('\r'))
      assert(!c.contains("  ") || c.contains("\n"))   // space runs collapsed (newline-adjacent spaces excepted)
      assert(c == PyText.strip(c))
    }
  }

  test("extractDoc: offsets are 0..n-1 in order; media refs preserved; deterministic") {
    import graft.model.{Doc, Span}
    val spanGen = for {
      kind <- Gen.oneOf("pdf_page", "text", "image", "figure")
      t <- textGen
    } yield (kind, t)
    forAll(Gen.listOf(spanGen)) { (raw: List[(String, String)]) =>
      val spans = raw.zipWithIndex.map { case ((k, t), i) =>
        if (k == "image" || k == "figure") Span(k, "", s"media://$i", i)
        else Span(k, t, "", i)
      }
      val doc = Doc("d", spans)
      val out = Extract.extractDoc(doc)
      assert(out.spans.map(_.offset) == out.spans.indices)
      val mediaIn = spans.filter(s => s.kind == "image" || s.kind == "figure").map(_.media_ref)
      assert(out.spans.filter(_.kind == "media").map(_.media_ref) == mediaIn)
      assert(out == Extract.extractDoc(doc))
    }
  }
}
