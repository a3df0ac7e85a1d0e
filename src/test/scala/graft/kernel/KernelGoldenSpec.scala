package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Doc, Span}
import scala.jdk.CollectionConverters._

/** North-rule gate: exact equality of kernel outputs against goldens
  * produced by the reference's own Python functions (scripts/gen_goldens.py).
  */
class KernelGoldenSpec extends AnyFunSuite {

  test("C1 chunk_text: exact Python slice parity (incl. astral code points)") {
    for (c <- Golden.load("chunk_text.json")) {
      val got = Chunker.chunkText(c.get("text").asText(),
        c.get("chunk_size").asInt(), c.get("overlap").asInt())
      assert(got == Golden.strs(c.get("chunks")),
        s"chunk mismatch for size=${c.get("chunk_size")} text=${c.get("text").asText().take(60)}")
    }
  }

  test("T1-T5 _clean_page_text chain") {
    for (c <- Golden.load("clean_page_text.json")) {
      assert(TextClean.cleanPageText(c.get("text").asText()) == c.get("cleaned").asText(),
        s"clean mismatch for ${c.get("text").asText().take(80).replace("\n", "\\n")}")
    }
  }

  test("C7 extract_paragraphs (branch on raw text, min-80 filter)") {
    for (c <- Golden.load("extract_paragraphs.json")) {
      assert(Paragraphs.extractParagraphs(c.get("text").asText()) == Golden.strs(c.get("paragraphs")),
        s"paragraphs mismatch for ${c.get("text").asText().take(80).replace("\n", "\\n")}")
    }
  }

  test("C6 _fallback_sentence_grouping (greedy 600-char packs, min-80 drop)") {
    for (c <- Golden.load("fallback_grouping.json"))
      assert(Paragraphs.fallbackSentenceGrouping(c.get("text").asText()) == Golden.strs(c.get("groups")))
  }

  test("C4 _split_on_blank_lines") {
    for (c <- Golden.load("split_blank_lines.json"))
      assert(Paragraphs.splitOnBlankLines(c.get("text").asText()) == Golden.strs(c.get("parts")))
  }

  test("C8 paragraphize (short-fragment merge)") {
    for (c <- Golden.load("paragraphize.json"))
      assert(Paragraphs.paragraphize(c.get("text").asText(), c.get("min_len").asInt())
        == Golden.strs(c.get("paragraphs")),
        s"paragraphize mismatch for ${c.get("text").asText().take(80).replace("\n", "\\n")}")
  }

  test("T8/T9/T6 metadata extract + normalize") {
    for (c <- Golden.load("metadata.json")) {
      val raw: Map[String, Any] = c.get("raw").properties().asScala.map { e =>
        val v = e.getValue
        val value: Any =
          if (v.isNull) null
          else if (v.isArray) v.elements().asScala.map(_.asText()).toVector
          else v.asText()
        e.getKey -> value
      }.toMap
      val got = MetaNorm.extractMetadata(raw)
      val exp = c.get("extracted")
      assert(got.title == exp.get("title").asText())
      assert(got.author == exp.get("author").asText())
      assert(got.producer == exp.get("producer").asText())
      assert(got.creator == exp.get("creator").asText())
      assert(got.creationDate == exp.get("creation_date").asText())
      assert(got.modificationDate == exp.get("modification_date").asText())
      assert(got.keywords == exp.get("keywords").asText())
      assert(got.appleKeywords == Golden.strs(exp.get("apple_keywords")))
      assert(got.rgid == exp.get("rgid").asText())

      // normalize_metadata golden: keys were alternately upper-cased upstream
      val extractedPairs = Vector(
        "title" -> got.title, "AUTHOR" -> got.author, "producer" -> got.producer,
        "CREATOR" -> got.creator, "creation_date" -> got.creationDate,
        "MODIFICATION_DATE" -> got.modificationDate, "keywords" -> got.keywords,
        // apple_keywords is a list — string entries only in this golden check
        "RGID" -> got.rgid)
      val norm = MetaNorm.normalizeMetadata(extractedPairs).toMap
      val expNorm = c.get("normalized")
      for (name <- expNorm.fieldNames().asScala if name != "apple_keywords") {
        assert(norm(name) == expNorm.get(name).asText(), s"normalize mismatch on $name")
      }
    }
  }

  test("T7 normalize_date (strptime parity incl. non-padded + fallback)") {
    for (c <- Golden.load("normalize_date.json"))
      assert(MetaNorm.normalizeDate(c.get("in").asText()) == c.get("out").asText(),
        s"date mismatch for '${c.get("in").asText()}'")
  }

  test("edge goldens: astral/ZWJ chunk boundaries, exotic whitespace, punctuation") {
    for (c <- Golden.load("chunk_text_edge.json"))
      assert(Chunker.chunkText(c.get("text").asText(),
        c.get("chunk_size").asInt(), c.get("overlap").asInt()) == Golden.strs(c.get("chunks")))
    for (c <- Golden.load("clean_edge.json"))
      assert(TextClean.cleanPageText(c.get("text").asText()) == c.get("cleaned").asText(),
        s"clean mismatch for ${c.get("text").asText().flatMap(ch => if (ch < ' ') f"\\x${ch.toInt}%02x" else ch.toString)}")
    for (c <- Golden.load("paragraphs_edge.json"))
      assert(Paragraphs.extractParagraphs(c.get("text").asText()) == Golden.strs(c.get("paragraphs")))
    for (c <- Golden.load("paragraphize_edge.json"))
      assert(Paragraphs.paragraphize(c.get("text").asText(), c.get("min_len").asInt())
        == Golden.strs(c.get("paragraphs")))
    for (c <- Golden.load("sentences_edge.json"))
      assert(Paragraphs.fallbackSentenceGrouping(c.get("text").asText()) == Golden.strs(c.get("groups")),
        s"sentence-group mismatch for '${c.get("text").asText().take(60)}'")
  }

  test("live ingest path: doc -> output span sequence (kind,text,media_ref,order)") {
    for (c <- Golden.load("extract_docs.json")) {
      val spans = c.get("spans").elements().asScala.map { s =>
        Span(s.get("kind").asText(), s.get("text").asText(),
          s.get("media_ref").asText(), s.get("offset").asInt())
      }.toVector
      val expected = c.get("out_spans").elements().asScala.map { s =>
        Span(s.get("kind").asText(), s.get("text").asText(),
          s.get("media_ref").asText(), s.get("offset").asInt())
      }.toVector
      val got = Extract.extractDoc(Doc(c.get("doc_id").asText(), spans))
      assert(got.spans == expected, s"span sequence mismatch for ${c.get("doc_id").asText()}")
    }
  }
}
