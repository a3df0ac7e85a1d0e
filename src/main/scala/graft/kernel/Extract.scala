package graft.kernel

import graft.model.{Doc, Span, SpanKinds}

/** The per-document extraction kernel: input spans → ordered output spans.
  *
  * Pure Scala (no Spark imports) so it is directly unit-testable against the
  * committed goldens and runs inside one typed `mapPartitions` stage
  * (SURVEY.md §7.1 — the only non-Catalyst stage in the pipeline).
  *
  * Modes:
  *  - [[ExtractMode.ChunkMode]] — the reference's *live* path: every text-ish
  *    span is cleaned? NO — the live reference chunks the *raw* page text
  *    (`ingest_documents.py:70-81` passes `page_text` straight to
  *    `chunk_document`, no cleaning), 500/80 sliding window. Media spans pass
  *    through as kind="media".
  *  - [[ExtractMode.ParagraphMode]] — the latent `extract_paragraphs` path
  *    (C7): clean → blank-line split or sentence re-group → min-80 filter.
  *  - [[ExtractMode.SemanticMode]] — the north_star's heading-aware path:
  *    html spans get boilerplate-stripped block extraction (HtmlExtract),
  *    pdf_layout spans get reading-order recovery (PdfLayout), headings are
  *    emitted as kind="heading" and body text is chunked per heading section.
  */
sealed trait ExtractMode
object ExtractMode {
  case object ChunkMode     extends ExtractMode
  case object ParagraphMode extends ExtractMode
  case object SemanticMode  extends ExtractMode
}

object Extract {

  /** Extract one document. Deterministic; output offset = emission order. */
  def extractDoc(doc: Doc, mode: ExtractMode = ExtractMode.ChunkMode): Doc = {
    val out = Vector.newBuilder[Span]
    var idx = 0
    def emit(kind: String, text: String, mediaRef: String): Unit = {
      out += Span(kind, text, mediaRef, idx)
      idx += 1
    }
    // Input spans are processed in offset order regardless of array order;
    // skip the sort copy when already ordered (the common case).
    val ordered = {
      var sorted = true
      var i = 1
      while (sorted && i < doc.spans.length) {
        if (doc.spans(i - 1).offset > doc.spans(i).offset) sorted = false
        i += 1
      }
      if (sorted) doc.spans else doc.spans.sortBy(_.offset)
    }
    for (span <- ordered) {
      span.kind match {
        case k if SpanKinds.MediaInputs.contains(k) =>
          emit(SpanKinds.Media, "", span.media_ref)
        case SpanKinds.Html if mode == ExtractMode.SemanticMode =>
          for (b <- HtmlExtract.extractBlocks(span.text)) b match {
            case HtmlExtract.Heading(t)    => emit(SpanKinds.Heading, t, "")
            case HtmlExtract.Body(t)       => Chunker.chunkText(t).foreach(emit(SpanKinds.Chunk, _, ""))
            case HtmlExtract.MediaRef(ref) => emit(SpanKinds.Media, "", ref)
          }
        case SpanKinds.PdfLayout if mode == ExtractMode.SemanticMode =>
          val ordered = PdfLayout.readingOrderText(span.text)
          Chunker.chunkText(ordered).foreach(emit(SpanKinds.Chunk, _, ""))
        case _ =>
          mode match {
            case ExtractMode.ParagraphMode =>
              Paragraphs.extractParagraphs(span.text).foreach(emit(SpanKinds.Paragraph, _, ""))
            case _ => // ChunkMode (and SemanticMode over plain text/pdf_page spans)
              Chunker.chunkText(span.text).foreach(emit(SpanKinds.Chunk, _, ""))
          }
      }
    }
    Doc(doc.doc_id, out.result())
  }
}
