package graft.model

/** Core table shapes (BASELINE.json `input_hint`).
  *
  * Input:  docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)
  * Output: same shape; output `offset` is the 0-based emission order per doc —
  * the reference's `paragraph_index` ordering
  * (`/root/reference/src/scripts/ingest_documents.py:77-81`).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class Doc(doc_id: String, spans: Seq[Span])

/** Per-partition lineage/metrics row — the north_rule's checkpoint unit. */
final case class Lineage(
    partition_id: Int,
    docs_parsed: Long,
    spans_emitted: Long,
    parse_failures: Long,
    status: String)

object SpanKinds {
  // input kinds
  val PdfPage  = "pdf_page"
  val Html     = "html"
  val Text     = "text"
  val Image    = "image"
  val Figure   = "figure"
  val Table    = "table"
  val PdfLayout = "pdf_layout" // positioned text runs ("x\ty\ttext" lines)
  // output kinds
  val Chunk     = "chunk"
  val Paragraph = "paragraph"
  val Heading   = "heading"
  val Media     = "media"

  val MediaInputs: Set[String] = Set(Image, Figure, Table)
}
