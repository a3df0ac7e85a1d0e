package graft.kernel

/** C1 fixed-size overlapping character chunker — the reference's *live*
  * segmentation path.
  *
  * Reference: `/root/reference/src/ingestion/chunk_document.py:1-19`
  * (`chunk_text`), called with chunk_size=500, overlap=80 at
  * `chunk_document.py:21,34`; applied per *page* at
  * `src/scripts/ingest_documents.py:70-81`.
  *
  * Exact Python slice parity: windows of `chunk_size` code points starting at
  * 0, step = chunk_size - overlap (420 in the live path); last chunk may be
  * short; empty text → 0 chunks.
  */
object Chunker {
  val LiveChunkSize = 500
  val LiveOverlap   = 80

  def chunkText(text: String, chunkSize: Int = LiveChunkSize, overlap: Int = LiveOverlap): Vector[String] = {
    val n = PyText.len(text)
    val step = chunkSize - overlap
    require(step > 0, s"chunk_size ($chunkSize) must exceed overlap ($overlap)")
    val b = Vector.newBuilder[String]
    var start = 0
    while (start < n) {
      b += PyText.slice(text, start, math.min(start + chunkSize, n))
      start += step
    }
    b.result()
  }

  /** Expected chunk count for sizing estimates: ceil(len/step), 0 for empty.
    * (ADR 0002's cost model `len/420`.)
    */
  def chunkCount(textLen: Int, chunkSize: Int = LiveChunkSize, overlap: Int = LiveOverlap): Int = {
    val step = chunkSize - overlap
    if (textLen <= 0) 0 else (textLen + step - 1) / step
  }
}
