package graft.kernel

/** T6–T10: metadata extract / normalize / date-normalize / flatten.
  *
  * Reference: `/root/reference/src/ingestion/metadata_schema.py:11-28`
  * (safe_str + 9-field projection), `src/ingestion/normalizer.py:3-23`
  * (key/value normalize, date normalize), `src/storage/vector_store.py:45-59`
  * (flatten with `meta_` prefix, drop-empty; duplicated at
  * `sparse_store.py:34-46`).
  */
object MetaNorm {

  /** The reference's fixed 9-field metadata record (metadata_schema.py:18-28). */
  final case class DocMeta(
      title: String,
      author: String,
      producer: String,
      creator: String,
      creationDate: String,
      modificationDate: String,
      keywords: String,
      appleKeywords: Seq[String],
      rgid: String)

  /** T8 `safe_str` (metadata_schema.py:11-16): None→"", else str(v).strip(). */
  def safeStr(v: Any): String = v match {
    case null      => ""
    case s: String => PyText.strip(s)
    case other     => PyText.strip(String.valueOf(other))
  }

  /** T9 `extract_metadata` (metadata_schema.py:18-28): project the 9 PDF
    * info keys into the fixed record.
    */
  def extractMetadata(meta: Map[String, Any]): DocMeta = {
    def g(k: String) = safeStr(meta.getOrElse(k, ""))
    val apple = meta.get("/AAPL:Keywords") match {
      case Some(xs: Seq[_]) => xs.map(String.valueOf(_))
      case _                => Seq.empty[String]
    }
    DocMeta(
      title = g("/Title"), author = g("/Author"), producer = g("/Producer"),
      creator = g("/Creator"), creationDate = g("/CreationDate"),
      modificationDate = g("/ModDate"), keywords = g("/Keywords"),
      appleKeywords = apple, rgid = g("/rgid"))
  }

  /** T6 `normalize_metadata` (normalizer.py:3-15): lowercase keys, strip
    * string values (non-strings pass through). Later duplicate keys win,
    * matching Python dict insertion/overwrite order.
    */
  def normalizeMetadata(meta: Seq[(String, String)]): Seq[(String, String)] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for ((k, v) <- meta) out(PyText.lower(k)) = if (v == null) null else PyText.strip(v)
    out.toSeq
  }

  private val IsoDate = "^(\\d{4})-(\\d{1,2})-(\\d{1,2})$".r

  /** T7 `normalize_date` (normalizer.py:17-23): strptime('%Y-%m-%d') →
    * isoformat, original string on parse failure. Python's %m/%d accept
    * non-zero-padded components; %Y here is constrained to 4 digits (the
    * fixture/golden contract uses 4-digit years).
    */
  def normalizeDate(dateStr: String): String = dateStr match {
    case IsoDate(y, m, d) =>
      try {
        val ld = java.time.LocalDate.of(y.toInt, m.toInt, d.toInt)
        f"${ld.getYear}%04d-${ld.getMonthValue}%02d-${ld.getDayOfMonth}%02dT00:00:00"
      } catch { case _: java.time.DateTimeException => dateStr }
    case _ => dateStr
  }

  /** T10 flatten (vector_store.py:45-59): prefix keys with `meta_`; drop
    * null/""/empty-list values; scalars pass as strings here (the engine's
    * metadata values are strings post-normalize); lists → list[str].
    * Returns (scalar fields, list fields).
    */
  def flatten(meta: Seq[(String, String)], lists: Seq[(String, Seq[String])] = Nil)
      : (Seq[(String, String)], Seq[(String, Seq[String])]) = {
    val scalars = meta.collect { case (k, v) if v != null && v.nonEmpty => (s"meta_$k", v) }
    val listed  = lists.collect { case (k, v) if v != null && v.nonEmpty => (s"meta_$k", v.map(String.valueOf(_))) }
    (scalars, listed)
  }
}
