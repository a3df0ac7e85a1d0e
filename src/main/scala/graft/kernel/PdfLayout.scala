package graft.kernel

/** From-scratch PDF layout reading-order recovery over positioned text runs.
  *
  * The input-table spans carry *text*, not PDF bytes (FIXTURES.md §1), so a
  * `pdf_layout` span encodes its page's positioned runs one per line as
  * `x<TAB>y<TAB>text` (PDF user-space-ish coordinates, y grows downward).
  * This kernel recovers reading order the way a layout parser over real
  * extracted runs would (north_star: "column detection via x-cluster
  * sorting"):
  *
  *  1. parse runs;
  *  2. 1-D cluster run x-origins into columns (sorted x, split at gaps wider
  *     than `columnGap`);
  *  3. order columns left→right, runs within a column top→bottom then
  *     left→right;
  *  4. join runs: same-line runs (|Δy| < `lineTol`) with a space, new lines
  *     with `\n`, column boundaries with `\n\n`.
  *
  * Malformed lines are ignored (counted by the caller as parse anomalies,
  * not hard failures). Deterministic: stable sorts, fixed tolerances.
  */
object PdfLayout {

  final case class Run(x: Double, y: Double, text: String)

  val ColumnGap = 80.0 // min horizontal whitespace between column clusters
  val LineTol   = 2.0  // runs within this Δy are on one visual line

  def parseRuns(encoded: String): Vector[Run] = {
    val out = Vector.newBuilder[Run]
    for (line <- encoded.split("\n", -1) if line.nonEmpty) {
      val t1 = line.indexOf('\t')
      val t2 = if (t1 < 0) -1 else line.indexOf('\t', t1 + 1)
      if (t2 > 0) {
        try {
          val x = java.lang.Double.parseDouble(line.substring(0, t1))
          val y = java.lang.Double.parseDouble(line.substring(t1 + 1, t2))
          val txt = line.substring(t2 + 1)
          if (txt.nonEmpty) out += Run(x, y, txt)
        } catch { case _: NumberFormatException => () }
      }
    }
    out.result()
  }

  /** Cluster x-origins into column intervals; returns column index per run. */
  def assignColumns(runs: Vector[Run], gap: Double = ColumnGap): Vector[Int] = {
    if (runs.isEmpty) return Vector.empty
    val xs = runs.map(_.x).distinct.sorted
    // boundaries where consecutive x-origins are further apart than `gap`
    val starts = Vector.newBuilder[Double]
    starts += xs.head
    for (i <- 1 until xs.length) if (xs(i) - xs(i - 1) > gap) starts += xs(i)
    val colStarts = starts.result()
    runs.map { r =>
      // last column whose start <= r.x
      var lo = 0
      var hi = colStarts.length - 1
      var ans = 0
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (colStarts(mid) <= r.x) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      ans
    }
  }

  /** Full reading-order recovery: encoded runs → ordered page text. */
  def readingOrderText(encoded: String): String = {
    val runs = parseRuns(encoded)
    if (runs.isEmpty) return ""
    val cols = assignColumns(runs)
    val byCol = runs.zip(cols).groupBy(_._2).toSeq.sortBy(_._1)
    val colTexts = byCol.map { case (_, rs) =>
      val ordered = rs.map(_._1).sortBy(r => (r.y, r.x))
      val sb = new java.lang.StringBuilder
      var prevY = Double.NaN
      for (r <- ordered) {
        if (!prevY.isNaN) sb.append(if (math.abs(r.y - prevY) < LineTol) " " else "\n")
        sb.append(r.text)
        prevY = r.y
      }
      sb.toString
    }
    colTexts.mkString("\n\n")
  }
}
