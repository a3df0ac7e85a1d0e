package graft.functions

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** The native winnow must be indistinguishable from the portable forms it
  * replaces: the per-window `array_min(slice(...))` HOF fold (the DuckDB
  * oracle text for the substring family) and q_winnow's relational
  * doc_id-window `min(struct(h, -pos))` — including the rightmost-tie
  * rule, the single-whole-array window for short inputs, and null
  * handling. The expression emits the per-doc DISTINCT pairs directly
  * (selection positions are non-decreasing, so duplicates are consecutive
  * runs); the reference model here re-derives that from first principles.
  */
class WinnowPairsSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference winnow: all windows, rightmost-tie min, consecutive-dup
    * collapse — an independent reimplementation of the contract.
    */
  private def ref(h: Seq[java.lang.Long], w: Int): Seq[(Int, Long)] = {
    val n = h.length
    val nw = if (n >= w) n - w + 1 else 1
    val sel = (0 until nw).flatMap { s =>
      val win = (s until math.min(s + w, n)).filter(i => h(i) != null)
      if (win.isEmpty) None
      else {
        val mn = win.map(i => h(i).longValue).min
        Some((win.filter(i => h(i) == mn).max, mn)) // rightmost tie
      }
    }
    sel.foldLeft(Vector.empty[(Int, Long)]) { (acc, p) =>
      if (acc.nonEmpty && acc.last == p) acc else acc :+ p
    }
  }

  test("winnow_pairs equals the reference winnow on corpus gram hashes (w=4 and w=8)") {
    GraftFunctions.ensure(spark)
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .where(expr("size(toks) >= 3"))
      .select(col("doc_id"), expr(
        "transform(transform(sequence(1, size(toks) - 2), i -> concat_ws(' '," +
          " element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))," +
          " s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint))").as("hs"))
      .select(col("doc_id"), col("hs"),
        expr("winnow_pairs(hs, 4)").as("w4"), expr("winnow_pairs(hs, 8)").as("w8"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows; (w, idx) <- Seq((4, 2), (8, 3))) {
      val hs = r.getSeq[Long](1).map(java.lang.Long.valueOf)
      val got = r.getSeq[org.apache.spark.sql.Row](idx)
        .map(p => (p.getInt(0), p.getLong(1)))
      assert(got == ref(hs, w), s"doc ${r.getLong(0)} w=$w")
    }
  }

  test("edge semantics: rightmost ties, short arrays, nulls, run-compressed distinctness") {
    GraftFunctions.ensure(spark)
    val df = Seq(
      (1L, Array[java.lang.Long](5L, 3L, 3L, 7L, 3L, 9L)),      // ties -> rightmost
      (2L, Array[java.lang.Long](4L, 2L)),                       // n < w: one whole-array window
      (3L, Array[java.lang.Long](8L)),                           // single element
      (4L, Array[java.lang.Long](null, 6L, null, 1L)),           // null elements skipped
      (5L, Array[java.lang.Long](null, null)),                   // all-null -> one null element
      (6L, Array.empty[java.lang.Long]),                         // empty -> one empty window -> null
      (7L, Array[java.lang.Long](1L, 1L, 1L, 1L, 1L))            // constant run collapses
    ).toDF("id", "hs").select(col("id"), expr("winnow_pairs(hs, 3)").as("wp"))
    val out = df.collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap

    def pairs(id: Long) = out(id).map {
      case null => null
      case p: org.apache.spark.sql.Row => (p.getInt(0), p.getLong(1))
    }
    // id 1, w=3: wins [5,3,3]->(2,3) [3,3,7]->(2,3) [3,7,3]->(4,3) [7,3,9]->(4,3)
    assert(pairs(1L) == Seq((2, 3L), (4, 3L)))
    assert(pairs(2L) == Seq((1, 2L)))
    assert(pairs(3L) == Seq((0, 8L)))
    // id 4 (n=4, w=3 -> two windows): [null,6,null] -> (1,6); [6,null,1] -> (3,1)
    assert(pairs(4L) == Seq((1, 6L), (3, 1L)))
    assert(pairs(5L) == Seq(null))
    assert(pairs(6L) == Seq(null))
    // id 7: every window selects its rightmost 1 -> positions 2, 3, 4
    assert(pairs(7L) == Seq((2, 1L), (3, 1L), (4, 1L)))
    // run-compression IS distinctness: no output may contain a duplicate
    for ((id, ps) <- out) assert(ps.distinct.size == ps.size, s"id $id")
  }

  test("q_winnow: native map-only arm equals the relational window arm") {
    val fn = SparkEntry.queries("q_winnow")
    def run(native: Boolean) = {
      spark.conf.set("spark.graft.nativewinnow", native.toString)
      try fn(spark, sfDir).collect().toSeq
      finally spark.conf.unset("spark.graft.nativewinnow")
    }
    val nat = run(true)
    val rel = run(false)
    assert(nat.nonEmpty && nat == rel)
  }

  test("q_substring_dedup: native fps arm equals the portable HOF arm") {
    val fn = SparkEntry.queries("q_substring_dedup")
    def run(native: Boolean) = {
      spark.conf.set("spark.graft.nativewinnow", native.toString)
      try fn(spark, sfDir).collect().toSeq
      finally spark.conf.unset("spark.graft.nativewinnow")
    }
    val nat = run(true)
    val rel = run(false)
    assert(nat == rel)
  }

  test("winnow_pairs stays inside whole-stage codegen") {
    GraftFunctions.ensure(spark)
    // a codegen-able array<bigint> child (HOFs would drop the whole
    // projection out of WSC regardless of this expression)
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(expr("winnow_pairs(sequence(doc_id, doc_id + 9), 4)").as("wp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [winnow_pairs"), plan.take(2000))
  }

  test("arity and type validation fail analysis with clear messages") {
    GraftFunctions.ensure(spark)
    val df = Seq(Tuple1(Array(1L, 2L))).toDF("hs")
    val e1 = intercept[Exception](df.select(expr("winnow_pairs(hs)")).collect())
    assert(e1.getMessage.contains("2 arguments"), e1.getMessage)
    val e2 = intercept[Exception](
      Seq(Tuple1("x")).toDF("x").select(expr("winnow_pairs(x, 4)")).collect())
    assert(e2.getMessage != null)
    val e3 = intercept[Exception](df.select(expr("winnow_pairs(hs, 0)")).collect())
    assert(e3.getMessage != null)
  }
}
