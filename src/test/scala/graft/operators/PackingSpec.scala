package graft.operators

import graft.SparkTestBase

/** Semantic invariants of `q_pack_sequences` beyond the DuckDB oracle: the
  * output must actually describe a valid concat-and-chop packing — offsets
  * inside the budget, sequence ids monotone per shard, and every doc's
  * (seq_id, seq_offset) equal to the running token total of its
  * predecessors in the shard.
  */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private val Budget = 512L

  test("pack_sequences: offsets bounded, seq ids monotone, running totals exact") {
    val rows = graft.SparkEntry.queries("q_pack_sequences")(spark, sfDir)
      .select("doc_id", "shard", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, _, off) => off >= 0 && off < Budget })
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._1)
      var cum = 0L
      var lastSeq = -1L
      for ((_, _, n, seqId, off) <- ordered) {
        assert(seqId >= lastSeq, "seq_id must be non-decreasing in doc_id order")
        assert(seqId == cum / Budget && off == cum % Budget,
          s"doc start must equal the shard's running token total: cum=$cum got ($seqId, $off)")
        cum += n
        lastSeq = seqId
      }
    }
  }
}
