package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Connected-components (dedup clustering) semantics: min-label propagation
  * must close chains (a–b–c collapses to ONE keeper — the case a pairwise
  * min rule over-deletes), keep disjoint components apart, and converge in
  * ~diameter rounds on long paths.
  */
class DedupClusterSpec extends SparkTestBase {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    DedupOps.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to one component labeled by its min id") {
    // 1-2, 2-3 and an unrelated pair 10-11
    val labels = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long path (diameter 12) converges, labeled by its min id") {
    val path = (1L to 12L).sliding(2).map(w => (w(1), w(0))).toSeq // reversed edges
    val labels = cc(path)
    assert(labels.keySet == (1L to 12L).toSet)
    assert(labels.values.toSet == Set(1L))
  }

  test("pointer jumping: a 200-link chain closes in O(log d) rounds, not 200") {
    import spark.implicits._
    val path = (1L to 200L).sliding(2).map(w => (w(0), w(1))).toSeq
    val (labels, rounds) = DedupOps.connectedComponentsWithStats(path.toDF("doc_a", "doc_b"))
    assert(labels.collect().map(_.getLong(1)).toSet == Set(1L))
    // log2(200) ~ 8 doubling rounds + slack + the final proof round; plain
    // propagation would need ~200
    assert(rounds <= 14, s"took $rounds rounds")
  }

  test("empty pair set yields an empty labeling (no iteration blowup)") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("seeded start folds the first propagation in: disjoint pairs prove in ONE round") {
    // label₀ = min(self, neighbors) already labels every 2-clique by its
    // min, so the loop's only job is the no-change proof round
    val (labels, rounds) = DedupOps.connectedComponentsWithStats(
      Seq((2L, 1L), (5L, 9L), (7L, 8L)).toDF("doc_a", "doc_b"))
    assert(labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 9L -> 5L, 7L -> 7L, 8L -> 7L))
    assert(rounds == 1, s"seeded start should converge pairs in one proof round, took $rounds")
  }

  test("q_dedup_clusters: cluster ids are component minima and sizes add up") {
    val df = SparkEntryAccess.query("q_dedup_clusters")(spark, sfDir)
    val rows = df.collect()
    if (rows.nonEmpty) {
      // every cluster id is a member of its own cluster (the min rule)
      val byCluster = rows.groupBy(_.getLong(1))
      byCluster.foreach { case (cid, members) =>
        assert(members.map(_.getLong(0)).min == cid)
        assert(members.forall(_.getLong(2) == members.length))
      }
      // clusters are a partition of the paired docs: sizes sum to row count
      assert(byCluster.values.map(_.length).sum == rows.length)
    }
  }
}

private object SparkEntryAccess {
  def query(name: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    graft.SparkEntry.queries(name)
}
