package graft.operators

import graft.SparkTestBase

/** Plan-quality gates: assert the physical plans have the shapes a 100 TB
  * deployment needs — scans pruned to the referenced columns, small dims
  * broadcast, top-k compiled to TakeOrderedAndProject, whole-stage codegen
  * covering the scoring expressions. Guards against regressions that tests
  * on 5k rows would never catch.
  */
class PlanQualitySpec extends SparkTestBase {

  private def plan(name: String): String = {
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).queryExecution.executedPlan.toString
  }

  test("q_chunk_fixed: scan reads only doc_id+text, filter pushed") {
    val p = plan("q_chunk_fixed")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(2000))
    assert(p.contains("PushedFilters:") && p.contains("IsNotNull(text)"), p.take(2000))
  }

  test("q_dense_topk: broadcast query vector + TakeOrderedAndProject") {
    val p = plan("q_dense_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("q_join_topk: dimension joins are broadcast, no shuffle of dims") {
    val p = plan("q_join_topk")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("q_ingest_metrics: partial aggregation before the exchange") {
    val p = plan("q_ingest_metrics")
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p.take(3000))
    // only the 2 needed columns are read
    assert(p.contains("ReadSchema: struct<source:string,n_chars:bigint>"), p.take(3000))
  }

  test("q_sparse_topk: token filter before the partial agg, top-k fused") {
    val p = plan("q_sparse_topk")
    assert(p.contains("partial_count"), p.take(3000))          // map-side combine
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))  // no global sort
    // the IN filter sits under the aggregation, next to the Generate
    assert(p.indexOf("Filter tok") > p.indexOf("HashAggregate"), p.take(3000))
  }

  test("q1_agg: scan prunes to the 5 referenced lineitem columns") {
    val p = plan("q1_agg")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_returnflag:string"), p.take(3000))
    assert(p.contains("partial_sum"), p.take(3000))
  }
}
