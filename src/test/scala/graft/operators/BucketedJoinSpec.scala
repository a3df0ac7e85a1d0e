package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join mechanism for tables that join on the
  * same key repeatedly (docs ⨝ spans ⨝ features on doc_id at 100 TB).
  * Writing both sides bucketed by the join key lets Spark plan the join
  * with ZERO exchanges — the shuffle is paid once at write time and
  * amortized over every subsequent join. This spec pins that plan shape so
  * a config or writer regression can't silently reintroduce the shuffle.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("join of two doc_id-bucketed tables plans with no exchange") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val scores = docs.select(col("doc_id"), length(col("text")).as("score"))
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_scores")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("b_docs")
    scores.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("b_scores")
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("b_docs").join(spark.table("b_scores"), "doc_id")
          .select(col("doc_id"), col("lang"), col("score"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), plan.take(3000))
        assert(plan.contains("SortMergeJoin"), plan.take(3000))
        // and it actually runs correctly co-located
        assert(joined.count() == docs.count())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_scores")
    }
  }
}
