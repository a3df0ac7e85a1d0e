package graft.pipeline

import graft.operators.CorpusOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data export assembly — the last mile of the pipeline: curated
  * docs → domain-mixture sampling → deterministic shard + training order →
  * fixed-length sequence packing. Output one row per exported doc:
  * (shard, pos, doc_id, source, n_tokens, seq_id, seq_offset, text) — the
  * layout a data loader consumes (shard = file, pos = order within it,
  * seq_id/seq_offset = where the doc lands in the packed token stream).
  *
  * Every stage is a pure deterministic function of the input (hash-derived
  * sampling/order, no RNG), so a re-run, a retried task, or a resume
  * converges to identical bytes — the property `ExportMain`'s
  * marker-after-data commit relies on.
  *
  * Scale shape: one equi-join against the curated id set, map-only mixture
  * admission, ONE hash shuffle on shard, and two shard-partitioned windows
  * over the same partitioning (order + running token sum — the second
  * window reuses the first's exchange). No global sort anywhere; nShards
  * scales with the corpus so each window partition stays bounded.
  */
object ExportJob {

  /** Assemble the export table from an already-curated id table
    * (columns incl. doc_id, split) and the raw documents table.
    */
  def assembleFrom(curated: DataFrame, docs: DataFrame, nShards: Int,
      seqLen: Int = 512): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val train = curated.where(col("split") === "train").select("doc_id")
    val admitted = CorpusOps.withMixture(docs.join(train, "doc_id"))
      .where(col("mix_u") < col("target_ppm"))
      .drop("mix_u", "target_ppm")
    val positioned = CorpusOps.withShardPos(admitted, nShards)
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    positioned
      .withColumn("n_tokens",
        expr(s"cast(size(${graft.operators.Idioms.toksSpark}) as bigint)"))
      .withColumn("cum", sum(col("n_tokens")).over(w).cast("bigint"))
      .select(col("shard"), col("pos"), col("doc_id"), col("source"), col("n_tokens"),
        // integer div, not floor(x / y.0): cum is a per-shard running token
        // count that can pass 2^53 at corpus scale, where double division
        // starts rounding; div stays exact at any magnitude
        expr(s"(cum - n_tokens) div $seqLen").as("seq_id"),
        ((col("cum") - col("n_tokens")) % seqLen).as("seq_offset"),
        col("text"))
  }
}
