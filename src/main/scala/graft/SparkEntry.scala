package graft

import graft.operators._
import graft.pipeline.ExtractJob
import graft.sources.DocSynth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers the reference's operator inventory (SURVEY.md §2) plus
  * the training-data-pipeline operators (dedup / ANN / text analysis /
  * multimodal). Each SQL-expressible operator carries a DuckDB oracle with
  * identical column names/types; fold-based kernel operators are rows-only
  * here and golden-tested in ScalaTest instead.
  */
object SparkEntry {

  private val allOps: Seq[Op] =
    ExtractOps.ops ++ RetrievalOps.ops ++ EvalOps.ops ++ FeedbackOps.ops ++
      RelationalOps.ops ++ DedupOps.ops ++ SimilarityOps.ops ++
      TextAnalysisOps.ops ++ MultimodalOps.ops ++ CorpusOps.ops

  /** Flagship: the full extraction pipeline (synthesize interleaved docs →
    * salted repartition → kernel → spans), exploded to one row per output
    * span. Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = DocSynth.docs(spark, "/root/testdata/sf0.001")
    ExtractJob.extract(docs).toDF()
      .select(col("doc_id"), explode(col("spans")).as("span"))
      .select(col("doc_id"), col("span.kind"), col("span.text"),
        col("span.media_ref"), col("span.offset"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(op => op.name -> op.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (sequential-fold kernels) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    allOps.flatMap(op => op.oracle.map(op.name -> _)).toMap
}
