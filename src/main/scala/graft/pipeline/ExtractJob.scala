package graft.pipeline

import graft.kernel.{Extract, ExtractMode}
import graft.model.{Doc, Lineage}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The main extraction pipeline (SURVEY.md §3.1's Spark lifecycle):
  *
  *   read docs → size-bucket + salt → repartition → mapPartitions(kernel)
  *   → spans table (+ per-partition lineage metrics)
  *
  * Scale design notes (100 TB / 1000 executors):
  *  - The kernel stage is *map-only*: the single shuffle is the explicit
  *    salted repartition, keyed by (size_bucket, salt(doc_id)) so the giant-
  *    doc buckets (north_rule skew case) spread across `saltFactor` tasks
  *    instead of serializing one straggler partition.
  *  - No collect(), no driver-side loops; lineage is aggregated distributed
  *    and only the tiny per-partition summary reaches the driver.
  *  - Determinism: output spans are a pure function of the input row, so
  *    task retries and job re-runs emit identical bytes — the precondition
  *    for MERGE-on-doc_id resume (Checkpoint).
  */
object ExtractJob {

  final case class Config(
      mode: ExtractMode = ExtractMode.ChunkMode,
      numPartitions: Int = 0,     // 0 => leave to AQE / input splits
      saltFactor: Int = 8)

  /** Size bucket = log4(totalChars); giant docs land in their own buckets. */
  def withSizeBucket(docs: Dataset[Doc]): DataFrame =
    docs.withColumn("total_chars",
        aggregate(col("spans"), lit(0), (acc, s) => acc + length(s.getField("text"))))
      .withColumn("size_bucket",
        when(col("total_chars") <= 0, 0)
          .otherwise(floor(log(4.0, col("total_chars").cast("double") + lit(1.0)))))

  /** Salted repartition + typed kernel stage. */
  def extract(docs: Dataset[Doc], cfg: Config = Config()): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bucketed = withSizeBucket(docs)
    val salted = bucketed.withColumn("salt", pmod(xxhash64(col("doc_id")), lit(cfg.saltFactor)))
    val parts =
      if (cfg.numPartitions > 0) cfg.numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val repart = salted.repartition(parts, col("size_bucket"), col("salt"))
    val mode = cfg.mode
    repart.select($"doc_id", $"spans").as[Doc]
      .mapPartitions(_.map(Extract.extractDoc(_, mode)))
  }

  /** One-pass extraction that also yields per-partition lineage rows.
    * Returns (spans, lineage) — lineage is computed distributed from the
    * extracted output (kernel failures are counted, not thrown: a single
    * malformed doc must not abort a 10^12-doc job; reference aborts on first
    * error at ingest_documents.py:94, which is exactly the weakness the
    * north_rule fixes).
    */
  def extractWithLineage(docs: Dataset[Doc], cfg: Config = Config())
      : (Dataset[Doc], Dataset[Lineage]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mode = cfg.mode
    val bucketed = withSizeBucket(docs)
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(cfg.saltFactor)))
    val parts =
      if (cfg.numPartitions > 0) cfg.numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val repart = bucketed.repartition(parts, col("size_bucket"), col("salt"))
      .select($"doc_id", $"spans").as[Doc]

    // (doc, partition_id, failed) — failures yield an empty doc + flag.
    val tagged = repart.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      it.map { d =>
        try (Extract.extractDoc(d, mode), pid, false)
        catch { case scala.util.control.NonFatal(_) => (Doc(d.doc_id, Nil), pid, true) }
      }
    }
    val spans = tagged.map(_._1)
    val lineage = tagged.toDF("doc", "partition_id", "failed")
      .groupBy($"partition_id")
      .agg(
        count(lit(1)).as("docs_parsed"),
        sum(size($"doc.spans")).as("spans_emitted"),
        sum(when($"failed", 1L).otherwise(0L)).as("parse_failures"))
      .withColumn("status", lit("complete"))
      .select($"partition_id".cast("int"), $"docs_parsed", $"spans_emitted",
        $"parse_failures", $"status")
      .as[Lineage]
    (spans, lineage)
  }
}
